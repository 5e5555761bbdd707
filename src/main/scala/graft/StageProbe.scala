package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Generic per-stage attribution probe for any declared op: runs the
  * key once to warm JIT/codegen, then once under a stage listener
  * that prints wall/max/sum task time and the owning RDD chain per
  * stage — the fast way to find WHICH pass of a multi-consumer plan
  * owns a tail before optimizing it (the GramProbe/PqProbe2
  * methodology, generalized).
  *
  *   java ... graft.StageProbe <sfDir> <key> [key2 ...]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StageProbe <sfDir> <key> [key...]")
    val sfDir = args(0)
    val keys = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ext.GraftFunctions.register(spark)

    val taskTimes =
      scala.collection.concurrent.TrieMap.empty[Int, List[Double]]
    @volatile var live = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (live) {
          val d = te.taskInfo.duration / 1e3
          taskTimes.updateWith(te.stageId) {
            case Some(l) => Some(d :: l); case None => Some(List(d))
          }
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (live) {
          val si = sc.stageInfo
          val secs = (for {
            s <- si.submissionTime; c <- si.completionTime
          } yield (c - s) / 1e3).getOrElse(-1.0)
          val ts = taskTimes.getOrElse(si.stageId, Nil)
          val rdds =
            si.rddInfos.map(r => s"${r.id}:${r.name}").mkString(" ")
          println(f"[stage] id=${si.stageId}%3d tasks=${si.numTasks}%3d " +
            f"wall=$secs%6.2f max=${if (ts.isEmpty) 0 else ts.max}%6.2f " +
            f"sum=${ts.sum}%7.2f  rdds: ${rdds.take(160)}")
        }
    })

    // noop sink, not collect(): forces every output column to compute
    // (count() prunes the aggregate subtree — the r12 "pruned lie")
    // without shipping data-sized results to the driver
    def run(key: String): Unit =
      SparkEntry.queries(key)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    keys.foreach { key =>
      println(s"== $key warm-up ==")
      run(key) // JIT/codegen warm; listener off
      Thread.sleep(300)
      println(s"== $key probed ==")
      live = true
      val t0 = System.nanoTime()
      run(key)
      val t1 = System.nanoTime()
      live = false
      println(f"[total] $key ${(t1 - t0) / 1e9}%6.2f s")
      taskTimes.clear()
    }
    spark.stop()
  }
}
