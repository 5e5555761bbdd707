package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Minimal follow-up to [[PqProbe]]: the full-computation timings
  * showed the assign map stage costs 0.33 s feeding a global agg but
  * ~17-20 s feeding a localCheckpoint or a join — same subtree, same
  * 7 tasks. This probe prints PER-TASK runtimes and RDD chains for
  * every stage of exactly two actions (assign→sum and
  * assign→localCheckpoint) so the skew-vs-uniform question and the
  * owning RDD are answered directly.
  *
  *   sbt "runMain graft.PqProbe2 /tmp/sf10"
  */
object PqProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ext.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._

    val taskTimes =
      scala.collection.concurrent.TrieMap.empty[Int, List[Double]]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val d = te.taskInfo.duration / 1e3
        taskTimes.updateWith(te.stageId) {
          case Some(l) => Some(d :: l); case None => Some(List(d))
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val secs = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield (c - s) / 1e3).getOrElse(-1.0)
        val ts = taskTimes.getOrElse(si.stageId, Nil)
        val rdds = si.rddInfos.map(r => s"${r.id}:${r.name}").mkString(" ")
        println(f"[stage] id=${si.stageId}%3d tasks=${si.numTasks}%3d " +
          f"wall=$secs%6.2f max=${if (ts.isEmpty) 0 else ts.max}%6.2f " +
          f"sum=${ts.sum}%7.2f  rdds: ${rdds.take(160)}")
      }
    })

    val emb = Tables(spark, sfDir, "embeddings")
    val sub = emb
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(7))).as("s"),
        col("embedding"))
      .withColumn("sv", expr("slice(embedding, s * 8 + 1, 8)"))
      .withColumn("s2", expr("dot_f(sv, sv)"))
      .select(col("vec_id"), col("s"), col("sv"), col("s2"))
      .localCheckpoint()
    val c0 = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code"),
        explode(sequence(lit(0), lit(7))).as("s"),
        col("embedding"))
      .withColumn("c_sv", expr(
        "transform(slice(embedding, s * 8 + 1, 8), x -> CAST(x AS DOUBLE))"))
      .select(col("s"), col("code"), col("c_sv"))
      .withColumn("c2", expr("dot_fd(c_sv, c_sv)"))
      .localCheckpoint()

    def assign() = sub.join(broadcast(c0), "s")
      .withColumn("d2",
        round(col("s2") + col("c2") -
          lit(2.0) * expr("dot_fd(sv, c_sv)"), 4))
      .withColumn("k",
        round(col("d2") * 10000, 0).cast("long") * 65536L + col("code"))
      .groupBy(col("vec_id"), col("s"))
      .agg(min(col("k")).as("k"))
      .select(col("vec_id"), col("s"), (col("k") % 65536L).as("code"))

    println("[probe2] sub per-partition rows: " +
      sub.rdd.mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
        .collect().sortBy(_._1).map(_._2).mkString(","))

    println("[probe2] ===== action A: assign -> global sum =====")
    var t0 = System.nanoTime()
    val qa = assign().agg(sum(col("code")).as("x"))
    qa.count()
    println(f"[probe2] sum action   ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    println("[planA] " + qa.queryExecution.executedPlan.toString
      .linesIterator.map(_.take(150)).mkString("\n[planA] "))
    Thread.sleep(500)

    println("[probe2] ===== action B: assign -> localCheckpoint =====")
    // in-process sampler: attach API is blocked in this sandbox, so
    // dump executor-task stacks from inside while the straggler runs
    val sampler = new Thread(() => {
      (1 to 3).foreach { i =>
        Thread.sleep(6000)
        import scala.jdk.CollectionConverters._
        Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
          if (t.getName.contains("Executor task launch") && st.nonEmpty) {
            println(s"[dump$i] ${t.getName} state=${t.getState}")
            st.take(14).foreach(f => println(s"[dump$i]    $f"))
          }
        }
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    t0 = System.nanoTime()
    val qb = assign()
    val a = qb.localCheckpoint()
    println(f"[probe2] chk action   ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    println("[planB] " + qb.queryExecution.executedPlan.toString
      .linesIterator.map(_.take(150)).mkString("\n[planB] "))
    Thread.sleep(500)

    println("[probe2] ===== action C: assign -> count (skeleton) =====")
    t0 = System.nanoTime()
    assign().count()
    println(f"[probe2] cnt action   ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    Thread.sleep(500)
    a.count()
    spark.stop()
  }
}
