package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-phase attribution of the streaming-curation tick (VERDICT r15
  * task 5): replays the BENCH_STREAM scenario — 5 doc_id-ordered
  * ticks over the mutated sf1m corpus — through `Graft.curateIngest`
  * in ledger mode (the exact `curateStreamMerge` kernel, minus the
  * foreachBatch scaffolding) under a JOB listener keyed by each
  * job's callSite. A tick's jobs run sequentially on one thread, so
  * per-callSite wall sums ARE the phase shares: the quality battery's
  * localCheckpoint, the four commitPartition* writes, the band-index
  * rollup, and the near-dup verify's checkpoint/joins each surface
  * as their own Graft.scala / Snapshots.scala line.
  *
  *   java ... graft.TickProbe <sfDir> [nTicks] [--emb]
  *
  * `--emb` arms the semantic stage with the fixture embeddings
  * (vec_id keyed as doc_id) to attribute the 7-table form too. */
object TickProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TickProbe <sfDir> [nTicks] [--emb]")
    val sfDir = args(0)
    val nTicks = args.drop(1).find(!_.startsWith("--")).map(_.toInt)
      .getOrElse(5)
    val withEmb = args.contains("--emb")
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

    // job wall time by callSite (jobs are sequential within a tick)
    val jobStart = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val jobSite = scala.collection.concurrent.TrieMap.empty[Int, String]
    // SQL execution id -> the ACTION's callsite ("localCheckpoint at
    // Graft.scala:1612"): AQE submits its stage-materialization jobs
    // through futures whose own callsite is a CompletableFuture
    // lambda, so the execution description is the only stable label
    val execDesc = scala.collection.concurrent.TrieMap.empty[Long, String]
    val siteWall =
      scala.collection.mutable.LinkedHashMap.empty[String, Double]
    @volatile var live = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execDesc(s.executionId) = s.description
          case _ => ()
        }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (live) {
          jobStart(js.jobId) = js.time
          val byExec = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
            .flatMap(id => execDesc.get(id.toLong))
          jobSite(js.jobId) = byExec
            .orElse(js.stageInfos.lastOption.map(_.name))
            .getOrElse("?")
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        if (live) for (t0 <- jobStart.remove(je.jobId)) {
          val site = jobSite.remove(je.jobId).getOrElse("?")
          siteWall.synchronized {
            siteWall(site) =
              siteWall.getOrElse(site, 0.0) + (je.time - t0) / 1e3
          }
        }
    })

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "n_chars")
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val cuts = (1 to nTicks).map(i => ids(((ids.length.toLong * i
      / nTicks) - 1).toInt))
    val emb =
      if (withEmb) Some(spark.read
        .parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id").as("doc_id"), col("embedding")))
      else None
    val base = sources.Snapshots.freshTmpBase(spark, "tickprobe", sfDir)
    val t0 = System.nanoTime()
    live = true
    var lo = Long.MinValue
    cuts.zipWithIndex.foreach { case (hi, i) =>
      val batch = docs.filter(col("doc_id") > lo && col("doc_id") <= hi)
      val tTick = System.nanoTime()
      api.Graft.curateIngest(batch, base, 0.4, Some(i + 1L), emb)
      println(f"[tick] ${i + 1} ${(System.nanoTime() - tTick) / 1e9}%6.2f s")
      lo = hi
    }
    live = false
    val total = (System.nanoTime() - t0) / 1e9
    println(f"[total] $nTicks ticks $total%6.2f s  " +
      f"(${ids.length / total}%.0f rows/s)")
    siteWall.toSeq.sortBy(-_._2).foreach { case (site, w) =>
      println(f"[phase] $w%7.2f s  ${w / total * 100}%5.1f%%  $site")
    }
    spark.stop()
  }
}
