package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Unforced-DPP evidence probe (VERDICT r10 task 8).
  *
  * `dpp_join` pins `useStats=false` / `fallbackFilterRatio=10000` /
  * `reuseBroadcastOnly=false` because at the sf0.01 gate the fact is
  * KB-sized and Spark's benefit estimator correctly rejects the
  * pruning subquery. The 100 TB claim in SCALE.md is that a REAL
  * partitioned fact wins the same decision unforced — this main
  * measures that claim instead of asserting it.
  *
  * It builds a `days`-partition fact from the given SF's events table
  * (replica r shifts ts by r*30 days, so 30-day events tile to any
  * horizon; bytes and rows grow with the replica count), a calendar
  * dim keyed on a NON-partition attribute, and runs the
  * fact⋈(dim WHERE dno%7=0) aggregate twice on DEFAULT DPP confs —
  * once as written, once with DPP disabled — reporting for each:
  * did `dynamicpruningexpression` reach the fact scan's
  * PartitionFilters, how many of the fact's partition directories
  * were read (from the scan's "partitions read" metric), and the
  * wall time. One JSON line, SCALE.md-ready:
  *
  *   sbt "runMain graft.DppProbe /tmp/sf1 300"
  */
object DppProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val days = if (args.length > 1) args(1).toInt else 300
    require(days % 30 == 0, "days must be a multiple of the 30-day fixture")
    val replicas = days / 30
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = s"/tmp/graft_dpp_probe_${days}d"
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("value"), col("ts"))
    val tiled = (0 until replicas)
      .map(r => ev.withColumn("day",
        date_add(to_date(col("ts")), r * 30)).drop("ts"))
      .reduce(_ union _)
    tiled.write.mode("overwrite").partitionBy("day")
      .parquet(s"$path/fact")
    // calendar dim: file-backed (a LocalRelation filter would
    // constant-fold before the PartitionPruning rule sees it)
    tiled.select(col("day")).distinct()
      .withColumn("dno",
        datediff(col("day"), lit("2024-01-01")).cast("int"))
      .write.mode("overwrite").parquet(s"$path/dim")

    // the fact scan's "number of partitions read" SQL metric — the
    // headline evidence the probe exists for (dirs actually LISTED,
    // not just the pruning expression's presence in the plan string)
    def factPartitionsRead(
        p: org.apache.spark.sql.execution.SparkPlan): Long = {
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.adaptive.{
        AdaptiveSparkPlanExec, QueryStageExec}
      def scans(x: org.apache.spark.sql.execution.SparkPlan)
          : Seq[FileSourceScanExec] = x match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: QueryStageExec => scans(q.plan)
        case f: FileSourceScanExec => Seq(f)
        case o => o.children.flatMap(scans)
      }
      scans(p)
        .filter(_.relation.location.rootPaths.mkString.contains("/fact"))
        .flatMap(_.metrics.get("numPartitions").map(_.value))
        .headOption.getOrElse(-1L)
    }

    def run(dppEnabled: Boolean): (Boolean, Long, Double, Long) = {
      val s = spark.newSession()
      s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled",
        dppEnabled.toString)
      // everything else: Spark defaults — useStats=true,
      // fallbackFilterRatio=0.5, reuseBroadcastOnly=true
      val fact = s.read.parquet(s"$path/fact")
      val dim = s.read.parquet(s"$path/dim")
        .filter(pmod(col("dno"), lit(7)) === 0)
        .select(col("day"))
      val joined = fact.join(dim, Seq("day"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
      val t0 = System.nanoTime()
      // collect (43 tiny rows), not count(): count() builds its own
      // query execution, leaving `joined`'s AQE plan unfinalized
      val n = joined.collect().length.toLong
      val secs = (System.nanoTime() - t0) / 1e9
      val plan = joined.queryExecution.executedPlan.toString
      val pruned = plan.contains("dynamicpruningexpression")
      val partsRead = factPartitionsRead(joined.queryExecution.executedPlan)
      (pruned, n, secs, partsRead)
    }

    // warm both shapes once (codegen/JIT), then measure min-of-3
    run(dppEnabled = true); run(dppEnabled = false)
    val on = (1 to 3).map(_ => run(dppEnabled = true))
    val off = (1 to 3).map(_ => run(dppEnabled = false))
    require(on.map(_._2).distinct.size == 1 &&
      on.head._2 == off.head._2,
      "row counts diverged between DPP on/off — pruning changed results")
    def f(v: Double) = "%.4f".format(v)
    println(s"""{"probe":"dpp_unforced","sf":"$sfDir","day_partitions":$days,""" +
      s""""dpp_fired_unforced":${on.head._1},""" +
      s""""surviving_days":${on.head._2},""" +
      s""""partitions_read_dpp_on":${on.head._4},""" +
      s""""partitions_read_dpp_off":${off.head._4},""" +
      s""""secs_dpp_on":${f(on.map(_._3).min)},""" +
      s""""secs_dpp_off":${f(off.map(_._3).min)}}""")
    spark.stop()
  }
}
