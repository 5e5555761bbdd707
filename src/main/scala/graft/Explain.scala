package graft
import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: print the executed plan of named declared
  * queries (all of them with no args) at a given SF dir — the
  * `.explain` feedback loop SURVEY §4 prescribes, as a runnable main:
  *
  *   sbt "runMain graft.Explain /root/testdata/sf0.001 q1,q2"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"===== $n")
      try println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString)
      catch { case e: Throwable => println(s"[explain] failed: $e") }
    }
    spark.stop()
  }
}
