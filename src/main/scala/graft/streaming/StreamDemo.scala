package graft.streaming

import org.apache.spark.sql.SparkSession

/** End-to-end streaming drive: replay the events parquet as a file
  * stream, run the tumbling-window aggregate, sink to memory, and
  * cross-check against the batch `window_tumbling` query — the
  * streaming twin of the driver's oracle check, runnable standalone:
  * `sbt "runMain graft.streaming.StreamDemo /root/testdata/sf0.001"`.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val checkpoint = java.nio.file.Files
      .createTempDirectory("graft-demo").toString
    val query = StreamOps.tumblingCounts(StreamOps.replay(spark, sfDir))
      .writeStream.format("memory").queryName("stream_tumbling")
      .outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .start()
    query.processAllAvailable()
    query.stop()
    val streamed = spark.table("stream_tumbling")
      .collect().map(_.toString).sorted
    val batch = graft.SparkEntry.queries("window_tumbling")(spark, sfDir)
      .collect().map(_.toString).sorted
    println(s"STREAM rows=${streamed.length} BATCH rows=${batch.length} " +
      s"EQUAL=${streamed.sameElements(batch)}")
    spark.stop()
  }
}
