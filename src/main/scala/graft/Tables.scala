package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture table readers (TESTDATA.md, FIXTURES.md).
  *
  * All tables are parquet at `<sfDir>/<name>.parquet`. The only
  * normalization the engine applies is to `events.ts`, which the
  * generator wrote as Parquet TIMESTAMP(NANOS): Spark 4 refuses to
  * read it unless `spark.sql.legacy.parquet.nanosAsLong=true`, after
  * which it arrives as LongType nanoseconds (FIXTURES.md:85-91). We
  * convert to a microsecond TimestampType with exact integer division
  * (`div`, not `/` — double division of ~1.7e18 ns loses µs
  * precision), matching DuckDB's truncating CAST(ts AS TIMESTAMP).
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events with ts normalized to TimestampType(µs). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
