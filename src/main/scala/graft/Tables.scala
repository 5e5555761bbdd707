package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture table readers (TESTDATA.md, FIXTURES.md).
  *
  * All tables are parquet at `<sfDir>/<name>.parquet`. The only
  * normalization the engine applies is to `events.ts`, whose physical
  * encoding has varied across driver-generated fixture vintages:
  *  - Parquet TIMESTAMP(NANOS) (pre-round-8): Spark 4 refuses to read
  *    it unless `spark.sql.legacy.parquet.nanosAsLong=true`, after
  *    which it arrives as LongType nanoseconds; we convert to µs with
  *    exact integer division (`div`, not `/` — double division of
  *    ~1.7e18 ns loses µs precision), matching DuckDB's truncating
  *    CAST(ts AS TIMESTAMP).
  *  - Parquet TIMESTAMP(MICROS) without tz (round-8 regeneration):
  *    Spark reads it as TIMESTAMP_NTZ; we reinterpret in the
  *    session's UTC zone (`cast(TimestampType)`) — the naive-
  *    timestamp semantics DuckDB applies to the same file.
  * `normalizeTs` dispatches on the observed dtype so the engine is
  * correct against either vintage (and a plain TIMESTAMP column
  * passes through untouched).
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** The two corpus tables (`documents`, `embeddings`) are spread to
    * `spark.sql.shuffle.partitions` by a deterministic hash of their
    * id on read. Why: these tables feed COMPUTE-AMPLIFIED ops (gram
    * explosion, k-way vector scoring — 10-100x more work than bytes),
    * and both fixtures are written as a SINGLE parquet row group, so
    * Spark's byte-range splits put every row in one partition and the
    * whole downstream op runs on one core of 32 (measured, sf10:
    * every documents/embeddings op was a single-task stage; the pq
    * assignment pass alone was 21 s serial vs ~0.7 s spread). This is
    * not just a fixture artifact: corpora exported as few fat files
    * are common, and one narrow hash pass of the base table is noise
    * next to any amplified op. Row-group-rich inputs (events,
    * lineitem: 10-58 groups) split fine natively and stay untouched —
    * repartitioning a 100 TB fact table here would be the bug.
    * Hash-on-id (not round-robin) keeps the exchange deterministic
    * under task retry; no declared op's results depend on source
    * partitioning (the exact-rank kernel sorts first; salts are
    * value-derived). */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    name match {
      case "documents" =>
        raw.repartition(spark.sessionState.conf.numShufflePartitions,
          col("doc_id"))
      case "embeddings" =>
        raw.repartition(spark.sessionState.conf.numShufflePartitions,
          col("vec_id"))
      case _ => raw
    }
  }

  /** events with ts normalized to TimestampType(µs). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(apply(spark, sfDir, "events"))
  }

  /** Normalize a `ts` column to TimestampType(µs) from any fixture
    * vintage: LongType = nanos under nanosAsLong (exact integer
    * div), TIMESTAMP_NTZ = µs naive (reinterpret in session UTC),
    * TimestampType = already right. */
  def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
}
