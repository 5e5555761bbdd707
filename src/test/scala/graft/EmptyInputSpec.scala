package graft

import graft.api.Graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Empty-input robustness: every facade transform and representative
  * operator shape must return an empty (or grand-total) result on
  * zero rows, never throw — the degenerate partitions of a 100 TB run
  * are empty all the time.
  */
class EmptyInputSpec extends AnyFunSuite {
  import SparkFixture._

  private lazy val emptyEvents = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType))))

  private lazy val emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))

  test("sessionize on zero events") {
    assert(Graft.sessionize(emptyEvents, "user_id", "ts").count() == 0)
  }

  test("cohortRetention on zero events") {
    assert(Graft.cohortRetention(emptyEvents, "user_id", "ts").count() == 0)
  }

  test("dedupExact on zero documents") {
    assert(Graft.dedupExact(emptyDocs, "text", "doc_id").count() == 0)
  }

  test("qualityScore on zero documents") {
    assert(Graft.qualityScore(emptyDocs, "text").count() == 0)
  }

  test("asofJoin with an empty right side keeps all left rows") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "p")
    val right = Seq.empty[(Long, Long, String)].toDF("k", "rt", "s")
    val out = Graft.asofJoin(left, right, "k", "t", "rt").collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("s")))
  }

  test("aggregation over zero rows yields the grand-total row semantics") {
    val agg = emptyEvents.agg(count(lit(1)).as("n"),
      sum(col("value")).as("s")).collect().head
    assert(agg.getLong(0) == 0L && agg.isNullAt(1))
    // grouped aggregation yields zero rows instead
    assert(emptyEvents.groupBy("event_type").count().count() == 0)
  }

  test("window functions over zero rows") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    assert(emptyEvents.withColumn("rn", row_number().over(w)).count() == 0)
  }

  test("kmv_distinct over zero rows returns 0") {
    emptyEvents.createOrReplaceTempView("empty_ev")
    val n = spark.sql("SELECT kmv_distinct(user_id) FROM empty_ev")
      .collect().head.getLong(0)
    assert(n == 0L)
  }

  test("heavyHitters over zero rows claims nothing") {
    assert(Graft.heavyHitters(emptyEvents, "event_type", 8).count() == 0)
  }

  test("bloomSemiJoin with an empty dim side keeps no fact rows") {
    val li = SparkFixture.q("scan_project").limit(100)
      .select(col("l_orderkey"))
    val emptyDims = emptyEvents.select(col("event_id").as("o_orderkey"))
    assert(Graft.bloomSemiJoin(li, "l_orderkey", emptyDims, "o_orderkey")
      .count() == 0)
  }

  test("round-5 facades on zero rows") {
    assert(Graft.chunkDocs(emptyDocs, "text", "doc_id").count() == 0)
    assert(Graft.pmiBigrams(emptyDocs, "text").count() == 0)
    assert(Graft.unigramLogprob(emptyDocs, "text", "doc_id").count() == 0)
    assert(Graft.editDistPairs(emptyDocs, "doc_id", "text",
      Seq("text")).count() == 0)
    assert(Graft.basketPairs(emptyEvents, "event_id", "event_type")
      .count() == 0)
    assert(Graft.histogram(emptyEvents, "value", "event_type").count() == 0)
    assert(Graft.decileLift(emptyEvents, "user_id", "value").count() == 0)
    assert(Graft.userStreaks(emptyEvents, "user_id", "ts").count() == 0)
  }

  test("round-8 facade transforms on zero rows") {
    Graft.register(spark)
    assert(Graft.entropyFilter(emptyDocs, "text", "doc_id").count() == 0)
    assert(Graft.cooccurTopK(emptyDocs, "text").count() == 0)
    assert(Graft.importanceWeights(emptyDocs, "text", "doc_id",
      expr("doc_id % 2 = 0")).count() == 0)
    val emptyVecs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    assert(Graft.semdedup(emptyVecs, "embedding", "vec_id",
      emptyVecs.select(col("vec_id").as("cid"),
        col("embedding").as("cvec")), "cid", "cvec").count() == 0)
    // zero users: the 1-row grand-total shape still returns one row
    // of zero counts rather than throwing on 0/0
    val ab = Graft.abLift(emptyEvents, "user_id", "value",
      col("event_type") === "purchase", col("event_type") === "purchase")
    assert(ab.count() == 1 && ab.first().getLong(0) == 0L)
    assert(Graft.containmentPairs(emptyDocs, "text", "doc_id")
      .count() == 0)
    assert(Graft.winnowFingerprints(emptyDocs, "text", "doc_id")
      .count() == 0)
    assert(Graft.ewmaSmooth(emptyEvents, "event_type", "ts")
      .count() == 0)
    assert(Graft.dauMau(emptyEvents, "user_id", "ts").count() == 0)
    // zero tokens: the 1-row grand-total shape keeps NULL slope
    val zf = Graft.zipfFit(emptyDocs, "text")
    assert(zf.count() == 1 && zf.first().getLong(0) == 0L &&
      zf.first().isNullAt(1))
  }

  test("chunkDocs skips empty-string documents instead of throwing") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "abcd")).toDF("doc_id", "text")
    val out = Graft.chunkDocs(docs, "text", "doc_id", 3, 2).collect()
    // doc 1 yields no chunks (sequence(0,-1) guarded); doc 2 chunks
    assert(out.forall(_.getLong(0) == 2L))
    assert(out.map(r => (r.getLong(1), r.getString(2))).toSet ==
      Set((0L, "abc"), (1L, "cd")))
  }
}
