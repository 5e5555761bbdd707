package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of the rare-gram pair kernel (the
  * `shingle_containment` / `ngram_jaccard` cost center): times
  * cumulative prefixes of the plan at a given SF so the kernel's cost
  * is attributable to a stage, not guessed.
  *
  *   sbt "runMain graft.GramProbe /tmp/sf10"
  *
  * History this probe drove (sf10): with the pre-r11 shape
  * (`ngrams → xxhash64 → global (doc_id, g).distinct()`) it measured
  * scan 11.1 s / +distinct 19.6 s / +df 0.6 s / +grams 0.9 s /
  * +pairs 2.2 s — the global distinct was the single most expensive
  * stage, yet a (doc_id, g) key only repeats WITHIN one document, so
  * the dedup is row-local by construction. The `ngram_hashes`
  * generator (ext/NGramHashesGenerator) now dedups inside the row and
  * no distinct exchange exists; `shingle_containment` fell
  * 33.4 s → 14.0 s (45.2 s before the r11 hash-key rewrite).
  *
  * Current stages (each timed min-of-3, warm, cumulative):
  *   scan  — docs → ngram_hashes generator (row-local dedup, no shuffle)
  *   df    — + gram df rollup (first exchange, map-side combined) + MaxDf
  *   grams — + rare-gram semi join back to (doc_id, g)
  *   pairs — + candidate self-join + pair rollup (the full kernel)
  */
object GramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    graft.ext.GraftFunctions.register(spark)

    def scanStage = Tables(spark, sfDir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), expr("ngram_hashes(toks, 3)"))
    def dfStage = scanStage.groupBy(col("g"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= text.SimilarityOps.MaxDf)
    def gramsStage = scanStage.join(dfStage.select(col("g")), "g")
    // mirrors SimilarityOps.rareGramStats (private[text]) so the
    // probe times the identical shape end-to-end
    def pairsStage = {
      val grams = gramsStage
      val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val a = grams.select(col("doc_id").as("doc_a"), col("g"))
      val b = grams.select(col("doc_id").as("doc_b"), col("g"))
      a.join(b, "g")
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_inter"))
        .join(sizes.select(col("doc_id").as("doc_a"),
          col("n").as("n_a")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"),
          col("n").as("n_b")), "doc_b")
    }

    val stages: Seq[(String, () => Long)] = Seq(
      "scan" -> (() => scanStage.count()),
      "df" -> (() => dfStage.count()),
      "grams" -> (() => gramsStage.count()),
      "pairs" -> (() => pairsStage.count()))
    // warm
    stages.foreach(_._2())
    def f(v: Double) = "%.4f".format(v)
    val timed = stages.map { case (name, run) =>
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      s""""$name":${f(ts.min)}"""
    }
    println(s"""{"probe":"gram_stages","sf":"$sfDir",${timed.mkString(",")}}""")
    spark.stop()
  }
}
