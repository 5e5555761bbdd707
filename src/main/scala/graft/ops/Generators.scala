package graft.ops

import graft.{Op, OpModule, Tables}
import org.apache.spark.sql.functions._

/** Generators & reshaping (SURVEY.md §2.9): explode (Catalyst
  * `Generator`) and pivot — the pandas `pivot_table` surface of the
  * reference's post-processing layer.
  *
  * Scale notes: explode multiplies rows *within* a partition (no
  * shuffle); the downstream groupBy is the only exchange, and its
  * partial aggregation collapses token counts map-side first, so the
  * shuffle carries ≤ |vocabulary| rows per partition. Pivot with an
  * explicit value list is a single hash aggregate (no second pass to
  * discover pivot values — never let Spark infer them at 100 TB).
  */
object Generators extends OpModule {

  /** Tokenize documents and count tokens, top-20 (total order:
    * count desc, then token). */
  val explodeTokens = Op(
    "explode_tokens",
    (s, d) =>
      Tables(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w"))
        .limit(20),
    Some("""
      SELECT w, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w
      ORDER BY n DESC, w
      LIMIT 20"""))

  /** Doc counts pivoted lang × source over a fixed source list.
    * Spark pivot yields NULL for empty cells while the FILTER-agg
    * oracle yields 0 — coalesce to 0 on the Spark side. */
  val pivotLang = Op(
    "pivot_lang",
    (s, d) => {
      val sources = Seq("src0", "src1", "src2", "src3", "src4")
      val pivoted = Tables(s, d, "documents")
        .groupBy(col("lang"))
        .pivot("source", sources)
        .count()
      pivoted.select(
        col("lang") +: sources.map(c => coalesce(col(c), lit(0L)).as(c)): _*)
    },
    Some("""
      SELECT lang,
             COUNT(*) FILTER (WHERE source = 'src0') AS src0,
             COUNT(*) FILTER (WHERE source = 'src1') AS src1,
             COUNT(*) FILTER (WHERE source = 'src2') AS src2,
             COUNT(*) FILTER (WHERE source = 'src3') AS src3,
             COUNT(*) FILTER (WHERE source = 'src4') AS src4
      FROM documents
      GROUP BY lang"""))

  /** Top-20 token trigrams via the CUSTOM Generator UDTF
    * (graft.ext.NGramsGenerator, registered as `ngrams`) — puts the
    * custom generator itself under the driver's oracle gate; the
    * DuckDB side builds the same trigrams with a list comprehension. */
  val ngramTop = Op(
    "ngram_top",
    (s, d) => {
      graft.ext.GraftFunctions.register(s)
      Tables(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        // no size filter: the generator itself emits nothing for
        // sub-n docs (NGramsGenerator.eval), and a size(toks)>=3
        // Filter is pushdown-eligible — it would tokenize the corpus
        // below the spread exchange, single-threaded (r13 lesson)
        .select(expr("ngrams(toks, 3)"))
        .groupBy(col("ngram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ngram"))
        .limit(20)
    },
    Some("""
      SELECT g AS ngram, COUNT(*) AS n
      FROM (
        SELECT unnest([toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                       FOR i IN range(0, len(toks) - 2)]) AS g
        FROM (SELECT string_split(text, ' ') AS toks FROM documents)
        WHERE len(toks) >= 3)
      GROUP BY g
      ORDER BY n DESC, g
      LIMIT 20"""))

  /** Wide→long reshape (pivot's inverse, pandas `melt`): per-flag
    * pricing metrics unpivoted to (metric, value) rows via the native
    * `Dataset.unpivot` — a Generator-backed Expand, row-multiplying
    * within partitions with no extra shuffle. All measures are cast
    * to double (unpivot requires one value type); the oracle is the
    * explicit UNION ALL. */
  val unpivotMetrics = Op(
    "unpivot_metrics",
    (s, d) =>
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          // quantity is integer-valued (exact double sum); the price
          // sums exact integer cents — 12M-row cells at sf10 flip a
          // raw double sum's rounding boundary
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(floor(col("l_extendedprice") * 100).cast("long"))
            / 100.0, 2).as("sum_price"),
          count(lit(1)).cast("double").as("n_rows"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("n_rows")),
          "metric", "value"),
    Some("""
      WITH wide AS (
        SELECT l_returnflag,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
                 / 100.0, 2) AS sum_price,
               CAST(COUNT(*) AS DOUBLE) AS n_rows
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
      UNION ALL
      SELECT l_returnflag, 'sum_price', sum_price FROM wide
      UNION ALL
      SELECT l_returnflag, 'n_rows', n_rows FROM wide"""))

  override def ops: Seq[Op] =
    Seq(explodeTokens, pivotLang, ngramTop, unpivotMetrics)
}
