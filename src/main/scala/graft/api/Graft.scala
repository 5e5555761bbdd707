package graft.api

import graft.ga.GaQuery
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** User-facing facade: the operations a user of the reference
  * connector runs today, as reusable DataFrame transforms (each is
  * the generalized form of a declared, oracle-verified query — the
  * named queries in SparkEntry pin these to fixed parameters).
  *
  * Every transform is lazy plan construction; nothing executes until
  * an action, so Catalyst sees the whole pipeline (pushdown through
  * these helpers works — asserted in PlanShapeSpec/ApiSpec).
  */
object Graft {

  /** Entry point mirroring the reference's report query facade. */
  def query(): GaQuery = GaQuery()

  def register(spark: SparkSession): Unit =
    graft.ext.GraftFunctions.register(spark)

  /** SQL entry (SURVEY §3.3 lifecycle B): register every fixture
    * table as a temp view (events with the ns→µs normalization
    * applied) so `spark.sql(...)` works directly alongside the
    * DataFrame DSL — same Catalyst pipeline plus a parse step. */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    graft.Tables.names.foreach { t =>
      val df =
        if (t == "events") graft.Tables.events(spark, sfDir)
        else graft.Tables(spark, sfDir, t)
      df.createOrReplaceTempView(t)
    }

  // ---- GA composites ----

  /** Gap-based sessionization: appends `session_id` (per-user ordinal)
    * to an event frame. One shuffle on `userCol`. Gaps compare at
    * MICROSECOND precision (unix_micros), matching the oracle-verified
    * sessionize query — casting a timestamp to long would truncate to
    * seconds and merge sessions whose gap is within 1s of the
    * threshold. `tieBreak` columns extend the event-time ordering so
    * equal-timestamp events sessionize deterministically. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int = 30, tieBreak: Seq[String] = Nil): DataFrame =
    graft.ga.GaSessions.addSessionId(events, col(userCol),
      unix_micros(col(tsCol)),
      unix_micros(col(tsCol)) +: tieBreak.map(col),
      gapMinutes * 60L * 1000000L, "session_id")

  /** As-of join: for each left row, the single most recent right row
    * with rightTime <= leftTime, per key. Implemented as the
    * groupBy-max formulation (union trick avoided): join on key +
    * range, keep max rightTime per left row. Right side should be the
    * smaller (dimension/state) table. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String): DataFrame = {
    val l = left.withColumn("_lid", monotonically_increasing_id())
    // right columns that collide with left names (the common
    // trades.ts / quotes.ts shape) are suffixed `_r` in the output —
    // otherwise the post-join frame has ambiguous references and the
    // matched/unmatched union is ill-formed
    val collisions = right.columns.toSet
      .intersect(left.columns.toSet) - key
    val r = collisions.foldLeft(right)((df, c) =>
      df.withColumnRenamed(c, c + "_r"))
    val rtName = if (collisions(rightTime)) rightTime + "_r" else rightTime
    val matched = l.join(r,
        l(key) === r(key) && r(rtName) <= l(leftTime))
      .withColumn("_rn", row_number().over(
        // tie-break over the remaining right columns (all unique names
        // after the _r suffixing) so equal-timestamp right rows pick a
        // deterministic winner
        Window.partitionBy(col("_lid")).orderBy(
          col(rtName).desc +:
            r.columns.filterNot(c => c == key || c == rtName)
              .toIndexedSeq.map(c => col(c).asc): _*)))
      .filter(col("_rn") === 1)
      .drop("_rn")
      .drop(r(key))
    val unmatched = l.join(r,
      l(key) === r(key) && r(rtName) <= l(leftTime),
      "left_anti")
    matched.unionByName(unmatched, allowMissingColumns = true)
      .drop("_lid")
  }

  /** Weekly cohort retention: (cohort week start, week offset,
    * distinct users). */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    // both the cohort label and the offset use the SAME epoch-week
    // bucketing (us div week), matching the oracle-verified
    // cohort_retention query — mixing calendar weeks with
    // days-since-first/7 would misalign cells for users whose first
    // event falls mid-week
    val weekUs = 604800000000L
    val first = events.groupBy(col(userCol))
      .agg(min(unix_micros(col(tsCol))).as("_first_us"))
    events.join(first, userCol)
      .withColumn("cohort_week", expr(s"_first_us div $weekUs"))
      .withColumn("week_offset",
        expr(s"unix_micros($tsCol) div $weekUs") - col("cohort_week"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  // ---- LLM-pipeline transforms ----

  /** Exact dedup: keep the first row (min orderCol) per textCol hash. */
  def dedupExact(df: DataFrame, textCol: String,
      orderCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(orderCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Brute-force top-k rows by dot product against one target vector.
    * Broadcast of the 1-row target + TakeOrderedAndProject merge —
    * the block-partitioned exact baseline. */
  def vectorTopK(df: DataFrame, vecCol: String, target: DataFrame,
      targetVecCol: String, k: Int, idCol: String): DataFrame = {
    register(df.sparkSession)
    df.crossJoin(broadcast(target.select(col(targetVecCol).as("_t"))))
      .withColumn("score", expr(s"dot_f($vecCol, _t)"))
      .drop("_t")
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Per-document quality signals (token count, char span, stopword
    * ratio) for corpus filtering. */
  def qualityScore(df: DataFrame, textCol: String,
      stopwords: Seq[String] = Seq("a", "the")): DataFrame = {
    require(stopwords.nonEmpty, "qualityScore needs at least one stopword")
    // escape quotes/backslashes: the predicate is spliced into SQL text
    def esc(w: String): String =
      w.replace("\\", "\\\\").replace("'", "\\'")
    val stopPred = stopwords.map(w => s"x = '${esc(w)}'").mkString(" or ")
    df.withColumn("n_tokens", size(split(col(textCol), " ")))
      .withColumn("_stop",
        expr(s"size(filter(split($textCol, ' '), x -> $stopPred))"))
      .withColumn("stop_ratio",
        col("_stop").cast("double") / col("n_tokens"))
      .withColumn("quality",
        least(lit(1.0), col("n_tokens").cast("double") / 60.0) *
          (lit(1.0) - col("stop_ratio")))
      .drop("_stop")
  }

  /** Token n-grams per row via the native generator (one row per
    * OCCURRENCE — apply .distinct() downstream for set semantics). */
  def ngrams(df: DataFrame, textCol: String, n: Int,
      idCol: String): DataFrame = {
    register(df.sparkSession)
    df.withColumn("_toks", split(col(textCol), " "))
      .filter(size(col("_toks")) >= n)
      .select(col(idCol), expr(s"ngrams(_toks, $n)"))
  }
}
