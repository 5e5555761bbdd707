package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-mitigation utilities (SURVEY.md §7 "100 TB design notes").
  *
  * AQE's skew-join splitting (on by default) covers sort-merge joins;
  * these helpers cover the two cases it doesn't: hot-key *hash
  * aggregation* and broadcast-infeasible joins against a skewed
  * probe side. Both use deterministic salts (hash of a stable column,
  * never rand()) so results are reproducible and retryable — a task
  * retry with rand() salts would double-count.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (key, salt) partial sums,
    * then groupBy key to merge. Turns one hot key hitting one reducer
    * into `salts` parallel partials. Only algebraic aggregates
    * (sum/count/min/max) can use this shape.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      saltCol: Column, salts: Int): DataFrame =
    df.groupBy(key.as("k"), (pmod(hash(saltCol), lit(salts))).as("salt"))
      .agg(sum(value).as("partial_sum"), count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_sum")).as("total"),
        sum(col("partial_n")).as("n"))

  /** Salted join for a skewed probe side against a small-but-not-
    * broadcastable build side: probe rows get a deterministic salt in
    * [0, salts); the build side is replicated `salts` times with an
    * explode, and the join key becomes (key, salt) — fanning each hot
    * key across `salts` reducers. */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, saltOn: Column, salts: Int): DataFrame = {
    val saltedProbe = probe
      .withColumn("_salt", pmod(hash(saltOn), lit(salts)))
    val replicatedBuild = build
      .withColumn("_salt", explode(expr(s"sequence(0, ${salts - 1})")))
    saltedProbe.join(replicatedBuild,
      saltedProbe(probeKey) === replicatedBuild(buildKey) &&
        saltedProbe("_salt") === replicatedBuild("_salt"))
      .drop("_salt")
  }
}
