package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator from SURVEY.md §2: a Spark implementation
  * `(session, sfDir) => DataFrame` plus, when the semantics are
  * SQL-expressible, the equivalent DuckDB oracle SQL (the driver
  * hash-compares both at sf0.01 — SURVEY.md §2 determinism rules).
  *
  * Ops without an oracle (randomized sketches, streaming, ANN) are
  * still registered in `queries` and get the driver's weaker
  * rows-only check; their real coverage is the scalatest suite.
  */
final case class Op(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait OpModule {
  def ops: Seq[Op]
}
