package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-category operator registries
  * (SURVEY.md §2 inventory); `oracleSql` carries the DuckDB oracle for
  * every SQL-expressible entry. Column names/aliases are identical on
  * both sides (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  private val modules: Seq[OpModule] = Seq(
    ops.Scans,
    ops.Joins,
    ops.Aggs,
    ops.Windows,
    ops.Sets,
    ops.Funcs,
    ops.Generators,
    sources.SourceOps,
    ga.GaOps,
    ga.FlowOps,
    ga.JourneyOps,
    text.TextOps,
    text.SimilarityOps,
    text.CurationOps,
    text.LmOps,
    multimodal.MultimodalOps,
    vec.VectorOps)

  private lazy val all: Seq[Op] = modules.flatMap(_.ops)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Aggs.pricingAgg.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(o => o.name -> o.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(o => o.oracle.map(sql => o.name -> sql.trim)).toMap
}
