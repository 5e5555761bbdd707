package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned-parquet snapshots: ACID-lite table versioning with
  * time-travel reads (`readAsOf`) — the lake-user primitive the
  * MERGE emulations (`merge_upsert`, `merge_partitioned`,
  * `table_diff`) compose with.
  *
  * Layout under `base/`:
  *   - `v=<N>/` — the version-N data (full parquet snapshot)
  *   - `_commits/<N>` — the commit marker, written AFTER the data
  *
  * Commit protocol (write-ordered, marker-last):
  *   1. write the data to `v=<N>/` (Spark job; may take hours)
  *   2. create `_commits/<N>` with `create(..., overwrite = false)`
  * The marker create is the atomic commit point: a crash after step 1
  * leaves an orphan data dir that NO reader ever sees (readers list
  * only `_commits/`), and `overwrite = false` makes two racing
  * writers of the same version fail-loudly rather than co-own a dir —
  * the loser retries with the next number (optimistic concurrency,
  * the Delta/Iceberg commit idiom re-expressed on raw parquet).
  *
  * The 100 TB story is in what readers LIST: `_commits/` holds one
  * tiny file per version, so discovering versions is O(#versions)
  * metadata reads — never a recursive listing of data files — and a
  * `readAsOf` scans exactly one `v=<N>/` directory, inside which
  * Spark's normal pruning (partition dirs, row groups, pushed
  * filters) applies untouched. Full-snapshot versions trade write
  * amplification for zero-cost reads; a delta-log variant would
  * change `commit`, not the reader contract.
  */
object Snapshots {

  private def fs(s: SparkSession, base: String) =
    new Path(base).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def commitDir(base: String) = new Path(base, "_commits")

  /** Committed version numbers, ascending (empty for a fresh base). */
  def versions(s: SparkSession, base: String): Seq[Long] = {
    val f = fs(s, base)
    val dir = commitDir(base)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .flatMap(st => st.getPath.getName.toLongOption)
      .sorted
  }

  /** Latest committed version; 0 when none exist. */
  def latest(s: SparkSession, base: String): Long =
    versions(s, base).lastOption.getOrElse(0L)

  /** Write `df` as the next version of the table at `base`; returns
    * the committed version number. Data first, marker last. */
  def commit(df: DataFrame, base: String): Long = {
    val s = df.sparkSession
    val f = fs(s, base)
    var v = latest(s, base) + 1
    var committed = false
    while (!committed) {
      df.write.mode("overwrite").parquet(s"$base/v=$v")
      // atomic commit point; overwrite=false loses the race loudly
      try {
        val out = f.create(new Path(commitDir(base), v.toString), false)
        out.close()
        committed = true
      } catch {
        case _: java.io.IOException => v = latest(s, base) + 1
      }
    }
    v
  }

  /** Idempotent commit of a KNOWN version number — the Structured
    * Streaming `foreachBatch` contract (version = batchId + 1): a
    * restarted micro-batch re-offers the same version and must land
    * exactly once. Returns true if THIS call committed the version,
    * false if it already existed (the restart/no-op path) or another
    * writer won the marker race. Either way the version exists with
    * exactly one writer's data when this returns — the marker-last
    * protocol makes the duplicate write of the SAME deterministic
    * batch invisible (the loser's dir rewrite happens before any
    * marker exists, and `mode(overwrite)` makes it idempotent). */
  def commitAs(df: DataFrame, base: String, version: Long): Boolean = {
    val s = df.sparkSession
    val f = fs(s, base)
    val marker = new Path(commitDir(base), version.toString)
    if (f.exists(marker)) return false
    df.write.mode("overwrite").parquet(s"$base/v=$version")
    try { f.create(marker, false).close(); true }
    catch { case _: java.io.IOException => false }
  }

  /** Rollback as a COMMIT, never a delete: re-commits the content of
    * `version` as the NEXT version, so "undo to v3" is itself a
    * versioned, auditable event (v6 = v3's content), concurrent
    * readers of the bad versions are never yanked, and the bad
    * history stays inspectable until `vacuum` retires it — the
    * RESTORE semantics of the table formats this module mirrors.
    * Returns the new version number. */
  def rollbackTo(s: SparkSession, base: String, version: Long): Long =
    commit(readAsOf(s, base, version), base)

  /** Retention vacuum: keep the newest `retain` committed versions;
    * delete older versions (marker FIRST, then data — the inverse of
    * marker-last commit, so a crash mid-vacuum leaves an orphan data
    * dir, never a readable half-deleted version) and orphan `v=N`
    * dirs whose writer died before its marker — but only orphans
    * older than `graceMs`, because a missing marker is also what an
    * IN-FLIGHT commit looks like (the Delta/Iceberg vacuum-retention
    * rationale). A `readAsOf` at or below a vacuumed version fails
    * loudly rather than silently resolving to a different snapshot.
    * Returns the vacuumed version numbers. */
  def vacuum(s: SparkSession, base: String, retain: Int,
      graceMs: Long = 24L * 3600 * 1000): Seq[Long] = {
    require(retain >= 1, "vacuum must retain at least the latest version")
    val f = fs(s, base)
    val vs = versions(s, base)
    val dead = vs.dropRight(retain)
    dead.foreach { v =>
      f.delete(new Path(commitDir(base), v.toString), false)
      f.delete(new Path(s"$base/v=$v"), true)
    }
    val live = vs.takeRight(retain).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    f.listStatus(new Path(base)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .filter(st => st.getModificationTime < cutoff)
      .flatMap(st => st.getPath.getName.stripPrefix("v=").toLongOption
        .filterNot(live).map(_ => st.getPath))
      .foreach(p => f.delete(p, true))
    dead
  }

  /** Compaction as a commit (the OPTIMIZE half of the snapshot
    * story, pairing `compaction_plan`'s planning half): rewrite the
    * latest version's data into ceil(bytes / targetFileBytes) files
    * and commit the rewrite as the NEXT version. Readers of the new
    * version see identical rows in fewer files; every older version
    * stays readable (time travel untouched), so a compaction that
    * crashes mid-write is invisible like any other failed commit.
    * Returns the committed version number.
    *
    * The row-identical guarantee is structural: the rewrite is
    * `read(v).repartition(n)` — a round-robin exchange, no
    * filter/project — and the marker-last protocol means the swap is
    * atomic. At 100 TB you'd compact per PARTITION (only the
    * small-file partitions `compaction_plan` flags, preserving
    * partition dirs via partitionBy on the rewrite); whole-table
    * round-robin is the fixture-scale form of the same commit. */
  def compact(s: SparkSession, base: String, targetFileBytes: Long): Long = {
    val v = latest(s, base)
    require(v > 0, s"nothing to compact at $base (no committed version)")
    val dir = s"$base/v=$v"
    val bytes = fs(s, base).getContentSummary(new Path(dir)).getLength
    val nOut = math.max(1L,
      (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    commit(s.read.parquet(dir).repartition(nOut), base)
  }

  /** Data-file count of a committed version (metadata listing only —
    * the compaction audit metric). */
  def fileCount(s: SparkSession, base: String, version: Long): Int =
    fs(s, base).listStatus(new Path(s"$base/v=$version")).count { st =>
      val n = st.getPath.getName
      n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    }

  /** Time-travel read: the table as of `version` — the greatest
    * committed version ≤ `version` (so `readAsOf(Long.MaxValue)` is
    * the latest snapshot). Throws for a base with no committed
    * version at or below the ask. */
  def readAsOf(s: SparkSession, base: String, version: Long): DataFrame = {
    val vs = versions(s, base).filter(_ <= version)
    require(vs.nonEmpty,
      s"no committed version <= $version at $base " +
        s"(committed: ${versions(s, base).mkString(",")})")
    s.read.parquet(s"$base/v=${vs.last}")
  }
}
