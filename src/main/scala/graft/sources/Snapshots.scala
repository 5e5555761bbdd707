package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets.UTF_8

/** Versioned-parquet snapshots: ACID-lite table versioning with
  * time-travel reads (`readAsOf`) — the lake-user primitive the
  * MERGE emulations (`merge_upsert`, `merge_partitioned`,
  * `table_diff`) compose with.
  *
  * Layout under `base/`:
  *   - `v=<N>-<nonce>/` — a version-N data candidate, uniquely named
  *     PER WRITER (the nonce is a random suffix)
  *   - `_commits/<N>` — the commit marker; its CONTENT names the
  *     winning writer's data directory
  *
  * Commit protocol (write-ordered, marker-last, writer-unique dirs):
  *   1. write the data to `v=<N>-<nonce>/` (Spark job; may take
  *      hours) — a directory NO other writer ever touches
  *   2. create `_commits/<N>` with `create(..., overwrite = false)`
  *      and write the data-dir name into it
  * The marker create is the atomic commit point: a crash after step 1
  * leaves an orphan data dir that NO reader ever sees (readers list
  * only `_commits/` and resolve dirs through marker content), and
  * `overwrite = false` makes two racing writers of the same version
  * fail-loudly at the marker — each wrote its OWN directory, so the
  * loser's bytes can never clobber or interleave with the winner's
  * (the Iceberg pointer-file idiom re-expressed on raw parquet: the
  * tiny marker, not the data path, is the unit of atomicity). The
  * loser's dir becomes an orphan that `vacuum` retires after its
  * grace period. `commit` retries the loser at the next version
  * number (optimistic concurrency); `commitAs` reports the loss.
  *
  * The one non-atomicity left is marker content: a reader can list a
  * marker in the instant between its create and its content write.
  * That window resolves to a LOUD failure (the named dir is not yet
  * parseable), never to another writer's data — and the fallback for
  * empty content is the legacy `v=<N>` path, which only a pre-nonce
  * layout ever has.
  *
  * The 100 TB story is in what readers LIST: `_commits/` holds one
  * tiny file per version, so discovering versions is O(#versions)
  * metadata reads — never a recursive listing of data files — and a
  * `readAsOf` scans exactly one version directory, inside which
  * Spark's normal pruning (partition dirs, row groups, pushed
  * filters) applies untouched. Full-snapshot versions trade write
  * amplification for zero-cost reads; `commitPartitions` is the
  * incremental form — it rewrites only the touched partition
  * directories and records a per-version manifest mapping every live
  * partition to the version that last wrote it, so a daily MERGE
  * into one partition of a year-partitioned 100 TB table writes one
  * partition's bytes, not the table's.
  */
object Snapshots {

  private def fs(s: SparkSession, base: String) =
    new Path(base).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def commitDir(base: String) = new Path(base, "_commits")

  private def manifestDir(base: String) = new Path(base, "_manifests")

  private def nonce(): String =
    java.util.UUID.randomUUID().toString.take(8)

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

  /** Latest committed version STRICTLY BELOW `v`; 0 when none. The
    * pre-tick read point for fixed-version ledgers: on a replay the
    * tick's own version (and any later one) must be invisible to the
    * recompute, and version numbers may be sparse (skipped batches
    * leave gaps), so "the version before v" is a search, not v−1. */
  def latestBefore(s: SparkSession, base: String, v: Long): Long =
    versions(s, base).takeWhile(_ < v).lastOption.getOrElse(0L)

  /** The data directory a committed version's marker names (relative
    * to `base`); falls back to the legacy `v=<N>` layout for markers
    * with no content. Throws for an uncommitted version. */
  private def dataDirOf(s: SparkSession, base: String, v: Long): String = {
    val f = fs(s, base)
    val marker = new Path(commitDir(base), v.toString)
    require(f.exists(marker),
      s"version $v is not committed at $base")
    val in = f.open(marker)
    val content =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    if (content.isEmpty) s"v=$v" else content
  }

  /** Create the version marker with `overwrite = false` — the atomic
    * commit point — and record the winning data dir as its content.
    * Returns true if THIS call created the marker. A lost race (the
    * marker already exists) returns false; any OTHER IOException is a
    * genuine write failure and PROPAGATES, so a caller driving a
    * streaming checkpoint fails and retries the batch instead of
    * silently losing the version (a swallowed transient failure here
    * would advance the checkpoint with no marker on disk). */
  private def tryMarker(s: SparkSession, base: String, v: Long,
      dataDir: String): Boolean = {
    val f = fs(s, base)
    val marker = new Path(commitDir(base), v.toString)
    // Phase 1 — the atomic create. Only HERE does "marker exists" mean
    // "another writer won": after a successful create, the marker is
    // OURS, and any later failure must not be misread as a lost race.
    val out =
      try f.create(marker, false)
      catch {
        case e: java.io.IOException =>
          // only the already-exists race is benign; everything else is
          // a real failure the caller must see
          if (f.exists(marker)) return false else throw e
      }
    // Phase 2 — the content write. A failure here is NEVER a lost race
    // (we hold the marker): leaving the half-written marker in place
    // would publish a committed version that resolves to nowhere, and
    // returning false would make the caller delete its own data dir.
    // Remove our incomplete marker and propagate.
    try {
      try out.write(dataDir.getBytes(UTF_8)) finally out.close()
      true
    } catch {
      case e: Throwable =>
        try f.delete(marker, false)
        catch { case _: Throwable => () } // best-effort; rethrow below
        throw e
    }
  }

  /** Write `df` as the next version of the table at `base`; returns
    * the committed version number. Data first (to a writer-unique
    * dir), marker last; a lost marker race leaves this writer's dir
    * an orphan and retries at the next version number. */
  def commit(df: DataFrame, base: String): Long = {
    val s = df.sparkSession
    val f = fs(s, base)
    var v = latest(s, base) + 1
    while (true) {
      val dir = s"v=$v-${nonce()}"
      df.write.mode("overwrite").parquet(s"$base/$dir")
      if (tryMarker(s, base, v, dir)) return v
      f.delete(new Path(base, dir), true) // lost the race: own dir only
      v = latest(s, base) + 1
    }
    v // unreachable
  }

  /** Idempotent commit of a KNOWN version number — the Structured
    * Streaming `foreachBatch` contract (version = batchId + 1): a
    * restarted micro-batch re-offers the same version and must land
    * exactly once. Returns true if THIS call committed the version,
    * false if it already existed (the restart/no-op path, detected
    * before any write) or another writer won the marker race — in
    * the race case the loser wrote only its own uniquely-named dir,
    * so the winner's committed data is untouched either way. A
    * transient marker-write failure (not a lost race) THROWS, so the
    * streaming query fails and re-offers the batch. */
  def commitAs(df: DataFrame, base: String, version: Long): Boolean = {
    val s = df.sparkSession
    val f = fs(s, base)
    val marker = new Path(commitDir(base), version.toString)
    if (f.exists(marker)) return false
    val dir = s"v=$version-${nonce()}"
    df.write.mode("overwrite").parquet(s"$base/$dir")
    if (tryMarker(s, base, version, dir)) true
    else { f.delete(new Path(base, dir), true); false }
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
    * dir, never a readable half-deleted version) and orphan `v=N…`
    * dirs no live marker references, whose writer died before its
    * marker (or lost its race) — but only orphans older than
    * `graceMs`, because an unreferenced dir is also what an IN-FLIGHT
    * commit looks like (the Delta/Iceberg vacuum-retention
    * rationale). A partition-manifest version (`commitPartitions`)
    * pins every data dir its manifest references, so incremental
    * history chains are never broken by retention. A `readAsOf` at or
    * below a vacuumed version fails loudly rather than silently
    * resolving to a different snapshot. Returns the vacuumed version
    * numbers.
    *
    * `now` is injectable for tests and for object stores whose file
    * mtimes lag wall clock — the grace compare is mtime < now−grace,
    * so give skewed stores a grace comfortably above the skew bound
    * (mtime skew shrinks the EFFECTIVE grace by the skew amount). */
  def vacuum(s: SparkSession, base: String, retain: Int,
      graceMs: Long = 24L * 3600 * 1000,
      now: Long = System.currentTimeMillis()): Seq[Long] = {
    require(retain >= 1, "vacuum must retain at least the latest version")
    val f = fs(s, base)
    val vs = versions(s, base)
    val dead = vs.dropRight(retain)
    // every dir a surviving version references stays, including dirs
    // an incremental manifest borrows from OLDER (even vacuumed)
    // versions — computed before any delete
    val live = vs.takeRight(retain)
      .flatMap(v => referencedDirs(s, base, v)).toSet
    dead.foreach { v =>
      val dir = dataDirOf(s, base, v)
      f.delete(new Path(commitDir(base), v.toString), false)
      f.delete(new Path(manifestDir(base), v.toString), false)
      if (!live(dir)) f.delete(new Path(base, dir), true)
    }
    val cutoff = now - graceMs
    f.listStatus(new Path(base)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .filter(st => st.getModificationTime < cutoff)
      .filterNot(st => live(st.getPath.getName))
      .foreach(st => f.delete(st.getPath, true))
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
    * small-file partitions `compaction_plan` flags) and commit the
    * rewrite through `commitPartitions`, which touches just those
    * partitions' dirs; whole-table round-robin is the fixture-scale
    * form of the same commit. */
  def compact(s: SparkSession, base: String, targetFileBytes: Long): Long = {
    val v = latest(s, base)
    require(v > 0, s"nothing to compact at $base (no committed version)")
    val dir = s"$base/${dataDirOf(s, base, v)}"
    val bytes = fs(s, base).getContentSummary(new Path(dir)).getLength
    val nOut = math.max(1L,
      (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    commit(s.read.parquet(dir).repartition(nOut), base)
  }

  /** Data-file count of a committed version (metadata listing only —
    * the compaction audit metric). Counts across every partition dir
    * the version references (manifest versions may reference dirs
    * written by earlier versions). */
  def fileCount(s: SparkSession, base: String, version: Long): Int = {
    val f = fs(s, base)
    def countIn(p: Path): Int =
      f.listStatus(p).map { st =>
        val n = st.getPath.getName
        if (st.isDirectory && !n.startsWith("_") && !n.startsWith("."))
          countIn(st.getPath)
        else if (n.endsWith(".parquet") && !n.startsWith("_") &&
          !n.startsWith(".")) 1
        else 0
      }.sum
    referencedDirs(s, base, version)
      .map(d => countIn(new Path(base, d))).sum
  }

  /** Time-travel read: the table as of `version` — the greatest
    * committed version ≤ `version` (so `readAsOf(Long.MaxValue)` is
    * the latest snapshot). Throws for a base with no committed
    * version at or below the ask. Manifest (partition-incremental)
    * versions resolve to a pruned union over the source versions
    * that last wrote each live partition. */
  def readAsOf(s: SparkSession, base: String, version: Long): DataFrame = {
    val vs = versions(s, base).filter(_ <= version)
    require(vs.nonEmpty,
      s"no committed version <= $version at $base " +
        s"(committed: ${versions(s, base).mkString(",")})")
    val v = vs.last
    manifestOf(s, base, v) match {
      case None => s.read.parquet(s"$base/${dataDirOf(s, base, v)}")
      case Some(m) => readManifest(s, base, m, manifestPartType(s, base, v))
    }
  }

  // ---- partition-incremental commits -------------------------------

  /** A manifest line: (hive partition dir like "day=2024-01-03",
    * data dir like "v=3-ab12cd34" that owns its current bytes). */
  private type Manifest = Seq[(String, String)]

  private def manifestOf(s: SparkSession, base: String,
      v: Long): Option[Manifest] = {
    val f = fs(s, base)
    val p = new Path(manifestDir(base), v.toString)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(text.split('\n').toSeq
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { line =>
          val i = line.lastIndexOf('\t')
          (line.substring(0, i), line.substring(i + 1))
        })
    }
  }

  /** The partition column's WRITER-side type, recorded as the
    * manifest's `#type` header (r16). Hive partition-value type
    * inference is per-READ and data-dependent — a version whose live
    * partition values happen to all parse numeric infers the column
    * as int, while its sibling versions (or the in-flight frames it
    * merges with) carry strings, and the join coercion then casts
    * e.g. hash prefix 'b' to BIGINT and throws. Recording the type
    * once at write time makes every read return the column exactly
    * as committed. Absent for pre-header manifests → reads fall back
    * to inference (the old behavior). */
  private def manifestPartType(s: SparkSession, base: String,
      v: Long): Option[String] = {
    val f = fs(s, base)
    val p = new Path(manifestDir(base), v.toString)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.split('\n').find(_.startsWith("#type\t"))
        .map(_.stripPrefix("#type\t").trim)
    }
  }

  /** Every data dir under `base` that `version` references: its own
    * marker dir plus (for manifest versions) each partition's source
    * dir. */
  private def referencedDirs(s: SparkSession, base: String,
      version: Long): Seq[String] =
    (dataDirOf(s, base, version) +:
      manifestOf(s, base, version).toSeq.flatten.map(_._2)).distinct

  private def writeManifest(s: SparkSession, base: String, v: Long,
      m: Manifest, partType: String): Unit = {
    val f = fs(s, base)
    val out = f.create(new Path(manifestDir(base), v.toString), false)
    try out.write(
      (s"#type\t$partType" +:
        m.map { case (p, d) => s"$p\t$d" }).mkString("\n").getBytes(UTF_8))
    finally out.close()
  }

  /** The hive null-partition sentinel directory name. */
  private val HiveNullPart = "__HIVE_DEFAULT_PARTITION__"

  /** Decode one hive-escaped path segment: Spark's partitioned writer
    * escapes each special char (including '=', '%', ':', space) as
    * `%XX` — two hex digits of the char — so the dir name is NOT the
    * raw value. Inverse of that per-char escaping. */
  private def unescapePathName(n: String): String = {
    val sb = new java.lang.StringBuilder(n.length)
    var i = 0
    while (i < n.length) {
      val c = n.charAt(i)
      if (c == '%' && i + 2 < n.length) {
        val hex = n.substring(i + 1, i + 3)
        val code = try Integer.parseInt(hex, 16) catch { case _: NumberFormatException => -1 }
        if (code >= 0) { sb.append(code.toChar); i += 3 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The (unescaped) partition column name of a manifest line's hive
    * dir name ("day=2024-01-03" → "day"). */
  private def manifestPartCol(hiveDir: String): String =
    unescapePathName(hiveDir.substring(0, hiveDir.indexOf('=')))

  /** One pruned scan per SOURCE version: partitions are grouped by
    * the data dir that owns them, each group reads its dir with hive
    * partition discovery and an `isin` filter on the partition values
    * (directory pruning — the stale partitions a later version
    * superseded are never listed into the scan), and the groups
    * union. Values are UNESCAPED from their hive dir form before the
    * compare (an escaped name like `a%3Db` never matches the column's
    * raw `a=b` otherwise) and the hive null sentinel maps to an
    * `isNull` branch — a null-partition row would silently vanish
    * through `isin` alone. At 100 TB this is exactly the file set a
    * format manifest would enumerate, reached through O(#partitions)
    * metadata. */
  private def readManifest(s: SparkSession, base: String,
      m: Manifest, partType: Option[String] = None): DataFrame = {
    require(m.nonEmpty,
      "empty manifest: this version committed no partitions and owns " +
        "no inherited ones — an empty partitioned table version is " +
        "rejected at commit time; use commit() for full snapshots")
    m.groupBy(_._2).toSeq.sortBy(_._1).map { case (dir, parts) =>
      val partCol = manifestPartCol(parts.head._1)
      val c = org.apache.spark.sql.functions.col(partCol).cast("string")
      val raw = parts.map(p => p._1.substring(p._1.indexOf('=') + 1))
      val (nulls, escaped) = raw.partition(_ == HiveNullPart)
      val vals = escaped.map(unescapePathName)
      val pred =
        if (vals.isEmpty) c.isNull
        else if (nulls.isEmpty) c.isin(vals: _*)
        else c.isin(vals: _*) || c.isNull
      val g = s.read.option("basePath", s"$base/$dir")
        .parquet(s"$base/$dir")
        .filter(pred)
      // pin the partition column to its committed type: per-dir hive
      // inference is data-dependent (an all-numeric dir group infers
      // int where the table's column is string) — see manifestPartType
      partType.fold(g)(t => g.withColumn(partCol,
        org.apache.spark.sql.functions.col(partCol).cast(t)))
    }.reduce(_ unionByName _)
  }

  /** Full commit of a hive-partitioned table version: writes every
    * partition of `df` under one writer-unique dir (partitionBy) and
    * records the manifest mapping each partition to it. The base
    * version `commitPartitions` increments from. Returns the version.
    * Single string partition column (the fixture-scale form; the
    * manifest format already carries full hive dir names, so nesting
    * is a reader-side extension, not a layout change). */
  def commitPartitioned(df: DataFrame, base: String,
      partCol: String): Long = {
    val s = df.sparkSession
    var v = latest(s, base) + 1
    while (true) {
      if (attemptPartitioned(df, base, partCol, v)) return v
      v = latest(s, base) + 1
    }
    v // unreachable
  }

  /** One optimistic attempt to partition-commit `df` AT `v`: data dir
    * → manifest → marker. Returns false (all traces cleaned up) when
    * the marker race is lost; throws on an empty DataFrame. */
  private def attemptPartitioned(df: DataFrame, base: String,
      partCol: String, v: Long): Boolean = {
    val s = df.sparkSession
    val f = fs(s, base)
    val dir = s"v=$v-${nonce()}"
    df.write.mode("overwrite").partitionBy(partCol)
      .parquet(s"$base/$dir")
    val parts = f.listStatus(new Path(base, dir)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => n.contains('=') && !n.startsWith("_"))
      .sorted.map(p => (p, dir))
    if (parts.isEmpty) {
      // an empty manifest is unreadable (no partition dirs, no
      // schema to infer) — refuse to publish it rather than commit
      // a version readAsOf can never resolve
      f.delete(new Path(base, dir), true)
      throw new IllegalArgumentException(
        "commitPartitioned refuses an empty DataFrame (a version " +
          "with zero partitions cannot be read back); use commit() " +
          "for full — possibly empty — snapshots")
    }
    // manifest before marker: a version is only visible complete
    writeManifest(s, base, v, parts,
      df.schema(partCol).dataType.catalogString)
    if (tryMarker(s, base, v, dir)) true
    else {
      f.delete(new Path(manifestDir(base), v.toString), false)
      f.delete(new Path(base, dir), true)
      false
    }
  }

  /** A writer-unique /tmp snapshot base for a declared op's fixture
    * demo (`/tmp/graft_<tag>_<sfDirHash>_p<pid>`), with any prior dir
    * for the same (tag, fixture, process) removed — ONE definition
    * for the append-op modules (the path scheme appears in test
    * assertions, so it must not drift per module). */
  def freshTmpBase(s: SparkSession, tag: String, sfDir: String): String = {
    val base = s"/tmp/graft_${tag}_${Integer.toHexString(sfDir.hashCode)}" +
      s"_p${ProcessHandle.current().pid()}"
    val p = new Path(base)
    val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (f.exists(p)) f.delete(p, true)
    base
  }

  /** Does `version` have a commit marker at `base`? */
  def versionExists(s: SparkSession, base: String,
      version: Long): Boolean =
    fs(s, base).exists(new Path(commitDir(base), version.toString))

  /** `commitPartitioned` at a CALLER-FIXED version — `commitAs`'s
    * partitioned twin, for streaming `foreachBatch` ledgers where
    * version = f(batchId) makes a replayed batch a no-op. Returns
    * false without touching the table when `version` is already
    * committed (the replay/no-op case) or when the marker race is
    * lost. Version numbers MAY be sparse (a skipped batch leaves a
    * gap); `latest`/`versions` handle gaps by construction. */
  def commitPartitionedAs(df: DataFrame, base: String, partCol: String,
      version: Long): Boolean = {
    val s = df.sparkSession
    if (versionExists(s, base, version)) false
    else {
      clearOrphanManifest(s, base, version)
      attemptPartitioned(df, base, partCol, version)
    }
  }

  /** Delete a MARKER-LESS manifest left at `version` by a crashed
    * prior attempt — without this, a streaming re-offer of the same
    * version (the fixed-version ledger's whole point) would wedge
    * forever on writeManifest's `create(overwrite = false)`. Only the
    * fixed-version paths call this: they own their version number
    * (one streaming query per table), so a marker-less manifest there
    * can only be crash debris. The optimistic-loop paths must NOT —
    * under a live same-version race a marker-less manifest belongs to
    * the concurrent writer, and deleting it could pair one writer's
    * marker with the other's manifest. */
  private def clearOrphanManifest(s: SparkSession, base: String,
      version: Long): Unit = {
    val f = fs(s, base)
    val m = new Path(manifestDir(base), version.toString)
    if (!versionExists(s, base, version) && f.exists(m))
      f.delete(m, false)
  }

  /** INCREMENTAL commit — the 100 TB write path: rewrite ONLY the
    * partitions present in `df`, inherit every other live partition
    * from the previous version by manifest reference, and commit the
    * result as the next version. A daily MERGE into one partition of
    * a year-partitioned table writes that partition's bytes (+ a
    * KB-sized manifest + marker), not a full table copy — the write
    * amplification drops from O(table) to O(touched partitions),
    * measured in SCALE.md. Old versions stay readable (their
    * manifests still name the dirs that own their partitions; vacuum
    * pins every dir a retained manifest references). Returns the
    * committed version number.
    *
    * Requires the table's previous version to be partition-committed
    * (`commitPartitioned` / `commitPartitions`) on the same column —
    * the manifest is the inheritance mechanism. */
  def commitPartitions(df: DataFrame, base: String,
      partCol: String): Long = {
    val s = df.sparkSession
    var v = latest(s, base) + 1
    while (true) {
      // the inherited manifest is re-read EVERY attempt: after a lost
      // marker race the new latest version may itself have rewritten
      // partitions, and merging against the pre-race manifest would
      // silently discard the concurrent winner's rewrites — the lost
      // update the optimistic retry exists to prevent
      if (attemptPartitions(df, base, partCol, v, v - 1)) return v
      v = latest(s, base) + 1
    }
    v // unreachable
  }

  /** One optimistic attempt at an incremental commit AT `v`,
    * inheriting untouched partitions from `prevVersion`'s manifest.
    * Returns false (all traces cleaned up) on a lost marker race. */
  private def attemptPartitions(df: DataFrame, base: String,
      partCol: String, v: Long, prevVersion: Long): Boolean = {
    val s = df.sparkSession
    val f = fs(s, base)
    val prev = manifestOf(s, base, prevVersion).getOrElse(
      throw new IllegalArgumentException(
        s"commitPartitions needs a partition-committed previous " +
          s"version at $base (v=$prevVersion has no manifest); seed " +
          "the table with commitPartitioned"))
    require(prev.forall(p => manifestPartCol(p._1) == partCol),
      s"partition column mismatch: table is partitioned on " +
        s"${manifestPartCol(prev.head._1)}, got $partCol")
    val dir = s"v=$v-${nonce()}"
    df.write.mode("overwrite").partitionBy(partCol)
      .parquet(s"$base/$dir")
    val touched = f.listStatus(new Path(base, dir)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => n.contains('=') && !n.startsWith("_"))
      .toSet
    val merged = (prev.filterNot(p => touched(p._1)) ++
      touched.toSeq.sorted.map(p => (p, dir))).sortBy(_._1)
    // the merged version keeps the PRIOR version's recorded partition
    // type when it has one (the table's committed contract outranks
    // this batch frame's — a caller-side cast must not flip the
    // column type mid-table), else this frame's
    writeManifest(s, base, v, merged,
      manifestPartType(s, base, prevVersion)
        .getOrElse(df.schema(partCol).dataType.catalogString))
    if (tryMarker(s, base, v, dir)) true
    else {
      f.delete(new Path(manifestDir(base), v.toString), false)
      f.delete(new Path(base, dir), true)
      false
    }
  }

  /** `commitPartitions` at a CALLER-FIXED version, inheriting from
    * the LATEST committed version below it (version numbers may be
    * sparse under a batch-ledger scheme — a skipped empty batch
    * leaves a gap). Returns false without touching the table when
    * `version` already exists (the replay/no-op case) or on a lost
    * marker race. Requires `version` > the current latest. */
  def commitPartitionsAs(df: DataFrame, base: String, partCol: String,
      version: Long): Boolean = {
    val s = df.sparkSession
    if (versionExists(s, base, version)) false
    else {
      val prevV = latest(s, base)
      require(prevV < version,
        s"commitPartitionsAs version $version is not ahead of the " +
          s"latest committed version $prevV at $base")
      clearOrphanManifest(s, base, version)
      attemptPartitions(df, base, partCol, version, prevV)
    }
  }

  /** Bytes under every data dir `version` wrote ITSELF (its marker
    * dir only — inherited partitions cost nothing): the write-
    * amplification audit metric for `commitPartitions`. */
  def bytesWritten(s: SparkSession, base: String, version: Long): Long =
    fs(s, base).getContentSummary(
      new Path(base, dataDirOf(s, base, version))).getLength

  /** Per-partition file count of a committed manifest version: one
    * (hive partition, n_files, bytes) row per live partition, from
    * metadata listing only — the audit `compactPartitions` selects
    * its rewrite set from. */
  def partitionFiles(s: SparkSession, base: String,
      version: Long): Seq[(String, Int, Long)] = {
    val f = fs(s, base)
    val m = manifestOf(s, base, version).getOrElse(
      throw new IllegalArgumentException(
        s"partitionFiles needs a partition-committed version at $base"))
    m.map { case (part, dir) =>
      val p = new Path(base, s"$dir/$part")
      val files = f.listStatus(p).count { st =>
        val n = st.getPath.getName
        n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      }
      (part, files, f.getContentSummary(p).getLength)
    }
  }

  /** Partition-scoped OPTIMIZE — the 100 TB compaction form the
    * whole-table `compact` scaladoc promises: audit every live
    * partition of the latest (manifest) version by metadata listing,
    * rewrite ONLY the partitions carrying more files than
    * ceil(bytes / targetFileBytes), each to exactly its target count,
    * and commit the rewrites through `commitPartitions` so every
    * healthy partition is inherited by manifest reference — zero
    * bytes moved for it. A 100 TB table where one day's ingest
    * fragmented three partitions compacts those three partitions'
    * bytes, not the table's. Untouched versions stay readable (time
    * travel across compaction, as with `compact`). Returns
    * (committed version, rewritten partitions); no commit happens
    * when nothing is fragmented (the latest version is returned).
    *
    * Row identity is structural, like `compact`'s: each flagged
    * partition is re-read through its own pruned hive scan and
    * round-robin `repartition(n)` — no filter, no project beyond the
    * partition column the writer re-derives. */
  def compactPartitions(s: SparkSession, base: String,
      targetFileBytes: Long): (Long, Seq[String]) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val v = latest(s, base)
    val audit = partitionFiles(s, base, v)
    val m = manifestOf(s, base, v).get // partitionFiles proved it exists
    val owner = m.toMap
    val flagged = audit.filter { case (_, files, bytes) =>
      files > math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    }
    if (flagged.isEmpty) return (v, Seq.empty)
    val partCol = manifestPartCol(m.head._1)
    val rewritten = flagged.map { case (part, _, bytes) =>
      val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
      s.read.option("basePath", s"$base/${owner(part)}")
        .parquet(s"$base/${owner(part)}/$part")
        .repartition(n.toInt)
    }.reduce(_ unionByName _)
    (commitPartitions(rewritten, base, partCol), flagged.map(_._1))
  }
}
