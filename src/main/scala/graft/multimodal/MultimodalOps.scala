package graft.multimodal

import graft.{Op, OpModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal columns (north star: image/audio/video as opaque
  * `binary` columns + typed metadata, processed by batch-shaped
  * per-partition functions).
  *
  * The container has no media codecs, so the decode step is a
  * clearly-marked deterministic STUB (byte histogram standing in for
  * pixel decoding); everything around it — binary columns, metadata
  * struct, partition-preserving mapPartitions batch shape, fixed
  * feature dim, explode-based frame sampling — is the real Spark
  * plumbing a production decoder would drop into.
  *
  * Scale shape: decode/feature-extract are narrow (no shuffle,
  * per-partition batches); only the tiny feature vectors ever reach a
  * downstream shuffle, never the media bytes. At 100 TB: media in
  * date-bucketed parquet with binary columns, features written
  * side-car, joins on doc_id only.
  */
object MultimodalOps extends OpModule {

  val FeatureDim = 16

  final case class MediaRow(doc_id: Long, media_type: String,
      content: Array[Byte], n_bytes: Long)

  final case class MediaFeatures(doc_id: Long, media_type: String,
      n_bytes: Long, features: Array[Float])

  /** documents recast as a media table: utf-8 payload plays the role
    * of an opaque media blob; metadata is carried as typed columns. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents").select(
      col("doc_id"),
      // deterministic media_type assignment (stands in for a mime col)
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))

  /** STUB DECODER — replace with a real codec (JPEG/PCM/...) in
    * production. Deterministic: 16-bin byte histogram, L1-normalized.
    * Takes the whole partition iterator so a real implementation can
    * amortize codec init across the batch (the mapInPandas shape). */
  def decodeStub(content: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    var i = 0
    while (i < content.length) {
      hist(((content(i) & 0xff) * FeatureDim) >> 8) += 1f
      i += 1
    }
    val n = math.max(1, content.length).toFloat
    hist.map(_ / n)
  }

  /** Batch decode: partition-preserving (no shuffle), codec init once
    * per partition, fixed output dim. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: initialize the codec ONCE here, then stream rows
      rows.map(r => MediaFeatures(r.doc_id, r.media_type, r.n_bytes,
        decodeStub(r.content)))
    }
  }

  /** Average-pool features to a smaller dim (the "resize" analog). */
  def pool(features: DataFrame, outDim: Int): DataFrame = {
    require(FeatureDim % outDim == 0)
    val k = FeatureDim / outDim
    features.withColumn("pooled",
      expr(s"""transform(sequence(0, ${outDim - 1}),
                 i -> CAST(aggregate(slice(features, i * $k + 1, $k),
                             CAST(0.0 AS FLOAT), (a, x) -> a + x) / $k
                           AS FLOAT))"""))
  }

  /** Frame sampling: split the payload into fixed-size chunks and keep
    * every `stride`-th one — the video-frame-subsample shape, done
    * with explode so it stays distributed. */
  def sampleFrames(media: DataFrame, chunkBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("n_frames",
        ceil(col("n_bytes").cast("double") / chunkBytes).cast("int"))
      // empty payloads have zero frames; sequence(0, -1) would throw
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("media_type"), col("content"),
        explode(expr(s"sequence(0, n_frames - 1, $stride)")).as("frame_id"))
      .select(col("doc_id"), col("media_type"), col("frame_id"),
        expr(s"substring(content, frame_id * $chunkBytes + 1, $chunkBytes)")
          .as("frame"))

  /** Declared query: binary metadata extraction (octet length + md5
    * content digest) — the catalog scan a media pipeline starts from.
    * md5(utf8 payload) is identical across engines. */
  val mediaMeta = Op(
    "media_meta",
    (s, d) =>
      mediaTable(s, d).select(
        col("doc_id"), col("media_type"), col("n_bytes"),
        md5(col("content")).as("content_md5")),
    Some("""
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             md5(text) AS content_md5
      FROM documents"""))

  /** Declared query: per-type byte accounting over the media table —
    * proves binary columns flow through relational ops. */
  val mediaStats = Op(
    "media_stats",
    (s, d) =>
      mediaTable(s, d)
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("n_bytes")).as("total_bytes"),
          max(col("n_bytes")).as("max_bytes")),
    Some("""
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             COUNT(*) AS n_items,
             CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
             MAX(CAST(octet_length(encode(text)) AS BIGINT)) AS max_bytes
      FROM documents GROUP BY 1"""))

  /** Declared query: frame-level exact dedup over binary payloads —
    * chunk every item into aligned 64-byte frames, digest each, and
    * report frames shared across ≥2 items with the keeper (min doc).
    * The storage-dedup shape for media at 100 TB: only (digest,
    * doc_id) pairs shuffle, never the frame bytes, and the groupBy
    * key space is bounded by distinct content, not items × size.
    *
    * Oracle parity caveat: the Spark side frames over BYTES of the
    * binary payload (the real media shape); DuckDB v1.0.0 has no
    * BLOB substring/md5, so the oracle frames over CHARACTERS of the
    * source text. Equivalent iff the fixture text is pure ASCII
    * (1 byte = 1 char) — asserted mechanically in MultimodalSpec
    * ("documents fixture is ASCII"), not merely assumed. */
  val mediaDedup = Op(
    "media_dedup",
    (s, d) =>
      mediaTable(s, d)
        // empty payloads: sequence(0, -1) throws in Spark; DuckDB's
        // generate_series is empty — filter to match
        .filter(col("n_bytes") > 0)
        .select(col("doc_id"), col("content"),
          explode(sequence(lit(0), col("n_bytes").cast("int") - 1,
            lit(64))).as("off"))
        .select(col("doc_id"),
          md5(expr("substring(content, off + 1, 64)")).as("frame_md5"))
        .groupBy(col("frame_md5"))
        .agg(
          count(lit(1)).as("n_copies"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("keeper_doc"))
        .filter(col("n_docs") > 1),
    Some("""
      WITH frames AS (
        SELECT doc_id, md5(substr(text, off + 1, 64)) AS frame_md5
        FROM documents,
             UNNEST(generate_series(0, CAST(n_chars AS INT) - 1, 64))
               AS u(off))
      SELECT frame_md5, COUNT(*) AS n_copies,
             COUNT(DISTINCT doc_id) AS n_docs,
             MIN(doc_id) AS keeper_doc
      FROM frames
      GROUP BY frame_md5
      HAVING COUNT(DISTINCT doc_id) > 1"""))

  override def ops: Seq[Op] = Seq(mediaMeta, mediaStats, mediaDedup)
}
