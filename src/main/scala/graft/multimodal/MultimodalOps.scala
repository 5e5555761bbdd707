package graft.multimodal

import graft.{Op, OpModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal columns (north star: image/audio/video as opaque
  * `binary` columns + typed metadata, processed by batch-shaped
  * per-partition functions).
  *
  * The decode step is REAL: payloads are wrapped as uncompressed
  * binary P6 PPM images (`ppmTable`), and `parsePpm` is a genuine
  * format parser — ASCII header (magic, dims, maxval) + raw RGB
  * raster — needing no codec libraries. A production pipeline swaps
  * `parsePpm` for a JPEG/PCM codec call; every other piece — binary
  * columns, metadata struct, partition-preserving mapPartitions
  * batch shape, fixed feature dim, explode-based frame sampling —
  * is unchanged. Per-pixel channel stats over the decoded raster are
  * a declared oracle query (`media_decode`).
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

  /** 8×8 RGB PPM geometry: 192 raster bytes per image. */
  val PpmW = 8
  val PpmH = 8

  /** Media table with every payload wrapped as a REAL binary image:
    * a P6 PPM whose 8×8 RGB raster is the first 192 payload bytes,
    * zero-padded. Built with Spark binary expressions so the payload
    * is an ordinary binary column in the plan; uncompressed, so it
    * decodes pure-JVM (no codec libs) and DuckDB can recompute
    * per-pixel stats from the same source text via ord/substr
    * arithmetic (the `media_decode` oracle). */
  def ppmTable(s: SparkSession, d: String): DataFrame = {
    val raster = PpmW * PpmH * 3
    val header = lit(s"P6\n$PpmW $PpmH\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    mediaTable(s, d)
      .withColumn("content",
        concat(header,
          rpad(substring(col("content"), 1, raster), raster,
            Array[Byte](0))))
      .withColumn("n_bytes", length(col("content")).cast("long"))
  }

  /** REAL format decoder: parses a binary P6 PPM — whitespace-
    * delimited ASCII header (magic "P6", width, height, maxval),
    * then the raw RGB raster. Returns (width, height, raster).
    * The uncompressed-format analog of the JPEG/PCM codec call a
    * production pipeline makes at this exact point. */
  def parsePpm(content: Array[Byte]): (Int, Int, Array[Byte]) = {
    var pos = 0
    def token(): String = {
      while (pos < content.length &&
        Character.isWhitespace(content(pos).toChar)) pos += 1
      val start = pos
      while (pos < content.length &&
        !Character.isWhitespace(content(pos).toChar)) pos += 1
      new String(content, start, pos - start,
        java.nio.charset.StandardCharsets.US_ASCII)
    }
    val magic = token()
    require(magic == "P6", s"not a binary PPM (P6): '$magic'")
    val w = token().toInt
    val h = token().toInt
    val maxval = token().toInt
    require(w > 0 && h > 0 && maxval == 255,
      s"unsupported PPM geometry ${w}x$h maxval=$maxval")
    pos += 1 // exactly one whitespace byte separates header and raster
    require(content.length - pos >= w * h * 3,
      s"truncated raster: ${content.length - pos} < ${w * h * 3}")
    (w, h, java.util.Arrays.copyOfRange(content, pos, pos + w * h * 3))
  }

  /** Batch decode: partition-preserving (no shuffle), codec init once
    * per partition, fixed output dim. Features = 16-bin histogram of
    * DECODED pixel values, L1-normalized. Input rows must carry PPM
    * payloads (`ppmTable`). */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: initialize the codec ONCE here, then stream rows
      rows.map { r =>
        val (_, _, px) = parsePpm(r.content)
        val hist = new Array[Float](FeatureDim)
        var i = 0
        while (i < px.length) {
          hist(((px(i) & 0xff) * FeatureDim) >> 8) += 1f
          i += 1
        }
        val n = math.max(1, px.length).toFloat
        MediaFeatures(r.doc_id, r.media_type, r.n_bytes, hist.map(_ / n))
      }
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

  /** Declared query: REAL image decode + per-pixel channel stats —
    * every payload wrapped as a binary P6 PPM (`ppmTable`), parsed by
    * the genuine format decoder (`parsePpm`), per-channel byte sums
    * computed from the decoded raster. The oracle recomputes the same
    * sums from the source text with ord/substr arithmetic (exact:
    * integer sums of integer bytes; 1 char = 1 byte asserted by the
    * ASCII-fixture test). Decode is narrow (mapPartitions, no
    * shuffle); only (doc_id, 5 ints) ever leaves the decode stage —
    * at 100 TB the raster bytes never reach a shuffle. */
  val mediaDecode = Op(
    "media_decode",
    (s, d) => {
      import s.implicits._
      ppmTable(s, d)
        .select(col("doc_id"), col("content"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          // codec init would happen once per partition here
          it.map { case (id, bytes) =>
            val (w, h, px) = parsePpm(bytes)
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < w * h) {
              sr += px(3 * i) & 0xff
              sg += px(3 * i + 1) & 0xff
              sb += px(3 * i + 2) & 0xff
              i += 1
            }
            (id, w, h, sr, sg, sb)
          }
        }
        .toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b")
    },
    Some("""
      WITH px AS (
        SELECT doc_id, off,
               CASE WHEN off < n_chars
                    THEN ord(substr(text, CAST(off + 1 AS INT), 1))
                    ELSE 0 END AS b
        FROM documents,
             UNNEST(generate_series(0, 191)) AS u(off))
      SELECT doc_id, 8 AS width, 8 AS height,
             CAST(SUM(CASE WHEN off % 3 = 0 THEN b ELSE 0 END)
               AS BIGINT) AS sum_r,
             CAST(SUM(CASE WHEN off % 3 = 1 THEN b ELSE 0 END)
               AS BIGINT) AS sum_g,
             CAST(SUM(CASE WHEN off % 3 = 2 THEN b ELSE 0 END)
               AS BIGINT) AS sum_b
      FROM px GROUP BY doc_id"""))

  /** Declared query: decode + nearest-neighbor resize (8×8 → 4×4,
    * source pixel (2y, 2x) for output pixel (y, x)) + per-channel
    * sums of the RESIZED raster. The thumbnail shape: decode and
    * resize happen in one narrow pass, and only (doc_id, 5 ints)
    * leaves the stage — at 100 TB neither the full nor the resized
    * raster ever reaches a shuffle. Integer sums of integer bytes:
    * exact in both engines (oracle picks the same strided pixels via
    * ord/substr arithmetic; ASCII fixture asserted in MultimodalSpec). */
  val mediaResize = Op(
    "media_resize",
    (s, d) => {
      import s.implicits._
      ppmTable(s, d)
        .select(col("doc_id"), col("content"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, bytes) =>
            val (w, h, px) = parsePpm(bytes)
            val ow = w / 2
            val oh = h / 2
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < oh) {
              var x = 0
              while (x < ow) {
                val i = (2 * y) * w + 2 * x
                sr += px(3 * i) & 0xff
                sg += px(3 * i + 1) & 0xff
                sb += px(3 * i + 2) & 0xff
                x += 1
              }
              y += 1
            }
            (id, ow, oh, sr, sg, sb)
          }
        }
        .toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b")
    },
    Some("""
      WITH rp AS (
        SELECT doc_id, n_chars, text,
               16 * (j // 4) + 2 * (j % 4) AS i
        FROM documents, UNNEST(generate_series(0, 15)) AS u(j)),
      px AS (
        SELECT doc_id,
               CASE WHEN 3 * i < n_chars
                    THEN ord(substr(text, CAST(3 * i + 1 AS INT), 1))
                    ELSE 0 END AS r,
               CASE WHEN 3 * i + 1 < n_chars
                    THEN ord(substr(text, CAST(3 * i + 2 AS INT), 1))
                    ELSE 0 END AS g,
               CASE WHEN 3 * i + 2 < n_chars
                    THEN ord(substr(text, CAST(3 * i + 3 AS INT), 1))
                    ELSE 0 END AS b
        FROM rp)
      SELECT doc_id, 4 AS width, 4 AS height,
             CAST(SUM(r) AS BIGINT) AS sum_r,
             CAST(SUM(g) AS BIGINT) AS sum_g,
             CAST(SUM(b) AS BIGINT) AS sum_b
      FROM px GROUP BY doc_id"""))

  /** Declared query: strided frame sampling over the raw payload —
    * every 2nd aligned 64-byte frame, digested. The video-frame-
    * subsample shape (`sampleFrames`): frames stay distributed via
    * explode, and only (doc_id, frame_id, md5) rows move downstream,
    * never the frame bytes. Oracle frames over characters of the
    * source text (1 char = 1 byte under the asserted ASCII fixture). */
  val mediaFrames = Op(
    "media_frames",
    (s, d) =>
      sampleFrames(mediaTable(s, d), chunkBytes = 64, stride = 2)
        .select(col("doc_id"), col("frame_id"),
          md5(col("frame")).as("frame_md5")),
    Some("""
      SELECT doc_id, CAST(f.frame_id AS INT) AS frame_id,
             md5(substr(text, CAST(f.frame_id * 64 + 1 AS INT), 64))
               AS frame_md5
      FROM documents,
           UNNEST(generate_series(0, (n_chars + 63) // 64 - 1, 2))
             AS f(frame_id)
      WHERE n_chars > 0"""))

  /** Declared query: the decoded-pixel histogram behind
    * `decodeFeatures`, in exact integer form — 16 equal-width bins
    * over decoded byte values (bin = b // 16), one (doc_id, bin,
    * count) row per NON-EMPTY bin. Declaring the un-normalized
    * counts (rather than the L1-normalized Float vector) keeps the
    * oracle exact; `decodeFeatures` divides these same counts by the
    * raster size. */
  val mediaFeatures = Op(
    "media_features",
    (s, d) => {
      import s.implicits._
      ppmTable(s, d)
        .select(col("doc_id"), col("content"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            val (_, _, px) = parsePpm(bytes)
            val hist = new Array[Long](FeatureDim)
            var i = 0
            while (i < px.length) {
              hist(((px(i) & 0xff) * FeatureDim) >> 8) += 1L
              i += 1
            }
            (0 until FeatureDim).iterator
              .filter(b => hist(b) > 0)
              .map(b => (id, b, hist(b)))
          }
        }
        .toDF("doc_id", "bin", "n_px")
    },
    Some("""
      WITH px AS (
        SELECT doc_id,
               CASE WHEN off < n_chars
                    THEN ord(substr(text, CAST(off + 1 AS INT), 1))
                    ELSE 0 END AS b
        FROM documents, UNNEST(generate_series(0, 191)) AS u(off))
      SELECT doc_id, CAST(b // 16 AS INT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n_px
      FROM px GROUP BY doc_id, b // 16"""))

  override def ops: Seq[Op] =
    Seq(mediaMeta, mediaStats, mediaDedup, mediaDecode,
      mediaResize, mediaFrames, mediaFeatures)
}
