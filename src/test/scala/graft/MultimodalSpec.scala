package graft

import graft.multimodal.MultimodalOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing tests: binary columns survive the pipeline,
  * the PPM parser decodes the real binary format (and rejects
  * malformed payloads), feature decode is deterministic with fixed
  * dim and L1 norm and partition-preserving (no shuffle), pooling
  * and frame sampling have the right shapes.
  */
class MultimodalSpec extends AnyFunSuite {
  import SparkFixture._

  private lazy val media = MultimodalOps.mediaTable(spark, sfDir)
  private lazy val ppm = MultimodalOps.ppmTable(spark, sfDir)

  test("media table: binary content with consistent metadata") {
    val rows = media.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val content = r.getAs[Array[Byte]]("content")
      assert(content.length.toLong == r.getLong(r.fieldIndex("n_bytes")))
      assert(Set("image", "audio", "video")(r.getString(1)))
    }
  }

  test("parsePpm decodes the real binary format (round-trip)") {
    // hand-built 2x1 P6 image: the parser must read geometry from the
    // header, not assume it, and return the raster byte-exact
    val raster = Array[Byte](10, 20, 30, -1, 0, 127)
    val img = "P6\n2 1\n255\n".getBytes("US-ASCII") ++ raster
    val (w, h, px) = MultimodalOps.parsePpm(img)
    assert(w == 2 && h == 1)
    assert(px.sameElements(raster))
    // malformed payloads must fail loudly, not decode garbage
    intercept[IllegalArgumentException] {
      MultimodalOps.parsePpm("P5\n2 1\n255\nxxxxxx".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      MultimodalOps.parsePpm("P6\n4 4\n255\nshort".getBytes("US-ASCII"))
    }
  }

  test("decodeFeatures: fixed dim, L1-normalized, deterministic") {
    import spark.implicits._
    val ds = ppm.as[MultimodalOps.MediaRow]
    val f1 = MultimodalOps.decodeFeatures(ds).collect().sortBy(_.doc_id)
    val f2 = MultimodalOps.decodeFeatures(ds).collect().sortBy(_.doc_id)
    assert(f1.length == ppm.count())
    f1.foreach { f =>
      assert(f.features.length == MultimodalOps.FeatureDim)
      assert(math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-4)
    }
    assert(f1.zip(f2).forall { case (a, b) =>
      a.features.sameElements(b.features) })
  }

  test("decodeFeatures adds no shuffle (narrow plan)") {
    import spark.implicits._
    val ds = ppm.repartition(4).as[MultimodalOps.MediaRow]
    val decoded = MultimodalOps.decodeFeatures(ds)
    decoded.collect()
    val plan = decoded.queryExecution.executedPlan.toString
    // the corpus read itself is hash-spread by Tables() (single-row-
    // group fixture, SCALE.md r12) — that exchange is UPSTREAM of the
    // decode. The decode itself must be narrow: nothing between the
    // MapPartitions and the result may shuffle.
    val aboveDecode = plan.substring(0, plan.indexOf("MapPartitions"))
    assert(!aboveDecode.contains("Exchange"),
      s"decode must not shuffle:\n${plan.take(800)}")
    assert(decoded.rdd.getNumPartitions == 4)
  }

  test("pool: averages groups of adjacent bins") {
    import spark.implicits._
    val ds = ppm.as[MultimodalOps.MediaRow]
    val feats = MultimodalOps.decodeFeatures(ds).toDF()
    val pooled = MultimodalOps.pool(feats, 4).collect()
    pooled.foreach { r =>
      val full = r.getSeq[Float](r.fieldIndex("features"))
      val p = r.getSeq[Float](r.fieldIndex("pooled"))
      assert(p.length == 4)
      for (i <- 0 until 4) {
        val expect = full.slice(i * 4, i * 4 + 4).map(_.toDouble).sum / 4
        assert(math.abs(p(i) - expect) < 1e-5)
      }
    }
  }

  test("sampleFrames: chunk count and chunk sizes") {
    val frames = MultimodalOps.sampleFrames(media, chunkBytes = 100, stride = 2)
    val byDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizes = media.select("doc_id", "n_bytes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, n) <- sizes) {
      val nFrames = math.ceil(n / 100.0).toInt
      val expected = (0 until nFrames by 2).size
      assert(byDoc(id) == expected, s"doc $id: ${byDoc(id)} != $expected")
    }
    // every sampled frame except possibly the last is exactly chunkBytes
    frames.collect().foreach { r =>
      val f = r.getAs[Array[Byte]]("frame")
      assert(f.length <= 100 && f.length > 0)
    }
  }

  test("features survive a relational join + groupBy") {
    import spark.implicits._
    val feats = MultimodalOps
      .decodeFeatures(ppm.as[MultimodalOps.MediaRow]).toDF()
    val joined = feats.join(Tables(spark, sfDir, "documents"), "doc_id")
      .groupBy("media_type", "lang").agg(count(lit(1)).as("n"))
    assert(joined.collect().map(_.getLong(2)).sum == ppm.count())
  }

  test("documents fixture is ASCII (media_dedup byte/char frame parity)") {
    // media_dedup's Spark side frames over BYTES, its oracle over
    // CHARACTERS (DuckDB v1.0.0 has no BLOB substring/md5) — the two
    // agree only while 1 char = 1 byte. Check the assumption at both
    // test SFs so any future multi-byte fixture text fails loudly
    // here instead of as a silent oracle divergence.
    for (dir <- Seq(sfDir, sfDir01)) {
      val nonAscii = Tables(spark, dir, "documents")
        .filter(length(encode(col("text"), "UTF-8")) =!= length(col("text")))
        .count()
      assert(nonAscii == 0,
        s"$dir/documents has $nonAscii non-ASCII texts: media_dedup's " +
          "char-framed oracle no longer matches its byte-framed query")
    }
  }

  test("sampleFrames emits zero frames for empty payloads (regression)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("media_type", StringType),
      StructField("content", BinaryType), StructField("n_bytes", LongType)))
    val rows = java.util.Arrays.asList(
      Row(1L, "image", Array.emptyByteArray, 0L),
      Row(2L, "image", Array.fill[Byte](150)(7), 150L))
    val df = spark.createDataFrame(rows, schema)
    val frames = MultimodalOps.sampleFrames(df, chunkBytes = 100, stride = 1)
      .collect()
    assert(frames.forall(_.getLong(0) == 2L))
    assert(frames.length == 2) // ceil(150/100) = 2 frames, stride 1
  }

  test("media_resize: strided sums match an independent decode") {
    val got = MultimodalOps.mediaResize.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val rows = ppm.select("doc_id", "content").collect()
    assert(got.size == rows.length)
    rows.take(50).foreach { r =>
      val id = r.getLong(0)
      val (w, h, px) = MultimodalOps.parsePpm(r.getAs[Array[Byte]](1))
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h / 2; x <- 0 until w / 2) {
        val i = 2 * y * w + 2 * x
        sr += px(3 * i) & 0xff
        sg += px(3 * i + 1) & 0xff
        sb += px(3 * i + 2) & 0xff
      }
      assert(got(id) == ((4, 4, sr, sg, sb)),
        s"doc $id resize sums diverge from independent decode")
    }
  }

  test("media_frames: stride-2 64-byte frame count is exact") {
    val counts = MultimodalOps.mediaFrames.run(spark, sfDir)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = media.select("doc_id", "n_bytes").collect()
      .filter(_.getLong(1) > 0)
    assert(counts.size == docs.length)
    docs.take(100).foreach { r =>
      val nFrames = (r.getLong(1) + 63) / 64
      val expected = (nFrames + 1) / 2 // ceil(nFrames / stride), stride=2
      assert(counts(r.getLong(0)) == expected)
    }
  }

  test("media_features: per-doc bin counts sum to the raster size") {
    val df = MultimodalOps.mediaFeatures.run(spark, sfDir)
    df.groupBy("doc_id").agg(sum("n_px").as("total")).collect()
      .foreach(r => assert(r.getLong(1) == 192L,
        s"doc ${r.getLong(0)}: bins sum to ${r.getLong(1)}, not 192"))
    assert(df.filter(col("bin") < 0 || col("bin") > 15).count() == 0)
    assert(df.filter(col("n_px") <= 0).count() == 0)
  }
}
