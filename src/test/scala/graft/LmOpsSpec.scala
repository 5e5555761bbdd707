package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the LmOps module beyond the DuckDB oracle:
  * chunk tiling arithmetic, chunk reconstruction, PMI definition
  * checks against exact recomputation, and unigram-LM bounds.
  */
class LmOpsSpec extends AnyFunSuite {
  import SparkFixture._

  test("chunk_docs tiles every document: count and length arithmetic") {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val counts = q("chunk_docs")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        max(col("chunk_idx")).as("last_idx"),
        sum(col("chunk_len")).as("sum_len"))
      .join(docs, "doc_id")
    // chunk count = ceil(n_chars / stride); idx is dense 0..n-1
    val bad = counts.filter(
      col("n_chunks") =!= ceil(col("n_chars") / 90.0).cast("long") ||
        col("last_idx") =!= col("n_chunks") - 1).count()
    assert(bad == 0)
    // each chunk is full width unless clipped by the document tail:
    // len = min(120, n_chars - 90*idx)
    val short = q("chunk_docs")
      .join(docs, "doc_id")
      .filter(col("chunk_len") =!=
        least(lit(120), col("n_chars") - col("chunk_idx") * 90))
      .count()
    assert(short == 0)
  }

  test("chunk_docs chunks reconstruct the source text (overlap check)") {
    // stride 90 / len 120: stripping the 30-char overlap from every
    // chunk after the first and concatenating must equal the text
    val docs = Tables(spark, sfDir, "documents")
    val ordered = docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), col("n_chars").cast("int") - 1,
          lit(90))).as("off"))
      .withColumn("piece",
        when(col("off") === 0, expr("substring(text, 1, 120)"))
          .otherwise(expr("substring(text, off + 31, 90)")))
      .groupBy(col("doc_id"), col("text"))
      .agg(array_join(transform(array_sort(collect_list(
        struct(col("off"), col("piece")))), x => x("piece")), "")
        .as("rebuilt"))
      .filter(col("rebuilt") =!= col("text"))
    assert(ordered.count() == 0)
  }

  test("pmi_bigrams matches an exact local recomputation") {
    val texts = Tables(spark, sfDir01, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val bi = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      val ws = t.split(" ")
      ws.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1)
      ws.sliding(2).foreach {
        case Array(a, b) => bi((a, b)) = bi.getOrElse((a, b), 0L) + 1
        case _           =>
      }
    }
    val nu = uni.values.sum.toDouble
    val nb = bi.values.sum.toDouble
    val expect = bi.filter(_._2 >= 5).map { case ((a, b), c) =>
      (a, b, c,
        math.log(c * 1.0 * nu / nb * (nu * 1.0 / uni(a)) / uni(b)))
    }.toSeq.sortBy { case (a, b, _, p) => (-p, a, b) }.take(25)
    val got = q("pmi_bigrams", sfDir01)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.length == expect.length)
    got.zip(expect).foreach { case ((gw1, gw2, gc, gp), (ew1, ew2, ec, ep)) =>
      assert(gw1 == ew1 && gw2 == ew2 && gc == ec)
      assert(math.abs(gp - (math.rint(ep * 1e4) / 1e4)) < 1e-9)
    }
  }

  test("bpe_merges: corpus is pipe-free (the delimiter-framing precondition)") {
    // bpe_merges frames segmentations with '|'; a corpus containing the
    // delimiter would corrupt the replace-based re-segmentation. Assert
    // the precondition mechanically at both gate SFs.
    for (dir <- Seq(sfDir, sfDir01)) {
      val n = Tables(spark, dir, "documents")
        .filter(col("text").contains("|")).count()
      assert(n == 0, s"$dir: $n documents contain the '|' delimiter")
    }
  }

  test("bpe_merges matches an exact driver-side greedy BPE recomputation") {
    val texts = Tables(spark, sfDir01, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val wc = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split(" ").filter(_.nonEmpty)
      .foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1))
    var segs: Map[Vector[String], Long] =
      wc.map { case (w, c) => w.split("").toVector -> c }.toMap
    def mergeWord(v: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < v.length) {
        if (i + 1 < v.length && v(i) == a && v(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += v(i); i += 1 }
      }
      out.result()
    }
    val expect = (1 to 8).map { r =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      segs.foreach { case (v, c) =>
        v.sliding(2).foreach {
          case Seq(a, b) => pc((a, b)) = pc.getOrElse((a, b), 0L) + c
          case _         =>
        }
      }
      val ((a, b), n) = pc.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      segs = segs.groupMapReduce { case (v, _) => mergeWord(v, a, b) }(
        _._2)(_ + _)
      (r, a, b, n)
    }
    val got = q("bpe_merges", sfDir01).orderBy(col("merge_rank"))
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == expect)
  }

  test("bpe_merges: merge-pair counts are non-increasing across rounds") {
    // after merging the argmax pair, every surviving pair's count only
    // drops and every newly created pair is bounded by the merged
    // count, so the greedy sequence is monotone — a structural check
    // that the K unrolled rounds are actually chained, not repeated
    val counts = q("bpe_merges").orderBy(col("merge_rank"))
      .select(col("pair_count")).collect().map(_.getLong(0))
    assert(counts.length == 8)
    counts.sliding(2).foreach {
      case Array(x, y) => assert(x >= y, s"counts increased: $x -> $y")
      case _           =>
    }
  }

  test("unigram_logprob: all scores negative, token counts reconcile") {
    val out = q("unigram_logprob")
    assert(out.filter(col("avg_logprob") >= 0).count() == 0)
    val totalToks = out.agg(sum(col("n_toks"))).first().getLong(0)
    val direct = Tables(spark, sfDir, "documents")
      .select(size(split(col("text"), " ")).as("n"))
      .agg(sum(col("n"))).first().getLong(0)
    assert(totalToks == direct)
    // the most predictable doc scores >= the least predictable one by
    // definition of avg; sanity: min < max
    val mm = out.agg(min(col("avg_logprob")), max(col("avg_logprob"))).first()
    assert(mm.getDouble(0) < mm.getDouble(1))
  }

  test("perplexity_mix: rank quartiles partition the corpus, score " +
      "ranges are ordered, keep rates behave") {
    val rows = q("perplexity_mix").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(rows.keySet == Set(0L, 1L, 2L, 3L))
    val n = Tables(spark, sfDir, "documents").count()
    assert(rows.values.map(_._1).sum == n)
    // quartile sizes differ by at most 1 from N/4 rounding
    rows.values.foreach { case (nd, _, _, _) =>
      assert(math.abs(nd - n / 4.0) <= 1.0, s"quartile size $nd vs $n/4")
    }
    // kept <= docs everywhere; the best bucket (rate 1000 permil)
    // keeps everything
    rows.foreach { case (_, (nd, nk, _, _)) => assert(nk <= nd) }
    assert(rows(3L)._2 == rows(3L)._1)
    // score ranges tile in bucket order (ties may touch, never cross)
    for (b <- 0L to 2L) {
      assert(rows(b)._4 <= rows(b + 1L)._3 + 1e-12,
        s"bucket $b hi ${rows(b)._4} > bucket ${b + 1} lo ${rows(b + 1L)._3}")
      assert(rows(b)._3 <= rows(b)._4)
    }
  }

  test("ccnet_buckets: per-lang terciles partition each language, " +
      "lp ranges tile head->tail, every lang has 3 buckets") {
    val rows = q("ccnet_buckets").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap // (lang, bucket) -> (n_docs, n_tokens, hi_lp, lo_lp)
    val docs = Tables(spark, sfDir, "documents")
    val perLang = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet.map(_._1) == perLang.keySet)
    for (lang <- perLang.keys) {
      val b = (0L to 2L).map(i => rows((lang, i)))
      // terciles partition the language; sizes within 1 of n/3
      assert(b.map(_._1).sum == perLang(lang), s"$lang doc sum")
      b.foreach(t => assert(
        math.abs(t._1 - perLang(lang) / 3.0) <= 1.0,
        s"$lang tercile size ${t._1} vs ${perLang(lang)}/3"))
      // bucket 0 = head (highest lp); ranges tile downward
      for (i <- 0 until 2)
        assert(b(i)._4 >= b(i + 1)._3 - 1e-12,
          s"$lang bucket $i lo ${b(i)._4} < bucket ${i + 1} " +
            s"hi ${b(i + 1)._3}")
      b.foreach(t => assert(t._3 >= t._4 && t._2 > 0L))
    }
  }
}
