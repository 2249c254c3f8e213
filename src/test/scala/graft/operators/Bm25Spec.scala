package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class Bm25Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // corpus: doc 1 = "a a b", doc 2 = "a c", doc 3 = "c c c d"
  private val corpusToks = Seq(
    (1L, "a"), (1L, "a"), (1L, "b"),
    (2L, "a"), (2L, "c"),
    (3L, "c"), (3L, "c"), (3L, "c"), (3L, "d")).toDF("doc_id", "term")

  test("single-term query matches the hand formula exactly") {
    // N = 3, avgdl = 9/3 = 3, df(a) = 2 -> idf = 1.5/2.5 = 0.6
    // doc 1: tf 2, dl 3 -> 0.6 * 4.4 / (2 + 1.2*(0.25 + 0.75*1.0)) = 0.825
    // doc 2: tf 1, dl 2 -> 0.6 * 2.2 / (1 + 1.2*(0.25 + 0.75*2/3))
    val q = Seq((100L, "a")).toDF("qid", "term")
    val rows = Bm25.topK(corpusToks, q, k1 = 1.2, b = 0.75, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((100L, 1, 1L), (100L, 2, 2L))) // doc 3 lacks 'a' entirely
    assert(math.abs(rows(0)._4 - 0.825) < 1e-12)
    assert(math.abs(rows(1)._4 - 0.6 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2.0 / 3.0))) < 1e-12)
  }

  test("multi-term scores sum per term and rerank accordingly") {
    // qid 101 = {a, d}: doc 3 scores on d alone with idf (3-1+.5)/1.5 =
    // 5/3, tf 1, dl 4 -> (5/3) * 2.2 / (1 + 1.2*(0.25 + 0.75*4/3)) =
    // 2.2/1.5 ≈ 1.467 — above doc 1's 0.825 on a: rare terms dominate.
    val q = Seq((101L, "a"), (101L, "d")).toDF("qid", "term")
    val rows = Bm25.topK(corpusToks, q, k1 = 1.2, b = 0.75, k = 5)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(rows == Seq((1, 3L), (2, 1L), (3, 2L)))
  }

  test("length normalization: same tf ranks the shorter doc higher") {
    // Two docs with tf(x) = 1 but different lengths; b = 0.75 penalizes
    // the longer one, so it must rank second.
    val toks = Seq((1L, "x"), (1L, "y"), (1L, "y"), (1L, "y"), (1L, "y"),
      (2L, "x"), (2L, "y")).toDF("doc_id", "term")
    val q = Seq((7L, "x")).toDF("qid", "term")
    val rows = Bm25.topK(toks, q, k1 = 1.2, b = 0.75, k = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(rows == Seq((1, 2L), (2, 1L)))
  }

  test("mergeIndex == buildIndex over the union corpus, frame by frame") {
    // The incremental-maintenance law q_text_bm25_incremental's oracle
    // relies on: folding a disjoint batch into an index must yield
    // bit-identical postings, dfreq, AND stats to a full rebuild —
    // including the exact-integer stats sums (the reason stats carry
    // sum_dl, not the derived avgdl). Batch doc 4 re-mentions 'a' and
    // introduces 'e', so dfreq exercises both merge arms
    // (existing-term increment and new-term insert).
    val batchToks = Seq((4L, "a"), (4L, "e"), (4L, "e"))
      .toDF("doc_id", "term")
    val (hp, hd, hs) = Bm25.buildIndex(corpusToks)
    val (mp, md, ms) = Bm25.mergeIndex(hp, hd, hs, batchToks)
    val (fp, fd, fs) = Bm25.buildIndex(corpusToks.unionByName(batchToks))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(mp) == rows(fp))
    assert(rows(md) == rows(fd))
    assert(rows(ms) == rows(fs))
    // and the SERVED answers agree with the ad-hoc path on the union
    val q = Seq((100L, "a"), (100L, "e")).toDF("qid", "term")
    val served = Bm25.servedTopK(mp, md, ms, q, 1.2, 0.75, 5).collect()
    val adhoc = Bm25.topK(corpusToks.unionByName(batchToks), q,
      1.2, 0.75, 5).collect()
    assert(served.map(_.toSeq).toSeq == adhoc.map(_.toSeq).toSeq)
  }
}
