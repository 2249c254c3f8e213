package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def train(seqs: Seq[Seq[String]], iters: Int) =
    Bpe.trainMerges(seqs.toDF("toks"), "toks", iters)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("adopts the most frequent adjacent pair") {
    val corpus = Seq(
      Seq("x", "y", "z"), Seq("x", "y", "w"), Seq("x", "y"),
      Seq("z", "w"))
    val m = train(corpus, 1)
    assert(m.toSeq == Seq((1L, "x", "y", 3L)))
  }

  test("ties break on (left, right) lexicographic order") {
    // (a,b) and (b,c) both appear twice; (a,b) < (b,c)
    val corpus = Seq(Seq("a", "b"), Seq("a", "b"),
      Seq("b", "c"), Seq("b", "c"))
    val m = train(corpus, 1)
    assert(m.toSeq == Seq((1L, "a", "b", 2L)))
  }

  test("merged tokens participate in later rounds (subword composition)") {
    // round 1 merges (a,b) everywhere; round 2's most frequent pair is
    // then (a_b, c) — only expressible over the REWRITTEN corpus
    val corpus = Seq.fill(3)(Seq("a", "b", "c")) ++ Seq(Seq("a", "b"))
    val m = train(corpus, 2)
    assert(m(0) == ((1L, "a", "b", 4L)))
    assert(m(1) == ((2L, "a_b", "c", 3L)))
  }

  test("rewrite is greedy left-to-right (overlaps don't double-merge)") {
    // "a a a" under the merge (a,a): greedy left-to-right yields
    // [a_a, a] — the middle token can't merge twice — so round 2's
    // dominant pair is (a_a, a), never (a, a_a)
    val corpus = Seq.fill(2)(Seq("a", "a", "a"))
    val m = train(corpus, 2)
    assert(m(0) == ((1L, "a", "a", 4L)))
    assert(m(1) == ((2L, "a_a", "a", 2L)))
  }

  test("sequences shrunk to one token drop out of pair counting") {
    // doc 2 becomes the single token a_b after round 1 and must simply
    // stop contributing pairs (no crash, no phantom pair)
    val corpus = Seq(Seq("a", "b", "c"), Seq("a", "b"), Seq("a", "b", "c"))
    val m = train(corpus, 2)
    assert(m(0) == ((1L, "a", "b", 3L)))
    assert(m(1) == ((2L, "a_b", "c", 2L)))
  }

  test("applyMerges encodes with the learned rules, rule order honored") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Seq("a", "b", "c", "a", "b")),
      (2L, Seq("b", "a")),       // no rule matches
      (3L, Seq("a", "a", "b")))  // greedy: a stays, (a,b) merges
    .toDF("id", "toks")
    val out = Bpe.applyMerges(df, "toks", Seq("a" -> "b", "a_b" -> "c"))
      .orderBy(col("id")).select("bpe_toks").as[Seq[String]].collect()
    assert(out(0) == Seq("a_b_c", "a_b")) // both rules fire in order
    assert(out(1) == Seq("b", "a"))
    assert(out(2) == Seq("a", "a_b"))
    // empty sequence: fold of nothing is nothing
    val empty = Bpe.applyMerges(
      Seq((9L, Seq.empty[String])).toDF("id", "toks"), "toks",
      Seq("a" -> "b")).select("bpe_toks").as[Seq[String]].head()
    assert(empty.isEmpty)
  }
}
