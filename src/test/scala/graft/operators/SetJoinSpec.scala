package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The prefix filter's contract is LOSSLESSNESS: jaccardSelfJoin must
  * return exactly the brute-force pair set at every threshold — the
  * prefix/length filters may only prune pairs that cannot qualify.
  */
class SetJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def brute(sets: Seq[(Long, Set[String])], t: Double) =
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size
      union = (sa | sb).size
      if union > 0 && inter.toDouble / union >= t
    } yield (ia, ib, inter.toDouble / union)).toSet

  private def viaSpark(sets: Seq[(Long, Set[String])], t: Double) = {
    val df = sets.flatMap { case (id, s) => s.map(id -> _) }
      .toDF("id", "elem")
    SetJoin.jaccardSelfJoin(df, "id", "elem", t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("matches brute force on a fixed corpus at several thresholds") {
    val sets = Seq(
      1L -> Set("a", "b", "c", "d"),
      2L -> Set("a", "b", "c", "d"),          // exact dup of 1
      3L -> Set("a", "b", "c", "e"),          // J(1,3) = 3/5 = 0.6
      4L -> Set("x", "y", "z"),               // disjoint
      5L -> Set("a", "x"),                    // small overlaps
      6L -> Set("b"))                         // singleton
    for (t <- Seq(0.3, 0.5, 0.6, 0.8, 1.0))
      assert(viaSpark(sets, t) == brute(sets, t), s"threshold $t")
  }

  test("property: lossless vs brute force on random small corpora") {
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    for (trial <- 1 to 20) {
      val sets = (0 until 7).map { i =>
        val sz = 1 + rnd.nextInt(alphabet.size)
        i.toLong -> rnd.shuffle(alphabet).take(sz).toSet
      }
      val t = Seq(0.34, 0.5, 0.75)(rnd.nextInt(3))
      assert(viaSpark(sets, t) == brute(sets, t), s"trial $trial t=$t $sets")
    }
  }

  private def bruteCont(sets: Seq[(Long, Set[String])], t: Double) =
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia != ib
      inter = (sa & sb).size
      if sa.nonEmpty && inter.toDouble / sa.size >= t
    } yield (ia, ib, inter.toLong, inter.toDouble / sa.size)).toSet

  private def viaSparkCont(sets: Seq[(Long, Set[String])], t: Double) = {
    val df = sets.flatMap { case (id, s) => s.map(id -> _) }
      .toDF("id", "elem")
    SetJoin.containmentSelfJoin(df, "id", "elem", t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
  }

  test("containment join finds subsets Jaccard misses, lossless vs brute force") {
    val sets = Seq(
      1L -> Set("a", "b"),                          // fully inside 2 and 3
      2L -> Set("a", "b", "c", "d", "e", "f"),      // J(1,2)=2/6 < 0.5
      3L -> Set("a", "b", "z"),
      4L -> Set("x", "y"))
    for (t <- Seq(0.5, 0.9, 1.0))
      assert(viaSparkCont(sets, t) == bruteCont(sets, t), s"threshold $t")
    // the subset relation is directional: 1->2 qualifies at 1.0, never 2->1
    assert(viaSparkCont(sets, 1.0).map(p => (p._1, p._2))
      == Set((1L, 2L), (1L, 3L)))
  }

  test("containment property: lossless on random corpora") {
    val rnd = new scala.util.Random(11)
    val alphabet = Vector("a", "b", "c", "d", "e", "f")
    for (trial <- 1 to 15) {
      val sets = (0 until 6).map { i =>
        i.toLong -> rnd.shuffle(alphabet).take(1 + rnd.nextInt(6)).toSet
      }
      val t = Seq(0.4, 0.7, 0.9)(rnd.nextInt(3))
      assert(viaSparkCont(sets, t) == bruteCont(sets, t),
        s"trial $trial t=$t $sets")
    }
  }

  private def viaSparkContBanded(sets: Seq[(Long, Set[String])],
                                 t: Double) = {
    // the banded twin's contract wants pre-hashed 8-byte elements (the
    // hashedShingles convention) — hash here like the queries do;
    // md5Long is injective in practice on these tiny alphabets, so
    // set semantics (all the brute force sees) are preserved
    val df = sets.flatMap { case (id, s) => s.map(id -> _) }
      .toDF("id", "raw")
      .select(col("id"),
        graft.functions.HashFns.md5Long(col("raw")).as("elem"))
    SetJoin.containmentBanded(df, "id", "elem", t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
  }

  test("banded containment twin: sound always, complete inside the ratio envelope") {
    // The twin's contract (SetJoin.containmentBanded scaladoc): every
    // emitted pair is exact-verified TRUE (soundness is
    // unconditional), and recall covers pairs inside the size-ratio
    // envelope. These near-dup containment pairs all carry J >= 0.82
    // — the shape the corpus measurements show — and minhash over md5
    // is deterministic, so the equality below is a pinned result, not
    // a flaky one.
    val sets = Seq(
      1L -> Set("a", "b", "c", "d", "e", "f", "g", "h", "i", "k"),
      2L -> Set("a", "b", "c", "d", "e", "f", "g", "h", "i", "j"),
      3L -> Set("a", "b", "c", "d", "e", "f", "g", "h", "i"),
      4L -> Set("x", "y", "z"),
      5L -> Set("p", "q"))
    val banded = viaSparkContBanded(sets, 0.9)
    val brute = bruteCont(sets, 0.9)
    assert(banded.subsetOf(brute), "twin emitted a non-true pair")
    assert(banded == brute,
      s"recall gap inside the envelope: missing ${brute -- banded}")
  }

  test("banded containment twin: exact verify rejects band-collision noise") {
    // Disjoint sets can only reach the output through a band
    // collision; the exact integer-ratio verify must filter every one.
    val sets = (1L to 8L).map(i =>
      i -> Set(s"u$i", s"v$i", s"w$i", s"x$i"))
    assert(viaSparkContBanded(sets, 0.5).isEmpty)
  }

  // ---- stratified twin: token-sequence corpora (the quote regime) ----

  /** 3-gram rows WITH position (the containmentStratified input). */
  private def ngramRows(docs: Seq[(Long, Seq[String])]) =
    docs.flatMap { case (id, toks) =>
      if (toks.size < 3) Seq.empty
      else toks.sliding(3).zipWithIndex
        .map { case (w, i) => (id, i + 1, w.mkString(" ")) }
    }

  private def ngramSets(docs: Seq[(Long, Seq[String])]) =
    docs.map { case (id, toks) =>
      id -> toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet }

  private def viaSparkStratified(docs: Seq[(Long, Seq[String])],
                                 t: Double) = {
    val df = ngramRows(docs).toDF("id", "pos", "ngram")
      .select(col("id"), col("pos"),
        graft.functions.HashFns.md5Long(col("ngram")).as("h"))
    SetJoin.containmentStratified(df, "id", "pos", "h", t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
  }

  /** Deterministic pseudo-random token stream (seeded). */
  private def toks(seed: Int, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(s"w${rnd.nextInt(40)}")
  }

  test("stratified twin matches brute force INCLUDING rho>=5 quote pairs the banded twin misses") {
    // The r12 coverage hole: a 12-token quote (10 3-grams) inside an
    // 80-token host is a rho ~ 7.8 pair with J ~ 0.13 — beyond the
    // banded twin's ratio envelope (per-pair band-hit probability
    // ~0.3 at 24 r=2 bands). The stratified twin's winnowing leg
    // carries a DETERMINISTIC guarantee for the verbatim run, so it
    // must return the exact brute-force answer; the banded twin's
    // miss is pinned below (md5 minhash is deterministic — this is a
    // fixed outcome, not a flaky one).
    val host1 = toks(1, 80)
    val host2 = toks(2, 90)
    val docs = Seq(
      1L -> host1,
      2L -> host2,
      101L -> host1.take(12),                  // quote of host1
      102L -> host2.take(12),                  // quote of host2
      3L -> toks(3, 60),                       // noise
      4L -> toks(4, 40),                       // noise
      5L -> toks(5, 30),                       // near-dup pair (5,6):
      6L -> (toks(5, 30).init :+ "w99"))       // one-token edit
    val sets = ngramSets(docs)
    val brute = bruteCont(sets, 0.9)
    // the fixture really is in the quote regime
    val bySize = sets.toMap.map { case (k, v) => k -> v.size }
    assert(bySize(1L).toDouble / bySize(101L) >= 5.0 &&
      bySize(2L).toDouble / bySize(102L) >= 5.0, s"fixture rho: $bySize")
    assert(brute.exists(p => p._1 == 101L && p._2 == 1L))
    assert(viaSparkStratified(docs, 0.9) == brute)
    // the banded twin misses at least one quote pair — the documented
    // envelope hole this operator exists to close
    val banded = viaSparkContBanded(sets, 0.9)
    assert(banded.subsetOf(brute))
    val quotePairs = brute.filter(p => p._1 >= 100L)
    assert((quotePairs -- banded).nonEmpty,
      "banded unexpectedly caught every quote pair — fixture too easy")
  }

  test("stratified twin: lossless on random token corpora at t=0.9") {
    for (trial <- 10 to 14) {
      val base = toks(trial * 7, 50 + trial)
      val docs = Seq(
        1L -> base,
        2L -> base.drop(20),                    // suffix: contained
        3L -> base.take(12),                    // prefix quote
        4L -> toks(trial * 7 + 1, 35),
        5L -> toks(trial * 7 + 2, 8))           // shorter than one window
      assert(viaSparkStratified(docs, 0.9) == bruteCont(ngramSets(docs), 0.9),
        s"trial $trial")
    }
  }

  test("spanHotFingerprints reports boilerplate spans the cap would drop") {
    // six docs opening with the SAME 12 tokens: the shared spans'
    // fingerprints have df 6 — above a cap of 4 they are dropped from
    // candidacy, and the report must surface them (heaviest first)
    val shared = toks(99, 12)
    val docs = (1L to 6L).map(i => i -> (shared ++ toks(i.toInt, 30)))
    val df = ngramRows(docs).toDF("id", "pos", "ngram")
      .select(col("id"), col("pos"),
        graft.functions.HashFns.md5Long(col("ngram")).as("h"))
    val rep = SetJoin.spanHotFingerprints(df, "id", "pos", "h",
      winnowW = 8, maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rep.nonEmpty && rep.forall(_._2 == 6L),
      s"expected shared-span fingerprints at df 6, got ${rep.toSeq}")
    // a cap at the corpus size reports nothing
    assert(SetJoin.spanHotFingerprints(df, "id", "pos", "h", 8, 6)
      .collect().isEmpty)
  }

  test("prefixHotElements reports closed-vocab inflation, heaviest first") {
    // six 2-element sets all share "hot": with t=0.5 the prefix keeps
    // both elements, so hot's prefix df is 6 — each such element
    // contributes p² candidate pairs, which is what the report warns
    // about (the sf1 closed-vocab finding, SCALING.md round 11)
    val sets = (1L to 6L).map(i => i -> Set("hot", s"u$i"))
    val df = sets.flatMap { case (id, s) => s.map(id -> _) }
      .toDF("id", "elem")
    val rep = SetJoin.prefixHotElements(df, "id", "elem", 0.5, maxDf = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rep.toSeq == Seq(("hot", 6L, 6L)))
    // a cap above every prefix df reports nothing
    assert(SetJoin.prefixHotElements(df, "id", "elem", 0.5, 10)
      .collect().isEmpty)
  }

  test("prefix candidates prune: disjoint corpus verifies zero pairs") {
    // every set unique-element — no prefix collision, so the verify
    // stage gets an empty pair frame and the result is empty
    val sets = (1L to 5L).map(i => i -> Set(s"u$i", s"v$i", s"w$i"))
    assert(viaSpark(sets, 0.5).isEmpty)
  }
}
