package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class EvalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force Mann-Whitney AUC: mean over (pos, neg) pairs of
    * [1 if s_pos > s_neg, 0.5 if tied, 0 otherwise].
    */
  private def bruteAuc(rows: Seq[(Double, Boolean)]): Double = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    wins / (pos.size * neg.size)
  }

  private def engineAuc(rows: Seq[(Double, Boolean)]): Double =
    Eval.aucByRank(rows.toDF("s", "y"), "s", "y")
      .head().getAs[Double]("auc")

  test("matches the pairwise definition, ties counted half") {
    val rows = Seq(
      (3.0, true), (3.0, false), (2.0, true), (1.0, false),
      (5.0, true), (0.5, false), (2.0, false), (4.0, true))
    assert(engineAuc(rows) == bruteAuc(rows))
  }

  test("perfect, random, and inverted scorers") {
    val perfect = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
    assert(engineAuc(perfect) == 1.0)
    assert(engineAuc(perfect.map { case (s, y) => (s, !y) }) == 0.0)
    val allTied = Seq((1.0, true), (1.0, false), (1.0, true), (1.0, false))
    assert(engineAuc(allTied) == 0.5)
  }

  test("degenerate single-class input yields null, not an error") {
    val onlyPos = Seq((1.0, true), (2.0, true)).toDF("s", "y")
    val r = Eval.aucByRank(onlyPos, "s", "y").head()
    assert(r.isNullAt(r.fieldIndex("auc")))
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 0L)
  }

  test("partition-invariant (integer numerator is order-free)") {
    val rows = (1 to 200).map(i => (math.sin(i).abs * 10, i % 3 == 0))
    val df = rows.toDF("s", "y")
    val a = Eval.aucByRank(df, "s", "y").head().getAs[Double]("auc")
    val b = Eval.aucByRank(df.repartition(13), "s", "y")
      .head().getAs[Double]("auc")
    assert(a == b && a == bruteAuc(rows))
  }

  test("calibrationBins: exact counts, rates, and means per bin") {
    val rows = Seq(
      (0.1, true), (0.3, false), (0.6, true), (0.7, true), (1.2, false))
    val out = Eval.calibrationBins(rows.toDF("s", "y"), "s", "y", 0.5)
      .orderBy(col("bin")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (0L, 2L, 1L, 0.5, 0.2),   // scores 0.1, 0.3
      (1L, 2L, 2L, 1.0, 0.65),  // scores 0.6, 0.7
      (2L, 1L, 0L, 0.0, 1.2)))
  }

  test("mapMrrAtK matches the textbook AP/MRR on a worked example") {
    // group g ranked by score desc: rel pattern [F, T, T, F, T]
    // → first relevant at rank 2, MRR = 1/2,
    //   AP = (1/2 + 2/3 + 3/5) / 3 (3 relevant, all inside k=10)
    val rows = Seq(
      ("g", 1L, 50L, false), ("g", 2L, 40L, true), ("g", 3L, 30L, true),
      ("g", 4L, 20L, false), ("g", 5L, 10L, true))
    val out = Eval.mapMrrAtK(rows.toDF("q", "id", "s", "rel"),
      "q", "s", "rel", "id", 10).head()
    assert(out.getAs[Long]("n_docs") == 5L)
    assert(out.getAs[Long]("n_rel") == 3L)
    assert(out.getAs[Long]("first_rel_rank") == 2L)
    assert(out.getAs[Double]("mrr") == 0.5)
    val expAp = (1.0 / 2 + 2.0 / 3 + 3.0 / 5) / 3
    assert(math.abs(out.getAs[Double]("ap") - expAp) < 1e-9)
  }

  test("mapMrrAtK: no-relevant group yields nulls; k cuts the AP sum") {
    val rows = Seq(
      ("none", 1L, 9L, false), ("none", 2L, 8L, false),
      // "cut": relevant docs at ranks 1 and 3 with k=2 — only rank 1's
      // term enters AP, but normalization is min(R=2, k=2) = 2
      ("cut", 1L, 9L, true), ("cut", 2L, 8L, false),
      ("cut", 3L, 7L, true))
    val out = Eval.mapMrrAtK(rows.toDF("q", "id", "s", "rel"),
        "q", "s", "rel", "id", 2)
      .orderBy(col("q")).collect()
    val cut = out(0)
    assert(cut.getAs[Long]("n_rel") == 2L &&
      cut.getAs[Double]("ap") == 0.5 && // (1/1) / min(2,2)
      cut.getAs[Double]("mrr") == 1.0)
    val none = out(1)
    assert(none.getAs[Long]("n_docs") == 2L &&
      none.isNullAt(none.fieldIndex("first_rel_rank")) &&
      none.isNullAt(none.fieldIndex("mrr")) &&
      none.isNullAt(none.fieldIndex("ap")))
  }

  test("mapMrrAtK is partitioning-invariant") {
    val rows = (1L to 200L).map(i =>
      (s"q${i % 7}", i, (i * 37) % 101, (i * 13) % 3 == 0))
    val df = rows.toDF("q", "id", "s", "rel")
    val a = Eval.mapMrrAtK(df, "q", "s", "rel", "id", 5)
      .orderBy(col("q")).collect().toSeq
    val b = Eval.mapMrrAtK(df.repartition(17), "q", "s", "rel", "id", 5)
      .orderBy(col("q")).collect().toSeq
    assert(a == b)
  }
}
