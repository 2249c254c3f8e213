package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DriftSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def run(ref: Seq[Long], cur: Seq[Long], bins: Int) =
    Drift.chiSquared(ref.toDF("v"), cur.toDF("v"), "v", bins)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))

  test("identical snapshots give chisq exactly zero") {
    val xs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L)
    val got = run(xs, xs, bins = 5)
    // equal totals + identical histogram: expected == cur_n exactly
    got.foreach { case (_, rn, cn, e, c, chi) =>
      assert(rn == cn); assert(e == cn.toDouble)
      assert(c == 0.0); assert(chi == 0.0)
    }
  }

  test("a shifted snapshot produces positive drift mass where it moved") {
    val ref = (1L to 100L).toSeq
    val cur = (51L to 150L).toSeq // upper half doubled, lower gone
    val got = run(ref, cur, bins = 4)
    assert(got.map(_._5).sum > 50.0)
    assert(got.forall(_._6 == got.head._6)) // total repeated per row
  }

  test("a bin with no reference mass falls back to unexpected-mass") {
    // ref is one hot value -> the single boundary equals it, so every
    // ref row lands in bin 0; cur rows above the boundary land in the
    // ref-empty bin 1, contributing cur_n by convention
    val got = run(Seq(1L, 1L, 1L, 1L), Seq(5L, 5L), bins = 2)
    val byBin = got.map(g => g._1 -> g).toMap
    assert(byBin(1L)._2 == 0L && byBin(1L)._3 == 2L)
    assert(byBin(1L)._5 == 2.0)
    // bin 0: expected = 4 * 2/4 = 2, observed 0 -> (0-2)^2/2 = 2
    assert(byBin(0L)._5 == 2.0)
    assert(got.head._6 == 4.0)
  }

  private def psi(ref: Seq[Long], cur: Seq[Long], bins: Int) = {
    val r = ref.toDF("v"); val c = cur.toDF("v")
    Drift.psiFromReport(Drift.chiSquared(r, c, "v", bins))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4))).toSeq
  }

  test("psi is zero for identical snapshots and positive under shift") {
    val ref = (1L to 100L).toSeq
    assert(psi(ref, ref, bins = 4).forall(t => t._4 == 0.0 && t._5 == 0.0))
    val shifted = psi(ref, (51L to 150L).toSeq, bins = 4)
    assert(shifted.head._5 > 0.25) // the "drifted" alert band
    assert(shifted.forall(_._5 == shifted.head._5))
  }

  test("psi smoothing keeps ref-empty bins finite") {
    val got = psi(Seq(1L, 1L, 1L, 1L), Seq(5L, 5L), bins = 2)
    assert(got.forall(t => !t._4.isNaN && !t._4.isInfinite))
    assert(got.head._5 > 0.0)
  }

  private def ks(ref: Seq[Long], cur: Seq[Long]) = {
    val r = Drift.ks(ref.toDF("v"), cur.toDF("v"), "v").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
  }

  test("ks of identical samples is exactly zero") {
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val (_, rt, ct, num, d) = ks(xs, xs)
    assert(rt == 8L && ct == 8L && num == 0L && d == 0.0)
  }

  test("ks of disjoint samples is exactly one") {
    val (at, rt, ct, num, d) = ks(Seq(1L, 2L, 3L), Seq(11L, 12L))
    assert(num == rt * ct && d == 1.0)
    assert(at >= 3L && at < 11L) // the gap between the supports
  }

  test("ks hand-computed case with deterministic argmax tiebreak") {
    // ref={1,2}, cur={2,3}: diffs scaled by rt*ct=4 are 2,2,0 at
    // v=1,2,3 -> d_num=2, d=0.5, at_value = LARGEST tied v = 2
    val (at, rt, ct, num, d) = ks(Seq(1L, 2L), Seq(2L, 3L))
    assert(rt == 2L && ct == 2L)
    assert(num == 2L && d == 0.5 && at == 2L)
  }
}
