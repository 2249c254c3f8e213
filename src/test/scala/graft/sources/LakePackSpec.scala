package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class LakePackSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def plan(sizes: Seq[(Long, Long)], targetBins: Int) =
    Lake.packPlan(sizes.toDF("ord", "sz"), "sz", "ord", targetBins)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("first-fit-decreasing textbook example") {
    // sizes 9,8,7,3,2,2,1 with cap = 32 div 3 = 10:
    // 9|8|7 open bins, 3 first-fits bin 3 (7+3), 2 fits bin 2 (8+2),
    // 2 opens bin 4, 1 fits bin 1 (9+1) -> loads 10,10,10,2
    val got = plan(Seq(1L -> 9L, 2L -> 8L, 3L -> 7L, 4L -> 3L,
      5L -> 2L, 6L -> 2L, 7L -> 1L), targetBins = 3)
    assert(got.toSeq == Seq((1L, 10L, 10L), (2L, 10L, 10L),
      (3L, 10L, 10L), (4L, 2L, 10L)))
  }

  test("an oversize item opens its own overfull bin") {
    // total 12, 2 bins -> cap 6; the 7 exceeds cap and sits alone
    val got = plan(Seq(1L -> 7L, 2L -> 3L, 3L -> 2L), targetBins = 2)
    assert(got.toSeq == Seq((1L, 7L, 6L), (2L, 5L, 6L)))
  }

  test("equal sizes tie-break on the order column (deterministic)") {
    val a = plan(Seq(1L -> 4L, 2L -> 4L, 3L -> 4L), 2)
    val b = plan(Seq(3L -> 4L, 1L -> 4L, 2L -> 4L), 2)
    assert(a.toSeq == b.toSeq)
    assert(a.map(_._2).sum == 12L)
  }

  test("conservation and capacity laws over a generated size mix") {
    // pseudo-random but fixed sizes: every byte lands in exactly one
    // bin, and no bin exceeds cap unless it holds a single oversize
    // item (which FFD places alone)
    val sizes = (1L to 40L).map(i => i -> ((i * 7919) % 900 + 100))
    val total = sizes.map(_._2).sum
    val got = plan(sizes, targetBins = 6)
    val cap = got.head._3
    assert(got.map(_._2).sum == total)
    val over = got.filter(_._2 > cap)
    assert(over.forall(b => sizes.exists(_._2 == b._2)),
      s"overfull bins must be single oversize items: $over")
  }
}
