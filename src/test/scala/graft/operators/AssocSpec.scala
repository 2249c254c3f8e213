package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AssocSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 4 baskets: {1,2,3} {1,2} {1,2,4} {3,4} — pair (1,2) support 3
  private val baskets = Seq(
    (10L, 1L), (10L, 2L), (10L, 3L),
    (20L, 1L), (20L, 2L),
    (30L, 1L), (30L, 2L), (30L, 4L),
    (40L, 3L), (40L, 4L)).toDF("bk", "it")

  test("support counts distinct baskets and respects minSupport") {
    val got = Assoc.copurchasePairs(baskets, "bk", "it", 2L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(got == Map((1L, 2L) -> 3L)) // all other pairs support 1
  }

  test("lift is support·n_baskets/(c_a·c_b)") {
    val r = Assoc.copurchasePairs(baskets, "bk", "it", 2L).collect().head
    // c(1)=3, c(2)=3, support=3, n_baskets=4 -> lift = 12/9
    assert(r.getDouble(3) == 3.0 * 4.0 / (3.0 * 3.0))
  }

  test("duplicate (basket, item) rows don't inflate support") {
    val dup = baskets.union(baskets)
    val got = Assoc.copurchasePairs(dup, "bk", "it", 2L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(got == Map((1L, 2L) -> 3L))
  }

  test("a-priori prune: items below minSupport generate no pairs") {
    // item 5 appears once; its pairs must not survive minSupport 2
    val b2 = baskets.union(Seq((10L, 5L)).toDF("bk", "it"))
    val got = Assoc.copurchasePairs(b2, "bk", "it", 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }
}
