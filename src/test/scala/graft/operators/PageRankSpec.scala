package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PageRankSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Double] =
    PageRank.run(edges.toDF("src", "dst"), damping = 0.85, iters = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("a directed ring stays at the uniform fixed point") {
    // Every node has in-degree = out-degree = 1, so 1/n is exactly
    // preserved by each iteration: (1-d)/n + d*(1/n)/1 = 1/n.
    val r = ranks(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    r.values.foreach(v => assert(math.abs(v - 0.25) < 1e-9))
  }

  test("rank mass is conserved on dangling-free graphs") {
    val r = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (2L, 1L),
      (3L, 2L)))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("a hub out-ranks its spokes, which out-rank nothing pointing at them") {
    // spokes 2..5 all point at hub 1; hub points back at 2 only.
    val r = ranks(Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (1L, 2L)))
    assert(r(1L) > r(2L))     // hub beats the reciprocated spoke
    assert(r(2L) > r(3L))     // reciprocated spoke beats the others
    assert(r(3L) == r(4L) && r(4L) == r(5L)) // symmetric spokes tie exactly
  }

  test("iterating contracts toward the fixed point (damping bound)") {
    // successive-iteration deltas must shrink by at least the damping
    // factor on this strongly-connected graph
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val r4 = ranks(edges, iters = 4)
    val r5 = ranks(edges, iters = 5)
    val r6 = ranks(edges, iters = 6)
    val d45 = r4.keys.map(k => math.abs(r5(k) - r4(k))).max
    val d56 = r5.keys.map(k => math.abs(r6(k) - r5(k))).max
    assert(d56 <= d45 * 0.85 + 1e-10)
  }
}
