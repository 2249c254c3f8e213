package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class LabelPropSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Double)],
                  seeds: Seq[(Long, Option[Int])], iters: Int) =
    LabelProp.run(edges.toDF("src", "dst", "w"),
        seeds.toDF("id", "lab"), iters)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap

  test("weighted majority vote with clamped seeds") {
    // node 3 hears label 1 (w=0.9) and label 2 (w=0.4+0.4=0.8) -> 1;
    // seed 4 keeps its label even though its neighbor says otherwise
    val edges = Seq((3L, 1L, 0.9), (3L, 2L, 0.4), (3L, 5L, 0.4),
      (4L, 1L, 1.0))
    val seeds = Seq(1L -> Some(1), 2L -> Some(2), 5L -> Some(2),
      3L -> None, 4L -> Some(9))
    val got = run(edges, seeds, 1)
    assert(got(3L) == Some(1))
    assert(got(4L) == Some(9)) // clamped
  }

  test("bit-equal scores tie to the lowest label") {
    val edges = Seq((3L, 1L, 0.5), (3L, 2L, 0.5))
    val seeds = Seq(1L -> Some(7), 2L -> Some(4), 3L -> None)
    assert(run(edges, seeds, 1)(3L) == Some(4))
  }

  test("labels reach two hops in two rounds, not one") {
    // 1(seeded) -> feeds 2 -> feeds 3
    val edges = Seq((2L, 1L, 1.0), (3L, 2L, 1.0))
    val seeds = Seq(1L -> Some(5), 2L -> None, 3L -> None)
    val one = run(edges, seeds, 1)
    val two = run(edges, seeds, 2)
    assert(one(2L) == Some(5) && one(3L) == None)
    assert(two(3L) == Some(5))
  }

  test("nodes with no labeled neighbors stay null") {
    val edges = Seq((2L, 3L, 1.0))
    val seeds = Seq(1L -> Some(5), 2L -> None, 3L -> None)
    assert(run(edges, seeds, 3)(2L) == None)
  }
}
