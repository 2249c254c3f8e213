package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class FusionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("RRF matches the hand formula and rewards cross-ranker agreement") {
    // ranker A: d1, d2, d3 ; ranker B: d3, d1, d4.
    // d1: 1/61 + 1/62, d3: 1/63 + 1/61, d2: 1/62, d4: 1/63.
    // agreement (d1, d3) beats single-ranker hits; d1 > d3.
    val a = Seq((9L, 1L, 1), (9L, 2L, 2), (9L, 3L, 3)).toDF("qid", "doc_id", "rk")
    val b = Seq((9L, 3L, 1), (9L, 1L, 2), (9L, 4L, 3)).toDF("qid", "doc_id", "rk")
    val got = Fusion.rrf(Seq(a, b), k0 = 60, topK = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._2).toSeq == Seq(1L, 3L, 2L, 4L))
    assert(math.abs(got(0)._3 - (1.0 / 61 + 1.0 / 62)) < 1e-15)
    assert(math.abs(got(1)._3 - (1.0 / 63 + 1.0 / 61)) < 1e-15)
    // d2 (rank 2 in A) outranks d4 (rank 3 in B) on part value,
    // and the doc_id tie-break never fires since parts differ
    assert(math.abs(got(2)._3 - 1.0 / 62) < 1e-15)
  }

  test("a doc ranked by only one ranker can still win if ranked first") {
    val a = Seq((1L, 10L, 1)).toDF("qid", "doc_id", "rk")
    val b = Seq((1L, 11L, 1), (1L, 10L, 2)).toDF("qid", "doc_id", "rk")
    val got = Fusion.rrf(Seq(a, b), 60, 2)
      .collect().map(_.getLong(2)).toSeq
    assert(got == Seq(10L, 11L)) // 1/61+1/62 > 1/61
  }
}
