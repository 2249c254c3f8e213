package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val rows = (1L to 200L).map(i => (i, if (i <= 20) 50L else 1L))
  private val df = rows.toDF("id", "w")

  private def draw(seed: Int, n: Int = 30): Set[Long] =
    Sampling.sequentialPoisson(df, "id", "w", n, seed)
      .collect().map(_.getLong(0)).toSet

  test("same seed replays the same set; another seed differs") {
    assert(draw(7) == draw(7))
    assert(draw(7) != draw(8))
  }

  test("inclusion tracks weight: the heavy tier dominates the sample") {
    // ids 1-20 carry 50/51 of total mass in a 200-row frame; a πps
    // draw of 30 must be mostly heavy ids under ANY reasonable seed —
    // deterministic given the fixed hash, verified over 20 seeds.
    val heavyShare = (0 until 20).map { s =>
      draw(s).count(_ <= 20L).toDouble / 30.0
    }
    assert(heavyShare.sum / heavyShare.size > 0.5,
      s"heavy tier underdrawn: ${heavyShare.sum / heavyShare.size}")
    // and every draw has at least SOME light-tier presence pressure
    // check: heavy tier is only 20 ids, so ≥ 10 light ids always appear
    (0 until 20).foreach(s => assert(draw(s).count(_ > 20L) >= 10))
  }

  test("non-positive weights are excluded") {
    val withZero = df.union(Seq((999L, 0L), (998L, -5L)).toDF("id", "w"))
    val got = Sampling.sequentialPoisson(withZero, "id", "w", 200, 3)
      .collect().map(_.getLong(0)).toSet
    assert(!got.contains(999L) && !got.contains(998L))
  }

  test("kCenter picks farthest points greedily, ties on smaller id") {
    // (0,0) and a near-twin, plus two far corners equidistant from the
    // start: the tie at dist 100 must resolve to the smaller id (3)
    val pts = Seq(
      (1L, Array(0f, 0f)), (2L, Array(0f, 0.1f)),
      (3L, Array(10f, 0f)), (4L, Array(0f, 10f))).toDF("id", "v")
    val got = Sampling.kCenter(pts, "id", "v", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 1L, 0.0), (2L, 3L, 100.0),
      (3L, 4L, 100.0)))
  }

  test("kCenter k=1 returns just the smallest-id seed") {
    val pts = Seq((5L, Array(1f)), (2L, Array(9f))).toDF("id", "v")
    val got = Sampling.kCenter(pts, "id", "v", k = 1).collect()
    assert(got.length == 1 && got.head.getLong(1) == 2L)
  }
}
