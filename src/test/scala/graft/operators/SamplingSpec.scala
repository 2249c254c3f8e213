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
}
