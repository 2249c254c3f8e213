package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SpectralSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def loadings(rows: Seq[(Long, Seq[Float])], iters: Int,
                       dim: Int = 4) =
    Spectral.powerIterationLoadings(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
        dim = dim, iters = iters)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))

  test("rank-1 matrix: exact eigenvector and eigenvalue immediately") {
    // Three copies of (2,0,0,0): X'X = diag(12,0,0,0) — the dominant
    // direction is e1 with eigenvalue 12, and one iteration suffices.
    val rows = (1L to 3L).map(i => i -> Seq(2f, 0f, 0f, 0f))
    val got = loadings(rows, iters = 2)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got(0)._2 == 1.0)
    assert(got.drop(1).forall(_._2 == 0.0))
    assert(got.forall(_._3 == 12.0))
  }

  test("dominant direction wins over a weaker orthogonal one") {
    // 8 rows along (1,1,1,1) vs 2 rows along (1,-1,0,0): the loadings
    // must converge to +/- (1,1,1,1)/2.
    val strong = (1L to 8L).map(i => i -> Seq(1f, 1f, 1f, 1f))
    val weak = Seq(9L -> Seq(1f, -1f, 0f, 0f), 10L -> Seq(1f, -1f, 0f, 0f))
    val got = loadings(strong ++ weak, iters = 8)
    val v = got.map(_._2)
    val cos = v.map(_ * 0.5).sum.abs // dot with (1,1,1,1)/2
    assert(cos > 0.999, s"loadings $v not aligned with (1,1,1,1)/2")
    // eigenvalue of X'X along that direction: each strong row
    // contributes |x.u|^2 = 4; 8 rows -> 32 (weak rows are orthogonal)
    assert(math.abs(got.head._3 - 32.0) < 1e-6)
  }

  test("result is invariant to input partitioning (ordered folds)") {
    val rows = (1L to 20L).map(i =>
      i -> Seq(i.toFloat, (i % 3).toFloat, 1f / i, (i % 7).toFloat))
    val df = rows.toDF("vec_id", "embedding")
    val a = Spectral.powerIterationLoadings(df, "vec_id", "embedding", 4, 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val b = Spectral.powerIterationLoadings(df.repartition(7),
        "vec_id", "embedding", 4, 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(a.toSeq == b.toSeq) // bit-identical, not approximately
  }

  test("rejects dims whose 1/sqrt(d) is not exactly representable") {
    val df = Seq((1L, Seq(1f, 2f, 3f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Spectral.powerIterationLoadings(df, "vec_id", "embedding", 3, 2)
    }
  }
}
