package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ExperimentSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def stab6(x: Double) = math.rint(x * 1e6) / 1e6

  test("welchTTest matches the textbook statistic and df") {
    val a = Seq(10.0, 12.0, 9.0, 11.0)       // control
    val b = Seq(14.0, 15.0, 13.0, 18.0, 16.0) // treatment
    val rows = a.map((false, _)) ++ b.map((true, _))
    val out = Experiment.welchTTest(
      rows.toDF("t", "y").withColumn("y", col("y").cast("decimal(18,2)")),
      col("t"), col("y")).head()
    def meanVar(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      (m, xs.map(v => (v - m) * (v - m)).sum / (xs.size - 1))
    }
    val ((ma, va), (mb, vb)) = (meanVar(a), meanVar(b))
    val se2 = va / a.size + vb / b.size
    val t = (mb - ma) / math.sqrt(se2)
    val dfW = se2 * se2 / (va / a.size * (va / a.size) / (a.size - 1) +
      vb / b.size * (vb / b.size) / (b.size - 1))
    assert(out.getAs[Long]("n_a") == 4L && out.getAs[Long]("n_b") == 5L)
    assert(out.getAs[Double]("mean_a") == ma)
    assert(math.abs(out.getAs[Double]("t_stat") - stab6(t)) < 1e-12)
    assert(math.abs(out.getAs[Double]("df") - stab6(dfW)) < 1e-12)
  }

  test("welchTTest: degenerate arms yield null t") {
    val rows = Seq((false, 5.0), (true, 7.0), (true, 8.0))
    val out = Experiment.welchTTest(
      rows.toDF("t", "y").withColumn("y", col("y").cast("decimal(18,2)")),
      col("t"), col("y")).head()
    assert(out.isNullAt(out.fieldIndex("t_stat")) &&
      out.isNullAt(out.fieldIndex("df")))
  }

  test("cuped matches the direct adjusted-variance computation") {
    val rows = (1 to 40).map { i =>
      val x = (i * 7 % 13).toDouble
      (x, 2.5 * x + (i * 11 % 5).toDouble) // correlated pre/post
    }
    val out = Experiment.cuped(
      rows.toDF("x", "y")
        .withColumn("x", col("x").cast("decimal(18,2)"))
        .withColumn("y", col("y").cast("decimal(18,2)")),
      col("x"), col("y")).head()
    val n = rows.size
    val (mx, my) = (rows.map(_._1).sum / n, rows.map(_._2).sum / n)
    val cov = rows.map { case (x, y) => (x - mx) * (y - my) }.sum / (n - 1)
    val vx = rows.map { case (x, _) => (x - mx) * (x - mx) }.sum / (n - 1)
    val vy = rows.map { case (_, y) => (y - my) * (y - my) }.sum / (n - 1)
    val theta = cov / vx
    // the closed form equals the variance of the directly adjusted metric
    val adj = rows.map { case (x, y) => y - theta * (x - mx) }
    val madj = adj.sum / n
    val vAdjDirect = adj.map(v => (v - madj) * (v - madj)).sum / (n - 1)
    assert(math.abs(out.getAs[Double]("theta") - theta) < 1e-6)
    assert(math.abs(out.getAs[Double]("var_y") - vy) < 1e-6)
    assert(math.abs(out.getAs[Double]("var_y_adj") - vAdjDirect) < 1e-6)
    assert(math.abs(out.getAs[Double]("var_reduction")
      - cov * cov / (vx * vy)) < 1e-6) // 1e-6 stabilization grid
  }

  test("ratioDelta matches the first-order delta formula") {
    val rows = (1 to 30).map(i =>
      ((i % 7 + 1).toDouble, (i % 4 + 1).toDouble)) // (x, y), y > 0
    val out = Experiment.ratioDelta(
      rows.toDF("x", "y")
        .withColumn("x", col("x").cast("decimal(18,2)"))
        .withColumn("y", col("y").cast("decimal(18,0)")),
      col("x"), col("y")).head()
    val n = rows.size
    val (mx, my) = (rows.map(_._1).sum / n, rows.map(_._2).sum / n)
    val cov = rows.map { case (x, y) => (x - mx) * (y - my) }.sum / (n - 1)
    val vx = rows.map { case (x, _) => (x - mx) * (x - mx) }.sum / (n - 1)
    val vy = rows.map { case (_, y) => (y - my) * (y - my) }.sum / (n - 1)
    val seDelta = math.sqrt((vx / (my * my) - 2 * mx * cov /
      (my * my * my) + mx * mx * vy / (my * my * my * my)) / n)
    val rs = rows.map { case (x, y) => x / y }
    val mr = rs.sum / n
    val seNaive = math.sqrt(
      rs.map(r => (r - mr) * (r - mr)).sum / (n - 1) / n)
    assert(math.abs(out.getAs[Double]("ratio") - mx / my) < 1e-9)
    assert(math.abs(out.getAs[Double]("se_delta") - seDelta) < 1e-6)
    assert(math.abs(out.getAs[Double]("se_naive") - seNaive) < 1e-6)
  }

  test("diffInDiff matches the hand-computed panel estimate") {
    // control deltas: {+1, +3}; treatment deltas: {+5, +9}
    val rows = Seq(
      (false, 10.0, 11.0), (false, 20.0, 23.0),
      (true, 10.0, 15.0), (true, 20.0, 29.0))
    val out = Experiment.diffInDiff(
      rows.toDF("t", "pre", "post")
        .withColumn("pre", col("pre").cast("decimal(18,2)"))
        .withColumn("post", col("post").cast("decimal(18,2)")),
      col("t"), col("pre"), col("post")).head()
    assert(out.getAs[Double]("delta_c") == 2.0)
    assert(out.getAs[Double]("delta_t") == 7.0)
    assert(out.getAs[Double]("did") == 5.0)
    // Welch SE over deltas: var_c = 2, var_t = 8, se = sqrt(1 + 4)
    assert(math.abs(out.getAs[Double]("se") - math.sqrt(5.0)) < 1e-6)
  }

  test("minDetectableEffect matches the two-sample formula") {
    val a = Seq(10.0, 12.0, 14.0); val b = Seq(11.0, 13.0)
    val rows = a.map((false, _)) ++ b.map((true, _))
    val out = Experiment.minDetectableEffect(
      rows.toDF("t", "y").withColumn("y", col("y").cast("decimal(18,2)")),
      col("t"), col("y")).head()
    val all = a ++ b
    val mean = all.sum / all.size
    // standard pooled WITHIN-arm variance: ((na-1)va + (nb-1)vb)/(n-2)
    def css(xs: Seq[Double]) = {
      val m = xs.sum / xs.size; xs.map(x => (x - m) * (x - m)).sum
    }
    val pooledVar = (css(a) + css(b)) / (a.size + b.size - 2)
    val mde = (Experiment.zAlphaHalf + Experiment.zPower) *
      math.sqrt(2 * pooledVar / 2) // n_arm = min(3, 2)
    assert(math.abs(out.getAs[Double]("pooled_mean") - mean) < 1e-6)
    assert(math.abs(out.getAs[Double]("pooled_var") - pooledVar) < 1e-6)
    assert(math.abs(out.getAs[Double]("mde_abs") - mde) < 1e-6)
    assert(math.abs(out.getAs[Double]("mde_rel") - mde / mean) < 1e-6)
  }

  test("minDetectableEffect ignores the between-arm mean gap") {
    // Two arms with identical within-arm spread but a large mean gap:
    // the grand-variance formula would balloon with the gap; the
    // within-arm pooled variance must not move.
    val near = Seq((false, 10.0), (false, 12.0), (true, 10.0), (true, 12.0))
    val far = Seq((false, 10.0), (false, 12.0), (true, 110.0), (true, 112.0))
    def pv(rows: Seq[(Boolean, Double)]) = Experiment.minDetectableEffect(
      rows.toDF("t", "y").withColumn("y", col("y").cast("decimal(18,2)")),
      col("t"), col("y")).head().getAs[Double]("pooled_var")
    assert(math.abs(pv(near) - 2.0) < 1e-6) // var of {10,12} = 2
    assert(math.abs(pv(far) - 2.0) < 1e-6)
  }

  test("cuped: constant covariate yields null theta") {
    val rows = Seq((1.0, 5.0), (1.0, 9.0), (1.0, 6.0))
    val out = Experiment.cuped(
      rows.toDF("x", "y")
        .withColumn("x", col("x").cast("decimal(18,2)"))
        .withColumn("y", col("y").cast("decimal(18,2)")),
      col("x"), col("y")).head()
    assert(out.isNullAt(out.fieldIndex("theta")) &&
      out.isNullAt(out.fieldIndex("var_y_adj")))
  }
}
