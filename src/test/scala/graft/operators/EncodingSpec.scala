package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class EncodingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("targetEncode matches the textbook smoothing and LOO formulas") {
    // cat a: y = {10, 20, 30}; cat b: y = {40}; global S=100, N=4
    val rows = Seq((1L, "a", 10), (2L, "a", 20), (3L, "a", 30),
      (4L, "b", 40))
    val df = rows.toDF("id", "cat", "y")
      .withColumn("y", col("y").cast("decimal(18,2)"))
    val out = Encoding.targetEncode(df, "cat", col("y"), 2L)
      .orderBy(col("id")).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_cat"),
        r.getAs[Double]("enc_smooth"), Option(r.getAs[Any]("enc_loo"))))
    // a: (60 + 2·25) / (3 + 2) = 22; b: (40 + 50) / 3 = 30
    assert(out(0) == ((1L, 3L, 22.0, Some(25.0)))) // (60-10)/2
    assert(out(1) == ((2L, 3L, 22.0, Some(20.0)))) // (60-20)/2
    assert(out(2) == ((3L, 3L, 22.0, Some(15.0)))) // (60-30)/2
    assert(out(3)._3 == 30.0 && out(3)._4.isEmpty) // singleton: null LOO
  }

  test("targetEncode m=0 degenerates to the plain category mean") {
    val df = Seq((1L, "a", 10), (2L, "a", 30), (3L, "b", 7))
      .toDF("id", "cat", "y")
      .withColumn("y", col("y").cast("decimal(18,2)"))
    val enc = Encoding.targetEncode(df, "cat", col("y"), 0L)
      .select("cat", "enc_smooth").distinct().collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(enc == Map("a" -> 20.0, "b" -> 7.0))
  }

  test("woeIv matches the brute-force WOE/IV; degenerate bins excluded") {
    // bins: 0 -> 3 pos / 1 neg, 1 -> 1 pos / 3 neg, 2 -> 2 pos / 0 neg
    val rows = Seq((0L, true), (0L, true), (0L, true), (0L, false),
      (1L, true), (1L, false), (1L, false), (1L, false),
      (2L, true), (2L, true))
    val out = Encoding.woeIv(rows.toDF("bin", "lab"), "bin", col("lab"))
      .orderBy(col("bin")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getAs[Any]("woe")).map(_.asInstanceOf[Double]),
        r.getAs[Double]("iv_total")))
    val p = 6.0; val q = 4.0
    def stab6(x: Double) = math.rint(x * 1e6) / 1e6
    val woe0 = stab6(math.log((3 * q) / (1 * p)))
    val woe1 = stab6(math.log((1 * q) / (3 * p)))
    val iv = stab6((3 / p - 1 / q) * woe0) + stab6((1 / p - 3 / q) * woe1)
    assert(out(0) == ((0L, 3L, 1L, Some(woe0), iv)))
    assert(out(1) == ((1L, 1L, 3L, Some(woe1), iv)))
    assert(out(2)._4.isEmpty) // zero-neg bin: woe null, excluded from IV
  }
}
