package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Profile.momentsByGroup against closed-form references. */
class MomentsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("moments match the textbook values on a known distribution") {
    // symmetric {1,2,3,4,5}: mean 3, var 2, skew 0, kurtosis -1.3
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("g", _)).toDF("g", "x")
    val r = Profile.momentsByGroup(df, Seq("g"), "x").collect().head
    assert(r.getLong(1) == 5L)
    assert(r.getDouble(2) == 3.0)
    assert(r.getDouble(3) == 2.0)
    assert(r.getDouble(4) == 0.0)
    assert(math.abs(r.getDouble(5) - (-1.3)) < 1e-12)
  }

  test("skewness sign tracks the tail; groups independent; nulls excluded") {
    val rows: Seq[(String, java.lang.Double)] =
      Seq[(String, java.lang.Double)](("r", 1.0), ("r", 1.0), ("r", 1.0),
        ("r", 10.0), ("l", 10.0), ("l", 10.0), ("l", 10.0), ("l", 1.0),
        ("l", null))
    val got = Profile.momentsByGroup(rows.toDF("g", "x"), Seq("g"), "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("r").getLong(1) == 4L && got("l").getLong(1) == 4L)
    assert(got("r").getDouble(4) > 0.5)   // right tail
    assert(got("l").getDouble(4) < -0.5)  // left tail
  }
}
