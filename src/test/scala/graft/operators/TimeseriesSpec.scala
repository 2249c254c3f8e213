package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TimeseriesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Double)], alpha: Double) =
    Timeseries.ewma(rows.toDF("k", "t", "v"), Seq("k"),
        Seq(col("t")), "v", alpha)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap

  test("matches the sequential recurrence exactly") {
    val xs = Seq(4.0, 8.0, 1.0, 5.0, 9.0)
    val rows = xs.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
    val got = run(rows, alpha = 0.25)("a")
    val want = xs.tail.foldLeft(xs.head)((s, x) => s * 0.75 + x * 0.25)
    assert(got._1 == 5L)
    assert(got._2 == 9.0)          // last_value
    assert(got._3 == want)         // ewma, bit-exact
    assert(got._4 == 9.0 - want)   // drift
  }

  test("single point: ewma is the point itself, drift zero") {
    val got = run(Seq(("a", 0L, 7.5)), alpha = 0.25)("a")
    assert(got == ((1L, 7.5, 7.5, 0.0)))
  }

  test("fold respects event-time order, not input order") {
    // Same multiset, shuffled input: the ordered fold must give the
    // in-order answer (EWMA is order-sensitive, unlike a mean).
    val inOrder = Seq(("a", 0L, 1.0), ("a", 1L, 100.0), ("a", 2L, 2.0))
    val shuffled = Seq(("a", 2L, 2.0), ("a", 0L, 1.0), ("a", 1L, 100.0))
    assert(run(inOrder, 0.5)("a") == run(shuffled, 0.5)("a"))
    val want = (1.0 * 0.5 + 100.0 * 0.5) * 0.5 + 2.0 * 0.5
    assert(run(shuffled, 0.5)("a")._3 == want)
  }

  test("null values are excluded from the series on both count and fold") {
    val df = Seq(("a", 0L, Some(2.0)), ("a", 1L, None), ("a", 2L, Some(4.0)))
      .toDF("k", "t", "v")
    val r = Timeseries.ewma(df, Seq("k"), Seq(col("t")), "v", 0.25)
      .collect().head
    assert(r.getLong(1) == 2L)
    assert(r.getDouble(3) == 2.0 * 0.75 + 4.0 * 0.25)
  }

  test("keys fold independently") {
    val rows = Seq(("a", 0L, 1.0), ("b", 0L, 10.0),
      ("a", 1L, 3.0), ("b", 1L, 30.0))
    val got = run(rows, 0.25)
    assert(got("a")._3 == 1.0 * 0.75 + 3.0 * 0.25)
    assert(got("b")._3 == 10.0 * 0.75 + 30.0 * 0.25)
  }
}
