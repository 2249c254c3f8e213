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

  test("holtLinear matches the sequential recurrence exactly") {
    val xs = Seq(2.0, 4.0, 3.0, 8.0, 5.0)
    val (a, b) = (0.5, 0.25)
    var l = xs.head; var t = 0.0
    xs.tail.foreach { x =>
      val lNew = x * a + (l + t) * (1.0 - a)
      t = (lNew - l) * b + t * (1.0 - b); l = lNew
    }
    val r = Timeseries.holtLinear(
        xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
          .toDF("k", "ord", "v"),
        Seq("k"), Seq(col("ord")), "v", a, b)
      .collect().head
    assert(r.getLong(1) == xs.size)
    assert(r.getDouble(2) == l)
    assert(r.getDouble(3) == t)
    assert(r.getDouble(4) == l + t)
  }

  test("holtLinear tracks an exact linear series: forecast == next point") {
    // y = 3 + 2i: after enough steps level+trend converges onto the
    // line for this exact-binary data; with alpha=0.5/beta=0.5 and
    // integer grid the fold is exact arithmetic, so check recurrence
    // convergence loosely
    val xs = (0 until 20).map(i => 3.0 + 2.0 * i)
    val r = Timeseries.holtLinear(
        xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
          .toDF("k", "ord", "v"),
        Seq("k"), Seq(col("ord")), "v", 0.5, 0.5)
      .collect().head
    assert(math.abs(r.getDouble(4) - (3.0 + 2.0 * 20)) < 0.05)
  }

  test("olsByGroup recovers an exact linear relation per group") {
    // y = 3x + 7 for group a, y = -2x + 100 for group b (exact doubles)
    val rows = for {
      (k, m, c) <- Seq(("a", 3.0, 7.0), ("b", -2.0, 100.0))
      x <- 1 to 10
    } yield (k, x.toDouble, m * x + c)
    val got = Timeseries.olsByGroup(rows.toDF("k", "x", "y"),
        Seq("k"), "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got("a") == ((10L, 3.0, 7.0)))
    assert(got("b") == ((10L, -2.0, 100.0)))
  }

  test("interpolateLinear fills interior gaps by day fraction, edges by extension") {
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    val rows: Seq[(String, Date, java.lang.Double)] = Seq(
      ("u", d("2024-01-01"), null),        // leading edge -> bfill 10
      ("u", d("2024-01-02"), 10.0),
      ("u", d("2024-01-03"), null),        // 10 + (40-10)*1/3 = 20
      ("u", d("2024-01-04"), null),        // 10 + (40-10)*2/3 = 30
      ("u", d("2024-01-05"), 40.0),
      ("u", d("2024-01-06"), null))        // trailing edge -> ffill 40
    val got = Timeseries.interpolateLinear(rows.toDF("k", "day", "v"),
        Seq("k"), "day", "v")
      .orderBy("day").collect().map(_.getDouble(3)).toSeq
    assert(got == Seq(10.0, 10.0, 20.0, 30.0, 40.0, 40.0))
  }

  test("interpolateLinear: all-null key stays null; keys are independent") {
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    val rows: Seq[(String, Date, java.lang.Double)] = Seq(
      ("a", d("2024-01-01"), 1.0), ("a", d("2024-01-02"), null),
      ("a", d("2024-01-03"), 3.0),
      ("b", d("2024-01-01"), null), ("b", d("2024-01-02"), null))
    val got = Timeseries.interpolateLinear(rows.toDF("k", "day", "v"),
        Seq("k"), "day", "v")
      .orderBy("k", "day").collect()
      .map(r => (r.getString(0), Option(r.get(3)))).toSeq
    assert(got == Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("b", None), ("b", None)))
  }

  test("olsByGroup matches the closed form on noisy grid data") {
    // 2-decimal-grid y values, like prices: moments stay exact decimals
    val rows = Seq(1.0 -> 2.25, 2.0 -> 3.75, 3.0 -> 3.5, 4.0 -> 6.0,
      5.0 -> 7.25).map { case (x, y) => ("g", x, y) }
    val n = rows.size.toDouble
    val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
    val sxx = rows.map(r => r._2 * r._2).sum
    val sxy = rows.map(r => r._2 * r._3).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    val r = Timeseries.olsByGroup(rows.toDF("k", "x", "y"),
      Seq("k"), "x", "y").collect().head
    assert(math.abs(r.getDouble(2) - slope) < 1e-12)
    assert(math.abs(r.getDouble(3) - intercept) < 1e-12)
  }

  test("acf matches hand-computed values on an alternating series") {
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    // x=[1,2,1,2] daily: n=4, S=6, dev=4x-6=[-2,2,-2,2], den=16
    // lag1: (-2·2)+(2·-2)+(-2·2) = -12 -> r=-0.75; lag2: 8 -> 0.5
    val rows = Seq(1L, 2L, 1L, 2L).zipWithIndex.map { case (x, i) =>
      (d(f"2024-01-${i + 1}%02d"), x)
    }
    val got = Timeseries.acf(rows.toDF("day", "x"), "day", "x", maxLag = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 3L, -0.75), (2L, 2L, 0.5),
      (3L, 1L, -0.25)))
  }

  test("acf skips pairs across a missing day (calendar-lag convention)") {
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    // days 1,2,4: lag-1 pairs are only (1,2) — (2,3)/(3,4) don't exist
    val rows = Seq(("2024-01-01", 1L), ("2024-01-02", 2L),
      ("2024-01-04", 3L)).map { case (s, x) => (d(s), x) }
    val got = Timeseries.acf(rows.toDF("day", "x"), "day", "x", maxLag = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) == 1L) // only (day1, day2)
    assert(got(2L) == 1L) // only (day2, day4); (day1, day3) is broken
  }

  test("cusum peaks at the step day with exact integer running sums") {
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    // x=[0,0,0,10,10,10]: n=6, S=30, dev=6x-30=[-30]*3 ++ [30]*3
    // cs=[-30,-60,-90,-60,-30,0] -> unique peak |−90| at day 3
    val rows = (1 to 6).map(i =>
      (d(f"2024-01-$i%02d"), if (i <= 3) 0L else 10L))
    val got = Timeseries.cusum(rows.toDF("day", "x"), "day", "x")
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(-30L, -60L, -90L, -60L, -30L, 0L))
    assert(got.map(_._2).toSeq == Seq(0L, 0L, 1L, 0L, 0L, 0L))
  }

  test("theilSen ignores the outlier day OLS would chase") {
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    // x=[1,2,3,4,100] on days 0..4: 6 of the 10 pairwise slopes are 1,
    // so the median slope is 1; residuals [1,1,1,1,96] -> intercept 1
    val rows = Seq(1L, 2L, 3L, 4L, 100L).zipWithIndex.map { case (x, i) =>
      (d(f"2024-01-${i + 1}%02d"), x)
    }
    val r = Timeseries.theilSen(rows.toDF("day", "x"), "day", "x")
      .collect().head
    assert(r.getLong(0) == 5L)         // n_days
    assert(r.getLong(1) == 10L)        // n_pairs
    assert(r.getDouble(2) == 1.0)      // slope
    assert(r.getDouble(3) == 1.0)      // intercept
  }

  test("theilSen even-count median averages the two middle slopes") {
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    // x=[0,1,3] -> slopes (0,1):1, (1,2):2, (0,2):1.5; m=3 odd -> 1.5
    // then drop to 2 points x=[0,2] -> single slope 2 (m=1 path)
    val r3 = Timeseries.theilSen(
      Seq(0L, 1L, 3L).zipWithIndex.map { case (x, i) =>
        (d(f"2024-01-${i + 1}%02d"), x)
      }.toDF("day", "x"), "day", "x").collect().head
    assert(r3.getDouble(2) == 1.5)
    val r2 = Timeseries.theilSen(
      Seq(0L, 2L).zipWithIndex.map { case (x, i) =>
        (d(f"2024-01-${i + 1}%02d"), x)
      }.toDF("day", "x"), "day", "x").collect().head
    assert(r2.getLong(1) == 1L && r2.getDouble(2) == 2.0)
  }
}
