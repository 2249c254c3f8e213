package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MarkovAttributionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // user 1: view -> purchase; user 2: click -> view -> purchase;
  // user 3: click (no conversion). All within one session each.
  private def events = Seq(
    (1L, "2024-01-01 10:00:00", 1L, "view"),
    (1L, "2024-01-01 10:01:00", 2L, "purchase"),
    (2L, "2024-01-01 10:00:00", 3L, "click"),
    (2L, "2024-01-01 10:01:00", 4L, "view"),
    (2L, "2024-01-01 10:02:00", 5L, "purchase"),
    (3L, "2024-01-01 10:00:00", 6L, "click"))
    .toDF("user_id", "ts_s", "event_id", "event_type")
    .selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_id",
      "event_type")

  test("transitions include start rows and drop absorbing-from rows") {
    val t = MarkovAttribution.transitions(events, "user_id", "ts",
        "event_id", "event_type", 1800L, "purchase")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
      .toSet
    assert(t == Set(
      ("start", "view", 1L, 1.0 / 3),
      ("start", "click", 2L, 2.0 / 3),
      ("view", "purchase", 2L, 1.0),
      ("click", "view", 1L, 1.0)))
  }

  test("removal effects match the hand-computed chain") {
    // every journey converts (base = 1/3 + 2/3); removing click leaves
    // only the direct view path (1/3), removing view kills everything
    val t = MarkovAttribution.transitions(events, "user_id", "ts",
      "event_id", "event_type", 1800L, "purchase")
    val got = MarkovAttribution.removalEffects(t, "purchase",
        Seq("click", "view"), steps = 6)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
      .toMap
    val (cb, cr, ce, cs) = got("click")
    val (vb, vr, ve, vs) = got("view")
    assert(math.abs(cb - 1.0) < 1e-12 && math.abs(vb - 1.0) < 1e-12)
    assert(math.abs(cr - 1.0 / 3) < 1e-12) // only the direct view path
    assert(vr == 0.0)                      // no path converts
    assert(math.abs(ce - 2.0 / 3) < 1e-12 && math.abs(ve - 1.0) < 1e-12)
    assert(math.abs(cs - 0.4) < 1e-12 && math.abs(vs - 0.6) < 1e-12)
  }

  test("oversized state spaces are refused, not silently iterated") {
    val big = (0 until 5000).map(i => (s"s$i", s"t$i", 1L, 0.5))
      .toDF("from_type", "to_type", "n", "p")
    val e = intercept[IllegalArgumentException] {
      MarkovAttribution.removalEffects(big, "purchase", Seq("x"), 6)
    }
    assert(e.getMessage.contains("bounded taxonomy"))
  }
}
