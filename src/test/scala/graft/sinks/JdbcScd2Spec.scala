package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Jdbc.scd2Upsert: incremental type-2 dimension maintenance on Derby —
  * bootstrap, state-change close+insert, no-change no-op, and the
  * replay-idempotency claim from the scaladoc, each asserted on the
  * actual table contents.
  */
class JdbcScd2Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("scd2Upsert: bootstrap, close-on-change, no-op on no-change, replay-safe") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft_scd2")
    val url = s"jdbc:derby:$dbDir/scd2db;create=true"

    def snapshot(): Seq[(Long, String, java.sql.Date, Option[java.sql.Date], Boolean)] =
      Jdbc.query(spark, url,
          """SELECT "cust", CAST("tier" AS VARCHAR(64)) AS "tier",
            |"valid_from", "valid_to", "is_current" FROM dim_cust""".stripMargin)
        .collect()
        .map(r => (r.getAs[Number]("cust").longValue(), r.getAs[String]("tier"),
          r.getAs[java.sql.Date]("valid_from"),
          Option(r.getAs[java.sql.Date]("valid_to")),
          r.getAs[Boolean]("is_current")))
        .toSeq.sortBy(t => (t._1, t._3.toString))

    // batch 1 bootstraps the dimension
    val b1 = Seq((1L, "gold", d("2024-01-01")), (2L, "silver", d("2024-01-01")))
      .toDF("cust", "tier", "ts")
    Jdbc.scd2Upsert(b1, url, "dim_cust", Seq("cust"), Seq("tier"), "ts")
    assert(snapshot() == Seq(
      (1L, "gold", d("2024-01-01"), None, true),
      (2L, "silver", d("2024-01-01"), None, true)))

    // batch 2: cust 1 changes, cust 2 unchanged, cust 3 is new
    val b2 = Seq((1L, "plat", d("2024-02-01")), (2L, "silver", d("2024-02-01")),
        (3L, "gold", d("2024-02-01")))
      .toDF("cust", "tier", "ts")
    Jdbc.scd2Upsert(b2, url, "dim_cust", Seq("cust"), Seq("tier"), "ts")
    val afterB2 = Seq(
      (1L, "gold", d("2024-01-01"), Some(d("2024-02-01")), false),
      (1L, "plat", d("2024-02-01"), None, true),
      (2L, "silver", d("2024-01-01"), None, true),
      (3L, "gold", d("2024-02-01"), None, true))
    assert(snapshot() == afterB2)

    // crash-replay of batch 2: states equal the open rows, so the
    // close-MERGE matches nothing and the insert sees the open rows —
    // the table must be byte-identical
    Jdbc.scd2Upsert(b2, url, "dim_cust", Seq("cust"), Seq("tier"), "ts")
    assert(snapshot() == afterB2, "replayed batch mutated the dimension")
  }

  test("scd2Upsert: null attribute states are real states (null-safe compare)") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft_scd2n")
    val url = s"jdbc:derby:$dbDir/scd2ndb;create=true"
    val rows1: Seq[(Long, Option[String], java.sql.Date)] =
      Seq((1L, None, d("2024-01-01")))
    Jdbc.scd2Upsert(rows1.toDF("cust", "tier", "ts"), url, "dim_n",
      Seq("cust"), Seq("tier"), "ts")
    // null -> gold is a change (closes the null interval)
    val rows2: Seq[(Long, Option[String], java.sql.Date)] =
      Seq((1L, Some("gold"), d("2024-02-01")))
    Jdbc.scd2Upsert(rows2.toDF("cust", "tier", "ts"), url, "dim_n",
      Seq("cust"), Seq("tier"), "ts")
    // gold -> null is a change too
    val rows3: Seq[(Long, Option[String], java.sql.Date)] =
      Seq((1L, None, d("2024-03-01")))
    Jdbc.scd2Upsert(rows3.toDF("cust", "tier", "ts"), url, "dim_n",
      Seq("cust"), Seq("tier"), "ts")
    val n = Jdbc.query(spark, url,
        """SELECT COUNT(*) AS n FROM dim_n""").head().getAs[Number](0).longValue()
    val open = Jdbc.query(spark, url,
        """SELECT COUNT(*) AS n FROM dim_n WHERE "is_current" = TRUE""")
      .head().getAs[Number](0).longValue()
    assert(n == 3L, s"expected 3 intervals, got $n")
    assert(open == 1L, s"expected 1 open row, got $open")
  }
}
