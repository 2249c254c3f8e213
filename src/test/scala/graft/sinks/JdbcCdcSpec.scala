package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.SnapshotDiff

/** The snapshot-CDC lifecycle end-to-end on Derby: SnapshotDiff recovers
  * the change stream from two snapshots, Jdbc.applyCdc applies it, and
  * the warehouse table must land EXACTLY on the new snapshot. Plus the
  * scaladoc's replay-idempotency claim, asserted on table contents.
  */
class JdbcCdcSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("diff -> applyCdc reproduces the new snapshot; replay is a no-op") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft_cdc")
    val url = s"jdbc:derby:$dbDir/cdcdb;create=true"

    val oldSnap = Seq((1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C"))
      .toDF("k", "price", "status")
    val newSnap = Seq((1L, 10.0, "A"), (2L, 25.0, "B"), (4L, 40.0, "D"))
      .toDF("k", "price", "status")

    def tableRows(): Seq[(Long, Double, String)] =
      Jdbc.query(spark, url,
          """SELECT "k", "price", CAST("status" AS VARCHAR(16)) AS "status"
            |FROM tgt""".stripMargin)
        .collect()
        .map(r => (r.getAs[Number]("k").longValue(),
          r.getAs[Number]("price").doubleValue(),
          r.getAs[String]("status")))
        .toSeq.sortBy(_._1)

    // bootstrap the warehouse at the old snapshot
    Jdbc.load(oldSnap, url, "tgt", ifExists = "replace")
    assert(tableRows() == Seq((1L, 10.0, "A"), (2L, 20.0, "B"),
      (3L, 30.0, "C")))

    val changes = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"),
      Seq("price", "status"))
    Jdbc.applyCdc(changes, url, "tgt", Seq("k"), Seq("price", "status"))
    val want = Seq((1L, 10.0, "A"), (2L, 25.0, "B"), (4L, 40.0, "D"))
    assert(tableRows() == want)

    // replay the same batch: deletes miss, updates/inserts set same values
    Jdbc.applyCdc(changes, url, "tgt", Seq("k"), Seq("price", "status"))
    assert(tableRows() == want)
  }

  test("applyCdc bootstraps a missing target from the non-delete rows") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft_cdc_boot")
    val url = s"jdbc:derby:$dbDir/cdcdb;create=true"
    val changes = SnapshotDiff.diff(
      Seq((9L, 1.0)).toDF("k", "v"),           // old: key 9 only
      Seq((5L, 2.0)).toDF("k", "v"),           // new: key 5 only
      Seq("k"), Seq("v"))                      // -> insert 5, delete 9
    Jdbc.applyCdc(changes, url, "boot", Seq("k"), Seq("v"))
    val got = Jdbc.query(spark, url, """SELECT "k", "v" FROM boot""")
      .collect().map(r => (r.getAs[Number]("k").longValue(),
        r.getAs[Number]("v").doubleValue())).toSeq
    assert(got == Seq((5L, 2.0)))
  }
}
