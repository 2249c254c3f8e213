package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SnapshotDiffSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C"),
    (4L, 40.0, null.asInstanceOf[String]))
    .toDF("k", "price", "status")
  private val newSnap = Seq(
    (1L, 10.0, "A"),                      // unchanged -> dropped
    (2L, 25.0, "B"),                      // price update
    (4L, 40.0, "D"),                      // null -> D update
    (5L, 50.0, "E"))                      // insert; 3 deleted
    .toDF("k", "price", "status")

  test("classifies insert/delete/update and drops unchanged") {
    val out = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"),
        Seq("price", "status"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq(2L -> "update", 3L -> "delete",
      4L -> "update", 5L -> "insert"))
  }

  test("null-safe compare: null -> null is unchanged, null -> value is update") {
    val o = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("k", "v")
    val n = Seq((1L, null.asInstanceOf[String]), (2L, "x")).toDF("k", "v")
    val out = SnapshotDiff.diff(o, n, Seq("k"), Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq(2L -> "update"))
  }

  test("old/new column pairs carry the values from each side") {
    val row = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"),
        Seq("price", "status"))
      .filter("k = 2").collect().head
    assert(row.getDouble(row.fieldIndex("old_price")) == 20.0)
    assert(row.getDouble(row.fieldIndex("new_price")) == 25.0)
  }
}
