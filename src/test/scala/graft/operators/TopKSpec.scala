package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TopKSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq(
    ("a", 5.0, 1L), ("a", 9.0, 2L), ("a", 9.0, 3L), ("a", 1.0, 4L),
    ("a", 7.0, 5L), ("b", 2.0, 6L), ("b", 2.0, 7L), ("c", 3.0, 8L))

  private def agg(df: org.apache.spark.sql.DataFrame, k: Int) =
    TopK.topKPerGroupAgg(df, Seq("g"), "v", "id", k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))

  test("matches the window top-k exactly, ties by id") {
    val df = rows.toDF("g", "v", "id")
    val got = agg(df, 2)
    assert(got.toSeq == Seq(
      ("a", 1L, 9.0, 2L), ("a", 2L, 9.0, 3L),  // tie at 9.0: lower id first
      ("b", 1L, 2.0, 6L), ("b", 2L, 2.0, 7L),
      ("c", 1L, 3.0, 8L)))
    val win = Windows.topKPerGroup(df, Seq(col("g")),
        Seq(col("v").desc, col("id")), 2)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(got.map(t => (t._1, t._3, t._4)).toSet == win)
  }

  test("partition-invariant: partial buffers merge to the same answer") {
    val df = rows.toDF("g", "v", "id")
    assert(agg(df, 2).toSeq == agg(df.repartition(7), 2).toSeq)
    assert(agg(df, 2).toSeq == agg(df.repartition(1), 2).toSeq)
  }

  test("k larger than the group returns the whole group ranked") {
    val got = agg(rows.toDF("g", "v", "id"), 10)
    assert(got.count(_._1 == "a") == 5)
    assert(got.filter(_._1 == "a").map(_._2).toSeq == (1L to 5L))
  }

  test("null values drop out instead of ranking") {
    val df = Seq(("a", Some(5.0), 1L), ("a", None, 2L), ("a", Some(3.0), 3L))
      .toDF("g", "v", "id")
    val got = agg(df, 3)
    assert(got.map(_._4).toSeq == Seq(1L, 3L))
  }

  test("kMinPairsPerGroup matches the (hash, id)-ranked window exactly") {
    // The long-exact sibling used by negative sampling: ascending
    // (hash, id) with hash values ABOVE 2^53, where a double-keyed
    // rank would collapse distinct hashes.
    val big = (1L << 60) - 1
    val prs = Seq(
      ("a", big, 1L), ("a", big - 1, 2L), ("a", big, 3L), ("a", 5L, 4L),
      ("b", 7L, 5L), ("b", 7L, 6L), ("c", 0L, 7L))
    val df = prs.toDF("g", "h", "id")
    val got = TopK.kMinPairsPerGroup(df, Seq("g"), "h", "id", 2, "rk")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      ("a", 1L, 5L, 4L), ("a", 2L, big - 1, 2L), // big-1 beats big: long-exact
      ("b", 1L, 7L, 5L), ("b", 2L, 7L, 6L),      // hash tie: lower id first
      ("c", 1L, 0L, 7L)))
    val win = Windows.topKPerGroupRanked(df, Seq(col("g")),
        Seq(col("h"), col("id")), 2, "rk")
      .select(col("g"), col("rk").cast("long"), col("h"), col("id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got.toSet == win)
    // partition-invariance (the partial-aggregation law)
    val got7 = TopK.kMinPairsPerGroup(df.repartition(7), Seq("g"), "h",
        "id", 2, "rk")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == got7.toSeq)
  }
}
