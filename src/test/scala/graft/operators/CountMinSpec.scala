package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CountMinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val items = (Seq.fill(20)("alpha") ++ Seq.fill(9)("beta") ++
    Seq.fill(3)("gamma") ++ Seq("delta", "epsilon", "zeta"))
    .toDF("key")

  test("estimates are one-sided: never below the true count") {
    // Tiny width forces collisions, so overshoot is likely — but the
    // min-of-rows estimate can never undershoot, whatever collides.
    val sk = CountMin.sketch(items, "key", depth = 3, width = 4)
    val exact = items.groupBy("key").agg(count(lit(1)).as("exact_n"))
    val est = CountMin.estimate(exact, "key", sk, depth = 3, width = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.length == 6)
    est.foreach { case (k, n, e) =>
      assert(e >= n, s"$k: estimate $e undershot exact $n") }
  }

  test("wide sketch with few keys is exact") {
    val sk = CountMin.sketch(items, "key", depth = 3, width = 4096)
    val exact = items.groupBy("key").agg(count(lit(1)).as("exact_n"))
    val est = CountMin.estimate(exact, "key", sk, depth = 3, width = 4096)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // 6 keys across 3×4096 cells: a 3-way simultaneous collision on all
    // rows is what it would take to overshoot — assert exactness.
    est.foreach { case (n, e) => assert(e == n) }
  }

  test("sketches merge by cell-wise addition (partial-agg law)") {
    // sketch(A ++ B) must equal the cell-wise sum of sketch(A) and
    // sketch(B) — the property that makes the build safe under Spark's
    // partial aggregation and incremental under batch union.
    val a = items.limit(15)
    val b = items.exceptAll(a)
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Long] =
      df.collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val whole = cells(CountMin.sketch(items, "key", 3, 8))
    val partA = cells(CountMin.sketch(a, "key", 3, 8))
    val partB = cells(CountMin.sketch(b, "key", 3, 8))
    val merged = (partA.keySet ++ partB.keySet).map(k =>
      k -> (partA.getOrElse(k, 0L) + partB.getOrElse(k, 0L))).toMap
    assert(whole == merged)
  }
}
