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

  test("catalog appends one day and answers from all stored grids") {
    // Mirror of KMVSpec's catalog contract: a second call with ONLY the
    // new day's rows must preserve prior partitions (dynamic overwrite)
    // and report estimates over the MERGED stored grids equal to a
    // sketch built over the whole corpus directly.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cm_catalog").toString
    def day(d: String, keys: Seq[String]) =
      keys.toDF("__key").select(to_date(lit(d)).as("dt"), col("__key"))
    val d1 = day("2024-01-01", Seq.fill(30)("alpha") ++ Seq.fill(4)("beta"))
    val d2 = day("2024-01-02", Seq.fill(25)("alpha") ++ Seq.fill(9)("beta"))
    val d3 = day("2024-01-03", Seq.fill(11)("alpha") ++ Seq("gamma"))
    def report(in: org.apache.spark.sql.DataFrame) =
      CountMin.sketchCatalog(in, col("dt"), "__key", 3, 64, 2, dir)
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSeq
    val first = report(d1.union(d2))
    assert(first.map(_._1) == Seq(2L, 2L), "n_days after two days")
    // second call: day 3 only — history must come from the lake
    val second = report(d3)
    assert(second.map(_._1) == Seq(3L, 3L), "stored days lost on append")
    // exact face recomputes over the GIVEN frame (day 3 only)...
    assert(second.map(t => (t._2, t._3)) ==
      Seq(("alpha", 11L), ("gamma", 1L)))
    // ...but the estimates come from ALL THREE stored grids: alpha's
    // merged cell floor is its whole-corpus count (one-sided >= 66).
    val alphaEst = second.find(_._2 == "alpha").get._4
    assert(alphaEst >= 66L, s"merged estimate $alphaEst lost stored days")
    // and equals the estimate from one grid built over everything
    val direct = CountMin.estimate(
      Seq("alpha").toDF("key"), "key",
      CountMin.sketch(d1.union(d2).union(d3).withColumnRenamed(
        "__key", "key"), "key", 3, 64), 3, 64)
      .collect().head.getLong(1)
    assert(alphaEst == direct,
      s"merged-catalog estimate $alphaEst != direct $direct")
  }

  test("catalog on an empty first input: empty report, not a read error") {
    // r14 advice: an empty first input left a partition-less dir that
    // the immediate read-back rejected with a schema-inference error.
    // A never-written catalog is a valid state (the streaming readers'
    // convention): no days, no probes, schema intact.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cm_catalog_empty").toString
    val empty = Seq.empty[(String, String)].toDF("ds", "__key")
      .select(to_date(col("ds")).as("dt"), col("__key"))
    val rep = CountMin.sketchCatalog(empty, col("dt"), "__key", 3, 64, 2, dir)
    assert(rep.columns.toSeq ==
      Seq("n_days", "key", "exact_n", "cm_estimate", "over_count"))
    assert(rep.count() == 0)
    // and a later real day proceeds normally from the same dir
    val d1 = Seq.fill(5)("alpha").toDF("__key")
      .select(to_date(lit("2024-01-01")).as("dt"), col("__key"))
    val after = CountMin.sketchCatalog(d1, col("dt"), "__key", 3, 64, 2, dir)
      .collect()
    assert(after.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq == Seq((1L, "alpha", 5L)))
  }
}
