package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.HashFns

class KMVSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // Two groups over a shared value domain, hashed with the portable
  // md5Long family — values engineered so the groups overlap.
  private def hashed(rows: Seq[(String, Int)]) =
    rows.toDF("g", "v")
      .select(col("g"), HashFns.md5Long(col("v").cast("string")).as("h"))

  private val aVals = (0 until 400).map(i => ("A", i))
  private val bVals = (200 until 600).map(i => ("B", i))

  test("sketch is the k smallest distinct hashes, ascending") {
    val k = 16
    val sk = KMV.sketch(hashed(aVals), "g", "h", k)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val expected = hashed(aVals).select("h").as[Long].collect()
      .distinct.sorted.take(k).toSeq
    assert(sk("A") == expected)
  }

  test("below k the sketch is the whole domain and the estimate exact") {
    val k = 1024
    val sk = KMV.sketch(hashed(aVals), "g", "h", k)
    val est = sk.select(KMV.estimateDistinct(col("kmins"), k))
      .as[Double].head()
    assert(est == 400.0)
    assert(sk.select(size(col("kmins"))).as[Int].head() == 400)
  }

  test("duplicate input rows cannot move the sketch (distinct law)") {
    val k = 16
    val dup = aVals ++ aVals ++ aVals.take(50)
    val s1 = KMV.sketch(hashed(aVals), "g", "h", k)
      .collect().map(_.getSeq[Long](1)).head
    val s2 = KMV.sketch(hashed(dup), "g", "h", k)
      .collect().map(_.getSeq[Long](1)).head
    assert(s1 == s2)
  }

  test("closed under union: merged k-mins ARE the union's sketch") {
    // The property the pairwise set-operation query rests on: taking
    // the k smallest of K(A) ∪ K(B) gives exactly the sketch that
    // would have been built over A ∪ B directly.
    val k = 32
    val both = KMV.sketch(hashed(aVals ++ bVals), "g", "h", k)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val unionDirect = KMV.sketch(
      hashed((aVals ++ bVals).map { case (_, v) => ("U", v) }),
      "g", "h", k).collect().map(_.getSeq[Long](1)).head
    val merged = (both("A") ++ both("B")).distinct.sorted.take(k)
    assert(merged == unionDirect)
  }

  test("sketchCatalog: appending a day merges against STORED sketches " +
      "without rescanning history") {
    // The 100 TB lifecycle contract: per-day sketches are write-once
    // lake artifacts; a later call with ONLY a new day's rows must
    // (a) preserve every prior day's stored sketch (dynamic partition
    // overwrite), and (b) answer the global distinct from the merged
    // stored arrays — equal to the sketch built over the full data
    // directly (closure under union).
    val k = 32
    val dir = java.nio.file.Files
      .createTempDirectory("graft_kmv_catalog").toString
    def day(d: String, vs: Range) =
      vs.map(v => (d, v)).toDF("day0", "v")
        .select(to_date(lit(d)).as("dt"),
          HashFns.md5Long(col("v").cast("string")).as("h"))
    val d1 = day("2024-01-01", 0 until 300)
    val d2 = day("2024-01-02", 150 until 450)
    val d3 = day("2024-01-03", 400 until 700)
    val first = KMV.sketchCatalog(d1.union(d2), col("dt"), "h", k, dir)
      .collect().head
    assert(first.getLong(0) == 2L) // n_days
    // second call: ONLY day 3's rows — history must not be rescanned
    // (the input frame simply doesn't contain it) yet the report
    // merges all three stored days
    val second = KMV.sketchCatalog(d3, col("dt"), "h", k, dir)
      .collect().head
    assert(second.getLong(0) == 3L, "stored days lost on append")
    assert(second.getLong(1) == 300L + 300L + 300L) // sum of per-day
    // exact face recomputes over the GIVEN frame (day 3 only) — the
    // documented certification contract
    assert(second.getLong(2) == 300L)
    // merged estimate == the estimate from a sketch built over ALL
    // days directly: the stored-array merge lost nothing
    val full = d1.union(d2).union(d3)
      .select(lit("g").as("g"), col("h"))
    val directEst = KMV.sketch(full, "g", "h", k)
      .select(KMV.estimateDistinct(col("kmins"), k)).as[Double].head()
    assert(second.getDouble(3) == directEst,
      s"merged-catalog estimate ${second.getDouble(3)} != direct $directEst")
  }

  test("estimates land within the KMV error envelope") {
    // 400 distinct values, k=64: σ ≈ D/√(k−2) ≈ 51. Assert a loose
    // 4σ band — deterministic data, so this pins the estimator math
    // (a formula bug lands far outside, not marginally).
    val k = 64
    val est = KMV.sketch(hashed(aVals), "g", "h", k)
      .select(KMV.estimateDistinct(col("kmins"), k)).as[Double].head()
    assert(math.abs(est - 400.0) < 4 * 400.0 / math.sqrt(k - 2.0),
      s"estimate $est outside the 4σ envelope around 400")
  }

  test("sketchCatalog on an empty first input: zero report, not a read error") {
    // r14 advice (mirrors CountMinSpec's empty-catalog pin): empty
    // input must short-circuit to the valid empty state — 0 days,
    // 0 distincts — instead of crashing on the partition-less dir.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_kmv_catalog_empty").toString
    val empty = Seq.empty[(String, Long)].toDF("ds", "h")
      .select(to_date(col("ds")).as("dt"), col("h"))
    val rep = KMV.sketchCatalog(empty, col("dt"), "h", 8, dir).collect()
    assert(rep.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq == Seq((0L, 0L, 0L, 0.0)))
  }
}
