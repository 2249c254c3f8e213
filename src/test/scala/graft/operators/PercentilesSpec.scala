package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Percentiles.exactByHistogram must be value-identical to the built-in
  * exact `percentile` aggregate (it replaces it in q_text_quality_prune
  * purely for memory shape), and the approx_percentile variant's
  * selected row set must sit within the sketch's rank-error bound of
  * the exact query's.
  */
class PercentilesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("histogram percentile == built-in exact percentile (ties, dups, nulls)") {
    val vals: Seq[java.lang.Double] = Seq[java.lang.Double](
      5.0, 1.0, 3.0, 3.0, 3.0, 2.5, null, 9.0, 0.5, 0.5, 7.25, null, 4.0)
    val df = vals.toDF("x")
    for (p <- Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)) {
      val got = Percentiles.exactByHistogram(df, "x", p, "c")
        .collect()(0).getDouble(0)
      val want = df.agg(expr(s"percentile(x, $p)")).collect()(0).getDouble(0)
      assert(got == want, s"p=$p: histogram=$got builtin=$want")
    }
  }

  test("histogram percentile matches built-in on the real score column") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val toks = graft.functions.TextFns.tokens(col("text"))
    val scored = docs.select(
      (graft.functions.TextFns.countIn(toks, graft.functions.TextFns.enStopwords)
        / size(toks).cast("long")).as("r"))
    for (p <- Seq(0.25, 0.5, 0.9)) {
      val got = Percentiles.exactByHistogram(scored, "r", p, "c")
        .collect()(0).getDouble(0)
      val want = scored.agg(expr(s"percentile(r, $p)")).collect()(0).getDouble(0)
      assert(math.abs(got - want) < 1e-12, s"p=$p: $got vs $want")
    }
  }

  test("approx prune selects within rank-error of the exact prune") {
    def ids(q: String): Set[Long] =
      graft.Queries.all(q)(spark, sf).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val exact = ids("q_text_quality_prune")
    val approx = ids("q_text_quality_prune_approx")
    // The exact cutoff interpolates between adjacent order statistics
    // v_k, v_{k+1} (k = floor(0.25*(n-1))); an approx cutoff with
    // rank error < 1 must be one of them, so the selected sets can
    // differ ONLY by the rows tied at v_k. Assert both halves.
    val docs = graft.sources.Tables.documents(spark, sf)
    val toks = graft.functions.TextFns.tokens(col("text"))
    val scores = docs.select(
        (graft.functions.TextFns.countIn(toks, graft.functions.TextFns.enStopwords)
          / size(toks).cast("long")).as("r"))
      .collect().map(_.getDouble(0)).sorted
    val n = scores.length
    val k = math.floor(0.25 * (n - 1)).toInt
    val (vk, vk1) = (scores(k), scores(math.min(k + 1, n - 1)))
    // The query no longer emits the sketch cutoff (its contract is the
    // selected set, oracle-checked); re-derive it here from the same
    // sketch call to keep the adjacency assertion.
    val cutA = docs.select(
        (graft.functions.TextFns.countIn(toks, graft.functions.TextFns.enStopwords)
          / size(toks).cast("long")).as("r"))
      .agg(expr("approx_percentile(r, 0.25, 10000)"))
      .collect().headOption.map(_.getDouble(0))
    assert(cutA.forall(c => c >= vk && c <= vk1),
      s"approx cutoff $cutA outside adjacent order statistics [$vk, $vk1]")
    val symDiff = (exact -- approx) ++ (approx -- exact)
    val tiesAtVk = scores.count(_ == vk)
    assert(symDiff.size <= tiesAtVk,
      s"approx/exact selection differs by ${symDiff.size} rows; " +
        s"only the $tiesAtVk rows tied at v_k=$vk may differ")
  }

  test("grouped histogram percentiles == built-in grouped percentile") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val got = Percentiles.groupedExactByHistogram(
        li, Seq("l_returnflag"), "l_extendedprice",
        Seq(0.25 -> "p25", 0.5 -> "p50", 0.99 -> "p99"))
      .orderBy("l_returnflag").collect()
    val want = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.99))")
          .as("ps"),
        count(col("l_extendedprice")).as("n"))
      .orderBy("l_returnflag").collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0))
      val ps = w.getSeq[Double](1)
      for (i <- 0 until 3)
        assert(g.getDouble(1 + i) == ps(i),
          s"group ${g.getString(0)} p$i: ${g.getDouble(1 + i)} vs ${ps(i)}")
      assert(g.getLong(4) == w.getLong(2))
    }
  }

  test("grouped histogram percentiles: ties, nulls, single-value group") {
    val rows: Seq[(String, java.lang.Double)] = Seq(
      ("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", null), ("a", 9.0),
      ("b", 4.25), // single non-null value
      ("c", 3.0), ("c", null), ("c", 7.0))
    val df = rows.toDF("g", "x")
    val got = Percentiles.groupedExactByHistogram(
        df, Seq("g"), "x", Seq(0.0 -> "p0", 0.5 -> "p50", 1.0 -> "p100"))
      .orderBy("g").collect()
    val want = df.groupBy(col("g"))
      .agg(expr("percentile(x, array(0.0, 0.5, 1.0))").as("ps"),
        count(col("x")).as("n"))
      .orderBy("g").collect()
    got.zip(want).foreach { case (g, w) =>
      val ps = w.getSeq[Double](1)
      for (i <- 0 until 3)
        assert(g.getDouble(1 + i) == ps(i),
          s"group ${g.getString(0)}: ${g.getDouble(1 + i)} vs ${ps(i)}")
      assert(g.getLong(4) == w.getLong(2))
    }
  }

  test("weighted lower quantiles: nearest-rank on cumulative weight") {
    // values 1..4 with weights 1,1,6,2 (W=10): cum = 1,2,8,10
    val df = Seq((1.0, 1L), (2.0, 1L), (3.0, 6L), (4.0, 2L))
      .toDF("v", "w")
    val r = Percentiles.weightedLowerQuantiles(df, "v", "w",
      Seq((1, 10, "p10"), (1, 5, "p20"), (1, 2, "p50"),
        (4, 5, "p80"), (1, 1, "p100"))).collect().head
    assert(r.getDouble(0) == 1.0) // cum 1 >= 1
    assert(r.getDouble(1) == 2.0) // cum 2 >= 2
    assert(r.getDouble(2) == 3.0) // cum 8 >= 5
    assert(r.getDouble(3) == 3.0) // cum 8 >= 8 — exact boundary
    assert(r.getDouble(4) == 4.0)
    assert(r.getDouble(5) == 10.0) // total_weight
  }

  test("grouped weighted quantiles match the global operator per group") {
    val rows = Seq(("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 6L),
      ("a", 4.0, 2L), ("b", 10.0, 3L), ("b", 20.0, 1L))
    val df = rows.toDF("g", "v", "w")
    val grouped = Percentiles.weightedLowerQuantilesByGroup(
        df, Seq("g"), "v", "w", Seq((1, 2, "p50"), (4, 5, "p80")))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    for (g <- Seq("a", "b")) {
      val solo = Percentiles.weightedLowerQuantiles(
        df.filter(col("g") === g), "v", "w",
        Seq((1, 2, "p50"), (4, 5, "p80"))).collect().head
      assert(grouped(g) ==
        ((solo.getDouble(0), solo.getDouble(1), solo.getDouble(2))), g)
    }
  }

  test("weighted quantiles with unit weights match the unweighted nearest-rank") {
    val xs = Seq(5.0, 1.0, 9.0, 3.0, 7.0)
    val df = xs.map(x => (x, 1L)).toDF("v", "w")
    val r = Percentiles.weightedLowerQuantiles(df, "v", "w",
      Seq((1, 2, "p50"), (4, 5, "p80"))).collect().head
    val sorted = xs.sorted // nearest-rank: ceil(p·n)-th value
    assert(r.getDouble(0) == sorted(math.ceil(0.5 * xs.size).toInt - 1))
    assert(r.getDouble(1) == sorted(math.ceil(0.8 * xs.size).toInt - 1))
  }

  test("histogram catalog appends one day; merged quantiles are the true ones") {
    // The catalog-writer contract (the KMV/CM pattern): a second call
    // with ONLY the new day's rows must preserve prior partitions and
    // report quantiles over ALL stored days, bit-identical to the
    // built-in percentile over the whole period.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pctl_catalog").toString
    def day(d: String, vs: Seq[Double]) =
      vs.toDF("v").select(to_date(lit(d)).as("dt"), col("v"))
    val d1 = day("2024-01-01", Seq(1.0, 2.0, 2.0, 3.0, 50.0))
    val d2 = day("2024-01-02", Seq(2.0, 4.0, 4.0, 9.0))
    val d3 = day("2024-01-03", Seq(0.5, 6.0, 7.0))
    val ps = Seq(0.5 -> "p50", 0.9 -> "p90")
    def report(in: org.apache.spark.sql.DataFrame) =
      Percentiles.histogramCatalog(in, col("dt"), "v", ps, dir)
        .collect().head
    val first = report(d1.union(d2))
    assert(first.getLong(0) == 2L && first.getLong(3) == 9L)
    // second call: day 3 only — history must come from the lake
    val second = report(d3)
    assert(second.getLong(0) == 3L, "stored days lost on append")
    assert(second.getLong(3) == 12L, "merged n must span all days")
    val all = d1.union(d2).union(d3)
    val want = all.agg(
      expr("percentile(v, 0.5)"), expr("percentile(v, 0.9)"))
      .collect().head
    assert(second.getDouble(1) == want.getDouble(0) &&
      second.getDouble(2) == want.getDouble(1),
      "merged-catalog quantiles != built-in over the whole period")
  }

  test("histogramCatalog on an empty first input: null quantiles, n=0") {
    // r14 advice (the empty-catalog pin, distributions face): no days,
    // no rows, and the quantiles of nothing are null — not a parquet
    // schema-inference error on the partition-less dir.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pctl_catalog_empty").toString
    val empty = Seq.empty[(String, Double)].toDF("ds", "v")
      .select(to_date(col("ds")).as("dt"), col("v"))
    val rep = Percentiles.histogramCatalog(empty, col("dt"), "v",
      Seq(0.5 -> "p50", 0.9 -> "p90"), dir).collect()
    assert(rep.length == 1)
    assert(rep.head.getLong(0) == 0L)
    assert(rep.head.isNullAt(1) && rep.head.isNullAt(2))
    assert(rep.head.getLong(3) == 0L)
  }
}
