package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Dedup (U2/A10), Windows (W1–W4), Scaffold (J2), Profile (P3/P4),
  * Sessionize — determinism and exact expected rows on small frames.
  */
class OperatorsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val sales = Seq(
    // key, seq, value
    ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 5.0),
    ("b", 1, 7.0), ("b", 2, 7.0)).toDF("k", "seq", "v")

  test("U2 keepFirst keeps the first row per key under the total order") {
    val r = Dedup.keepFirst(sales, Seq("k"), Seq(col("seq")))
      .orderBy("k").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(r == Seq(("a", 1), ("b", 1)))
  }

  test("keepFirst is idempotent and order-insensitive") {
    val once = Dedup.keepFirst(sales, Seq("k"), Seq(col("seq")))
    val twice = Dedup.keepFirst(once, Seq("k"), Seq(col("seq")))
    assert(once.orderBy("k", "seq").collect().toSeq ==
           twice.orderBy("k", "seq").collect().toSeq)
    val shuffled = Dedup.keepFirst(
      sales.orderBy(rand(seed = 7)).repartition(3), Seq("k"), Seq(col("seq")))
    assert(shuffled.orderBy("k", "seq").collect().toSeq ==
           once.orderBy("k", "seq").collect().toSeq)
  }

  test("A10 keepLatest takes the max-ordered row with tiebreak") {
    val r = Dedup.keepLatest(sales, Seq("k"), col("v"), Seq(col("seq")))
      .orderBy("k").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    // b has tied v=7.0 -> tiebreak seq DESC would keep seq=2? No: keepLatest
    // orders by v DESC then the caller tiebreak ASC (seq) -> seq=1.
    assert(r == Seq(("a", 2), ("b", 1)))
  }

  test("helper columns never collide with input columns") {
    val tricky = sales.withColumn("__rn", lit(99))
    val r = Dedup.keepFirst(tricky, Seq("k"), Seq(col("seq")))
    assert(r.columns.count(_ == "__rn") == 1) // input survives untouched
    assert(r.filter(col("__rn") =!= 99).count() == 0)
  }

  test("keepFirstAgg == keepFirst under a total order, any partitioning") {
    val w = Dedup.keepFirst(sales, Seq("k"), Seq(col("seq")))
      .orderBy("k", "seq").collect().toSeq
    val a = Dedup.keepFirstAgg(sales, Seq("k"), Seq(col("seq")))
      .orderBy("k", "seq").collect().toSeq
    assert(a == w)
    assert(a.head.schema.fieldNames.toSeq == Seq("k", "seq", "v"))
    val shuffled = Dedup.keepFirstAgg(
      sales.orderBy(rand(seed = 11)).repartition(5), Seq("k"), Seq(col("seq")))
      .orderBy("k", "seq").collect().toSeq
    assert(shuffled == w)
  }

  test("keepFirstAgg handles null order values like the window (nulls first)") {
    val rows: Seq[(String, java.lang.Integer, Double)] = Seq(
      ("a", null, 1.0), ("a", 1, 2.0), ("b", 2, 3.0))
    val df = rows.toDF("k", "seq", "v")
    val w = Dedup.keepFirst(df, Seq("k"), Seq(col("seq")))
      .orderBy("k").collect().toSeq
    val a = Dedup.keepFirstAgg(df, Seq("k"), Seq(col("seq")))
      .orderBy("k").collect().toSeq
    assert(a == w)
  }

  test("keepLatestAgg takes the argmax row per key") {
    val uniq = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 7.0))
      .toDF("k", "seq", "v")
    val r = Dedup.keepLatestAgg(uniq, Seq("k"), col("v"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(r == Seq(("a", 2), ("b", 1)))
  }

  test("keepFirstAgg helper struct never collides with input columns") {
    val tricky = sales.withColumn("__r", lit(42))
    val r = Dedup.keepFirstAgg(tricky, Seq("k"), Seq(col("seq")))
    assert(r.columns.count(_ == "__r") == 1)
    assert(r.filter(col("__r") =!= 42).count() == 0)
  }

  test("Scd2 compacts a change log into intervals, null-state aware") {
    val log: Seq[(String, Int, String)] = Seq(
      ("k1", 1, "a"), ("k1", 2, "a"),   // consecutive equal -> compact
      ("k1", 3, "b"),                   // change point
      ("k1", 4, null), ("k1", 5, null), // null state: real, compacts
      ("k1", 6, "a"),                   // back to a -> NEW interval
      ("k2", 1, "x"))
    val df = log.toDF("k", "t", "s")
    val r = Scd2.fromChangeLog(df, Seq("k"), Seq("s"), "t")
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3), r.getBoolean(4)))
      .toSeq
    assert(r == Seq(
      ("k1", "a", 1, 3, false),
      ("k1", "b", 3, 4, false),
      ("k1", null, 4, 6, false),
      ("k1", "a", 6, -1, true),
      ("k2", "x", 1, -1, true)))
  }

  test("exactByContent dedups identical bodies, keeps smallest id") {
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("id", "body")
    val r = Dedup.exactByContent(docs, "body", "id")
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(r == Seq(1L, 3L))
  }

  test("W1 runningSum follows the declared total order") {
    val r = sales.select(col("k"), col("seq"),
        Windows.runningSum(col("v"), Seq(col("k")), Seq(col("seq"))).as("cum"))
      .orderBy("k", "seq").collect().map(_.getDouble(2)).toSeq
    assert(r == Seq(10.0, 30.0, 35.0, 7.0, 14.0))
  }

  test("W2 lagWithDefault fills the first row per group") {
    val r = sales.select(col("k"), col("seq"),
        Windows.lagWithDefault(col("v"), Seq(col("k")), Seq(col("seq")), 0.0)
          .as("prev"))
      .orderBy("k", "seq").collect().map(_.getDouble(2)).toSeq
    assert(r == Seq(0.0, 10.0, 20.0, 0.0, 7.0))
  }

  test("W3 forwardFill carries the last non-null forward") {
    val gaps = Seq(("a", 1, Some(5.0)), ("a", 2, None), ("a", 3, None),
                   ("a", 4, Some(9.0)), ("a", 5, None))
      .toDF("k", "seq", "v")
    val r = gaps.select(col("seq"),
        Windows.forwardFill(col("v"), Seq(col("k")), Seq(col("seq"))).as("f"))
      .orderBy("seq").collect().map(_.getDouble(1)).toSeq
    assert(r == Seq(5.0, 5.0, 5.0, 9.0, 9.0))
  }

  test("W3-at-scale forwardFillDistributed equals the single-window fill") {
    val n = 500
    val data = (1 to n).map { i =>
      (i.toLong, if (i % 7 == 0) Some(i.toDouble) else None)
    }
    val df = data.toDF("seq", "v")
    val expected = df.select(col("seq"),
        Windows.forwardFill(col("v"), Nil, Seq(col("seq"))).as("v"))
      .orderBy("seq").collect().map(_.get(1)).toSeq
    val got = Windows.forwardFillDistributed(df, "v", Seq(col("seq")),
        bucket = col("seq") / 50)
      .orderBy("seq").collect().map(_.get(1)).toSeq
    assert(got == expected)
    // leading nulls (before the first non-null anywhere) stay null
    assert(got.take(6).forall(_ == null))
  }

  test("O2 topKPerGroup returns exactly k deterministic rows per group") {
    val r = Windows.topKPerGroup(sales, Seq(col("k")),
        Seq(col("v").desc, col("seq")), 2)
      .orderBy("k", "seq").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(r == Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)))
  }

  test("J2 dateSpine is dense: datediff+1 rows, no gaps") {
    val df = Seq("2024-01-30", "2024-02-02", "2024-02-01")
      .toDF("d").select(to_date(col("d")).as("d"))
    val spine = Scaffold.dateSpine(df, "d")
    assert(spine.count() == 4)
    val dates = spine.orderBy("spine_date").collect().map(_.getDate(0).toString)
    assert(dates.toSeq == Seq("2024-01-30", "2024-01-31", "2024-02-01", "2024-02-02"))
  }

  test("Profile HLL mode agrees with exact mode on pruning decisions") {
    // approx_count_distinct only needs to distinguish 0/1/many for the
    // pruning decision; assert the decisions match exact mode
    val df = graft.sources.Tables.orders(TestSpark.spark,
        "/root/testdata/sf0.001")
      .withColumn("dead", lit(null).cast("int"))
      .withColumn("const", lit(1))
    val exact  = Profile.pruneUninformative(df, exact = true).columns.toSeq
    val approx = Profile.pruneUninformative(df, exact = false).columns.toSeq
    assert(exact == approx)
  }

  test("Bloom prefilter: zero false negatives, bounded false positives") {
    val members = (0L until 2000L).toDF("k")
    val filter = Bloom.buildLongFilter(members, "k", fpp = 0.01)
    val kept = members.filter(Bloom.mightContain(filter, col("k"))).count()
    assert(kept == 2000L, "bloom filter dropped a true member")
    val nonMembers = (100000L until 120000L).toDF("k")
    val fp = nonMembers.filter(Bloom.mightContain(filter, col("k"))).count()
    assert(fp <= 20000L * 0.05,
      s"false-positive rate ${fp / 20000.0} far above the 1% target")
  }

  test("Bloom over an EMPTY build side: contains nothing, no NPE") {
    // Spark's stat.bloomFilter returns a null buffer on zero rows
    // (found by the sf10 sweep when a rare-ngram gate emptied under
    // replica tiling); buildLongFilter must hand back a valid filter
    // with zero members instead of propagating the NPE.
    import TestSpark.spark.implicits._
    val none = Seq.empty[Long].toDF("k")
    val filter = Bloom.buildLongFilter(none, "k")
    val probes = (0L until 1000L).toDF("k")
    assert(probes.filter(Bloom.mightContain(filter, col("k"))).count()
      == 0L, "empty-build filter claimed a member")
    // the explicit-size path must take the same guard
    val filter2 = Bloom.buildLongFilter(none, "k", expectedItems = 100)
    assert(probes.filter(Bloom.mightContain(filter2, col("k"))).count()
      == 0L)
  }

  test("distinctSketchReport: exact counts right, sketch within tolerance") {
    val li = graft.sources.Tables.lineitem(TestSpark.spark,
      "/root/testdata/sf0.001")
    val rows = Profile.distinctSketchReport(
      li, Seq("l_partkey", "l_returnflag")).collect()
    val exactPart = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("l_partkey").getLong(1) == exactPart)
    assert(rows.forall(_.getBoolean(2)), "HLL estimate outside tolerance")
  }

  test("distinctSketchCatalog: union dedups cross-day overlap; " +
      "appending a day merges WITHOUT rescanning history") {
    import org.apache.spark.sql.functions.{hll_sketch_estimate,
      hll_union_agg, hll_sketch_agg, to_date, lit, col}
    val spark = TestSpark.spark
    import spark.implicits._
    // 3 days, heavy overlap: 150 distinct users total vs 300 day-sum
    val rows = for (d <- 1 to 3; u <- 0 until 100)
      yield (f"2024-01-0$d", (u + (d - 1) * 25).toLong)
    val df = rows.toDF("ds", "user_id")
    val dir = java.nio.file.Files
      .createTempDirectory("hll_catalog").toString
    val rep = Profile.distinctSketchCatalog(
      df, to_date(col("ds")), "user_id", dir).head()
    assert(rep.getAs[Long]("n_days") == 3L)
    assert(rep.getAs[Long]("sum_day_distinct") == 300L)
    assert(rep.getAs[Long]("exact_distinct") == 150L)
    assert(rep.getAs[Boolean]("union_ok"))
    // incremental append — THE maintenance contract: call the catalog
    // builder again with ONLY day 4's rows. Dynamic partition
    // overwrite rewrites day=2024-01-04 alone; days 1-3's stored
    // sketches must survive untouched (their data is never re-read).
    val day4 = (0 until 100).map(u => (f"2024-01-04", (u + 75).toLong))
      .toDF("ds", "user_id")
    Profile.distinctSketchCatalog(
      day4, to_date(col("ds")), "user_id", dir).head()
    val catalog = spark.read.parquet(dir)
    assert(catalog.count() == 4L,
      "prior-day partitions must survive an incremental call")
    val est = catalog
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .head().getLong(0)
    val exact4 = rows.map(_._2).toSet ++ (0 until 100).map(_ + 75L)
    assert(math.abs(est - exact4.size) <= 0.05 * exact4.size,
      s"incremental union estimate $est vs exact ${exact4.size}")
  }

  test("distinctSketchCatalog on an empty first input: zero report, no crash") {
    // r14 advice (the empty-catalog pin, HLL face): 0 days / 0
    // distincts / union_ok, not a schema-inference error on the
    // partition-less directory the empty write leaves behind.
    import org.apache.spark.sql.functions.{to_date, col}
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("hll_catalog_empty").toString
    val empty = Seq.empty[(String, Long)].toDF("ds", "user_id")
      .select(to_date(col("ds")).as("dt"), col("user_id"))
    val rep = Profile.distinctSketchCatalog(
      empty, col("dt"), "user_id", dir).collect()
    assert(rep.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getBoolean(3))).toSeq == Seq((0L, 0L, 0L, true)))
  }

  test("SpanDedup cuts exactly the cross-doc duplicated span, keeps the rest") {
    // Two docs share an 8-token boilerplate block; each also has unique
    // text. The block must be cut from BOTH docs; unique text survives;
    // a third doc with no duplicated span is untouched.
    val boiler = "this license text is identical across both documents"
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler delta epsilon"),
      (2L, s"$boiler zeta eta theta iota kappa"),
      (3L, "entirely unique words that no other document shares here"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.TextFns.tokens(col("text")).as("toks"))
    val cov = SpanDedup.coverage(docs, "doc_id", "toks", 8)
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getBoolean(3)))
    val boilerToks = boiler.split(" ").toSet
    cov.foreach { case (id, tok, covered) =>
      if (boilerToks(tok)) assert(covered, s"doc $id: '$tok' not cut")
      else assert(!covered, s"doc $id: unique token '$tok' wrongly cut")
    }
    val fps = SpanDedup.dedupFingerprints(docs, "doc_id", "toks", 8)
      .orderBy("doc_id").collect()
    assert(fps.map(_.getLong(2)).toSeq == Seq(5L, 5L, 9L)) // n_kept
    // doc 3 untouched: fingerprint equals hash of its full text
    val full = docs.filter(col("doc_id") === 3)
      .select(graft.functions.HashFns.md5Long(
        concat_ws(" ", col("toks")))).head().getLong(0)
    assert(fps(2).getLong(3) == full)
  }

  test("Checks: verdicts per check, nulls counted, declared order kept") {
    val rows: Seq[(Long, java.lang.Double)] =
      Seq((1L, 10.0), (2L, -5.0), (3L, null))
    val df = rows.toDF("k", "v")
    val got = Checks.run(df, Seq(
        Checks.NullRateBelow("v", 0.5),      // 1/3 <= 0.5  -> pass
        Checks.MinAtLeast("v", 0.0),         // min = -5    -> fail
        Checks.DistinctAtLeast("k", 3L),     // 3 >= 3      -> pass
        Checks.SatisfiesAtLeast("v > 0", 0.5))) // 1/3 < 0.5 -> fail
      .orderBy("seq").collect()
    assert(got.map(_.getBoolean(3)).toSeq ==
      Seq(true, false, true, false))
    assert(got(0).getDouble(2) == 1.0 / 3.0)
    assert(got.map(_.getString(0)).toSeq == Seq(
      "null_rate(v)<=0.5", "min(v)>=0.0", "distinct(k)>=3",
      "satisfies(v > 0)>=0.5"))
  }

  test("P3/P4 pruneUninformative drops all-null and constant columns only") {
    val df = Seq((1, "x"), (2, "y")).toDF("id", "s")
      .withColumn("dead", lit(null).cast("int"))
      .withColumn("const", lit(5))
    assert(Profile.pruneUninformative(df).columns.toSeq == Seq("id", "s"))
    assert(Profile.pruneUninformative(df, dropSingleValue = false)
      .columns.toSeq == Seq("id", "s", "const"))
    assert(Profile.pruneUninformative(df, dropAllNull = false)
      .columns.toSeq == Seq("id", "s", "dead"))
  }

  test("rangeJoin pointInInterval: inclusive bounds, multi-bin intervals") {
    val points = Seq((1, 10.0), (2, 25.0), (3, 39.9), (4, 40.1))
      .toDF("pid", "v")
    val intervals = Seq((100, 10.0, 40.0), (200, 38.0, 39.0))
      .toDF("iid", "lo", "hi")
    val r = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi",
        binWidth = 7L)
      .select("pid", "iid").orderBy("pid", "iid").collect()
      .map(x => (x.getInt(0), x.getInt(1))).toSeq
    // 10.0 and 40.0 are inclusive bounds; 40.1 matches nothing;
    // interval 100 spans 5 bins and must still match every bin's points
    assert(r == Seq((1, 100), (2, 100), (3, 100)))
  }

  test("asof joinBackward: inclusive latest-prior match, null before first") {
    val left = Seq((1, 5, "l1"), (1, 10, "l2"), (1, 20, "l3"), (2, 7, "l4"))
      .toDF("k", "ts", "tag")
    val right = Seq((1, 5, 50.0), (1, 15, 150.0), (2, 9, 90.0))
      .toDF("k", "snap_ts", "price")
    val r = AsOf.joinBackward(left, right, "k", "ts", "snap_ts", Seq("price"))
      .orderBy("k", "ts").collect()
      .map(x => (x.getAs[String]("tag"), x.getAs[Any]("price"))).toSeq
    assert(r == Seq(
      ("l1", 50.0),  // equal ts matches (inclusive)
      ("l2", 50.0),  // 15 > 10 not eligible
      ("l3", 150.0), // latest <= 20
      ("l4", null))) // key 2: no snapshot at/before 7
  }

  test("asof joinForward: inclusive earliest-next match, null after last") {
    val left = Seq((1, 5, "l1"), (1, 10, "l2"), (1, 20, "l3"), (2, 12, "l4"))
      .toDF("k", "ts", "tag")
    val right = Seq((1, 5, 50.0), (1, 15, 150.0), (2, 9, 90.0))
      .toDF("k", "snap_ts", "price")
    val r = AsOf.joinForward(left, right, "k", "ts", "snap_ts", Seq("price"))
      .orderBy("k", "ts").collect()
      .map(x => (x.getAs[String]("tag"), x.getAs[Any]("price"))).toSeq
    assert(r == Seq(
      ("l1", 50.0),  // equal ts matches (inclusive)
      ("l2", 150.0), // earliest >= 10
      ("l3", null),  // nothing at/after 20
      ("l4", null))) // key 2: snapshot at 9 is before 12
  }

  test("asof joinNearest: two-directional choice, ties resolve backward") {
    import org.apache.spark.sql.functions.col
    val left = Seq((1, 5, "hit"), (1, 10, "tie"), (1, 13, "fwd"),
      (1, 30, "bwd"), (2, 7, "none"))
      .toDF("k", "ts", "tag")
    val right = Seq((1, 5, 50.0), (1, 15, 150.0))
      .toDF("k", "snap_ts", "price")
    val r = AsOf.joinNearest(left, right, "k", "ts", "snap_ts",
        Seq("price"), (a, b) => a - b)
      .orderBy("k", "ts").collect()
      .map(x => (x.getAs[String]("tag"), x.getAs[Any]("snap_ts"),
        x.getAs[Any]("price"))).toSeq
    assert(r == Seq(
      ("hit", 5, 50.0),    // exact hit: delta 0, backward
      ("tie", 5, 50.0),    // |10-5| == |15-10|: backward wins
      ("fwd", 15, 150.0),  // 15 is closer than 5
      ("bwd", 15, 150.0),  // nothing after 30: backward only
      ("none", null, null))) // key 2 has no right rows
  }

  test("connectedComponents: chains merge to min label, components stay apart") {
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val r = Components.connectedComponents(edges, "id_a", "id_b")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // 1-2-3-4 is a CHAIN: label 1 must propagate two hops to node 4
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents equals union-find on 20 seeded random graphs") {
    // 20 random graphs in disjoint id spaces, solved in ONE iterative
    // run (one Spark call, not one per case), checked against a
    // reference union-find whose min-directed unions make every root
    // the component minimum — the operator's exact contract.
    val rnd = new scala.util.Random(42)
    val edges = (0 until 20).flatMap { g =>
      val base = g * 100L
      Seq.fill(12)((base + rnd.nextInt(15), base + rnd.nextInt(15)))
        .filter(e => e._1 != e._2)
    }
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n)).toMap
    val got = Components
      .connectedComponents(edges.toDF("a", "b"), "a", "b", maxIter = 30)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("runningSumDistributed equals the global window cumsum") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 20L).map(i => (i, i * 3 % 7)).toDF("id", "v")
      .repartition(4) // physical layout must not matter
    val dist = Windows.runningSumDistributed(df, "v", "cum",
        Seq(col("id")), floor(col("id") / 3).cast("long"))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val global = df.select(col("id"),
        sum(col("v")).over(Window.orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == global)
  }

  test("pointInBoxJoin: contained points found exactly once, edges inclusive") {
    val pts = Seq((1L, 5.0, 5.0), (2L, -0.5, 3.0), (3L, 25.0, 5.0),
      (4L, 10.0, 10.0)).toDF("pid", "lon", "lat")
    val boxes = Seq(
      (100L, 0.0, 0.0, 10.0, 10.0),      // single-ish cell box
      (200L, -30.0, -30.0, 30.0, 30.0))  // spans 7x7 grid cells
      .toDF("bid", "min_lon", "min_lat", "max_lon", "max_lat")
    val r = GeoJoin.pointInBoxJoin(pts, boxes, "lon", "lat", cellSize = 10.0)
      .select("pid", "bid").collect().map(x => (x.getLong(0), x.getLong(1)))
    // each match appears ONCE even though box 200 covers many cells
    assert(r.length == r.toSet.size, "duplicate matches from multi-cell box")
    assert(r.toSet == Set((1L, 100L), (4L, 100L),    // (10,10) edge inclusive
      (1L, 200L), (2L, 200L), (3L, 200L), (4L, 200L)))
  }

  test("pointInPolygonJoin: concave star, known membership, found once") {
    // 8-vertex concave star around the origin: tips at (±10,0),(0,±10),
    // waist at (±3,±3). (5,5) is inside the BOUNDING BOX but outside
    // the star (the concave notch) — the case a bbox join gets wrong.
    val star = Seq((-10.0, 0.0), (-3.0, 3.0), (0.0, 10.0), (3.0, 3.0),
      (10.0, 0.0), (3.0, -3.0), (0.0, -10.0), (-3.0, -3.0))
    val polys = Seq(1L).toDF("poly_id").select(col("poly_id"),
      array(star.map { case (x, y) =>
        struct(lit(x).as("x"), lit(y).as("y")) }: _*).as("verts"))
    val pts = Seq(
      (1L, 0.0, 0.0),    // center: inside
      (2L, 5.0, 5.0),    // bbox yes, star no (concave notch)
      (3L, 8.0, 0.5),    // near +x tip: inside
      (4L, 0.5, -8.0),   // near -y tip: inside
      (5L, 11.0, 0.0),   // outside bbox entirely
      (6L, -2.9, 2.8)).toDF("pid", "lon", "lat") // just inside the waist
    val r = GeoJoin.pointInPolygonJoin(pts, polys, "lon", "lat", "verts",
        cellSize = 4.0)
      .select("pid").collect().map(_.getLong(0)).toSeq
    assert(r.length == r.toSet.size, "duplicate matches from multi-cell poly")
    assert(r.toSet == Set(1L, 3L, 4L, 6L))
  }

  test("corrMatrix: one-pass all-pairs Pearson with exact expected values") {
    // y = 2x (r=1), z = -x (r=-1), w uncorrelated-ish with known r
    val df = Seq(
      (1.0, 2.0, -1.0, 1.0),
      (2.0, 4.0, -2.0, 3.0),
      (3.0, 6.0, -3.0, 2.0),
      (4.0, 8.0, -4.0, 4.0)).toDF("x", "y", "z", "w")
    val m = Correlation.matrix(df, Seq("x", "y", "z", "w"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m.size == 10) // 4 diag + 6 upper pairs
    assert(m(("x", "x")) == 1.0)
    assert(m(("x", "y")) == 1.0)   // exact: decimal co-moments
    assert(m(("x", "z")) == -1.0)
    // hand-computed: sxw=1+6+6+16=29, cov=4*29-100=16,
    // var_x=var_w=4*30-100=20 -> r = 16/sqrt(20*20) = 0.8
    assert(m(("x", "w")) == 0.8)
    assert(m(("y", "z")) == -1.0)
  }

  test("corrMatrix fails loudly when a value breaks the long-product contract") {
    // |v| = |x|·10^decimals must stay under 3e9; 4e7 at decimals=2
    // scales to 4e9, whose square would silently wrap a BIGINT.
    val df = Seq((4.0e7, 1.0), (1.0, 2.0)).toDF("x", "y")
    val ex = intercept[Exception] {
      Correlation.matrix(df, Seq("x", "y")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
        Option(c.getMessage).exists(_.contains("3e9 long-product"))),
      s"expected the contract violation to surface, got: $ex")
  }

  test("sessionize splits on gap > threshold, 1-based per user") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 1L), (1L, "2024-01-01 10:10:00", 2L),
      (1L, "2024-01-01 11:00:00", 3L), // 50 min gap -> new session
      (2L, "2024-01-01 10:00:00", 4L))
      .toDF("user", "ts", "eid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val r = Sessionize.sessionize(ev, col("user"), col("ts"),
        Seq(col("ts"), col("eid")), gapSeconds = 1800)
      .orderBy("user", "eid").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("session_id"))).toSeq
    assert(r == Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L)))
  }
}
