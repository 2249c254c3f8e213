package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import EventStreams.{Event, SessionOut}

class StreamingSpec extends AnyFunSuite {
  private implicit val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling window with watermark aggregates per window/type") {
    val input = MemoryStream[Event](spark)
    val result = EventStreams.tumblingCounts(
      input.toDF(), windowLen = "1 hour", lateness = "10 minutes")
    val q = result.writeStream
      .format("memory").queryName("tumbling_spec")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(
        Event(1, ts("2024-03-01 10:05:00"), 1, "click", 1.0),
        Event(2, ts("2024-03-01 10:55:00"), 2, "click", 2.0),
        Event(3, ts("2024-03-01 11:05:00"), 1, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT win_start, event_type, n, total FROM tumbling_spec " +
        "ORDER BY win_start, event_type").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Timestamp]("win_start") == ts("2024-03-01 10:00:00"))
      assert(rows(0).getAs[Long]("n") == 2L)
      assert(rows(0).getAs[Double]("total") == 3.0)
      assert(rows(1).getAs[String]("event_type") == "view")
    } finally q.stop()
  }

  test("dedupedStream drops within-watermark redeliveries, keeps new ids") {
    val input = MemoryStream[Event](spark)
    val result = EventStreams.dedupedStream(input.toDF(), "event_id",
      lateness = "1 hour")
    val q = result.writeStream
      .format("memory").queryName("dedup_spec")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        Event(1, ts("2024-03-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-03-01 10:01:00"), 1, "view", 2.0))
      q.processAllAvailable()
      // redeliver id 2 (same file re-globbed) + genuinely new id 3
      input.addData(
        Event(2, ts("2024-03-01 10:01:00"), 1, "view", 2.0),
        Event(3, ts("2024-03-01 10:02:00"), 2, "click", 3.0))
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup_spec ORDER BY event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(1L, 2L, 3L)) // each id exactly once
    } finally q.stop()
  }

  test("jdbcUpsertSink is an idempotent delete+insert upsert") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft_upsert")
    val url = s"jdbc:derby:$dbDir/updb;create=true"
    val input = MemoryStream[Event](spark)
    val q = EventStreams.jdbcUpsertSink(input.toDF(), url, "ev_upsert",
      keyCol = "event_id", order = Seq("ts")).start()
    try {
      input.addData(
        Event(1, ts("2024-03-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-03-01 10:01:00"), 1, "view", 2.0))
      q.processAllAvailable()
      assert(graft.sinks.Jdbc.rowCount(spark, url, "ev_upsert") == 2L)
      // re-deliver key 2 with a newer value + a new key 3
      input.addData(
        Event(2, ts("2024-03-01 10:05:00"), 1, "view", 9.0),
        Event(3, ts("2024-03-01 10:06:00"), 2, "click", 3.0))
      q.processAllAvailable()
      assert(graft.sinks.Jdbc.rowCount(spark, url, "ev_upsert") == 3L)
      val v2 = graft.sinks.Jdbc.query(spark, url,
        """SELECT "value" FROM ev_upsert WHERE "event_id" = 2""")
        .head().getDouble(0)
      assert(v2 == 9.0) // last write won
    } finally q.stop()
  }

  test("streamToLake lands day-partitioned parquet incrementally") {
    val base = java.nio.file.Files.createTempDirectory("graft_slake")
    val path = s"$base/lake"; val ckpt = s"$base/ckpt"
    val input = MemoryStream[Event](spark)
    val q = EventStreams.streamToLake(input.toDF(), "ts", path, ckpt).start()
    try {
      input.addData(
        Event(1, ts("2024-03-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-03-02 11:00:00"), 1, "view", 2.0))
      q.processAllAvailable()
      assert(spark.read.parquet(path).count() == 2L)
      // second micro-batch appends; day partitioning is physical
      input.addData(Event(3, ts("2024-03-02 12:00:00"), 2, "click", 3.0))
      q.processAllAvailable()
      val lake = spark.read.parquet(path)
      assert(lake.count() == 3L)
      assert(lake.filter(col("day") === "2024-03-02").count() == 2L)
      val dayDirs = new java.io.File(path).listFiles()
        .filter(_.getName.startsWith("day=")).map(_.getName).sorted
      assert(dayDirs.toSeq == Seq("day=2024-03-01", "day=2024-03-02"))
    } finally q.stop()
  }

  test("enrich joins the stream against a static dim without state") {
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Event](spark)
    val result = EventStreams.enrich(input.toDF(), dim, Seq("user_id"))
    val q = result.writeStream
      .format("memory").queryName("enrich_spec")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        Event(1, ts("2024-03-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-03-01 10:01:00"), 3, "view", 2.0)) // no dim row
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT event_id, tier FROM enrich_spec ORDER BY event_id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq((1L, "gold"), (2L, null)))
    } finally q.stop()
  }

  test("dedupIngest: within-batch and cross-batch content dedup") {
    val base = java.nio.file.Files.createTempDirectory("graft_ingest")
    val out = s"$base/out"; val hist = s"$base/hist"
    val input = MemoryStream[(Long, String)](spark)
    val q = EventStreams.dedupIngest(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", out, hist)
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      // batch 0: doc 3 duplicates doc 1's content within the batch
      input.addData((1L, "aaa"), (2L, "bbb"), (3L, "aaa"))
      q.processAllAvailable()
      // batch 1: doc 4 re-lands batch-0 content; doc 5 is new
      input.addData((4L, "bbb"), (5L, "ccc"))
      q.processAllAvailable()
      val ids = spark.read.parquet(out).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 5L))
      // history carries one digest row per ACCEPTED doc, batch-stamped
      val h = spark.read.parquet(hist)
      assert(h.count() == 3L)
      assert(h.select("batch_id").distinct().count() == 2L)
    } finally q.stop()
  }

  test("sketchIngest folds per-batch count-min increments; replay replaces") {
    val base = java.nio.file.Files.createTempDirectory("graft_sketch")
    val dir = s"$base/sketch"
    val input = MemoryStream[String](spark)
    val q = EventStreams.sketchIngest(
      input.toDF().toDF("key"), "key", depth = 3, width = 8, dir)
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    val all = Seq("a", "a", "b", "c", "a", "b", "d", "e")
    try {
      input.addData(all.take(4): _*); q.processAllAvailable()
      input.addData(all.drop(4): _*); q.processAllAvailable()
    } finally q.stop()
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Long] =
      df.collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val merged = cells(EventStreams.readSketch(spark, dir))
    val direct = cells(graft.operators.CountMin.sketch(
      all.toDF("key"), "key", 3, 8))
    assert(merged == direct) // merge-on-read == one-shot batch sketch
    // replaying batch 1 (same id, same data) must leave the merge
    // unchanged: the increment overwrites its own partition
    EventStreams.sketchIngestBatch(
      all.drop(4).toDF("key"), 1L, "key", 3, 8, dir)
    assert(cells(EventStreams.readSketch(spark, dir)) == direct)
  }

  test("kmvIngest merges per-batch k-min partials; replay replaces") {
    val base = java.nio.file.Files.createTempDirectory("graft_kmvs")
    val dir = s"$base/kmv"
    val k = 16
    def hashed(vs: Seq[Int]) = vs.toDF("v")
      .select(graft.functions.HashFns
        .md5Long(col("v").cast("string")).as("h"))
    // the never-written dir is a valid stream state: empty sketch,
    // not an AnalysisException
    assert(EventStreams.readKmvSketch(spark, dir, k)
      .collect().head.getSeq[Long](0).isEmpty)
    val input = MemoryStream[Int](spark)
    val q = EventStreams.kmvIngest(
      input.toDF().select(graft.functions.HashFns
        .md5Long(col("value").cast("string")).as("h")), "h", k, dir)
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    val b0 = 0 until 300
    val b1 = 150 until 500 // overlaps b0: the merge must dedup
    try {
      input.addData(b0: _*); q.processAllAvailable()
      input.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    def arr(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.collect().map(_.getSeq[Long](0)).head
    val merged = arr(EventStreams.readKmvSketch(spark, dir, k))
    val direct = arr(graft.operators.KMV.sketch(
      hashed(b0 ++ b1).select(lit("g").as("g"), col("h")), "g", "h", k)
      .select(col("kmins")))
    assert(merged == direct,
      "merge-on-read != one-shot sketch over the whole stream")
    // replaying batch 1 (same id, same data) must leave the merge
    // unchanged: the partial overwrites its own partition
    EventStreams.kmvIngestBatch(hashed(b1), 1L, "h", k, dir)
    assert(arr(EventStreams.readKmvSketch(spark, dir, k)) == direct)
  }

  test("kmvIngest decade replay (sf1): merge-on-read == one-shot, replay idempotent") {
    // The batch-keyed ingest family's idempotency was spec-proven at
    // fixture scale only (r14 verdict stretch); when the sf1 tiling
    // exists (tools/make_sf1.py — the gated-decade-test convention of
    // InfraSpec's autoWidthFactor check), replay one ingest over the
    // full sf1 events table and pin the decade claim BIT-exactly:
    // four batch partials merged on read equal the one-shot sketch of
    // the whole table (KMV's k smallest distinct hashes are a pure
    // function of the value set — partitioning- and batching-free),
    // and a replayed batch changes nothing.
    val sf1 = "/root/repo/target/sf1"
    if (new java.io.File(sf1).isDirectory) {
      val k = 256
      val ev = spark.read.parquet(s"$sf1/events.parquet")
        .select(graft.functions.HashFns
          .md5Long(col("user_id").cast("string")).as("h"))
      val dir = java.nio.file.Files
        .createTempDirectory("graft_kmv_sf1").toString
      def batch(b: Long) = ev.filter(col("h") % 4 === lit(b))
      (0L until 4L).foreach(b =>
        EventStreams.kmvIngestBatch(batch(b), b, "h", k, dir))
      def arr(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        df.collect().map(_.getSeq[Long](0)).head
      val merged = arr(EventStreams.readKmvSketch(spark, dir, k))
      val direct = arr(graft.operators.KMV.sketch(
        ev.select(lit("g").as("g"), col("h")), "g", "h", k)
        .select(col("kmins")))
      assert(merged == direct,
        "sf1 merge-on-read != one-shot sketch over the whole table")
      EventStreams.kmvIngestBatch(batch(2L), 2L, "h", k, dir)
      assert(arr(EventStreams.readKmvSketch(spark, dir, k)) == direct,
        "sf1 replay of batch 2 moved the merged sketch")
    }
  }

  test("sketchIngest decade replay (sf1): merged CM grid == one-shot, replay idempotent") {
    // The count-min sibling of the kmv sf1 replay above — same gated-
    // decade convention. CM partials are exact cell counts and
    // merge-on-read is cell-wise addition, so the merged grid must
    // equal the one-shot sketch of the whole table CELL-exactly under
    // any batching, and a replayed batch (replace-not-append) must
    // move nothing.
    val sf1 = "/root/repo/target/sf1"
    if (new java.io.File(sf1).isDirectory) {
      val (depth, width) = (3, 256)
      val ev = spark.read.parquet(s"$sf1/events.parquet")
        .select(col("user_id").cast("string").as("item"))
      val dir = java.nio.file.Files
        .createTempDirectory("graft_cm_sf1").toString
      def batch(b: Long) = ev.filter(graft.functions.HashFns
        .md5Long(col("item")) % 4 === lit(b))
      (0L until 4L).foreach(b =>
        EventStreams.sketchIngestBatch(batch(b), b, "item",
          depth, width, dir))
      def grid(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Long] =
        df.collect().map(r => (r.getInt(0), r.getInt(1)) ->
          r.getLong(2)).toMap
      val merged = grid(EventStreams.readSketch(spark, dir)
        .select(col("d"), col("bucket"), col("c")))
      val direct = grid(graft.operators.CountMin
        .sketch(ev, "item", depth, width)
        .select(col("d"), col("bucket"), col("c")))
      assert(merged == direct,
        "sf1 merged CM grid != one-shot sketch over the whole table")
      EventStreams.sketchIngestBatch(batch(1L), 1L, "item",
        depth, width, dir)
      assert(grid(EventStreams.readSketch(spark, dir)
        .select(col("d"), col("bucket"), col("c"))) == direct,
        "sf1 replay of batch 1 moved the merged CM grid")
    }
  }

  test("mgIngest candidates + CM serve lose no heavy hitter; replay replaces") {
    val base = java.nio.file.Files.createTempDirectory("graft_mg")
    val mgDir = s"$base/mg"
    val cmDir = s"$base/cm"
    val k = 5
    // never-written dir: valid empty state
    assert(EventStreams.readMgSummary(spark, mgDir, k).count() == 0)
    // hot keys over a wide tail, split so neither batch alone decides
    val b0 = Seq.fill(30)("hot1") ++ Seq.fill(10)("hot2") ++
      (0 until 60).map(i => s"t$i")
    val b1 = Seq.fill(10)("hot1") ++ Seq.fill(28)("hot2") ++
      (60 until 120).map(i => s"t$i")
    val input = MemoryStream[String](spark)
    val q = EventStreams.mgIngest(
      input.toDF().toDF("key"), "key", k, mgDir)
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      input.addData(b0: _*); q.processAllAvailable()
      input.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    // the CM stream state over the same batches (its own ingest face
    // is proven above; here it feeds the serve leg)
    EventStreams.sketchIngestBatch(b0.toDF("key"), 0L, "key", 3, 64, cmDir)
    EventStreams.sketchIngestBatch(b1.toDF("key"), 1L, "key", 3, 64, cmDir)
    val all = b0 ++ b1
    val n = all.size.toLong
    val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val must = exact.collect {
      case (x, c) if c * (k + 1) > n => x }.toSet
    assert(must == Set("hot1", "hot2")) // the fixture's intent
    // merged candidates contain every strict-threshold key
    val cands = EventStreams.readMgSummary(spark, mgDir, k)
      .collect().map(_.getString(0)).toSet
    assert(cands.size <= k && must.subsetOf(cands))
    // the serve leg keeps them all, with one-sided estimates
    val served = EventStreams.servedHeavyHitters(
      spark, mgDir, cmDir, k, 3, 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(served.forall(_._3 == n), "n must come from the CM grid")
    val servedMap = served.map(t => t._1 -> t._2).toMap
    assert(must.subsetOf(servedMap.keySet), "serve lost a heavy hitter")
    servedMap.foreach { case (key, est) =>
      assert(est >= exact.getOrElse(key, 0L),
        s"$key: CM estimate $est undershot ${exact.get(key)}") }
    // Replaying batch 1 (same id, same data) REPLACES its partition
    // with a fresh valid summary of the same rows. Unlike CM/KMV
    // partials, an MG summary is partitioning-dependent, so the stored
    // bytes may differ across a replay — the contract is SEMANTIC
    // idempotency: the merge-on-read guarantee (every strict-threshold
    // key survives) and the serve's no-false-negative property must
    // hold identically, and no double-count can occur (the partition
    // was replaced, not appended).
    EventStreams.mgIngestBatch(b1.toDF("key"), 1L, "key", k, mgDir)
    val cands2 = EventStreams.readMgSummary(spark, mgDir, k)
      .collect().map(_.getString(0)).toSet
    assert(cands2.size <= k && must.subsetOf(cands2),
      "replay broke the merged-summary guarantee")
    val served2 = EventStreams.servedHeavyHitters(spark, mgDir, cmDir, k, 3, 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(must.subsetOf(served2.map(_._1).toSet),
      "replay broke the serve's no-false-negative property")
    assert(served2.forall(_._3 == n),
      "replay double-counted the CM grid") // CM side IS bit-idempotent
  }

  test("batch-keyed ingest rejects a fresh-checkpoint restart over history") {
    // An ingest dir is bound to one checkpoint lineage: a restart with
    // a FRESH checkpoint restarts batchIds at 0, and writing batch=0
    // into a dir that already holds later partitions would silently
    // clobber unrelated history. The guard must fail that loudly —
    // while still allowing the legitimate crash-replay of the true
    // first batch (only batch=0 exists).
    val base = java.nio.file.Files.createTempDirectory("graft_lineage")
    val dir = s"$base/sketch"
    EventStreams.sketchIngestBatch(Seq("a").toDF("key"), 0L, "key", 3, 8, dir)
    // replay of the true batch 0: allowed (only batch=0 present)
    EventStreams.sketchIngestBatch(Seq("a").toDF("key"), 0L, "key", 3, 8, dir)
    EventStreams.sketchIngestBatch(Seq("b").toDF("key"), 1L, "key", 3, 8, dir)
    // fresh-checkpoint restart: batchId 0 against history ⊃ {batch=1}
    val e = intercept[IllegalArgumentException] {
      EventStreams.sketchIngestBatch(Seq("c").toDF("key"), 0L, "key", 3, 8, dir)
    }
    assert(e.getMessage.contains("checkpoint lineage"))
    // and the history it would have clobbered is intact
    val after = EventStreams.readSketch(spark, dir).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val direct2 = graft.operators.CountMin.sketch(
      Seq("a", "b").toDF("key"), "key", 3, 8).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(after == direct2)
  }

  test("bm25Ingest serves the same ranking as a one-shot index; replay replaces") {
    val base = java.nio.file.Files.createTempDirectory("graft_bm25s")
    val dir = s"$base/index"
    val input = MemoryStream[(Long, String)](spark)
    val q = EventStreams.bm25Ingest(
      input.toDF().toDF("doc_id", "term"), "doc_id", "term", dir)
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    // two disjoint doc batches of token rows
    val b0 = Seq((10L, "a"), (10L, "a"), (10L, "b"), (11L, "a"), (11L, "c"))
    val b1 = Seq((12L, "c"), (12L, "c"), (12L, "d"), (13L, "a"), (13L, "d"))
    try {
      input.addData(b0: _*); q.processAllAvailable()
      input.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    val queries = Seq((100L, "a"), (100L, "d")).toDF("qid", "term")
    def served(): Seq[Seq[Any]] = {
      val (p, d, s) = EventStreams.readBm25Index(spark, dir)
      graft.operators.Bm25.servedTopK(p, d, s, queries, 1.2, 0.75, 5)
        .collect().map(_.toSeq).toSeq
    }
    val adhoc = graft.operators.Bm25.topK(
      (b0 ++ b1).toDF("doc_id", "term"), queries, 1.2, 0.75, 5)
      .collect().map(_.toSeq).toSeq
    assert(served() == adhoc) // merge-on-read == one-shot ranking
    // crash-replay of batch 1 overwrites its own partitions: unchanged
    EventStreams.bm25IngestBatch(
      b1.toDF("doc_id", "term"), 1L, "doc_id", "term", dir)
    assert(served() == adhoc, "replayed batch double-counted the index")
  }

  test("ivfIngest assigns to frozen centroids; merge == one-shot; replay replaces") {
    import graft.operators.{Ivf, Similarity}
    val base = java.nio.file.Files.createTempDirectory("graft_ivfs")
    val centsDir = s"$base/cents"; val dir = s"$base/index"
    // deterministic 4-dim vectors, all-positive so cosine structure is
    // non-degenerate across the 4 seeded cells
    def vec(i: Int): Array[Double] =
      Array.tabulate(4)(j => math.abs(math.sin(i * 7.0 + j * 3.0)) + 0.1)
    val train = (0 until 10).map(i => (i.toLong, vec(i)))
    val trainDf = train.toDF("vec_id", "embedding")
      .withColumn("nrm", Similarity.norm(col("embedding")))
    // the frozen artifact: centroids train ONCE, persist, and ingest
    // only ever reads them — the rebuild-vs-append boundary
    Ivf.lloydCentroids(trainDf, nSeeds = 4)
      .write.mode("overwrite").parquet(centsDir)
    val input = MemoryStream[(Long, Array[Double])](spark)
    val q = EventStreams.ivfIngest(
      input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", centsDir, dir)
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    val b1 = (10 until 30).map(i => (i.toLong, vec(i)))
    try {
      input.addData(train: _*); q.processAllAvailable()
      input.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    val cents = spark.read.parquet(centsDir)
    val queries = trainDf.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qnrm"))
    def searched(assigned: org.apache.spark.sql.DataFrame) =
      Ivf.search(queries, cents, assigned, nProbe = 2, k = 3)
        .collect().map(_.toSeq).toSeq
    val got = searched(EventStreams.readIvfIndex(spark, dir))
    // one-shot: assign the whole stream against the same frozen
    // centroids — merge-on-read must be bit-identical
    val allDf = (train ++ b1).toDF("vec_id", "embedding")
      .withColumn("nrm", Similarity.norm(col("embedding")))
    val oneShot = searched(Ivf.assign(allDf, cents))
    assert(got == oneShot)
    // cell counts stay exact under the merge too (integer-sum law)
    val streamed = Ivf.cellCounts(EventStreams.readIvfIndex(spark, dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = Ivf.cellCounts(Ivf.assign(allDf, cents))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == direct)
    // crash-replay of batch 1 overwrites its own partition: unchanged
    EventStreams.ivfIngestBatch(b1.toDF("vec_id", "embedding"), 1L,
      "vec_id", "embedding", centsDir, dir)
    assert(searched(EventStreams.readIvfIndex(spark, dir)) == oneShot,
      "replayed batch changed the served index")
  }

  test("phashIngest accumulates real-decode signatures; banded probe finds the scales") {
    val base = java.nio.file.Files.createTempDirectory("graft_phash")
    val dir = s"$base/sigs"
    def png(n: Int): Array[Byte] = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        f"/root/repo/src/test/resources/media/img_00$n%d.png"))
    val input = MemoryStream[(Long, Array[Byte])](spark)
    val q = EventStreams.phashIngest(
      input.toDF().toDF("media_id", "bytes"), "media_id", "bytes", dir)
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      input.addData((1L, png(1)), (2L, png(2))); q.processAllAvailable()
      input.addData((3L, png(3))); q.processAllAvailable()
    } finally q.stop()
    def pairs(): Set[(Long, Long, Long)] =
      graft.multimodal.Multimodal.bandedHammingPairs(
          EventStreams.readPhashSigs(spark, dir), "media_id", "phash",
          bits = 64, nBands = 4, maxHamming = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    // the three files are the SAME image at 60/120/300 px: measured
    // real-pixel phashes sit at hamming 1/1/0 — all three pairs must
    // surface from the banded probe over the ACCUMULATED index
    assert(pairs() == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 0L)))
    // crash-replay of batch 1 overwrites its own partition: unchanged
    EventStreams.phashIngestBatch(
      Seq((3L, png(3))).toDF("media_id", "bytes"), 1L,
      "media_id", "bytes", dir)
    assert(pairs() == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 0L)))
  }

  test("aggRollupSink accumulates across batches; replay adds nothing") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft_rollup")
    val url = s"jdbc:derby:$dbDir/rolldb;create=true"
    val input = MemoryStream[Event](spark)
    val q = EventStreams.aggRollupSink(input.toDF(), url, "ev_rollup").start()
    try {
      input.addData(
        Event(1, ts("2024-03-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-03-01 11:00:00"), 1, "click", 2.0),
        Event(3, ts("2024-03-01 12:00:00"), 2, "view", 5.0))
      q.processAllAvailable()
      input.addData(
        Event(4, ts("2024-03-01 13:00:00"), 2, "click", 4.0),
        Event(5, ts("2024-03-02 09:00:00"), 1, "view", 8.0))
      q.processAllAvailable()
      def clicks(): (Long, Double) = {
        val r = graft.sinks.Jdbc.query(spark, url,
          """SELECT "n", "total" FROM ev_rollup
            |WHERE CAST("event_type" AS VARCHAR(64)) = 'click'
            |  AND "day" = DATE('2024-03-01')""".stripMargin).head()
        (r.getAs[Number](0).longValue(), r.getAs[Number](1).doubleValue())
      }
      assert(clicks() == (3L, 7.0)) // batch 1 added onto batch 0
      // crash-replay of batch 1: ledger short-circuits, nothing re-adds
      EventStreams.rollupBatch(
        Seq(Event(4, ts("2024-03-01 13:00:00"), 2, "click", 4.0),
          Event(5, ts("2024-03-02 09:00:00"), 1, "view", 8.0)).toDF(),
        1L, url, "ev_rollup")
      assert(clicks() == (3L, 7.0), "replayed batch double-counted")
    } finally q.stop()
  }

  test("scd2Sink maintains a type-2 dimension across micro-batches") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft_scd2s")
    val url = s"jdbc:derby:$dbDir/scd2sdb;create=true"
    val input = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val q = EventStreams.scd2Sink(
      input.toDF().toDF("cust", "tier", "ts"), url, "dim_stream",
      Seq("cust"), Seq("tier"), "ts").start()
    try {
      // batch 0: two observations of cust 1 — only the latest counts
      input.addData((1L, "bronze", ts("2024-01-01 09:00:00")),
        (1L, "gold", ts("2024-01-01 10:00:00")),
        (2L, "silver", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // batch 1: cust 1 changes, cust 2 unchanged
      input.addData((1L, "plat", ts("2024-02-01 10:00:00")),
        (2L, "silver", ts("2024-02-01 10:00:00")))
      q.processAllAvailable()
      val rows = graft.sinks.Jdbc.query(spark, url,
          """SELECT "cust", CAST("tier" AS VARCHAR(64)) AS "tier",
            |"is_current" FROM dim_stream""".stripMargin)
        .collect()
        .map(r => (r.getAs[Number](0).longValue(), r.getString(1),
          r.getAs[Boolean](2)))
        .toSeq.sorted
      assert(rows == Seq((1L, "gold", false), (1L, "plat", true),
        (2L, "silver", true)))
    } finally q.stop()
  }

  test("cdcSink applies change micro-batches; last change per key wins in-batch") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft_cdcs")
    val url = s"jdbc:derby:$dbDir/cdcsdb;create=true"
    // change frame shape: (k, change_type, old_v, new_v, seq)
    val input = MemoryStream[(Long, String, java.lang.Double,
      java.lang.Double, Long)](spark)
    val q = EventStreams.cdcSink(
      input.toDF().toDF("k", "change_type", "old_v", "new_v", "seq"),
      url, "cdc_stream", Seq("k"), Seq("v"),
      Seq(org.apache.spark.sql.functions.col("seq"))).start()
    def rows(): Seq[(Long, Double)] =
      graft.sinks.Jdbc.query(spark, url,
          """SELECT "k", "v" FROM cdc_stream""")
        .collect()
        .map(r => (r.getAs[Number](0).longValue(),
          r.getAs[Number](1).doubleValue())).toSeq.sorted
    try {
      // batch 0 bootstraps; key 1 has two changes — seq 2 must win
      input.addData((1L, "insert", null, 10.0: java.lang.Double, 1L),
        (1L, "update", 10.0: java.lang.Double, 11.0: java.lang.Double, 2L),
        (2L, "insert", null, 20.0: java.lang.Double, 1L))
      q.processAllAvailable()
      assert(rows() == Seq((1L, 11.0), (2L, 20.0)))
      // batch 1: update 1, delete 2, insert 3
      input.addData(
        (1L, "update", 11.0: java.lang.Double, 12.0: java.lang.Double, 3L),
        (2L, "delete", 20.0: java.lang.Double, null, 3L),
        (3L, "insert", null, 30.0: java.lang.Double, 3L))
      q.processAllAvailable()
      assert(rows() == Seq((1L, 12.0), (3L, 30.0)))
    } finally q.stop()
  }

  test("rollupBatch first-batch bootstrap: crash between DDL and apply replays clean") {
    // upsertAdditive's create path is: stage -> CREATE empty target
    // (DDL, auto-commits) -> [INSERT-from-stage + ledger] in ONE txn.
    // The worst crash point is after the DDL: target exists but EMPTY,
    // ledger unmarked. Manufacture exactly that state, then replay the
    // batch — it must take the MERGE path against the empty table and
    // apply ONCE (the old load-then-ledger shape double-counted here).
    val dbDir = java.nio.file.Files.createTempDirectory("graft_boot")
    val url = s"jdbc:derby:$dbDir/bootdb;create=true"
    import graft.sinks.Jdbc
    Jdbc.execute(url,
      """CREATE TABLE ev_rollup ("day" DATE, "event_type" VARCHAR(64),
        |"n" BIGINT, "total" DOUBLE)""".stripMargin)
    Jdbc.execute(url,
      """CREATE TABLE ev_rollup__applied ("batch_id" BIGINT PRIMARY KEY)""")
    EventStreams.rollupBatch(
      Seq(Event(1, ts("2024-03-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-03-01 11:00:00"), 1, "click", 2.0)).toDF(),
      0L, url, "ev_rollup")
    val r = Jdbc.query(spark, url,
      """SELECT "n", "total" FROM ev_rollup
        |WHERE CAST("event_type" AS VARCHAR(64)) = 'click'""".stripMargin)
      .head()
    assert((r.getAs[Number](0).longValue(),
      r.getAs[Number](1).doubleValue()) == (2L, 3.0))
    // and the replayed batch is now ledgered: a second replay is a no-op
    EventStreams.rollupBatch(
      Seq(Event(1, ts("2024-03-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-03-01 11:00:00"), 1, "click", 2.0)).toDF(),
      0L, url, "ev_rollup")
    val r2 = Jdbc.query(spark, url,
      """SELECT "n" FROM ev_rollup
        |WHERE CAST("event_type" AS VARCHAR(64)) = 'click'""".stripMargin)
      .head()
    assert(r2.getAs[Number](0).longValue() == 2L)
  }

  test("concurrent duplicate batch aborts on the ledger PK, MERGE included") {
    // Two drivers resuming the same query can both pass rollupBatch's
    // ledger probe before either commits. The ledger INSERT runs FIRST
    // in upsertAdditive's transaction, so the loser must fail its
    // whole transaction — totals unchanged, no partial MERGE.
    val dbDir = java.nio.file.Files.createTempDirectory("graft_race")
    val url = s"jdbc:derby:$dbDir/racedb;create=true"
    import graft.sinks.Jdbc
    EventStreams.rollupBatch(
      Seq(Event(1, ts("2024-03-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-03-01 11:00:00"), 1, "click", 2.0)).toDF(),
      0L, url, "ev_rollup")
    // Writer B passed the probe before writer A committed; it now
    // applies the same batch through the same additive MERGE + ledger
    // pair. The ledger PK must kill the whole transaction.
    val dup = Seq((java.sql.Date.valueOf("2024-03-01"), "click", 2L, 3.0))
      .toDF("day", "event_type", "n", "total")
    intercept[Exception] {
      Jdbc.upsertAdditive(dup, url, "ev_rollup",
        keys = Seq("day", "event_type"), additive = Seq("n", "total"),
        alsoInTxn = Seq("INSERT INTO ev_rollup__applied VALUES (0)"))
    }
    val r = Jdbc.query(spark, url,
      """SELECT "n", "total" FROM ev_rollup
        |WHERE CAST("event_type" AS VARCHAR(64)) = 'click'""".stripMargin)
      .head()
    assert((r.getAs[Number](0).longValue(),
      r.getAs[Number](1).doubleValue()) == (2L, 3.0),
      "loser's MERGE leaked despite the ledger collision")
  }

  test("dedupIngestBatch replay with the same batchId is idempotent") {
    val base = java.nio.file.Files.createTempDirectory("graft_replay")
    val out = s"$base/out"; val hist = s"$base/hist"
    def run(id: Long, rows: Seq[(Long, String)]): Unit =
      EventStreams.dedupIngestBatch(rows.toDF("doc_id", "text"),
        id, "doc_id", "text", out, hist)
    run(0L, Seq((1L, "aaa"), (2L, "bbb")))
    run(1L, Seq((3L, "bbb"), (4L, "ccc")))       // 3 is seen -> only 4
    // crash-replay of batch 1: its own digests are already in history,
    // but the batch_id < current scoping must NOT mask them
    run(1L, Seq((3L, "bbb"), (4L, "ccc")))
    val ids = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L), s"replay changed the corpus: $ids")
    // history may carry duplicate (digest, batch_id) rows from the
    // replay — harmless set members — but never a THIRD batch id
    val h = spark.read.parquet(hist)
    assert(h.select("batch_id").distinct().count() == 2L)
  }

  test("privacyGate releases classes only after the cumulative census hits k") {
    val base = java.nio.file.Files.createTempDirectory("graft_privgate")
    val out = s"$base/out"; val census = s"$base/census"
    def run(id: Long, rows: Seq[(Long, String)]): Unit =
      EventStreams.privacyGateBatch(rows.toDF("id", "seg"),
        id, Seq("seg"), 3L, out, census)
    // batch 0: A has 2 members (< 3) -> suppressed; B has 1 -> suppressed
    run(0L, Seq((1L, "A"), (2L, "A"), (3L, "B")))
    val b0 = spark.read.parquet(s"$out/batch=0")
    assert(b0.filter(!col("suppressed")).count() == 0)
    assert(b0.filter(col("seg").isNotNull).count() == 0)
    // batch 1: A's cumulative census is 2+2=4 >= 3 -> released with QI;
    // B stays at 2 -> still suppressed
    run(1L, Seq((4L, "A"), (5L, "A"), (6L, "B")))
    val b1 = spark.read.parquet(s"$out/batch=1")
    assert(b1.filter(col("seg") === "A").count() == 2)
    assert(b1.filter(col("id") === 6L).head().getAs[Boolean]("suppressed"))
    // batch-0 rows are NOT retro-released (append-time monotone gate)
    assert(spark.read.parquet(s"$out/batch=0")
      .filter(col("seg").isNotNull).count() == 0)
    // crash-replay of batch 1: census increment REPLACES (no double
    // count) and the released output is reproduced exactly
    run(1L, Seq((4L, "A"), (5L, "A"), (6L, "B")))
    val b1r = spark.read.parquet(s"$out/batch=1")
    assert(b1r.filter(col("seg") === "A").count() == 2)
    assert(spark.read.parquet(census)
      .filter(col("seg") === "A")
      .agg(org.apache.spark.sql.functions.sum(col("n")))
      .head().getLong(0) == 4L)
    // replaying batch 0 AFTER batch 1 landed must reproduce batch 0's
    // original (fully suppressed) view, not see batch 1's census
    run(0L, Seq((1L, "A"), (2L, "A"), (3L, "B")))
    assert(spark.read.parquet(s"$out/batch=0")
      .filter(col("seg").isNotNull).count() == 0)
  }

  test("stateful sessionization closes sessions on gap") {
    val input = MemoryStream[Event](spark)
    val sessions = EventStreams.sessionize(input.toDS(), gapSeconds = 1800,
      idleTimeout = false)
    val q = sessions.writeStream
      .format("memory").queryName("session_spec")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // two bursts 50 min apart -> first session closes when the second
      // burst arrives (gap exceeded within-batch)
      input.addData(
        Event(1, ts("2024-03-01 10:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-03-01 10:10:00"), 7, "click", 2.0))
      q.processAllAvailable()
      input.addData(
        Event(3, ts("2024-03-01 11:00:00"), 7, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, session_start, session_end, n_events, total_value " +
        "FROM session_spec ORDER BY session_start").collect()
      assert(rows.length == 1) // second session still open in state
      assert(rows(0).getAs[Long]("n_events") == 2L)
      assert(rows(0).getAs[Double]("total_value") == 3.0)
      assert(rows(0).getAs[Timestamp]("session_end") == ts("2024-03-01 10:10:00"))
    } finally q.stop()
  }

  test("intervalJoin attributes clicks to impressions within the delay bound") {
    val imps = MemoryStream[Event](spark)
    val clks = MemoryStream[Event](spark)
    val joined = EventStreams.intervalJoin(
      imps.toDF().select(col("event_id").as("imp_id"),
        col("ts").as("imp_ts"), col("user_id").as("imp_user")),
      clks.toDF().select(col("event_id").as("clk_id"),
        col("ts").as("clk_ts"), col("user_id").as("clk_user")),
      leftKey = "imp_user", rightKey = "clk_user",
      leftTs = "imp_ts", rightTs = "clk_ts",
      maxDelay = "30 minutes", lateness = "10 minutes")
    val q = joined.writeStream
      .format("memory").queryName("interval_spec")
      .outputMode(OutputMode.Append())
      .start()
    try {
      imps.addData(
        Event(10, ts("2024-03-01 10:00:00"), 1, "imp", 0.0),
        Event(11, ts("2024-03-01 10:00:00"), 2, "imp", 0.0))
      clks.addData(
        // user 1: click 20 min after the impression -> attributed
        Event(20, ts("2024-03-01 10:20:00"), 1, "click", 1.0),
        // user 2: click 40 min after -> outside maxDelay, dropped
        Event(21, ts("2024-03-01 10:40:00"), 2, "click", 1.0),
        // user 3: click with no impression at all -> dropped
        Event(22, ts("2024-03-01 10:05:00"), 3, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT imp_id, clk_id FROM interval_spec ORDER BY imp_id").collect()
      assert(rows.length == 1)
      assert(rows(0).getLong(0) == 10L && rows(0).getLong(1) == 20L)
    } finally q.stop()
  }

  test("driftGate: per-batch chisq verdicts against a persisted reference") {
    val dir = java.nio.file.Files.createTempDirectory("drift_gate").toString
    val refDir = s"$dir/ref"
    val repDir = s"$dir/rep"
    // reference snapshot: uniform over 1..20 (via value histogram)
    val ref = (1 to 20).map(i => Event(i.toLong,
      ts("2024-03-01 09:00:00"), 1, "m", i.toDouble)).toDF()
    graft.operators.Drift.valueHistogram(ref, "value")
      .write.parquet(refDir)
    val input = MemoryStream[Event](spark)
    val q = EventStreams.driftGate(input.toDF(), "value", refDir,
        bins = 4, reportDir = repDir)
      .start()
    try {
      // batch 0: same uniform distribution -> chisq exactly 0
      input.addData((1 to 20).map(i => Event(100 + i.toLong,
        ts("2024-03-01 10:00:00"), 1, "m", i.toDouble)))
      q.processAllAvailable()
      // batch 1: all mass in the top bin -> large chisq
      input.addData((1 to 20).map(i => Event(200 + i.toLong,
        ts("2024-03-01 11:00:00"), 1, "m", 20.0)))
      q.processAllAvailable()
      val rows = spark.read.parquet(repDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1)
      assert(rows.length == 2)
      assert(rows(0)._2 == 20L && rows(0)._3 == 0.0)
      assert(rows(1)._2 == 20L && rows(1)._3 > 20.0)
      // replaying a batch overwrites its partition, not duplicates it
      EventStreams.driftGateBatch(
        (1 to 20).map(i => Event(200 + i.toLong,
          ts("2024-03-01 11:00:00"), 1, "m", 20.0)).toDF(),
        1L, "value", refDir, 4, repDir)
      assert(spark.read.parquet(repDir).count() == 2)
    } finally q.stop()
  }

  test("ewmaUpdates: in-order replay is bit-identical to the batch fold") {
    val events = Seq(
      Event(1, ts("2024-03-01 10:00:00"), 1, "m", 4.0),
      Event(2, ts("2024-03-01 10:01:00"), 1, "m", 8.0),
      Event(3, ts("2024-03-01 10:02:00"), 1, "m", 1.0),
      Event(4, ts("2024-03-01 10:03:00"), 1, "m", 5.0),
      Event(5, ts("2024-03-01 10:00:30"), 2, "m", 10.0),
      Event(6, ts("2024-03-01 10:04:00"), 2, "m", 30.0))
    val input = MemoryStream[Event](spark)
    val q = EventStreams.ewmaUpdates(input.toDS(), alpha = 0.25)
      .writeStream.format("memory").queryName("ewma_spec")
      .outputMode(OutputMode.Update())
      .start()
    try {
      // two event-time-ordered micro-batches, keys interleaved — the
      // cross-batch fold must continue from state, not restart
      input.addData(events.take(3))
      q.processAllAvailable()
      input.addData(events.drop(3))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT user_id, n_events, last_value, ewma, drift FROM ewma_spec")
        .collect()
        .groupBy(_.getLong(0))
        .map { case (u, rs) => u -> rs.maxBy(_.getLong(1)) } // latest update
      val batch = graft.operators.Timeseries.ewma(
          events.toDF(), Seq("user_id"), Seq(col("ts"), col("event_id")),
          "value", alpha = 0.25)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .toMap
      assert(got.keySet == Set(1L, 2L))
      got.foreach { case (u, r) =>
        val b = batch(u)
        assert(r.getLong(1) == b._1, s"user $u n")
        assert(r.getDouble(2) == b._2, s"user $u last_value")
        assert(r.getDouble(3) == b._3, s"user $u ewma (bit-exact)")
        assert(r.getDouble(4) == b._4, s"user $u drift")
      }
    } finally q.stop()
  }
}
