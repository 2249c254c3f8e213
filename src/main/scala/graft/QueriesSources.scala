package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{Headers, TimeFns, UnitFns}
import graft.sinks.Jdbc
import graft.sources.{CsvSources, Gpx, JsonSources, Lake, Tables, ZipUtil}

/** Source/sink layer coverage (SURVEY §2.1 S1–S11), oracle-checked.
  *
  * Inputs are committed fixtures under `src/test/resources/fixtures`
  * (deterministic, mirroring the reference's raw-file shapes: JSON-array
  * exports, the summarizedActivities envelope, sentinel-laden CSV, GPX
  * tracks, the mass-export zip). Round-trip queries (CSV sink, JDBC)
  * write under `target/tmp` and read back, so the oracle can pin them to
  * the original parquet tables.
  */
object QueriesSources {

  private val FX =
    sys.env.getOrElse("GRAFT_FIXTURES_DIR", "/root/repo/src/test/resources/fixtures")
  private val TMP =
    sys.env.getOrElse("GRAFT_TMP_DIR", "/root/repo/target/tmp")

  /** Dataset-scoped TMP subdirectory. Any TMP artifact whose READ-BACK
    * can outlive one dataset's write — dynamic-partition-overwrite
    * catalogs, incremental lakes — MUST key its directory by the
    * dataset it was built from: dynamic overwrite preserves partitions
    * absent from the current input, so a shared dir polluted by a
    * larger scale factor silently changes every later run's answer
    * (round-13 red row: the sf10 sweep left 3000 stale day partitions
    * in hll_catalog; sf0.01 then read n_days=3000 vs the oracle's 30).
    * Full-overwrite round-trips (CSV sink, ORC, Derby tables) truncate
    * on write and are self-contained; only preserve-on-write artifacts
    * need this. Pinned by InfraSpec's cross-dataset idempotence test.
    */
  private[graft] def dsScoped(base: String, d: String): String =
    s"$TMP/$base/ds_" + d.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Dataset- AND process-scoped TMP dir, for write-then-read-back
    * round-trips (CSV sink, ORC, zip extraction). These are
    * self-contained within one query run, so nothing ever needs to
    * read another process's copy — but two overlapping harness JVMs
    * (the driver runs correctness and bench concurrently, possibly at
    * different scale factors) racing an overwrite-write against a
    * read of the SAME fixed dir can observe a half-deleted directory
    * or the other scale factor's rows. Process-keying removes the
    * race by construction, same move as the per-PID Derby database.
    */
  private[graft] def procScoped(base: String, d: String): String =
    s"${dsScoped(base, d)}_p${ProcessHandle.current().pid()}"

  /** Sketch size shared by q_profile_kmv_catalog's Spark side and its
    * DuckDB oracle (one constant, two engines — the KmvK discipline).
    */
  private val KmvCatalogK = 256

  /** Count-min grid shape + probe size shared by q_profile_cm_catalog's
    * Spark side and its DuckDB oracle (same discipline).
    */
  private val CmDepth = 3
  private val CmWidth = 256
  private val CmProbeK = 5

  // Embedded Derby for the JDBC sink surface: same write/verify/probe code
  // path as a warehouse sink, zero external service. derby.system.home
  // keeps derby.log + the db directory out of the repo root.
  //
  // The db directory is JVM-SCOPED (round-14 red row): embedded Derby
  // allows exactly ONE booting JVM per database directory, so a fixed
  // shared path made the second of two overlapping harness processes
  // (the driver runs correctness and bench as separate JVMs) fail with
  // XSDB6 "Another instance of Derby may have already booted". All
  // three JDBC queries create/drop their own tables per run, so no
  // cross-run state is lost by giving each process its own database.
  // Same lesson as dsScoped above, one level up: dataset-keyed for
  // preserve-on-write artifacts, PROCESS-keyed for single-booter
  // embedded stores. Pinned by InfraSpec's jvm-scoped-path test.
  private[graft] def derbyDbDir(pid: Long): String =
    s"$TMP/derby/graftdb-$pid"

  private lazy val derbyUrl: String = {
    System.setProperty("derby.system.home", s"$TMP/derby")
    new java.io.File(s"$TMP/derby").mkdirs()
    s"jdbc:derby:${derbyDbDir(ProcessHandle.current().pid())};create=true"
  }

  val qs: Seq[Q] = Seq(

    // ---------------------------------------------------------- S1/S2/U1
    // Glob discovery + whole-file JSON-array scan with explicit schema;
    // two date-stamped files with drifting schemas unify in one read.
    Q("q_s1_s2_json_glob_scan",
      (s, d) => JsonSources
        .scanJsonArrays(s, s"$FX/json_plain/*.json", JsonSources.activitySchema)
        .select(
          col("activityId").as("activity_id"),
          col("name"),
          col("activityType.typeKey").as("type_key"),
          (col("distance") / 100000.0).as("distance_km"),
          (col("duration") / 1000.0).as("duration_s"),
          timestamp_millis(col("beginTimestamp")).as("began"),
          col("calories"))
        .orderBy(col("activity_id")),
      Some(s"""SELECT activityId AS activity_id, name,
              |  activityType.typeKey AS type_key,
              |  distance / 100000.0 AS distance_km,
              |  duration / 1000.0 AS duration_s,
              |  epoch_ms(beginTimestamp) AS began, calories
              |FROM read_json_auto('$FX/json_plain/*.json', union_by_name=true)
              |ORDER BY activity_id""".stripMargin)),

    // ---------------------------------------------------------- S3/N5/F12
    // Envelope explode: one wrapper row -> one row per activity, plus the
    // pace derivation the reference applies on this exact source
    // (`extract_json_data.py:187-205`).
    Q("q_s3_envelope_explode",
      (s, d) => JsonSources
        .scanEnvelope(s, s"$FX/json_envelope/summarizedActivities.json")
        .select(
          col("activityId").as("activity_id"),
          col("activityName").as("aname"),
          col("activityType.typeKey").as("type_key"),
          timestamp_millis(col("startTimeGmt")).as("start_ts"),
          (col("distance") / 100000.0).as("distance_km"),
          TimeFns.paceFromSpeed(col("avgSpeed")).as("pace"))
        .orderBy(col("activity_id")),
      Some(s"""WITH x AS (
              |  SELECT unnest(summarizedActivitiesExport) AS a
              |  FROM read_json_auto('$FX/json_envelope/summarizedActivities.json')),
              |p AS (
              |  SELECT a.*, CAST(round(1000.0 / a.avgSpeed, 0) AS BIGINT) AS spk
              |  FROM x)
              |SELECT activityId AS activity_id, activityName AS aname,
              |  activityType.typeKey AS type_key,
              |  epoch_ms(startTimeGmt) AS start_ts,
              |  distance / 100000.0 AS distance_km,
              |  printf('%d:%02d', spk // 60, spk % 60) AS pace
              |FROM p ORDER BY activity_id""".stripMargin)),

    // -------------------------------------------------- S4 + F1/F16/F17
    // Header CSV where '--' sentinels and "9,876" thousands-commas survive
    // the scan as strings (pandas-parity), then get cleaned downstream.
    Q("q_s4_csv_scan_sentinels",
      (s, d) => {
        val schema = StructType(Seq("Date", "Name", "Distance", "Total Ascent",
          "Max Elevation", "Steps", "Calories")
          .map(StructField(_, StringType)))
        val raw = CsvSources.scan(s, s"$FX/csv/running.csv", schema)
        Headers.normalize(raw)
          .select(
            to_date(col("Date")).as("run_date"),
            col("Name").as("name"),
            col("Distance").cast("double").as("distance_km"),
            UnitFns.sentinelToDefault(col("Total_Ascent")).as("total_ascent"),
            UnitFns.sentinelToDefault(col("Max_Elevation")).as("max_elevation"),
            UnitFns.stripThousands(col("Steps")).as("steps"),
            col("Calories").cast("double").as("calories"))
          .orderBy(col("run_date"))
      },
      Some(s"""SELECT CAST("Date" AS DATE) AS run_date, "Name" AS name,
              |  CAST(Distance AS DOUBLE) AS distance_km,
              |  CASE WHEN "Total Ascent" = '--' THEN 0.0
              |       ELSE CAST(replace("Total Ascent", ',', '') AS DOUBLE)
              |  END AS total_ascent,
              |  CASE WHEN "Max Elevation" = '--' THEN 0.0
              |       ELSE CAST(replace("Max Elevation", ',', '') AS DOUBLE)
              |  END AS max_elevation,
              |  CAST(replace(Steps, ',', '') AS DOUBLE) AS steps,
              |  CAST(Calories AS DOUBLE) AS calories
              |FROM read_csv('$FX/csv/running.csv', header=true, all_varchar=true)
              |ORDER BY run_date""".stripMargin)),

    // -------------------------------------------------------------- S5
    // CSV sink round-trip: write nation as a header CSV, read it back
    // with an explicit schema; the oracle pins it to the source parquet.
    Q("q_s5_csv_sink_roundtrip",
      (s, d) => {
        val dir = procScoped("s5_nation_csv", d)
        CsvSources.write(Tables.nation(s, d), dir)
        val schema = StructType(Seq(
          StructField("n_nationkey", IntegerType),
          StructField("n_name", StringType),
          StructField("n_regionkey", IntegerType)))
        CsvSources.scan(s, dir, schema).orderBy(col("n_nationkey"))
      },
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey")),

    // --------------------------------------- mergeable sketch catalog
    // The incremental-profile pattern at 100 TB: one HLL sketch per
    // day PERSISTED to the lake (Profile.distinctSketchCatalog), the
    // month's distinct users answered by union-merging the stored
    // sketches — history is never rescanned, a new day appends one
    // sketch row. n_days / per-day exact sums / global exact are
    // oracle-checked; union_ok pins the merged estimate within 5% of
    // exact (deterministic for fixed data — the HLL certification
    // discipline).
    Q("q_profile_hll_catalog",
      (s, d) => graft.operators.Profile.distinctSketchCatalog(
        Tables.events(s, d), to_date(col("ts")), "user_id",
        dsScoped("hll_catalog", d)),
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    count(DISTINCT user_id) AS exact_day
             |  FROM events GROUP BY 1)
             |SELECT CAST(count(*) AS BIGINT) AS n_days,
             |  CAST(sum(exact_day) AS BIGINT) AS sum_day_distinct,
             |  (SELECT count(DISTINCT user_id) FROM events)
             |    AS exact_distinct,
             |  TRUE AS union_ok
             |FROM daily""".stripMargin)),

    // --------------------------------------- mergeable KMV catalog
    // The lifecycle face of the KMV set-operation sketch
    // (q_profile_kmv_setops certifies the estimator; this certifies
    // the STORAGE pattern): per-day k-min sketches persisted with
    // dynamic partition overwrite into a DATASET-SCOPED lake dir —
    // a new day appends one sketch row, history is never re-scanned,
    // and the global distinct is answered by merging the stored
    // k-long arrays (closure under union). Unlike the HLL catalog's
    // tolerance boolean, the merged estimate replays BIT-EXACTLY in
    // DuckDB (md5Long order statistics), so est_distinct is
    // hash-pinned. KMVSpec proves the append-merges-against-stored
    // contract (a day-only second call preserves prior partitions
    // and the merged sketch equals the full-corpus sketch).
    Q("q_profile_kmv_catalog",
      (s, d) => {
        val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
          .select(to_date(col("ts")).as("__day"),
            graft.functions.HashFns
              .md5Long(col("user_id").cast("string")).as("__h"))
        graft.operators.KMV.sketchCatalog(ev, col("__day"), "__h",
          KmvCatalogK, dsScoped("kmv_catalog", d))
      },
      Some {
        import graft.functions.HashFns
        val k = KmvCatalogK
        s"""WITH hh AS (
           |  SELECT DISTINCT CAST(ts AS DATE) AS day,
           |    ${HashFns.md5LongSql("CAST(user_id AS VARCHAR)")} AS h
           |  FROM events WHERE user_id IS NOT NULL),
           |dd AS (SELECT day, count(*) AS exact_day FROM hh
           |       GROUP BY day),
           |km AS (SELECT day, h, row_number() OVER (
           |         PARTITION BY day ORDER BY h) AS rn FROM hh),
           |sk AS (SELECT day, h FROM km WHERE rn <= $k),
           |uq AS (SELECT DISTINCT h FROM sk),
           |ur AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
           |       FROM uq),
           |us AS (SELECT h FROM ur WHERE rn <= $k),
           |mg AS (SELECT count(*) AS m, max(h) AS hk FROM us)
           |SELECT
           |  (SELECT CAST(count(*) AS BIGINT) FROM dd) AS n_days,
           |  (SELECT CAST(sum(exact_day) AS BIGINT) FROM dd)
           |    AS sum_day_distinct,
           |  (SELECT CAST(count(DISTINCT h) AS BIGINT) FROM hh)
           |    AS exact_distinct,
           |  (SELECT CASE WHEN m < $k THEN CAST(m AS DOUBLE)
           |     ELSE (CAST(${k - 1} AS DOUBLE) *
           |           POWER(CAST(2 AS DOUBLE), 60))
           |          / CAST(hk AS DOUBLE) END
           |   FROM mg) AS est_distinct""".stripMargin
      }),

    // --------------------------------------- mergeable count-min catalog
    // The FREQUENCY face of the catalog trilogy (distincts:
    // q_profile_hll_catalog; set operations: q_profile_kmv_catalog):
    // one 3×256 count-min grid per day persisted with dynamic
    // partition overwrite into a dataset-scoped lake dir — a new day
    // rewrites one partition, history is never re-scanned, and any
    // cross-period frequency probe is answered by cell-wise-summing
    // the stored grids (days × d × w tiny rows). The report probes the
    // true top-5 keys (exact face rides along, the q_profile_
    // heavy_hitters convention) against the MERGED STORED grid;
    // n_days comes from the catalog read-back, so directory pollution
    // fails the hash gate loudly (the r13 lesson). Integer cells +
    // md5-family hashes make every column replay bit-exactly.
    Q("q_profile_cm_catalog",
      (s, d) => graft.operators.CountMin.sketchCatalog(
        Tables.events(s, d).withColumn("__key",
          col("user_id").cast("string")),
        to_date(col("ts")), "__key", depth = CmDepth, width = CmWidth,
        probeK = CmProbeK, dsScoped("cm_catalog", d)),
      Some {
        import graft.functions.HashFns
        def cellSql(src: String) =
          s"""SELECT $src.*, CAST(t.d AS INT) AS d,
             |    (CASE CAST(t.d AS INT)
             |${(0 until CmDepth).map(i =>
                 s"       WHEN $i THEN ${HashFns.hashFamilySql("h", i)}")
                 .mkString("\n")}
             |     END) % $CmWidth AS bucket
             |  FROM $src, unnest(range($CmDepth)) t(d)""".stripMargin
        s"""WITH k AS (
           |  SELECT CAST(user_id AS VARCHAR) AS key, ts FROM events
           |  WHERE user_id IS NOT NULL),
           |hh AS (SELECT key, ${HashFns.md5LongSql("key")} AS h FROM k),
           |cells AS (${cellSql("hh")}),
           |sk AS (SELECT d, bucket, count(*) AS c FROM cells
           |       GROUP BY d, bucket),
           |top AS (
           |  SELECT key, count(*) AS exact_n FROM k GROUP BY key
           |  ORDER BY exact_n DESC, key LIMIT $CmProbeK),
           |th AS (SELECT key, exact_n, ${HashFns.md5LongSql("key")} AS h
           |       FROM top),
           |probes AS (${cellSql("th")}),
           |est AS (
           |  SELECT key, exact_n, min(c) AS cm_estimate
           |  FROM probes JOIN sk USING (d, bucket)
           |  GROUP BY key, exact_n)
           |SELECT
           |  (SELECT count(DISTINCT CAST(ts AS DATE)) FROM k) AS n_days,
           |  key, exact_n, cm_estimate,
           |  cm_estimate - exact_n AS over_count
           |FROM est ORDER BY exact_n DESC, key""".stripMargin
      }),

    // ------------------------------------- mergeable histogram catalog
    // The DISTRIBUTIONS face of the catalog family (distincts / set
    // ops / frequencies / and now exact value distributions): one
    // (value, count) histogram per day persisted with dynamic
    // partition overwrite into a dsScoped lake dir. Unlike the sketch
    // catalogs the merge is EXACT — per-value count addition — so the
    // served "p99 over the whole period" is the TRUE type-7 quantile
    // of the merged distribution, from days × distinct-values tiny
    // rows however many raw rows the period holds; a new day appends
    // one partition and history is never re-scanned. events.value
    // carries a natural 0.01 grid (bounded distinct domain at any
    // scale — the exactByHistogram contract holds without
    // quantization). n_days rides from the catalog READ-BACK so
    // directory pollution fails the hash gate loudly; quantiles are
    // the shared interp form, stabilized to 6dp on both engines.
    Q("q_profile_pctl_catalog",
      (s, d) => {
        def stab(c: org.apache.spark.sql.Column) =
          graft.functions.Stabilize.stab(c, 6)
        graft.operators.Percentiles.histogramCatalog(
            Tables.events(s, d), to_date(col("ts")), "value",
            Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99"),
            dsScoped("pctl_catalog", d))
          .select(col("n_days"), stab(col("p50")).as("p50"),
            stab(col("p90")).as("p90"), stab(col("p99")).as("p99"),
            col("n"))
      },
      Some {
        def q(p: String) = graft.functions.Stabilize.stabSql(
          s"quantile_cont(value, $p)", 6)
        s"""SELECT
           |  (SELECT count(DISTINCT CAST(ts AS DATE)) FROM events
           |   WHERE value IS NOT NULL) AS n_days,
           |  ${q("0.5")} AS p50,
           |  ${q("0.9")} AS p90,
           |  ${q("0.99")} AS p99,
           |  count(value) AS n
           |FROM events""".stripMargin
      }),

    // ------------------------------------------------- ORC lake surface
    // Columnar-format breadth beyond parquet: write a lineitem slice as
    // ORC partitioned by return flag, read it back with a partition
    // filter AND a row-group predicate. At 100 TB the partition filter
    // prunes directories before any I/O and the quantity predicate
    // reaches the ORC reader as a pushed filter (ORC keeps min/max
    // stripe statistics exactly like parquet row groups), so the scan
    // touches one flag's stripes, not the table. The oracle pins the
    // full write→read→filter chain to the source parquet.
    Q("q_orc_roundtrip",
      (s, d) => {
        val dir = procScoped("orc_lineitem", d)
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_returnflag"), col("l_quantity"),
            col("l_extendedprice"), col("l_shipdate"))
          .write.mode("overwrite").partitionBy("l_returnflag").orc(dir)
        s.read.orc(dir)
          .filter(col("l_returnflag") === "R" && col("l_quantity") >= 45)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_extendedprice"), col("l_shipdate"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
             |  l_extendedprice, l_shipdate
             |FROM lineitem
             |WHERE l_returnflag = 'R' AND l_quantity >= 45
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ------------------------------------------------- S6/S7/S8/S11 JDBC
    // replace-load the first half, append the second, probe existence,
    // verify the count, then read back through SQL passthrough. The oracle
    // pins the round-trip to the source parquet.
    Q("q_s6_s7_s8_s11_jdbc_roundtrip",
      (s, d) => {
        val url = derbyUrl
        val base = Tables.orders(s, d).select(
          col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          to_date(col("o_orderdate")).as("odate"))
        Jdbc.load(base.filter(col("o_orderkey") < 1000), url,
          "graft_orders", ifExists = "replace", batchSize = 1000)
        Jdbc.load(base.filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 2000),
          url, "graft_orders", ifExists = "append", batchSize = 500)
        require(Jdbc.tableExists(url, "graft_orders"), "S11 probe failed")
        val n = Jdbc.rowCount(s, url, "graft_orders")
        Jdbc.query(s, url,
            """SELECT "o_orderkey", "o_custkey", "o_totalprice", "odate"
              |FROM graft_orders""".stripMargin)
          .withColumn("verified_n", lit(n))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice,
             |  CAST(o_orderdate AS DATE) AS odate,
             |  (SELECT COUNT(*) FROM orders WHERE o_orderkey < 2000) AS verified_n
             |FROM orders WHERE o_orderkey < 2000
             |ORDER BY o_orderkey""".stripMargin)),

    // ------------------------------------------------------ MERGE upsert
    // The reference's "upsert" load_strategy (config.template.yaml:31,
    // documented but never implemented in db_utils.py): initial load of
    // keys < 1000, then an OVERLAPPING batch (500–1499, prices doubled)
    // upserted via stage + one atomic MERGE INTO (Jdbc.upsert). The
    // read-back must show updated rows for 500–999, originals below
    // 500, inserts for 1000–1499 — which the oracle states relationally
    // over the source table, proving the engine-side MERGE applied
    // exactly the upsert semantics.
    Q("q_jdbc_merge_upsert",
      (s, d) => {
        val url = derbyUrl
        val base = Tables.orders(s, d).select(
          col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        Jdbc.load(base.filter(col("o_orderkey") < 1000), url,
          "graft_upsert", ifExists = "replace", batchSize = 1000)
        Jdbc.upsert(
          base.filter(col("o_orderkey") >= 500 && col("o_orderkey") < 1500)
            .withColumn("o_totalprice", col("o_totalprice") * 2),
          url, "graft_upsert", keys = Seq("o_orderkey"))
        Jdbc.query(s, url,
            """SELECT "o_orderkey", "o_custkey", "o_totalprice"
              |FROM graft_upsert""".stripMargin)
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  CASE WHEN o_orderkey >= 500 THEN o_totalprice * 2
             |       ELSE o_totalprice END AS o_totalprice
             |FROM orders WHERE o_orderkey < 1500
             |ORDER BY o_orderkey""".stripMargin)),

    // SCD2 warehouse maintenance end-to-end (Jdbc.scd2Upsert): two
    // batches of a customer-tier dimension — batch 2 changes every
    // third key — then a deliberate REPLAY of batch 2, and the final
    // table reads back for the oracle. The oracle derives the exact
    // interval set from the customer table: changed keys carry a
    // closed first interval + an open second; unchanged keys one open
    // interval; the replay must contribute nothing (idempotency is
    // part of the hash contract, not just a spec claim).
    Q("q_jdbc_scd2",
      (s, d) => {
        val url = derbyUrl
        if (Jdbc.tableExists(url, "graft_scd2"))
          Jdbc.execute(url, "DROP TABLE graft_scd2")
        val base = Tables.customer(s, d).filter(col("c_custkey") < 200)
          .select(col("c_custkey"), col("c_mktsegment").as("seg"))
        val b1 = base.withColumn("ts", lit(java.sql.Date.valueOf("2024-01-01")))
        val b2 = base.withColumn("seg",
            when(col("c_custkey") % 3 === 0, lit("CHANGED"))
              .otherwise(col("seg")))
          .withColumn("ts", lit(java.sql.Date.valueOf("2024-02-01")))
        Jdbc.scd2Upsert(b1, url, "graft_scd2", Seq("c_custkey"),
          Seq("seg"), "ts")
        Jdbc.scd2Upsert(b2, url, "graft_scd2", Seq("c_custkey"),
          Seq("seg"), "ts")
        Jdbc.scd2Upsert(b2, url, "graft_scd2", Seq("c_custkey"),
          Seq("seg"), "ts") // crash-replay: must be a no-op
        Jdbc.query(s, url,
            """SELECT "c_custkey", CAST("seg" AS VARCHAR(64)) AS "seg",
              |"valid_from", "valid_to", "is_current"
              |FROM graft_scd2""".stripMargin)
          .orderBy(col("c_custkey"), col("valid_from"))
      },
      Some("""SELECT c_custkey, c_mktsegment AS seg,
             |  DATE '2024-01-01' AS valid_from,
             |  CASE WHEN c_custkey % 3 = 0 THEN DATE '2024-02-01' END
             |    AS valid_to,
             |  c_custkey % 3 <> 0 AS is_current
             |FROM customer WHERE c_custkey < 200
             |UNION ALL
             |SELECT c_custkey, 'CHANGED', DATE '2024-02-01', NULL, TRUE
             |FROM customer WHERE c_custkey < 200 AND c_custkey % 3 = 0
             |ORDER BY c_custkey, valid_from""".stripMargin)),

    // -------------------------------------------------------------- S9
    // GPX trkpt scan over a folder glob (XML source, rowTag=trkpt); the
    // oracle is a hand-written expected-points CSV committed next to the
    // .gpx fixtures.
    Q("q_s9_gpx_scan",
      (s, d) => Gpx.scanPoints(s, s"$FX/gpx/*.gpx")
        .orderBy(col("point_date"), col("point_time")),
      Some(s"""SELECT CAST(point_date AS DATE) AS point_date,
              |  point_time,
              |  CAST(latitude AS DOUBLE) AS latitude,
              |  CAST(longitude AS DOUBLE) AS longitude,
              |  CAST(elevation AS DOUBLE) AS elevation
              |FROM read_csv('$FX/gpx/expected_points.csv', header=true,
              |              all_varchar=true)
              |ORDER BY point_date, point_time""".stripMargin)),

    // --------------------------------------------- GPX track statistics
    // The engine-side payoff of the GPX scan: per-track (per-date)
    // distance and climb — the reference maps these routes in PBI; a
    // pipeline computes their stats in-engine. Consecutive-point
    // haversine steps via a lag window PARTITIONED BY track (a track
    // is bounded by its recording, so partitions are naturally small),
    // each step stabilized to 1e-6 km (1 mm — far above the ~1e-13
    // transcendental-chain noise) and DECIMAL-summed; climb sums only
    // positive elevation deltas (exact double subtraction on identical
    // inputs, same stabilize-then-sum fold). Oracle replays the same
    // formula over the committed expected_points.csv.
    Q("q_gpx_track_stats",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val stab6 = (c: org.apache.spark.sql.Column) =>
          graft.functions.Stabilize.stab(c, 6)
        val w = Window.partitionBy(col("point_date"))
          .orderBy(col("point_time"))
        val pts = Gpx.scanPoints(s, s"$FX/gpx/*.gpx")
          .withColumn("plat", lag(col("latitude"), 1).over(w))
          .withColumn("plon", lag(col("longitude"), 1).over(w))
          .withColumn("pele", lag(col("elevation"), 1).over(w))
        pts
          .select(col("point_date"),
            when(col("plat").isNotNull,
              stab6(graft.functions.Geo.haversineKm(col("plat"),
                col("plon"), col("latitude"), col("longitude")))
                .cast("decimal(24,9)"))
              .otherwise(lit(0).cast("decimal(24,9)")).as("__step"),
            when(col("pele").isNotNull && col("elevation") > col("pele"),
              stab6(col("elevation") - col("pele")).cast("decimal(24,9)"))
              .otherwise(lit(0).cast("decimal(24,9)")).as("__climb"))
          .groupBy(col("point_date"))
          .agg(count(lit(1)).as("n_points"),
            sum(col("__step")).cast("double").as("dist_km"),
            sum(col("__climb")).cast("double").as("elev_gain_m"))
          .orderBy(col("point_date"))
      },
      Some {
        val hav = graft.functions.Geo.haversineKmSql(
          "plat", "plon", "latitude", "longitude")
        val stab = graft.functions.Stabilize.stabSql(_: String, 6)
        s"""WITH p AS (
           |  SELECT CAST(point_date AS DATE) AS point_date, point_time,
           |    CAST(latitude AS DOUBLE) AS latitude,
           |    CAST(longitude AS DOUBLE) AS longitude,
           |    CAST(elevation AS DOUBLE) AS elevation
           |  FROM read_csv('$FX/gpx/expected_points.csv', header=true,
           |                all_varchar=true)),
           |l AS (
           |  SELECT point_date,
           |    lag(latitude) OVER w AS plat,
           |    lag(longitude) OVER w AS plon,
           |    lag(elevation) OVER w AS pele,
           |    latitude, longitude, elevation
           |  FROM p WINDOW w AS (PARTITION BY point_date
           |                      ORDER BY point_time)),
           |t AS (
           |  SELECT point_date,
           |    CASE WHEN plat IS NOT NULL THEN
           |      CAST(${stab(hav)} AS DECIMAL(24,9))
           |    ELSE CAST(0 AS DECIMAL(24,9)) END AS step,
           |    CASE WHEN pele IS NOT NULL AND elevation > pele THEN
           |      CAST(${stab("elevation - pele")} AS DECIMAL(24,9))
           |    ELSE CAST(0 AS DECIMAL(24,9)) END AS climb
           |  FROM l)
           |SELECT point_date, CAST(count(*) AS BIGINT) AS n_points,
           |  CAST(sum(step) AS DOUBLE) AS dist_km,
           |  CAST(sum(climb) AS DOUBLE) AS elev_gain_m
           |FROM t GROUP BY point_date ORDER BY point_date""".stripMargin
      }),

    // -------------------------------------------------------------- S10
    // Zip extraction prep + scan of the contained CSV; the oracle reads
    // the committed plain copy of the same file.
    Q("q_s10_zip_extract_scan",
      (s, d) => {
        val paths = ZipUtil.extract(s"$FX/zip/garmin_export.zip", procScoped("s10", d))
        val csv = paths.find(_.toString.endsWith("daily_steps.csv"))
          .getOrElse(sys.error("daily_steps.csv not in archive")).toString
        val schema = StructType(Seq(
          StructField("calendarDate", DateType),
          StructField("totalSteps", LongType),
          StructField("totalDistanceMeters", DoubleType)))
        CsvSources.scan(s, csv, schema)
          .select(col("calendarDate").as("cal_date"), col("totalSteps"),
                  col("totalDistanceMeters").as("dist_m"))
          .orderBy(col("cal_date"))
      },
      Some(s"""SELECT CAST(calendarDate AS DATE) AS cal_date, totalSteps,
              |  CAST(totalDistanceMeters AS DOUBLE) AS dist_m
              |FROM read_csv('$FX/zip_expected/daily_steps.csv', header=true)
              |ORDER BY cal_date""".stripMargin)),

    // ---------------------------------------------- parquet lake round trip
    // The canonical lake layout end-to-end: write day-partitioned
    // parquet (Lake.writeByDay), read it back through partition
    // discovery, and aggregate ONE day — the filter hits the `day=`
    // directory via partition pruning (asserted in LakeSpec), so only
    // that day's files are read. The oracle aggregates the source
    // events directly: the write -> partition -> read -> prune chain
    // must be value-preserving.
    Q("q_lake_roundtrip",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_lake_rt").toString
        val ev = Tables.events(s, d).filter(col("user_id") < 100)
        Lake.writeByDay(ev, "ts", dir)
        Lake.read(s, dir)
          .filter(col("day") === lit("2024-01-03"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double")
              .as("total"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM events
             |WHERE user_id < 100 AND CAST(ts AS DATE) = DATE '2024-01-03'
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ------------------------------------------- dynamic partition pruning
    // The RUNTIME half of the lake's pruning story: q_lake_roundtrip
    // pins STATIC PartitionFilters (a literal day predicate); here the
    // day set comes from a FILTERED DIMENSION, unknowable at plan
    // time, and Catalyst inserts a DynamicPruningExpression into the
    // fact scan's partition filters — the dim's broadcast result
    // decides AT RUNTIME which day= directories the fact scan reads
    // (PlanSpec pins the executed plan; the dim broadcast is reused as
    // the pruning filter, so DPP costs nothing extra). At 100 TB this
    // is the difference between scanning 7 days and scanning 3 years
    // whenever the date gate lives in a dimension instead of a
    // literal.
    Q("q_lake_dpp_join",
      (s, d) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft_lake_dpp").toString
        val ev = Tables.events(s, d).filter(col("user_id") < 200)
        Lake.writeByDay(ev, "ts", s"$root/fact")
        // day dimension with a non-key attribute (weekday) — the
        // filter below is on the ATTRIBUTE, so the surviving day set
        // exists only after the dim scan runs
        ev.select(to_date(col("ts")).as("day")).distinct()
          .withColumn("wd", dayofweek(col("day")))
          .write.mode("overwrite").parquet(s"$root/dim")
        val fact = Lake.read(s, s"$root/fact")
        val mondays = s.read.parquet(s"$root/dim")
          .filter(col("wd") === 2).select(col("day"))
        fact.join(mondays, Seq("day"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double")
              .as("total"))
          .orderBy(col("event_type"))
      },
      // Spark dayofweek: Sunday=1 → Monday=2; DuckDB: Sunday=0 →
      // Monday=1. Both literals below mean Monday.
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM events
             |WHERE user_id < 200 AND dayofweek(CAST(ts AS DATE)) = 1
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---------------------------------------------- Z-order layout key
    // Certification of the lake's multi-dimensional clustering key
    // (Lake.zValue — the OPTIMIZE ZORDER BY primitive): every lineitem
    // row's (l_partkey, l_suppkey) interleaves into a 32-bit Morton
    // code, and the report buckets rows by the code's top nibble —
    // each of the 16 z-buckets must cover one bounded QUADRANT of the
    // key space (its min/max on BOTH dims stay inside the quadrant's
    // rectangle, which is exactly why per-file min/max stats can skip
    // scans on either column after a z-sort; LakeZOrderSpec asserts
    // the physical-file version over writeZOrdered). The oracle
    // mirrors the shift-mask spread operation for operation.
    Q("q_lake_zorder",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey"))
        // rank-reduce each dim to its 16-bit range (the scaladoc's
        // required pre-step; exact-integer scaling so both engines
        // agree bit-for-bit), THEN interleave — raw keys at small SF
        // occupy few bits and would land every row in bucket 0
        val st = li.agg(max(col("l_partkey")).as("xm"),
          max(col("l_suppkey")).as("ym"))
        li.crossJoin(broadcast(st))
          .withColumn("x16",
            floor(col("l_partkey") * 65536 / (col("xm") + 1)).cast("long"))
          .withColumn("y16",
            floor(col("l_suppkey") * 65536 / (col("ym") + 1)).cast("long"))
          .withColumn("bucket",
            shiftright(Lake.zValue(col("x16"), col("y16")), 28))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("l_partkey")).as("min_pk"),
            max(col("l_partkey")).as("max_pk"),
            min(col("l_suppkey")).as("min_sk"),
            max(col("l_suppkey")).as("max_sk"))
          .orderBy(col("bucket"))
      },
      Some("""WITH st AS (
             |  SELECT max(l_partkey) AS xm, max(l_suppkey) AS ym
             |  FROM lineitem),
             |t0 AS (
             |  SELECT l_partkey AS pk, l_suppkey AS sk,
             |    CAST(floor(l_partkey * 65536 / (xm + 1)) AS BIGINT)
             |      & 65535 AS x0,
             |    CAST(floor(l_suppkey * 65536 / (ym + 1)) AS BIGINT)
             |      & 65535 AS y0
             |  FROM lineitem, st),
             |t1 AS (SELECT *, ((x0 | (x0 << 8)) & 16711935) AS x1,
             |               ((y0 | (y0 << 8)) & 16711935) AS y1 FROM t0),
             |t2 AS (SELECT *, ((x1 | (x1 << 4)) & 252645135) AS x2,
             |               ((y1 | (y1 << 4)) & 252645135) AS y2 FROM t1),
             |t3 AS (SELECT *, ((x2 | (x2 << 2)) & 858993459) AS x3,
             |               ((y2 | (y2 << 2)) & 858993459) AS y3 FROM t2),
             |t4 AS (SELECT *, ((x3 | (x3 << 1)) & 1431655765) AS x4,
             |               ((y3 | (y3 << 1)) & 1431655765) AS y4 FROM t3),
             |z AS (SELECT pk, sk,
             |        ((x4 | (y4 << 1)) >> 28) AS bucket FROM t4)
             |SELECT bucket, count(*) AS n,
             |  min(pk) AS min_pk, max(pk) AS max_pk,
             |  min(sk) AS min_sk, max(sk) AS max_sk
             |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // -------------------------------------- range-partition planner
    // Balanced split points for a sorted lake layout (the deterministic
    // analogue of RangePartitioner's reservoir sampling): boundaries
    // are exact order statistics on a floor() quantization grid, ids
    // assigned by counting boundaries below each row's grid value —
    // all integer arithmetic, so the plan replays bit-for-bit in the
    // oracle. See Lake.rangePartitionPlan for the shuffle shape (one
    // histogram shuffle + broadcast boundary array, never a data sort).
    Q("q_lake_range_partition",
      (s, d) => Lake.rangePartitionPlan(
        Tables.lineitem(s, d), "l_extendedprice", k = 8),
      Some("""WITH vals AS (
             |  SELECT CAST(floor(l_extendedprice) AS BIGINT) AS gv
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vals),
             |hist AS (SELECT gv, count(*) AS c FROM vals GROUP BY gv),
             |cum AS (SELECT gv, sum(c) OVER (ORDER BY gv) AS cum
             |        FROM hist),
             |bnd AS (
             |  SELECT t.i, min(cum.gv) AS b
             |  FROM cum, n, unnest(range(1, 8)) t(i)
             |  WHERE cum.cum >= (t.i * n.n + 7) // 8
             |  GROUP BY t.i),
             |asg AS (
             |  SELECT v.gv, CAST((SELECT count(*) FROM bnd
             |    WHERE bnd.b < v.gv) AS BIGINT) AS pid
             |  FROM vals v)
             |SELECT pid, CAST(count(*) AS BIGINT) AS n_rows,
             |  min(gv) AS lo, max(gv) AS hi
             |FROM asg GROUP BY pid ORDER BY pid""".stripMargin)),

    // --------------------------------------- compaction packing plan
    // First-fit-decreasing packing of per-day "file" sizes into
    // target-capacity output groups — the grouping step of small-file
    // compaction. The fold input is file METADATA (30 rows), so the
    // sequential FFD costs nothing at any data scale; the oracle
    // replays the identical fold with a list-accumulator list_reduce,
    // including first-fit index arithmetic (see Lake.packPlan).
    Q("q_lake_pack_plan",
      (s, d) => Lake.packPlan(
        graft.sources.Tables.events(s, d)
          .select(to_date(col("ts")).as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("sz")),
        "sz", "day", targetBins = 8),
      Some {
        val ip = "list_position(list_transform(acc, " +
          "a -> a + t[1] <= one.cap), true)"
        s"""WITH it AS (
           |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT)
           |    AS sz
           |  FROM events GROUP BY 1),
           |one AS (
           |  SELECT list(sz ORDER BY sz DESC, day) AS sizes,
           |    CAST(sum(sz) // 8 AS BIGINT) AS cap
           |  FROM it),
           |packed AS (
           |  SELECT one.cap,
           |    list_reduce(list_transform(sizes, x -> [x]),
           |      (acc, t) -> CASE
           |        WHEN $ip = 0 THEN list_concat(acc, t)
           |        ELSE list_concat(list_concat(
           |          list_slice(acc, 1, $ip - 1),
           |          [acc[$ip] + t[1]]),
           |          list_slice(acc, $ip + 1, len(acc)))
           |      END) AS loads
           |  FROM one)
           |SELECT CAST(u.i AS BIGINT) AS bin,
           |  loads[CAST(u.i AS INT)] AS load, cap,
           |  CAST(loads[CAST(u.i AS INT)] AS DOUBLE)
           |    / CAST(cap AS DOUBLE) AS util
           |FROM packed, unnest(range(1, len(loads) + 1)) u(i)
           |ORDER BY bin""".stripMargin
      }),

    // --------------------------------------------- snapshot CDC recovery
    // operators/SnapshotDiff: recover the insert/delete/update stream
    // from two full snapshots — the bootstrap for every MERGE/SCD2 sink
    // in sinks/Jdbc when the upstream can only dump. Snapshots are
    // carved deterministically from orders (old = keys not divisible by
    // 7; new = keys not divisible by 5, with price bumped +1.00 on keys
    // divisible by 3), so the expected classes are pure key arithmetic
    // the oracle replays. One full-outer sort-merge join on the key,
    // null-safe compares, unchanged rows dropped — the output is the
    // size of the CHANGE, not the snapshot.
    Q("q_lake_snapshot_diff",
      (s, d) => {
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderstatus"))
        val oldSnap = orders.filter(col("o_orderkey") % 7 =!= 0)
        val newSnap = orders.filter(col("o_orderkey") % 5 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 1.0d)
              .otherwise(col("o_totalprice")))
        graft.operators.SnapshotDiff.diff(oldSnap, newSnap,
            Seq("o_orderkey"), Seq("o_totalprice", "o_orderstatus"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey, o_totalprice, o_orderstatus
             |  FROM orders WHERE o_orderkey % 7 <> 0),
             |n AS (
             |  SELECT o_orderkey,
             |    CASE WHEN o_orderkey % 3 = 0
             |      THEN o_totalprice + 1.0 ELSE o_totalprice
             |    END AS o_totalprice, o_orderstatus
             |  FROM orders WHERE o_orderkey % 5 <> 0),
             |j AS (
             |  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             |    CASE
             |      WHEN o.o_orderkey IS NULL THEN 'insert'
             |      WHEN n.o_orderkey IS NULL THEN 'delete'
             |      WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
             |        OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
             |        THEN 'update'
             |    END AS change_type,
             |    o.o_totalprice AS old_o_totalprice,
             |    n.o_totalprice AS new_o_totalprice,
             |    o.o_orderstatus AS old_o_orderstatus,
             |    n.o_orderstatus AS new_o_orderstatus
             |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
             |SELECT * FROM j WHERE change_type IS NOT NULL
             |ORDER BY o_orderkey""".stripMargin))
  )
}
