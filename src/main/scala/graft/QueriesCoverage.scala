package graft

import org.apache.spark.sql.functions._
import graft.functions.{Headers, TimeFns}
import graft.operators.{AsOf, Dedup, GeoJoin, Profile, RangeJoin, Salt, Windows}
import graft.sources.Tables

/** Oracle-checked coverage for SURVEY §2 operators that existed as
  * building blocks without correctness evidence (VERDICT r1 #7/#8/#10):
  * the duration/pace scalar family (F3/F9/F12/F13/F14), the higher-order
  * array-of-struct extraction (N3/N5), argmax-per-group by value (A11),
  * positional drops / presentation reorder (P2/P10), null-predicate +
  * defaulted projection (P6/P11), two-phase uninformative-column pruning
  * (P3/P4), and header normalization + parse-or-null timestamps (F1/F2).
  */
object QueriesCoverage {

  val qs: Seq[Q] = Seq(

    // --------------------------------------------- F3/F9/F12/F13/F14
    // Round-trips through every duration/pace function, seeded from
    // deterministic integer columns so both engines compute identical
    // inputs. Reference semantics: `ETL Scripts/transform_running_data.py:
    // 140-201`, `extract_json_data.py:168-205`, `transform_all_datasets.py:
    // 313-316`.
    Q("q_f3_f9_f12_durations",
      (s, d) => {
        val o = Tables.orders(s, d).filter(col("o_orderkey") < 2000)
        val base = o.select(
          col("o_orderkey"),
          // parquet TIMESTAMP_NTZ -> session-UTC timestamp for epoch math
          col("o_orderdate").cast("timestamp").as("o_orderdate"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("epoch_ms"),
          (col("o_orderkey") % 90000).as("secs"),
          ((col("o_custkey") % 40 + 1) / 10.0).as("speed_ms"))
        base.select(
            col("o_orderkey"),
            col("epoch_ms"),
            // F3: epoch millis -> timestamp
            TimeFns.epochMillisToTimestamp(col("epoch_ms")).as("ts_from_ms"),
            // F10 then F9: seconds -> "H:MM:SS" -> seconds (identity)
            TimeFns.secondsToHms(col("secs")).as("hms"),
            TimeFns.hmsToSeconds(TimeFns.secondsToHms(col("secs"))).as("secs_rt"),
            // F12: speed m/s -> pace "M:SS"/km; F13: pace -> seconds
            TimeFns.paceFromSpeed(col("speed_ms")).as("pace"),
            TimeFns.paceToSeconds(TimeFns.paceFromSpeed(col("speed_ms")))
              .as("pace_secs"),
            // F14: duration between two timestamps, in seconds
            TimeFns.durationSeconds(col("o_orderdate"),
              expr("timestampadd(SECOND, secs, o_orderdate)"))
              .as("dur_secs"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey, o_orderdate,
             |    epoch_ms(o_orderdate) AS epoch_ms,
             |    o_orderkey % 90000 AS secs,
             |    (o_custkey % 40 + 1) / 10.0 AS speed_ms
             |  FROM orders WHERE o_orderkey < 2000),
             |p AS (
             |  SELECT *, CAST(round(1000.0 / speed_ms, 0) AS BIGINT) AS spk
             |  FROM base)
             |SELECT o_orderkey, epoch_ms,
             |  epoch_ms(epoch_ms) AS ts_from_ms,
             |  printf('%d:%02d:%02d', secs // 3600, (secs % 3600) // 60, secs % 60)
             |    AS hms,
             |  secs AS secs_rt,
             |  printf('%d:%02d', spk // 60, spk % 60) AS pace,
             |  (spk // 60) * 60 + spk % 60 AS pace_secs,
             |  date_diff('second', o_orderdate,
             |            o_orderdate + secs * INTERVAL 1 SECOND) AS dur_secs
             |FROM p ORDER BY o_orderkey""".stripMargin)),

    // ------------------------------------------------------------ N3/N5
    // Array-of-struct normalize + take the tagged element: the reference
    // keeps the `type == 'TOTAL'` element of `aggregatorList`
    // (`PBI ...Wrangling.ipynb:2275-2302`). Here each order's lineitems
    // become an array of structs; the higher-order `filter` + `get`
    // extracts the first A-flagged element — order-independent because the
    // array is sorted on a unique leading field first.
    Q("q_n3_array_filter_total",
      (s, d) => {
        val li = Tables.lineitem(s, d).filter(col("l_orderkey") < 3000)
        val agg = li.groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(struct(
            col("l_linenumber").as("line"),
            col("l_returnflag").as("rtype"),
            col("l_quantity").as("qty")))).as("items"))
        val aItems = filter(col("items"), x => x.getField("rtype") === "A")
        agg.select(
            col("l_orderkey"),
            size(col("items")).cast("long").as("n_items"),
            size(aItems).cast("long").as("n_a"),
            // `get` is 0-based and null-safe on out-of-bounds (ANSI-safe),
            // mirroring DuckDB's list[1] returning NULL on empty lists.
            get(aItems, lit(0)).getField("line").as("first_a_line"),
            get(aItems, lit(0)).getField("qty").as("first_a_qty"))
          .orderBy(col("l_orderkey"))
      },
      Some("""WITH agg AS (
             |  SELECT l_orderkey,
             |    list_sort(list(struct_pack(
             |      line := l_linenumber, rtype := l_returnflag,
             |      qty := l_quantity))) AS items
             |  FROM lineitem WHERE l_orderkey < 3000 GROUP BY l_orderkey)
             |SELECT l_orderkey,
             |  len(items) AS n_items,
             |  CAST(len(list_filter(items, x -> x.rtype = 'A')) AS BIGINT) AS n_a,
             |  list_filter(items, x -> x.rtype = 'A')[1].line AS first_a_line,
             |  list_filter(items, x -> x.rtype = 'A')[1].qty AS first_a_qty
             |FROM agg ORDER BY l_orderkey""".stripMargin)),

    // -------------------------------------------------------------- A11
    // Keep the max-valued row per day (reference: longest run per
    // calendarDate, `ML_Model_...ipynb:2515`) — same window pattern as
    // A10 but ordered by a measure, with explicit tiebreakers.
    Q("q_a11_keep_max_per_day",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .withColumn("ship_day", to_date(col("l_shipdate")))
        Dedup.keepLatest(li, Seq("ship_day"), col("l_quantity"),
            Seq(col("l_orderkey").desc, col("l_linenumber").desc))
          .select(col("ship_day"), col("l_orderkey"), col("l_linenumber"),
                  col("l_quantity"))
          .orderBy(col("ship_day"))
      },
      Some("""SELECT ship_day, l_orderkey, l_linenumber, l_quantity FROM (
             |  SELECT CAST(l_shipdate AS DATE) AS ship_day, l_orderkey,
             |         l_linenumber, l_quantity,
             |         row_number() OVER (
             |           PARTITION BY CAST(l_shipdate AS DATE)
             |           ORDER BY l_quantity DESC, l_orderkey DESC,
             |                    l_linenumber DESC) AS rn
             |  FROM lineitem) WHERE rn = 1 ORDER BY ship_day""".stripMargin)),

    // ---------------------------------------------------------- P2/P10
    // Positional column drop (`iloc[:, :-2]`, `PBI ...Wrangling.ipynb:820`)
    // recast as a schema-ordered select, then a presentation reorder.
    Q("q_p2_p10_positional",
      (s, d) => {
        val c = Tables.customer(s, d)
        val kept = c.columns.dropRight(2) // P2: drop last 2 columns
        val dropped = c.select(kept.map(col).toSeq: _*)
        // P10: presentation reorder — key column last
        dropped.select((dropped.columns.tail :+ dropped.columns.head)
            .map(col).toSeq: _*)
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_name, c_nationkey, c_custkey
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // ---------------------------------------------------------- P6/P11
    // Null-predicate filter + defaulted projection (reference: keep
    // `.notna()` rows, fill picked JSON fields with `.get` defaults —
    // `transform_all_datasets.py:180-181`, `extract_json_data.py:67-88`).
    Q("q_p6_p11_null_default",
      (s, d) => {
        val e = Tables.events(s, d)
          .withColumn("v_dirty",
            when(col("event_type") === "click", lit(null).cast("double"))
              .otherwise(col("value")))
        e.filter(col("user_id").isNotNull)
          .select(
            col("event_id"),
            coalesce(col("v_dirty"), lit(-1.0)).as("v_filled"),
            coalesce(get_json_object(col("props"), "$.no_such_key"),
                     lit("unknown")).as("prop_defaulted"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |  COALESCE(CASE WHEN event_type = 'click' THEN NULL
             |                ELSE value END, -1.0) AS v_filled,
             |  COALESCE(json_extract_string(props, '$.no_such_key'),
             |           'unknown') AS prop_defaulted
             |FROM events WHERE user_id IS NOT NULL
             |ORDER BY event_id""".stripMargin)),

    // ----------------------------------------------------------- P3/P4
    // Two-phase uninformative-column pruning: inject an all-null and a
    // constant column, profile in ONE aggregate pass, select survivors.
    // The oracle pins the expected surviving schema.
    Q("q_p3_p4_prune_uninformative",
      (s, d) => {
        val dirty = Tables.supplier(s, d)
          .withColumn("all_null", lit(null).cast("double"))
          .withColumn("constant_col", lit(7))
        Profile.pruneUninformative(dirty)
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, s_name, s_nationkey, s_acctbal
             |FROM supplier ORDER BY s_suppkey""".stripMargin)),

    // --------------------------------------------------- rollup/cube
    // Hierarchical totals via ROLLUP (the grouping-sets surface SURVEY
    // §2.5 notes Spark provides beyond the reference): per
    // (status, priority), per status, and grand total in ONE pass —
    // partial aggregation covers all grouping sets without re-scanning.
    // grouping_id() disambiguates rolled-up NULLs from data NULLs on
    // both engines.
    Q("q_agg_rollup",
      (s, d) => Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |    AS total,
             |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT)
             |    AS gid
             |FROM orders
             |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
             |ORDER BY gid, o_orderstatus NULLS FIRST,
             |  o_orderpriority NULLS FIRST""".stripMargin)),

    // --------------------------------------------------------- cube
    // ROLLUP's sibling: ALL grouping-set combinations in one pass
    // (per-(flag,status), per-flag, per-status, grand total) — still a
    // single scan + partial aggregation; the Expand branch count is
    // 2^dims, so dims stay small by design at any scale.
    Q("q_agg_cube",
      (s, d) => Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("qty"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |    AS qty,
             |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
             |FROM lineitem
             |GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY gid, l_returnflag NULLS FIRST,
             |  l_linestatus NULLS FIRST""".stripMargin)),

    // -------------------------------------------------------- pivot
    // Wide-format reporting: event counts per day × type. The pivot
    // VALUES ARE DECLARED — with an explicit list Spark skips the
    // extra distinct-collection job and the plan is one groupBy with
    // conditional aggregates, exactly what the oracle spells out. At
    // scale an undeclared pivot is two jobs and an unbounded-width
    // schema; declared pivots are the only safe form.
    Q("q_agg_pivot", {
        val types = Seq("click", "view", "purchase", "signup")
        (s, d) => Tables.events(s, d)
          .withColumn("day", to_date(col("ts")))
          .groupBy(col("day"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
          .na.fill(0L, types)
          .orderBy(col("day"))
      },
      Some("""SELECT CAST(ts AS DATE) AS day,
             |  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
             |  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
             |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
             |  CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup
             |FROM events GROUP BY 1 ORDER BY day""".stripMargin)),

    // ------------------------------------------------------ unpivot
    // The melt direction (wide → long feature rows), Spark's native
    // unpivot operator — map-only, no shuffle until the final sort;
    // the long form is what feature stores and plotting layers want.
    Q("q_p_unpivot_melt",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("quantity"),
          col("l_discount").cast("double").as("discount"),
          col("l_tax").cast("double").as("tax"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("quantity"), col("discount"), col("tax")),
          "feature", "val")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("feature")),
      Some("""SELECT l_orderkey, l_linenumber, feature, val FROM (
             |  SELECT l_orderkey, l_linenumber, 'quantity' AS feature,
             |         CAST(l_quantity AS DOUBLE) AS val
             |  FROM lineitem WHERE l_orderkey < 100
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'discount',
             |         CAST(l_discount AS DOUBLE)
             |  FROM lineitem WHERE l_orderkey < 100
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'tax',
             |         CAST(l_tax AS DOUBLE)
             |  FROM lineitem WHERE l_orderkey < 100)
             |ORDER BY l_orderkey, l_linenumber, feature""".stripMargin)),

    // --------------------------------------------- distributed ffill
    // Global forward fill executed bucket-parallel (month buckets,
    // monotone along the date order) — the scale path for W3, where an
    // unpartitioned window would serialize the whole table through one
    // task. The oracle is DuckDB's global last_value IGNORE NULLS, so
    // the bucket-boundary carry is proven value-identical to the
    // single-sequence semantics.
    Q("q_w3_ffill_distributed",
      (s, d) => {
        val o = Tables.orders(s, d)
          .withColumn("sparse",
            when(col("o_orderkey") % 97 === 0, col("o_totalprice")))
        Windows.forwardFillDistributed(o, "sparse",
            Seq(col("o_orderdate"), col("o_orderkey")),
            bucket = year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .select(col("o_orderkey"), col("o_orderdate"), col("sparse"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderdate,
             |  last_value(CASE WHEN o_orderkey % 97 = 0
             |                  THEN o_totalprice END IGNORE NULLS) OVER (
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sparse
             |FROM orders
             |ORDER BY o_orderdate, o_orderkey""".stripMargin)),

    // ----------------------------------------------------- range join
    // Binned range join: price points land in fixed-width bins, price
    // intervals explode into the bins they overlap, and the range
    // predicate runs AFTER a hash equi-join on the bin — Catalyst's own
    // plan for this shape is a broadcast-nested-loop (|L|x|R|). The
    // oracle is the plain range-predicate join in DuckDB.
    Q("q_range_join_binned",
      (s, d) => {
        val points = Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 500)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"))
        val intervals = Tables.part(s, d)
          .filter(col("p_partkey") < 100)
          .select(col("p_partkey"),
            (col("p_retailprice") - 5.0).as("lo"),
            (col("p_retailprice") + 5.0).as("hi"))
        RangeJoin.pointInInterval(points, intervals,
            "l_extendedprice", "lo", "hi", binWidth = 10L)
          .select(col("l_orderkey"), col("l_linenumber"), col("p_partkey"),
            col("l_extendedprice"), col("lo"), col("hi"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("p_partkey"))
      },
      Some("""SELECT l_orderkey, l_linenumber, p_partkey,
             |  l_extendedprice, p_retailprice - 5.0 AS lo,
             |  p_retailprice + 5.0 AS hi
             |FROM (SELECT l_orderkey, l_linenumber, l_extendedprice
             |      FROM lineitem WHERE l_orderkey < 500) l
             |JOIN (SELECT p_partkey, p_retailprice FROM part
             |      WHERE p_partkey < 100) p
             |  ON l.l_extendedprice >= p.p_retailprice - 5.0
             | AND l.l_extendedprice <= p.p_retailprice + 5.0
             |ORDER BY l_orderkey, l_linenumber, p_partkey""".stripMargin)),

    // ------------------------------------------------------ as-of join
    // Point-in-time lookup: each open order picks up the customer's
    // latest PRIOR finished order (price + date). Spark has no as-of
    // operator; ours is the union+window trick (one shuffle on the key,
    // O(n log) per key — a range join would be quadratic per key). The
    // oracle is DuckDB's NATIVE ASOF JOIN, so the semantics — inclusive
    // backward match per key — are pinned against an independent
    // implementation.
    Q("q_asof_join",
      (s, d) => {
        val o = Tables.orders(s, d)
        val left = o.filter(col("o_orderstatus") === "O")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        val snaps = Dedup.keepLatest(
            o.filter(col("o_orderstatus") === "F")
              .select(col("o_custkey"), col("o_orderdate").as("snap_ts"),
                col("o_totalprice").as("snap_price"),
                col("o_orderkey").as("snap_key")),
            Seq("o_custkey", "snap_ts"), col("snap_key"))
          .drop("snap_key")
        AsOf.joinBackward(left, snaps, "o_custkey", "o_orderdate", "snap_ts",
            Seq("snap_price"))
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            col("snap_price"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""WITH l AS (
             |  SELECT o_custkey, o_orderkey, o_orderdate FROM orders
             |  WHERE o_orderstatus = 'O'),
             |r AS (
             |  SELECT o_custkey, snap_ts, snap_price FROM (
             |    SELECT o_custkey, o_orderdate AS snap_ts,
             |      o_totalprice AS snap_price,
             |      row_number() OVER (
             |        PARTITION BY o_custkey, o_orderdate
             |        ORDER BY o_orderkey DESC) AS rn
             |    FROM orders WHERE o_orderstatus = 'F') WHERE rn = 1)
             |SELECT l.o_custkey, l.o_orderkey, l.o_orderdate, r.snap_price
             |FROM l ASOF LEFT JOIN r
             |  ON l.o_custkey = r.o_custkey AND r.snap_ts <= l.o_orderdate
             |ORDER BY l.o_custkey, l.o_orderkey""".stripMargin)),

    // ---------------------------------------------- forward as-of join
    // The mirrored direction: each open order picks up the customer's
    // NEXT finished order at-or-after its date (the "next scheduled
    // event" lookup). Same union+window shape; the oracle is again
    // DuckDB's native ASOF JOIN, with the >= comparison.
    Q("q_asof_forward",
      (s, d) => {
        val o = Tables.orders(s, d)
        val left = o.filter(col("o_orderstatus") === "O")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        val snaps = Dedup.keepFirst(
            o.filter(col("o_orderstatus") === "F")
              .select(col("o_custkey"), col("o_orderdate").as("snap_ts"),
                col("o_totalprice").as("snap_price"),
                col("o_orderkey").as("snap_key")),
            Seq("o_custkey", "snap_ts"), Seq(col("snap_key")))
          .drop("snap_key")
        AsOf.joinForward(left, snaps, "o_custkey", "o_orderdate", "snap_ts",
            Seq("snap_price"))
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            col("snap_price"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""WITH l AS (
             |  SELECT o_custkey, o_orderkey, o_orderdate FROM orders
             |  WHERE o_orderstatus = 'O'),
             |r AS (
             |  SELECT o_custkey, snap_ts, snap_price FROM (
             |    SELECT o_custkey, o_orderdate AS snap_ts,
             |      o_totalprice AS snap_price,
             |      row_number() OVER (
             |        PARTITION BY o_custkey, o_orderdate
             |        ORDER BY o_orderkey) AS rn
             |    FROM orders WHERE o_orderstatus = 'F') WHERE rn = 1)
             |SELECT l.o_custkey, l.o_orderkey, l.o_orderdate, r.snap_price
             |FROM l ASOF LEFT JOIN r
             |  ON l.o_custkey = r.o_custkey AND r.snap_ts >= l.o_orderdate
             |ORDER BY l.o_custkey, l.o_orderkey""".stripMargin)),

    // ---------------------------------------------- nearest as-of join
    // The two-directional completion of the pair above: each open order
    // picks up the customer's CLOSEST finished order in either time
    // direction (ties and exact date hits resolve backward). One union
    // + one window sort serves both directions (AsOf.joinNearest); the
    // oracle composes DuckDB's native backward and strictly-forward
    // ASOF joins and replays the same delta comparison, pinning the
    // choice rule against an independent implementation.
    Q("q_asof_nearest",
      (s, d) => {
        val o = Tables.orders(s, d)
        val left = o.filter(col("o_orderstatus") === "O")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        val snaps = Dedup.keepLatest(
            o.filter(col("o_orderstatus") === "F")
              .select(col("o_custkey"), col("o_orderdate").as("snap_ts"),
                col("o_totalprice").as("snap_price"),
                col("o_orderkey").as("snap_key")),
            Seq("o_custkey", "snap_ts"), col("snap_key"))
          .drop("snap_key")
        AsOf.joinNearest(left, snaps, "o_custkey", "o_orderdate", "snap_ts",
            Seq("snap_price"), (a, b) => datediff(a, b))
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            col("snap_ts"), col("snap_price"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""WITH l AS (
             |  SELECT o_custkey, o_orderkey, o_orderdate FROM orders
             |  WHERE o_orderstatus = 'O'),
             |r AS (
             |  SELECT o_custkey, snap_ts, snap_price FROM (
             |    SELECT o_custkey, o_orderdate AS snap_ts,
             |      o_totalprice AS snap_price,
             |      row_number() OVER (
             |        PARTITION BY o_custkey, o_orderdate
             |        ORDER BY o_orderkey DESC) AS rn
             |    FROM orders WHERE o_orderstatus = 'F') WHERE rn = 1),
             |b AS (
             |  SELECT l.o_custkey, l.o_orderkey, l.o_orderdate,
             |    r.snap_ts AS bts, r.snap_price AS bp
             |  FROM l ASOF LEFT JOIN r
             |    ON l.o_custkey = r.o_custkey
             |   AND r.snap_ts <= l.o_orderdate),
             |f AS (
             |  SELECT l.o_custkey, l.o_orderkey,
             |    r.snap_ts AS fts, r.snap_price AS fp
             |  FROM l ASOF LEFT JOIN r
             |    ON l.o_custkey = r.o_custkey
             |   AND r.snap_ts > l.o_orderdate)
             |SELECT b.o_custkey, b.o_orderkey, b.o_orderdate,
             |  CASE WHEN b.bts IS NOT NULL AND (f.fts IS NULL
             |         OR date_diff('day', b.bts, b.o_orderdate)
             |         <= date_diff('day', b.o_orderdate, f.fts))
             |    THEN b.bts ELSE f.fts END AS snap_ts,
             |  CASE WHEN b.bts IS NOT NULL AND (f.fts IS NULL
             |         OR date_diff('day', b.bts, b.o_orderdate)
             |         <= date_diff('day', b.o_orderdate, f.fts))
             |    THEN b.bp ELSE f.fp END AS snap_price
             |FROM b JOIN f ON b.o_custkey = f.o_custkey
             |  AND b.o_orderkey = f.o_orderkey
             |ORDER BY b.o_custkey, b.o_orderkey""".stripMargin)),

    // ------------------------------------------- grid-binned spatial join
    // J4 (the reference README's aspirational ST_Contains example) as a
    // Spark-native rewrite: points and rectangles bin onto a 10-degree
    // grid, the join is a hash equi-join on the cell, and the exact
    // containment predicate verifies same-cell pairs only — never the
    // points x boxes nested loop. Coordinates derive deterministically
    // from events/nation (integer mods + 2-decimal fractions: exact in
    // both engines); the oracle is the plain containment join.
    Q("q_geo_bbox_join",
      (s, d) => {
        val pts = Tables.events(s, d).select(
          col("event_id"),
          ((col("user_id") * 37 % 360) - 180 +
            (col("event_id") % 100) / 100.0).as("lon"),
          ((col("user_id") * 53 % 180) - 90 +
            (col("event_id") % 50) / 100.0).as("lat"))
        val boxes = Tables.nation(s, d).select(
          col("n_nationkey"),
          ((col("n_nationkey") * 29 % 340) - 175.0).as("min_lon"),
          ((col("n_nationkey") * 29 % 340) - 155.0).as("max_lon"),
          ((col("n_nationkey") * 17 % 160) - 85.0).as("min_lat"),
          ((col("n_nationkey") * 17 % 160) - 70.0).as("max_lat"))
        GeoJoin.pointInBoxJoin(pts, boxes, "lon", "lat", cellSize = 10.0)
          .select(col("event_id"), col("n_nationkey"), col("lon"), col("lat"))
          .orderBy(col("event_id"), col("n_nationkey"))
      },
      Some("""WITH p AS (
             |  SELECT event_id,
             |    ((user_id * 37) % 360) - 180 + (event_id % 100) / 100.0 AS lon,
             |    ((user_id * 53) % 180) - 90 + (event_id % 50) / 100.0 AS lat
             |  FROM events),
             |b AS (
             |  SELECT n_nationkey,
             |    ((n_nationkey * 29) % 340) - 175.0 AS min_lon,
             |    ((n_nationkey * 29) % 340) - 155.0 AS max_lon,
             |    ((n_nationkey * 17) % 160) - 85.0 AS min_lat,
             |    ((n_nationkey * 17) % 160) - 70.0 AS max_lat
             |  FROM nation)
             |SELECT event_id, n_nationkey, lon, lat
             |FROM p JOIN b
             |  ON lon >= min_lon AND lon <= max_lon
             | AND lat >= min_lat AND lat <= max_lat
             |ORDER BY event_id, n_nationkey""".stripMargin)),

    // ---------------------------------------------- polygon spatial join
    // J4 COMPLETE: ST_Contains over arbitrary simple polygons (the
    // reference's aspirational geometry join, `ETL Scripts/README.md:
    // 201-209`), not just rectangles. One concave 8-vertex star per
    // nation; grid-bin candidates + even-odd ray-cast verify
    // (GeoJoin.pointInPolygonJoin). The oracle runs the SAME ray-cast
    // brute-force in DuckDB — identical double arithmetic in identical
    // order, so the crossing decisions agree bit-for-bit, and the
    // grid rewrite is proven against an engine that never binned.
    Q("q_geo_polygon_join",
      (s, d) => {
        val pts = Tables.events(s, d).select(
          col("event_id"),
          ((col("user_id") * 37 % 360) - 180 +
            (col("event_id") % 100) / 100.0).as("lon"),
          ((col("user_id") * 53 % 180) - 90 +
            (col("event_id") % 50) / 100.0).as("lat"))
        val star = Seq((-10.0, 0.0), (-3.0, 3.0), (0.0, 10.0), (3.0, 3.0),
          (10.0, 0.0), (3.0, -3.0), (0.0, -10.0), (-3.0, -3.0))
        val polys = Tables.nation(s, d).select(
            col("n_nationkey"),
            ((col("n_nationkey") * 29 % 340) - 165.0).as("cx"),
            ((col("n_nationkey") * 17 % 160) - 77.5).as("cy"))
          .select(col("n_nationkey"),
            array(star.map { case (dx, dy) =>
              struct((col("cx") + dx).as("x"), (col("cy") + dy).as("y"))
            }: _*).as("verts"))
        GeoJoin.pointInPolygonJoin(pts, polys, "lon", "lat", "verts",
            cellSize = 10.0)
          .select(col("event_id"), col("n_nationkey"), col("lon"), col("lat"))
          .orderBy(col("event_id"), col("n_nationkey"))
      },
      Some {
        val starSql = Seq(
          "{'x': cx - 10.0, 'y': cy + 0.0}", "{'x': cx - 3.0, 'y': cy + 3.0}",
          "{'x': cx + 0.0, 'y': cy + 10.0}", "{'x': cx + 3.0, 'y': cy + 3.0}",
          "{'x': cx + 10.0, 'y': cy + 0.0}", "{'x': cx + 3.0, 'y': cy - 3.0}",
          "{'x': cx + 0.0, 'y': cy - 10.0}", "{'x': cx - 3.0, 'y': cy - 3.0}"
        ).mkString("[", ",\n       ", "]")
        s"""WITH p AS (
           |  SELECT event_id,
           |    ((user_id * 37) % 360) - 180 + (event_id % 100) / 100.0 AS lon,
           |    ((user_id * 53) % 180) - 90 + (event_id % 50) / 100.0 AS lat
           |  FROM events),
           |g AS (
           |  SELECT n_nationkey,
           |    ((n_nationkey * 29) % 340) - 165.0 AS cx,
           |    ((n_nationkey * 17) % 160) - 77.5 AS cy
           |  FROM nation),
           |b AS (
           |  SELECT n_nationkey,
           |    $starSql AS verts
           |  FROM g)
           |SELECT event_id, n_nationkey, lon, lat
           |FROM p, b
           |WHERE len(list_filter(range(1, len(verts) + 1), i ->
           |    ((verts[i].y > lat) <> (verts[(i % len(verts)) + 1].y > lat))
           |    AND lon < (verts[(i % len(verts)) + 1].x - verts[i].x)
           |              * (lat - verts[i].y)
           |              / (verts[(i % len(verts)) + 1].y - verts[i].y)
           |              + verts[i].x)) % 2 = 1
           |ORDER BY event_id, n_nationkey""".stripMargin
      }),

    // ------------------------------------------------------ salted agg
    // Two-phase salted aggregation over a 3-value (maximally skewed)
    // group key: partial aggregate on (key, salt), merge partials.
    // The oracle is the PLAIN group-by — exactness of the decimal sums
    // proves the two-phase rewrite is value-identical, while the
    // physical plan never funnels a hot key through one reducer.
    Q("q_salted_skew_agg",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        Salt.aggregate(li,
            keys = Seq(col("l_returnflag")),
            salt = Salt.saltFrom(col("l_orderkey"), 16),
            aggs = Seq(
              "sum_qty" -> (col("l_quantity").cast("decimal(18,2)"), Salt.sum2),
              "n"       -> (lit(1L), Salt.sum2),
              "min_price" -> (col("l_extendedprice"), Salt.min2),
              "max_price" -> (col("l_extendedprice"), Salt.max2)))
          .select(col("l_returnflag"), col("sum_qty").cast("double").as("sum_qty"),
            col("n"), col("min_price"), col("max_price"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  count(*) AS n,
             |  min(l_extendedprice) AS min_price,
             |  max(l_extendedprice) AS max_price
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ------------------------------------------------------ salted join
    // The JOIN half of the skew story (Salt.aggregate covers the
    // aggregation half): ~70% of lineitem rows carry one hot synthetic
    // key; the dim side replicates 8x and the join runs on (key, salt),
    // spreading the hot key over 8 reducers. Oracle = the PLAIN join:
    // the salted rewrite must be row-for-row identical.
    Q("q_salted_skew_join",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .withColumn("skew_key",
            when(col("l_orderkey") % 10 < 7, lit(0L))
              .otherwise(col("l_orderkey") % 25))
        val dim = Tables.nation(s, d)
          .select(col("n_nationkey").cast("long").as("skew_key"),
            col("n_name"))
        Salt.saltedJoin(li, dim, "skew_key",
            Salt.saltFrom(col("l_orderkey"), 8), buckets = 8)
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("qty"))
          .orderBy(col("n_name"))
      },
      Some("""WITH li AS (
             |  SELECT l_quantity,
             |    CASE WHEN l_orderkey % 10 < 7 THEN 0
             |         ELSE l_orderkey % 25 END AS skew_key
             |  FROM lineitem)
             |SELECT n_name, count(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
             |FROM li JOIN nation ON skew_key = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // ----------------------------------------------------------- F1/F2
    // Header normalization over dirty column names, plus parse-or-null
    // timestamp semantics (pandas `errors='coerce'` ->
    // Spark `try_to_timestamp`, `transform_all_datasets.py:51-56`).
    Q("q_f1_f2_normalize_parse",
      (s, d) => {
        val dirty = Tables.orders(s, d)
          .filter(col("o_orderkey") < 2000)
          .select(
            col("o_orderkey").as("Order Key"),
            col("o_totalprice").as("Total Price($)"),
            date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")
              .as("Order Date!"))
        Headers.normalize(dirty)
          .select(
            col("Order_Key"),
            col("Total_Price"),
            try_to_timestamp(col("Order_Date")).as("parsed_ts"),
            try_to_timestamp(concat(lit("junk-"), col("Order_Date")))
              .as("bad_ts"))
          .orderBy(col("Order_Key"))
      },
      Some("""SELECT o_orderkey AS Order_Key,
             |  o_totalprice AS Total_Price,
             |  TRY_CAST(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
             |           AS TIMESTAMP) AS parsed_ts,
             |  TRY_CAST('junk-' || strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
             |           AS TIMESTAMP) AS bad_ts
             |FROM orders WHERE o_orderkey < 2000
             |ORDER BY Order_Key""".stripMargin))
  )
}
