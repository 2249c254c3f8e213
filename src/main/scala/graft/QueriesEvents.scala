package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Sessionize}
import graft.sources.Tables

/** Event-stream analytics over the `events` table (ts/user_id/event_type/
  * value/props): sessionization, tumbling + sliding event-time windows,
  * JSON property extraction, and an ordered funnel. These are the batch
  * shapes of the streaming operators in graft.streaming — identical
  * logical plans, so correctness proven here transfers to the
  * Structured Streaming path.
  *
  * Oracle-parity notes: all epoch arithmetic is integer MICROseconds
  * (Spark unix_micros ≡ DuckDB epoch_us) so no float time math; counts
  * and window-sums are cast to BIGINT on the DuckDB side (its integer
  * SUM returns HUGEINT).
  */
object QueriesEvents {

  private val gapSec = 1800L // 30-min session gap

  val qs: Seq[Q] = Seq(

    // -------------------------------------------------- retention cohorts
    // Classic cohort retention: each user's cohort is their first active
    // day; the matrix counts distinct users active at day offsets 0..7
    // from their cohort. Two aggregations (first-day per user, then the
    // cohort×offset distinct count) — both shuffle on user/cohort keys,
    // no self-join of the raw event stream.
    Q("q_ev_retention_cohorts",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"))
        val cohorts = ev.groupBy(col("user_id"))
          .agg(min(col("day")).as("cohort_day"))
        ev.join(cohorts, Seq("user_id"))
          .select(col("user_id"), col("cohort_day"),
            datediff(col("day"), col("cohort_day")).as("day_offset"))
          .filter(col("day_offset") <= 7)
          .groupBy(col("cohort_day"), col("day_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("cohort_day"), col("day_offset"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
             |cohorts AS (
             |  SELECT user_id, min(day) AS cohort_day FROM ev
             |  GROUP BY user_id)
             |SELECT cohort_day, date_diff('day', cohort_day, day) AS day_offset,
             |  count(DISTINCT user_id) AS n_users
             |FROM ev JOIN cohorts USING (user_id)
             |WHERE date_diff('day', cohort_day, day) <= 7
             |GROUP BY cohort_day, day_offset
             |ORDER BY cohort_day, day_offset""".stripMargin)),

    // ----------------------------------------- deterministic sampling
    // Hash-based stratified sampling: keep ~20% of documents per
    // language, selected by a portable content-independent hash of the
    // id — fully reproducible across runs, engines, and partitionings,
    // unlike rand()-based sampling. This is how training corpora carve
    // stable held-out slices.
    Q("q_sample_stratified",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val kept = docs.filter(
          pmod(graft.functions.HashFns.md5Long(
            concat(lit("sample:"), col("doc_id").cast("string"))), lit(100L)) < 20L)
        val perLang = kept.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_sampled"))
        kept.select(col("doc_id"), col("lang")).join(perLang, Seq("lang"))
          .select(col("doc_id"), col("lang"), col("n_sampled"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH kept AS (
              |  SELECT doc_id, lang FROM documents
              |  WHERE ${graft.functions.HashFns.md5LongSql(
                   "'sample:' || CAST(doc_id AS VARCHAR)")} % 100 < 20),
              |pl AS (SELECT lang, count(*) AS n_sampled FROM kept
              |       GROUP BY lang)
              |SELECT doc_id, lang, n_sampled FROM kept JOIN pl USING (lang)
              |ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------- source-weighted mixture
    // Training-corpus data MIXING: fixed per-source document quotas
    // (50/30/20 here; sources faked as doc_id % 3), filled by taking
    // each source's lowest-hash documents — a deterministic,
    // engine-reproducible uniform draw (md5-derived order, not rand()),
    // one shuffle on the source key. Integer quotas + hash ordering
    // keep SET membership exact across engines, where a float-weight
    // priority (Efraimidis-Spirakis pow(u, 1/w)) would be libm-
    // dependent at the selection boundary.
    Q("q_sample_mixture",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), (col("doc_id") % 3).as("source"))
        val quota = when(col("source") === 0, 50)
          .when(col("source") === 1, 30).otherwise(20)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(graft.functions.HashFns.md5Long(
            concat(lit("mix:"), col("doc_id").cast("string"))), col("doc_id"))
        docs.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= quota)
          .select(col("doc_id"), col("source"), col("rk"))
          .orderBy(col("source"), col("rk"))
      },
      Some(s"""WITH r AS (
              |  SELECT doc_id, doc_id % 3 AS source,
              |    row_number() OVER (PARTITION BY doc_id % 3
              |      ORDER BY ${graft.functions.HashFns.md5LongSql(
                     "'mix:' || CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
              |  FROM documents)
              |SELECT doc_id, source, rk FROM r
              |WHERE rk <= CASE source WHEN 0 THEN 50 WHEN 1 THEN 30
              |            ELSE 20 END
              |ORDER BY source, rk""".stripMargin)),

    // -------------------------------------- temperature-scaled mixing
    // Data-mixture rebalancing at temperature T=2: a source's quota
    // grows as n^(1/T) = sqrt(n), flattening the head sources and
    // up-weighting the tail — the standard multilingual/multi-source
    // rebalance. Quotas are UNNORMALIZED (floor(4*sqrt(n))): sqrt is
    // correctly rounded in every IEEE engine, so quota boundaries are
    // exact cross-engine, where a normalized weight (sum of sqrts)
    // would hang set membership on float summation order. The
    // normalization constant is a deterministic offline choice at
    // scale (one readout of the tiny per-source count frame). Fill is
    // the same lowest-md5-hash draw as q_sample_mixture — one shuffle
    // on the source key.
    Q("q_sample_temperature",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"))
        val quotas = docs.groupBy(col("source"))
          .agg(count(lit(1)).as("n"))
          .withColumn("quota",
            floor(sqrt(col("n").cast("double")) * 4.0).cast("long"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(graft.functions.HashFns.md5Long(
            concat(lit("temp:"), col("doc_id").cast("string"))),
            col("doc_id"))
        docs.withColumn("rk", row_number().over(w))
          .join(broadcast(quotas), Seq("source"))
          .filter(col("rk") <= col("quota"))
          .select(col("doc_id"), col("source"), col("rk"), col("quota"))
          .orderBy(col("source"), col("rk"))
      },
      Some(s"""WITH q AS (
              |  SELECT source, CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 4.0)
              |    AS BIGINT) AS quota
              |  FROM documents GROUP BY source),
              |r AS (
              |  SELECT doc_id, source,
              |    row_number() OVER (PARTITION BY source
              |      ORDER BY ${graft.functions.HashFns.md5LongSql(
                     "'temp:' || CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
              |  FROM documents)
              |SELECT doc_id, r.source AS source, rk, quota FROM r JOIN q
              |  ON r.source = q.source
              |WHERE rk <= quota ORDER BY r.source, rk""".stripMargin)),

    // --------------------------------------- weighted (πps) sampling
    // Importance sampling by document weight (operators/Sampling):
    // sequential Poisson order sampling — the 50 smallest u/w keys win,
    // giving inclusion probability ≈ n·w/Σw. Weight here is n_chars
    // (longer docs preferred — the "sample by token contribution"
    // shape). The u/w key is one integer-derived IEEE division, so the
    // selected SET is bit-reproducible across engines — where the
    // Efraimidis-Spirakis pow/ln keys would hang the selection boundary
    // on libm ulps (q_sample_mixture's note).
    Q("q_sample_weighted",
      (s, d) => Sampling.sequentialPoisson(
        Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", n = 50, seed = 0),
      Some(s"""WITH k AS (
              |  SELECT doc_id, n_chars,
              |    (${graft.functions.HashFns.md5LongSql(
                   "CAST(doc_id AS VARCHAR)", 0)} + 1)
              |      / 1152921504606846976.0 / n_chars AS key
              |  FROM documents WHERE n_chars > 0),
              |sel AS (SELECT doc_id, n_chars FROM k
              |        ORDER BY key, doc_id LIMIT 50)
              |SELECT doc_id, n_chars FROM sel ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------ sessionization
    Q("q_ev_sessionize",
      (s, d) => {
        val e = Tables.events(s, d)
        Sessionize.sessionize(e, col("user_id"), col("ts"),
            Seq(col("ts"), col("event_id")), gapSec)
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
               min(col("ts")).as("session_start"),
               max(col("ts")).as("session_end"),
               sum(col("value").cast("decimal(18,2)")).cast("double")
                 .as("sum_value"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts, value,
             |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
             |  FROM events),
             |f AS (
             |  SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 1800000000
             |                 THEN 1 ELSE 0 END AS new_s
             |  FROM g),
             |s AS (
             |  SELECT *, CAST(SUM(new_s) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS session_id
             |  FROM f)
             |SELECT user_id, session_id, count(*) AS n_events,
             |  min(ts) AS session_start, max(ts) AS session_end,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM s GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // ------------------------------------------------- OHLC resample
    // Time-series downsampling with order-sensitive endpoints: per-hour
    // open/close are the FIRST/LAST values by event time — taken as
    // lexicographic min/max of a (ts, id, value) struct inside the one
    // groupBy (deterministic under ts ties via the id tiebreak), never
    // a sort or a window. One shuffle on the hour key; partial
    // aggregation handles min/max/count map-side, so the reduce state
    // is O(hours), the canonical metrics-rollup shape at any scale.
    Q("q_ev_resample_ohlc",
      (s, d) => {
        val st = struct(col("ts"), col("event_id").as("id"),
          col("value").as("v"))
        Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(
            min(st).getField("v").as("open"),
            max(st).getField("v").as("close"),
            min(col("value")).as("lo"),
            max(col("value")).as("hi"),
            count(lit(1)).as("n"))
          .orderBy(col("h"))
      },
      Some("""SELECT date_trunc('hour', ts) AS h,
             |  (min({'ts': ts, 'id': event_id, 'v': value})).v AS open,
             |  (max({'ts': ts, 'id': event_id, 'v': value})).v AS close,
             |  min(value) AS lo, max(value) AS hi, count(*) AS n
             |FROM events GROUP BY 1 ORDER BY h""".stripMargin)),

    // -------------------------------------------------- tumbling windows
    Q("q_ev_tumbling_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast("decimal(18,2)")).cast("double")
               .as("sum_value"))
        .select(col("window.start").as("win_start"), col("event_type"),
                col("n"), col("sum_value"))
        .orderBy(col("win_start"), col("event_type")),
      Some("""SELECT date_trunc('hour', ts) AS win_start, event_type,
             |  count(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin)),

    // --------------------------------------------------- sliding windows
    // size 1h, slide 30min → each event lands in exactly 2 windows.
    // DuckDB mirrors Spark's epoch-aligned window() with integer floor
    // division on epoch micros.
    Q("q_ev_sliding_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("n"))
        .orderBy(col("win_start")),
      Some("""SELECT make_timestamp(((epoch_us(ts) // 1800000000) - k)
             |         * 1800000000) AS win_start,
             |       count(*) AS n
             |FROM events, unnest([0, 1]) t(k)
             |GROUP BY 1 ORDER BY win_start""".stripMargin)),

    // ------------------------------------------------ JSON props extract
    Q("q_ev_props_json",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
                get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k").isNotNull)
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), min(col("event_id")).as("first_event"))
        .orderBy(col("k_mod")),
      Some("""WITH x AS (
             |  SELECT event_id,
             |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |  FROM events)
             |SELECT k % 10 AS k_mod, count(*) AS n,
             |       min(event_id) AS first_event
             |FROM x WHERE k IS NOT NULL
             |GROUP BY 1 ORDER BY k_mod""".stripMargin)),

    // ------------------------------------------------------- ordered funnel
    // view → click (after the user's first view) → purchase (after that
    // click): three tiny per-user aggregates, each a single shuffle on
    // user_id; the final counts are 1-row aggregates cross-joined.
    Q("q_ev_funnel",
      (s, d) => {
        val e = Tables.events(s, d)
        val v = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
        val c = e.filter(col("event_type") === "click").as("c")
          .join(v, Seq("user_id"))
          .filter(col("ts") > col("t_view"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
        val p = e.filter(col("event_type") === "purchase").as("p")
          .join(c, Seq("user_id"))
          .filter(col("ts") > col("t_click"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
        v.agg(count(lit(1)).as("n_view"))
          .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
          .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
      },
      Some("""WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
             |           WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, min(e.ts) AS t_click
             |      FROM events e JOIN v ON e.user_id = v.user_id
             |      WHERE e.event_type = 'click' AND e.ts > v.t_view
             |      GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
             |      FROM events e JOIN c ON e.user_id = c.user_id
             |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
             |      GROUP BY e.user_id)
             |SELECT (SELECT count(*) FROM v) AS n_view,
             |       (SELECT count(*) FROM c) AS n_view_click,
             |       (SELECT count(*) FROM p) AS n_view_click_purchase""".stripMargin)),

    // ------------------------------------------ time-weighted average
    // TWAP per user: each value is weighted by how long it was the
    // CURRENT value (micros until the next event) — the standard
    // duration-weighted summary for irregularly sampled series, where
    // a plain mean over-counts bursts. Exactness: dt is integer
    // MICROseconds and the weighted sum runs in DECIMAL (order-free,
    // so partial aggregation can't change it); the 6-decimal
    // stabilizer absorbs the one representation boundary — the exact
    // decimal wsum exceeds 2^53 in its scaled form, so the
    // decimal->double conversions can differ in the last ulp.
    Q("q_ev_twap",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .withColumn("__next", lead(col("ts"), 1).over(w))
          .filter(col("__next").isNotNull)
          .withColumn("__dt", unix_micros(col("__next"))
            - unix_micros(col("ts")))
          .groupBy(col("user_id"))
          .agg(sum(col("__dt")).as("span_us"),
            sum(col("value").cast("decimal(18,2)") * col("__dt"))
              .as("__wsum"))
          .select(col("user_id"), col("span_us"),
            graft.functions.Stabilize.stab(
              col("__wsum").cast("double") / col("span_us").cast("double"),
              6).as("twap"))
          .orderBy(col("user_id"))
      },
      Some("""WITH st AS (
             |  SELECT user_id, value,
             |    epoch_us(lead(ts) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id))
             |      - epoch_us(ts) AS dt
             |  FROM events),
             |g AS (
             |  SELECT user_id, CAST(sum(dt) AS BIGINT) AS span_us,
             |    sum(CAST(value AS DECIMAL(18,2)) * dt) AS wsum
             |  FROM st WHERE dt IS NOT NULL GROUP BY user_id)
             |SELECT user_id, span_us,
             |  round_even((CAST(wsum AS DOUBLE)
             |    / CAST(span_us AS DOUBLE)) * 1000000.0, 0) / 1000000.0
             |    AS twap
             |FROM g ORDER BY user_id""".stripMargin)),

    // ------------------------------------- Markov transition matrix
    // First-order event-type transition model over each user's
    // event-time-ordered stream: counts of (from → to) steps and their
    // row-normalized probabilities — the product-analytics "what
    // happens after X" model and the stats behind next-event
    // prediction baselines. One per-user window (lead) + two keyed
    // aggregations; p is a single exact int/int IEEE division, so no
    // stabilizer is needed.
    Q("q_ev_markov_transitions",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val steps = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("from_type"))
          .withColumn("to_type", lead(col("from_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
        val counts = steps.groupBy(col("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        val fromTot = counts.groupBy(col("from_type"))
          .agg(sum(col("n")).as("__ft"))
        counts.join(fromTot, Seq("from_type"))
          .select(col("from_type"), col("to_type"), col("n"),
            (col("n").cast("double") / col("__ft").cast("double")).as("p"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH st AS (
             |  SELECT event_type AS from_type,
             |    lead(event_type) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |c AS (
             |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
             |  FROM st WHERE to_type IS NOT NULL GROUP BY 1, 2),
             |f AS (
             |  SELECT from_type, CAST(sum(n) AS BIGINT) AS ft
             |  FROM c GROUP BY 1)
             |SELECT c.from_type, c.to_type, c.n,
             |  CAST(c.n AS DOUBLE) / CAST(f.ft AS DOUBLE) AS p
             |FROM c JOIN f USING (from_type)
             |ORDER BY c.from_type, c.to_type""".stripMargin)),

    // --------------------------------------------- EWMA smoothing
    // Per-user exponentially weighted moving average of the event
    // value, folded in event-time order with alpha = 1/4 (an exact
    // binary fraction, so each fold step is representation-error-free
    // and the two engines' sequential folds agree bit-for-bit; DuckDB's
    // list_reduce seeds from the first element exactly like the Spark
    // fold's element_at(vs, 1) seed). One hash shuffle on user_id; the
    // per-key series packs into one task, which scales on the #keys
    // axis — see Timeseries.ewma's scaladoc for the associative affine
    // segmented form and why it's not used.
    Q("q_ev_ewma",
      (s, d) => {
        graft.operators.Timeseries.ewma(Tables.events(s, d),
            Seq("user_id"), Seq(col("ts"), col("event_id")),
            "value", alpha = 0.25)
          .orderBy(col("user_id"))
      },
      Some("""WITH sm AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    last(value ORDER BY ts, event_id) AS last_value,
             |    list_reduce(list(value ORDER BY ts, event_id),
             |      (a, b) -> a * CAST(0.75 AS DOUBLE)
             |              + b * CAST(0.25 AS DOUBLE)) AS ewma
             |  FROM events WHERE value IS NOT NULL
             |  GROUP BY user_id)
             |SELECT user_id, n_events, last_value, ewma,
             |  last_value - ewma AS drift
             |FROM sm ORDER BY user_id""".stripMargin)),

    // ---------------------------- Holt level+trend smoothing per user
    // Timeseries.holtLinear with exact-binary α=0.5, β=0.25: the
    // forecasting step above EWMA when the series trends. The oracle
    // replays the fold with a 2-list [level, trend] accumulator seeded
    // [x1, 0] — identical IEEE op chain per step, so level/trend/
    // forecast are bit-identical with no stabilizer.
    Q("q_ev_holt",
      (s, d) => graft.operators.Timeseries.holtLinear(
          Tables.events(s, d), Seq("user_id"),
          Seq(col("ts"), col("event_id")), "value",
          alpha = 0.5, beta = 0.25)
        .orderBy(col("user_id")),
      Some("""WITH vals AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    list(value ORDER BY ts, event_id) AS vs
             |  FROM events WHERE value IS NOT NULL
             |  GROUP BY user_id),
             |st AS (
             |  SELECT user_id, n_events,
             |    list_reduce(
             |      list_concat([[vs[1], CAST(0.0 AS DOUBLE)]],
             |        list_transform(vs[2:], x -> [x, x])),
             |      (acc, t) -> [
             |        t[1] * CAST(0.5 AS DOUBLE)
             |          + (acc[1] + acc[2]) * CAST(0.5 AS DOUBLE),
             |        ((t[1] * CAST(0.5 AS DOUBLE)
             |            + (acc[1] + acc[2]) * CAST(0.5 AS DOUBLE))
             |           - acc[1]) * CAST(0.25 AS DOUBLE)
             |          + acc[2] * CAST(0.75 AS DOUBLE)]) AS lb
             |  FROM vals)
             |SELECT user_id, n_events, lb[1] AS level, lb[2] AS trend,
             |  lb[1] + lb[2] AS forecast
             |FROM st ORDER BY user_id""".stripMargin)),

    // ------------------------------------ trajectory / sequence assembly
    // The SFT/behavioral-cloning export step: each user's event stream
    // assembled into ONE ordered token sequence ("view click purchase
    // …"), the shape every trajectory-training pipeline materializes.
    // One hash shuffle on user_id; the in-group sort happens inside
    // `array_sort` on the collected structs — no window, no global
    // sort, and the per-key cost is bounded by that key's event count
    // (a pathological key should be chunked by session first —
    // q_ev_sessionize feeds this directly). Struct sort order
    // (ts, event_id, event_type) is total because event_id is unique.
    Q("q_ev_trajectory",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            concat_ws(" ", transform(
              array_sort(collect_list(struct(col("ts"), col("event_id"),
                col("event_type")))),
              x => x("event_type"))).as("trajectory"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  string_agg(event_type, ' ' ORDER BY ts, event_id)
             |    AS trajectory
             |FROM events GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // ------------------------------- grouped robust anomaly detection
    // Per-event-type median/MAD outliers — the grouped sibling of
    // q_agg_mad_outliers, composed from the grouped exact-histogram
    // percentile (operators/Percentiles.groupedExactByHistogram): each
    // type's median costs O(its distinct values), the 5-row robust-
    // stats frames broadcast, and the flagging pass is map-only. The
    // per-type baseline matters: a value that is normal for `purchase`
    // can be 5 MADs out for `click`.
    Q("q_ev_anomaly_grouped",
      (s, d) => {
        def stab6(c: org.apache.spark.sql.Column) =
          graft.functions.Stabilize.stab(c, 6)
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("event_type"), col("value").as("v"))
        val med = graft.operators.Percentiles
          .groupedExactByHistogram(ev, Seq("event_type"), "v",
            Seq(0.5 -> "med_raw"))
          .select(col("event_type"), stab6(col("med_raw")).as("med"))
        val dev = ev.join(broadcast(med), Seq("event_type"))
          .withColumn("dev", abs(col("v") - col("med")))
        val mad = graft.operators.Percentiles
          .groupedExactByHistogram(dev, Seq("event_type"), "dev",
            Seq(0.5 -> "mad_raw"))
          .select(col("event_type"), stab6(col("mad_raw")).as("mad"))
        dev.join(broadcast(mad), Seq("event_type"))
          .filter(col("dev") > lit(4.5) * col("mad"))
          .select(col("event_id"), col("event_type"), col("v"),
            col("med"), col("mad"))
          .orderBy(col("event_id"))
      },
      Some {
        def st(e: String) = graft.functions.Stabilize.stabSql(e, 6)
        s"""WITH m AS (
           |  SELECT event_type, ${st("quantile_cont(value, 0.5)")} AS med
           |  FROM events GROUP BY 1),
           |d AS (
           |  SELECT e.event_id, e.event_type, e.value AS v, m.med,
           |    abs(e.value - m.med) AS dev
           |  FROM events e JOIN m USING (event_type)),
           |md AS (
           |  SELECT event_type, ${st("quantile_cont(dev, 0.5)")} AS mad
           |  FROM d GROUP BY 1)
           |SELECT event_id, event_type, v, med, mad
           |FROM d JOIN md USING (event_type)
           |WHERE dev > 4.5 * mad ORDER BY event_id""".stripMargin
      }),

    // ------------------------------------- rolling 7-day distinct users
    // Trailing-window exact distinct (the DAU/WAU rollup): for every
    // active day, distinct users that day and over the trailing 7 days.
    // Sliding distinct does NOT decompose into tumbling partials
    // (distinct isn't additive), so the scale-correct exact shape is a
    // range join of the (day, user) DISTINCT frame — already collapsed
    // from raw events by one map-side-combining aggregate — against the
    // tiny day dimension (broadcast: |days| is calendar-bounded), then
    // one count_distinct per day. Raw events are touched exactly once.
    // (The approximate sibling at extreme cardinality is an HLL-merge
    // over tumbling sketches — operators/Profile's certified path.)
    Q("q_ev_rolling_distinct",
      (s, d) => {
        val du = Tables.events(s, d)
          .select(to_date(col("ts")).as("day"), col("user_id"))
          .distinct()
        val days = du.select(col("day").as("d")).distinct()
        du.join(broadcast(days),
            col("day").between(date_sub(col("d"), 6), col("d")))
          .groupBy(col("d"))
          .agg(
            count_distinct(when(col("day") === col("d"), col("user_id")))
              .as("users_1d"),
            count_distinct(col("user_id")).as("users_7d"))
          .select(col("d").as("day"), col("users_1d"), col("users_7d"))
          .orderBy(col("day"))
      },
      Some("""WITH du AS (
             |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
             |  FROM events),
             |days AS (SELECT DISTINCT day AS d FROM du)
             |SELECT d AS day,
             |  CAST(count(DISTINCT CASE WHEN u.day = d THEN u.user_id END)
             |    AS BIGINT) AS users_1d,
             |  CAST(count(DISTINCT u.user_id) AS BIGINT) AS users_7d
             |FROM days JOIN du u ON u.day BETWEEN d - 6 AND d
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ------------------------------ inter-event gap distribution
    // Arrival-pattern diagnostic per event type: the distribution of
    // seconds since the user's PREVIOUS event (any type), attributed
    // to the later event's type — the signal behind session-gap
    // tuning (q_ev_sessionize's 30-min threshold) and bot detection
    // (near-zero gaps). Gaps are integer seconds (micros DIV — no
    // float time math); p50/p90 are nearest-rank data values via the
    // grouped weighted-quantile histogram with unit weights; the mean
    // is an exact integer ratio. One window per user + one grouped
    // histogram — both bounded-partition shapes.
    Q("q_ev_gap_stats",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val gaps = Tables.events(s, d)
          .withColumn("__prev", lag(col("ts"), 1).over(w))
          .filter(col("__prev").isNotNull)
          .select(col("event_type"),
            expr("CAST((unix_micros(ts) - unix_micros(__prev)) " +
              "DIV 1000000 AS BIGINT)").as("gap_s"))
          .withColumn("__one", lit(1L))
        val q = graft.operators.Percentiles.weightedLowerQuantilesByGroup(
          gaps, Seq("event_type"), "gap_s", "__one",
          Seq((1, 2, "p50_s"), (9, 10, "p90_s")))
        val m = gaps.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_gaps"),
            (sum(col("gap_s")).cast("double")
              / count(lit(1)).cast("double")).as("mean_s"))
        m.join(q, Seq("event_type"))
          .select(col("event_type"), col("n_gaps"), col("mean_s"),
            col("p50_s"), col("p90_s"))
          .orderBy(col("event_type"))
      },
      Some("""WITH g AS (
             |  SELECT event_type,
             |    CAST((epoch_us(ts) - epoch_us(lag(ts) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id)))
             |      // 1000000 AS BIGINT) AS gap_s
             |  FROM events),
             |gaps AS (SELECT * FROM g WHERE gap_s IS NOT NULL),
             |m AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
             |    CAST(sum(gap_s) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             |      AS mean_s
             |  FROM gaps GROUP BY 1),
             |h AS (
             |  SELECT event_type, CAST(gap_s AS DOUBLE) AS v,
             |    sum(CAST(1 AS DECIMAL(38,6))) AS w
             |  FROM gaps GROUP BY 1, 2),
             |c AS (
             |  SELECT event_type, v,
             |    sum(w) OVER (PARTITION BY event_type ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    sum(w) OVER (PARTITION BY event_type) AS tot
             |  FROM h),
             |q AS (
             |  SELECT event_type,
             |    min(CASE WHEN cum * 2 >= tot * 1 THEN v END) AS p50_s,
             |    min(CASE WHEN cum * 10 >= tot * 9 THEN v END) AS p90_s
             |  FROM c GROUP BY 1)
             |SELECT m.event_type, m.n_gaps, m.mean_s, q.p50_s, q.p90_s
             |FROM m JOIN q ON q.event_type = m.event_type
             |ORDER BY m.event_type""".stripMargin)),

    // --------------------------------------- user lifetime profile
    // The per-entity summary table every behavioral pipeline
    // materializes (and the input to churn/LTV features): first/last
    // seen, event count, exact distinct active days, intensity
    // (events per active day — exact integer ratio), purchase count
    // and DECIMAL-exact purchase value. ONE partial-aggregating
    // groupBy over the raw stream; at 100 TB this is the canonical
    // map-side-combine rollup.
    Q("q_ev_user_profile",
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"),
          count(lit(1)).as("n_events"),
          count_distinct(to_date(col("ts"))).as("active_days"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases"),
          sum(when(col("event_type") === "purchase",
              col("value").cast("decimal(18,2)"))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double")
            .as("purchase_value"))
        .select(col("user_id"), col("first_ts"), col("last_ts"),
          col("n_events"), col("active_days"),
          (col("n_events") / col("active_days")).as("events_per_day"),
          col("n_purchases"), col("purchase_value"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
             |    AS active_days,
             |  count(*) / count(DISTINCT CAST(ts AS DATE))
             |    AS events_per_day,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
             |    END) AS BIGINT) AS n_purchases,
             |  CAST(sum(CASE WHEN event_type = 'purchase'
             |    THEN CAST(value AS DECIMAL(18,2))
             |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             |    AS purchase_value
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // -------------------------------- funnel conversion-latency report
    // q_ev_funnel counts WHO converts; this reports HOW LONG the
    // view->click->purchase path takes: per converting user, the
    // ordered-step latency in whole seconds (integer micros div — no
    // float time math), then nearest-rank p50/p90 via the weighted-
    // quantile histogram with unit weights. Latency distinct values
    // are calendar-bounded (seconds over the funnel window), so the
    // histogram window is bounded at any user count — the same scale
    // contract as every percentile in this engine.
    Q("q_ev_funnel_latency",
      (s, d) => {
        val e = Tables.events(s, d)
        val v = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
        val c = e.filter(col("event_type") === "click")
          .join(v, Seq("user_id"))
          .filter(col("ts") > col("t_view"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
        val p = e.filter(col("event_type") === "purchase")
          .join(v.join(c, Seq("user_id")), Seq("user_id"))
          .filter(col("ts") > col("t_click"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
        val lat = p.join(v, Seq("user_id"))
          .select(expr("CAST((unix_micros(t_purchase) " +
            "- unix_micros(t_view)) DIV 1000000 AS BIGINT)").as("lat_s"))
          .withColumn("__one", lit(1L))
        graft.operators.Percentiles.weightedLowerQuantiles(
          lat, "lat_s", "__one",
          Seq((1, 2, "p50_s"), (9, 10, "p90_s")))
      },
      Some("""WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
             |           WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, min(e.ts) AS t_click
             |      FROM events e JOIN v ON e.user_id = v.user_id
             |      WHERE e.event_type = 'click' AND e.ts > v.t_view
             |      GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
             |      FROM events e JOIN c ON e.user_id = c.user_id
             |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
             |      GROUP BY e.user_id),
             |lat AS (
             |  SELECT CAST((epoch_us(p.t_purchase) - epoch_us(v.t_view))
             |    // 1000000 AS BIGINT) AS v
             |  FROM p JOIN v ON v.user_id = p.user_id),
             |h AS (
             |  SELECT CAST(v AS DOUBLE) AS v,
             |    sum(CAST(1 AS DECIMAL(38,6))) AS w
             |  FROM lat GROUP BY 1),
             |cw AS (
             |  SELECT v, sum(w) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    sum(w) OVER () AS tot
             |  FROM h)
             |SELECT
             |  min(CASE WHEN cum * 2 >= tot * 1 THEN v END) AS p50_s,
             |  min(CASE WHEN cum * 10 >= tot * 9 THEN v END) AS p90_s,
             |  CAST(max(tot) AS DOUBLE) AS total_weight
             |FROM cw""".stripMargin)),

    // ------------------------------- first/last-touch attribution
    // Marketing-style attribution for every purchase: the most recent
    // click at-or-before it (last touch — operators/AsOf.joinBackward,
    // the union-window trick: one shuffle on user_id, no per-row range
    // scan) and the user's earliest click if it precedes the purchase
    // (first touch — one tiny per-user aggregate broadcast back).
    // Clicks dedup to one row per (user, ts) first (AsOf's uniqueness
    // contract; max event_id deterministically).
    Q("q_ev_attribution",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts").as("click_ts"))
          .agg(max(col("event_id")).as("last_click_id"))
          .withColumn("last_click_ts", col("click_ts"))
        val lastTouch = graft.operators.AsOf.joinBackward(
          purchases, clicks, "user_id", "ts", "click_ts",
          Seq("last_click_ts", "last_click_id"))
        val firstTouch = clicks.groupBy(col("user_id"))
          .agg(min(col("click_ts")).as("__ft_ts"),
            min_by(col("last_click_id"),
              struct(col("click_ts"), col("last_click_id")))
              .as("__ft_id"))
        lastTouch.join(broadcast(firstTouch), Seq("user_id"), "left")
          .select(col("event_id"), col("user_id"),
            col("last_click_ts"), col("last_click_id"),
            when(col("__ft_ts") <= col("ts"), col("__ft_ts"))
              .as("first_click_ts"),
            when(col("__ft_ts") <= col("ts"), col("__ft_id"))
              .as("first_click_id"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (
             |  SELECT event_id, user_id, ts FROM events
             |  WHERE event_type = 'purchase'),
             |c AS (
             |  SELECT user_id, ts AS click_ts, max(event_id) AS click_id
             |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
             |lt AS (
             |  SELECT p.event_id, max(c.click_ts) AS last_click_ts
             |  FROM p LEFT JOIN c ON c.user_id = p.user_id
             |    AND c.click_ts <= p.ts
             |  GROUP BY 1),
             |ft AS (
             |  SELECT user_id, min(click_ts) AS ft_ts
             |  FROM c GROUP BY 1),
             |ftid AS (
             |  SELECT c.user_id, ft.ft_ts, c.click_id AS ft_id
             |  FROM ft JOIN c ON c.user_id = ft.user_id
             |    AND c.click_ts = ft.ft_ts)
             |SELECT p.event_id, p.user_id,
             |  lt.last_click_ts, lc.click_id AS last_click_id,
             |  CASE WHEN f.ft_ts <= p.ts THEN f.ft_ts END
             |    AS first_click_ts,
             |  CASE WHEN f.ft_ts <= p.ts THEN f.ft_id END
             |    AS first_click_id
             |FROM p
             |LEFT JOIN lt ON lt.event_id = p.event_id
             |LEFT JOIN c lc ON lc.user_id = p.user_id
             |  AND lc.click_ts = lt.last_click_ts
             |LEFT JOIN ftid f ON f.user_id = p.user_id
             |ORDER BY p.event_id""".stripMargin)),

    // ----------------------- rolling distinct: the HLL-sketch scale path
    // q_ev_rolling_distinct's exact shape re-shuffles the (day, user)
    // frame per window position; at extreme cardinality the scale path
    // keeps ONE mergeable HLL sketch per day and unions 7 of them per
    // window (sketches are bytes, not user sets). This query certifies
    // that substitution at test scale, the q_profile_approx_distinct
    // convention: exact count and sketch estimate computed side by
    // side, sketch_ok = estimate within 2% (lgConfigK=14 keeps HLL
    // error ~0.8%); the oracle checks the exact column and pins
    // sketch_ok TRUE.
    Q("q_ev_rolling_distinct_approx",
      (s, d) => {
        val du = Tables.events(s, d)
          .select(to_date(col("ts")).as("day"), col("user_id"))
          .distinct()
        val days = du.select(col("day").as("d")).distinct()
        val inWin = col("day").between(date_sub(col("d"), 6), col("d"))
        val sk = du.groupBy(col("day"))
          .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
        val est = sk.join(broadcast(days), inWin)
          .groupBy(col("d"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("__est"))
        val exact = du.join(broadcast(days), inWin)
          .groupBy(col("d"))
          .agg(count_distinct(col("user_id")).as("users_7d"))
        exact.join(est, Seq("d"))
          .select(col("d").as("day"), col("users_7d"),
            (abs(col("__est").cast("double")
              - col("users_7d").cast("double"))
              <= lit(0.02) * col("users_7d").cast("double"))
              .as("sketch_ok"))
          .orderBy(col("day"))
      },
      Some("""WITH du AS (
             |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
             |  FROM events),
             |days AS (SELECT DISTINCT day AS d FROM du)
             |SELECT d AS day,
             |  CAST(count(DISTINCT u.user_id) AS BIGINT) AS users_7d,
             |  TRUE AS sketch_ok
             |FROM days JOIN du u ON u.day BETWEEN d - 6 AND d
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ------------------------------------ seasonal baseline + residuals
    // operators/Timeseries.seasonalResiduals: subtract each
    // (event_type, hour-of-day) cell's exact mean — the detrending
    // step before any anomaly rule that shouldn't fire on rush-hour
    // shape. One cell aggregate (DECIMAL-exact mean) + one broadcast
    // join, map-only after that; residual arithmetic is the same
    // double op over identical operands on both engines.
    Q("q_ev_seasonal_residuals",
      (s, d) => graft.operators.Timeseries.seasonalResiduals(
          Tables.events(s, d).select(col("event_id"), col("ts"),
            col("event_type"), col("value")),
          Seq("event_type"), hour(col("ts")), "value")
        .filter(col("event_id") < 2000)
        .select(col("event_id"), col("event_type"), col("value"),
          col("seasonal"), col("residual"))
        .orderBy(col("event_id")),
      Some("""WITH s AS (
             |  SELECT event_type, date_part('hour', ts) AS slot,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |      / count(*) AS seasonal
             |  FROM events GROUP BY 1, 2)
             |SELECT e.event_id, e.event_type, e.value, s.seasonal,
             |  e.value - s.seasonal AS residual
             |FROM events e
             |JOIN s ON s.event_type = e.event_type
             |  AND s.slot = date_part('hour', e.ts)
             |WHERE e.event_id < 2000
             |ORDER BY e.event_id""".stripMargin)),

    // ------------------------------------------- linear-interp gap fill
    // operators/Timeseries.interpolateLinear over the scaffolded
    // user×day grid: daily means where observed, straight-line fill
    // through gaps, endpoint extension at the edges (pandas
    // interpolate(limit_direction='both')). The lerp factor is an
    // exact integer-day ratio; the one order-sensitive float product
    // chain is 6-decimal-stabilized.
    Q("q_ev_gap_fill",
      (s, d) => {
        def stab6(c: org.apache.spark.sql.Column) =
          graft.functions.Stabilize.stab(c, 6)
        val ev = Tables.events(s, d).filter(col("user_id") < 20)
        val daily = ev
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg((sum(col("value").cast("decimal(18,6)")).cast("double")
            / count(lit(1))).as("v"))
        val days = ev.agg(min(to_date(col("ts"))).as("lo"),
            max(to_date(col("ts"))).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"),
            expr("interval 1 day"))).as("day"))
        val grid = daily.select(col("user_id")).distinct()
          .crossJoin(broadcast(days))
        val sparse = grid.join(daily, Seq("user_id", "day"), "left")
        graft.operators.Timeseries.interpolateLinear(sparse,
            Seq("user_id"), "day", "v")
          .select(col("user_id"), col("day"), col("v").as("observed"),
            stab6(col("filled")).as("filled"))
          .orderBy(col("user_id"), col("day"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day, value
             |  FROM events WHERE user_id < 20),
             |daily AS (
             |  SELECT user_id, day,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |      / count(*) AS v
             |  FROM ev GROUP BY 1, 2),
             |span AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
             |days AS (
             |  SELECT CAST(unnest(generate_series(lo, hi,
             |    INTERVAL 1 DAY)) AS DATE) AS day FROM span),
             |grid AS (
             |  SELECT u.user_id, d.day
             |  FROM (SELECT DISTINCT user_id FROM daily) u, days d),
             |j AS (
             |  SELECT g.user_id, g.day, daily.v
             |  FROM grid g LEFT JOIN daily
             |    ON daily.user_id = g.user_id AND daily.day = g.day),
             |w AS (
             |  SELECT user_id, day, v,
             |    last_value(v IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             |    last_value(CASE WHEN v IS NOT NULL THEN day END
             |      IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             |    first_value(v IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY day
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             |    first_value(CASE WHEN v IS NOT NULL THEN day END
             |      IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY day
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
             |  FROM j)
             |SELECT user_id, day, v AS observed,
             |  round_even((CASE WHEN v IS NOT NULL THEN v
             |    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
             |      pv + (nv - pv) * (CAST(day - pd AS DOUBLE)
             |        / CAST(nd - pd AS DOUBLE))
             |    ELSE coalesce(pv, nv) END) * 1000000.0, 0) / 1000000.0
             |    AS filled
             |FROM w ORDER BY user_id, day""".stripMargin)),

    // ----------------------------------------- autocorrelation function
    // ACF of the daily event-count series at lags 1..7 — the
    // periodicity detector behind seasonality choices (is traffic
    // weekly-periodic? is the load series mean-reverting?). Exact
    // integer moments throughout (operators/Timeseries.acf): the
    // n²-scaled centered products Σ(n·x_t − S)(n·x_{t+k} − S) are
    // DECIMAL(38,0), and each r_k is ONE IEEE division — bit-identical
    // on both engines. One day-grain shuffle; the lag self-join runs
    // broadcast over the O(days) series.
    Q("q_ts_acf",
      (s, d) => graft.operators.Timeseries.acf(
        Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("x")),
        "day", "x", maxLag = 7),
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(x) AS BIGINT) AS s FROM daily),
             |c AS (SELECT day, CAST(n * x - s AS HUGEINT) AS dev
             |      FROM daily, t),
             |den AS (SELECT sum(dev * dev) AS dn FROM c),
             |lags AS (SELECT unnest(range(1, 8)) AS lag),
             |pairs AS (
             |  SELECT l.lag AS lag, a.dev AS d1, b.dev AS d2
             |  FROM lags l, c a, c b
             |  WHERE b.day = a.day + CAST(l.lag AS INT)),
             |agg AS (
             |  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
             |    sum(d1 * d2) AS num
             |  FROM pairs GROUP BY lag)
             |SELECT lag, n_pairs,
             |  CAST(num AS DOUBLE) / CAST(dn AS DOUBLE) AS r
             |FROM agg, den ORDER BY lag""".stripMargin)),

    // --------------------------------- temporal split with embargo gap
    // Leakage-safe TIME split (the time-series sibling of
    // q_split_leakage_safe / q_split_cluster_safe): train is everything
    // through the exact 80%-of-events boundary day, then a 3-day
    // EMBARGO absorbs the horizon over which features computed at
    // train time still overlap labels (rolling windows, session
    // carryover) — evaluating inside it is look-ahead leakage — and
    // test is the remainder. The boundary day comes off the day
    // HISTOGRAM by integer rank arithmetic (cum·5 ≥ n·4; one
    // cumulative window over O(days) rows), broadcast into a map-only
    // label; the report is one aggregation. No row-level sort, no
    // float anywhere.
    Q("q_split_temporal_gap",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(to_date(col("ts")).as("day"), col("user_id"))
        val hist = ev.groupBy(col("day")).agg(count(lit(1)).as("c"))
        val tot = hist.agg(sum(col("c")).as("__n"))
        val wcum = org.apache.spark.sql.expressions.Window
          .orderBy(col("day"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        val cut = hist.withColumn("__cum", sum(col("c")).over(wcum))
          .crossJoin(broadcast(tot))
          .agg(min(when(col("__cum") * 5 >= col("__n") * 4, col("day")))
            .as("__cut"))
        ev.crossJoin(broadcast(cut))
          .withColumn("split",
            when(col("day") <= col("__cut"), lit("train"))
              .when(col("day") <= date_add(col("__cut"), 3),
                lit("embargo"))
              .otherwise(lit("test")))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"),
            min(col("day")).as("first_day"),
            max(col("day")).as("last_day"))
          .orderBy(col("split"))
      },
      Some("""WITH ev AS (
             |  SELECT CAST(ts AS DATE) AS day, user_id FROM events),
             |h AS (SELECT day, count(*) AS c FROM ev GROUP BY 1),
             |tot AS (SELECT sum(c) AS n FROM h),
             |cut AS (
             |  SELECT min(CASE WHEN cum * 5 >= n * 4 THEN day END)
             |    AS cut_day
             |  FROM (SELECT day, sum(c) OVER (ORDER BY day
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |          AS cum
             |        FROM h) x, tot),
             |lab AS (
             |  SELECT CASE WHEN day <= cut_day THEN 'train'
             |              WHEN day <= cut_day + 3 THEN 'embargo'
             |              ELSE 'test' END AS split,
             |    day, user_id
             |  FROM ev, cut)
             |SELECT split, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             |  min(day) AS first_day, max(day) AS last_day
             |FROM lab GROUP BY split ORDER BY split""".stripMargin)),

    // --------------------------------------- dominant-period detection
    // Seasonality detector on top of the oracled ACF machinery: the
    // dominant period is the lag with the largest autocorrelation over
    // lags 2..10 (lag 1 is excluded — trend autocorrelation swamps the
    // seasonal signal in any smooth series). All ACF r values share
    // ONE denominator (Σ dev², exact HUGEINT), so the float argmax
    // ranks identically on both engines; ties break to the smallest
    // lag. One-row report: the period, its r, and n_pairs.
    Q("q_ts_period_detect",
      (s, d) => graft.operators.Timeseries.acf(
          Tables.events(s, d)
            .groupBy(to_date(col("ts")).as("day"))
            .agg(count(lit(1)).as("x")),
          "day", "x", maxLag = 10)
        .filter(col("lag") >= 2)
        .orderBy(col("r").desc, col("lag"))
        .limit(1)
        .select(col("lag").as("period"), col("n_pairs"), col("r")),
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(x) AS BIGINT) AS s FROM daily),
             |c AS (SELECT day, CAST(n * x - s AS HUGEINT) AS dev
             |      FROM daily, t),
             |den AS (SELECT sum(dev * dev) AS dn FROM c),
             |lags AS (SELECT unnest(range(1, 11)) AS lag),
             |pairs AS (
             |  SELECT l.lag AS lag, a.dev AS d1, b.dev AS d2
             |  FROM lags l, c a, c b
             |  WHERE b.day = a.day + CAST(l.lag AS INT)),
             |agg AS (
             |  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
             |    sum(d1 * d2) AS num
             |  FROM pairs GROUP BY lag)
             |SELECT lag AS period, n_pairs,
             |  CAST(num AS DOUBLE) / CAST(dn AS DOUBLE) AS r
             |FROM agg, den WHERE lag >= 2
             |ORDER BY r DESC, lag LIMIT 1""".stripMargin)),

    // ------------------------------------------- CUSUM changepoint scan
    // Offline CUSUM (Page 1954) over the same daily series: the
    // running sum of mean deviations peaks in magnitude at the most
    // likely level-shift day — the "did traffic step-change, and
    // when?" diagnostic. n-scaled to pure integers (n·s_t =
    // Σ(n·x_i − S)); is_peak replays the exact integer tie rule, so
    // the whole report is float-free.
    Q("q_ts_cusum",
      (s, d) => graft.operators.Timeseries.cusum(
        Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("x")),
        "day", "x"),
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(x) AS BIGINT) AS s FROM daily),
             |cs AS (
             |  SELECT day, x,
             |    sum(CAST(n * x - s AS HUGEINT)) OVER (ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
             |  FROM daily, t),
             |m AS (SELECT max(abs(c)) AS mx FROM cs)
             |SELECT day, x, CAST(c AS BIGINT) AS cusum_num,
             |  CASE WHEN abs(c) = mx THEN CAST(1 AS BIGINT)
             |       ELSE CAST(0 AS BIGINT) END AS is_peak
             |FROM cs, m ORDER BY day""".stripMargin)),

    // ------------------------------------- segmented trend at the break
    // Piecewise regression keyed off the CUSUM changepoint: split the
    // daily series at the peak-|cusum| day (smallest such day on
    // ties), fit exact-DECIMAL-moment OLS per segment — the
    // before/after incident report ("what was the trend, what did it
    // become"). Composes the oracled cusum + olsByGroup paths; the
    // only new logic is the broadcast split. Slope/intercept are
    // 6-decimal stabilized like every OLS twin.
    Q("q_ts_segmented_trend",
      (s, d) => {
        def stab6(c: org.apache.spark.sql.Column) =
          graft.functions.Stabilize.stab(c, 6)
        val daily = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
        val cs = graft.operators.Timeseries.cusum(daily, "day", "x")
        val peak = cs.orderBy(abs(col("cusum_num")).desc, col("day"))
          .limit(1).select(col("day").as("__peak"))
        val d0 = daily.agg(min(col("day")).as("__d0"))
        val seg = daily.crossJoin(broadcast(peak))
          .crossJoin(broadcast(d0))
          .select(when(col("day") <= col("__peak"), "pre")
            .otherwise("post").as("segment"),
            datediff(col("day"), col("__d0")).cast("long").as("i"),
            col("x"))
        graft.operators.Timeseries.olsByGroup(seg, Seq("segment"), "i", "x")
          .select(col("segment"), col("n").as("n_days"),
            stab6(col("slope")).as("slope"),
            stab6(col("intercept")).as("intercept"))
          .orderBy(col("segment"))
      },
      Some {
        def st(e: String) = graft.functions.Stabilize.stabSql(e, 6)
        s"""WITH daily AS (
           |  SELECT CAST(ts AS DATE) AS day,
           |    CAST(count(*) AS BIGINT) AS x
           |  FROM events GROUP BY 1),
           |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |             CAST(sum(x) AS BIGINT) AS s FROM daily),
           |cs AS (
           |  SELECT day, x,
           |    sum(CAST(n * x - s AS HUGEINT)) OVER (ORDER BY day
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
           |  FROM daily, t),
           |pk AS (SELECT day AS peak FROM cs
           |       ORDER BY abs(c) DESC, day LIMIT 1),
           |d0 AS (SELECT min(day) AS d0 FROM daily),
           |seg AS (
           |  SELECT CASE WHEN day <= peak THEN 'pre' ELSE 'post' END
           |      AS segment,
           |    date_diff('day', d0, day) AS i, x
           |  FROM daily, pk, d0),
           |m AS (
           |  SELECT segment, count(*) AS n,
           |    CAST(sum(CAST(i AS DECIMAL(38,4))) AS DOUBLE) AS sx,
           |    CAST(sum(CAST(x AS DECIMAL(38,4))) AS DOUBLE) AS sy,
           |    CAST(sum(CAST(i * i AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
           |    CAST(sum(CAST(i * x AS DECIMAL(38,4))) AS DOUBLE) AS sxy
           |  FROM seg GROUP BY 1)
           |SELECT segment, CAST(n AS BIGINT) AS n_days,
           |  ${st("(CAST(n AS DOUBLE) * sxy - sx * sy) " +
               "/ (CAST(n AS DOUBLE) * sxx - sx * sx)")} AS slope,
           |  ${st("(sy - ((CAST(n AS DOUBLE) * sxy - sx * sy) " +
               "/ (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx) " +
               "/ CAST(n AS DOUBLE)")} AS intercept
           |FROM m ORDER BY segment""".stripMargin
      }),

    // ---------------------------------------- Theil–Sen robust trend
    // The outlier-immune sibling of q_ts_ols_trend on the daily
    // series: slope = median of all pairwise slopes, intercept =
    // median residual (operators/Timeseries.theilSen). One traffic
    // spike drags OLS; Theil–Sen ignores it up to 29% contamination.
    // Pairwise slopes are single IEEE divisions of exact integers and
    // both medians use the exact rank rule — no float boundary
    // anywhere in selection.
    Q("q_ts_theilsen",
      (s, d) => graft.operators.Timeseries.theilSen(
        Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("x")),
        "day", "x"),
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |d0 AS (SELECT min(day) AS d0 FROM daily),
             |idx AS (SELECT date_diff('day', d0, day) AS i, x
             |        FROM daily, d0),
             |sl AS (
             |  SELECT CAST(b.x - a.x AS DOUBLE)
             |    / CAST(b.i - a.i AS DOUBLE) AS s
             |  FROM idx a, idx b WHERE b.i > a.i),
             |mm AS (SELECT count(*) AS m FROM sl),
             |rk AS (SELECT s, row_number() OVER (ORDER BY s) AS r
             |       FROM sl),
             |med AS (SELECT avg(s) AS med FROM rk, mm
             |        WHERE r = (m + 1) // 2 OR r = (m + 2) // 2),
             |resid AS (
             |  SELECT CAST(x AS DOUBLE) - med * CAST(i AS DOUBLE) AS b
             |  FROM idx, med),
             |m2 AS (SELECT count(*) AS m FROM resid),
             |rk2 AS (SELECT b, row_number() OVER (ORDER BY b) AS r
             |        FROM resid),
             |med2 AS (SELECT avg(b) AS med2 FROM rk2, m2
             |         WHERE r = (m + 1) // 2 OR r = (m + 2) // 2)
             |SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily)
             |    AS n_days,
             |  (SELECT CAST(m AS BIGINT) FROM mm) AS n_pairs,
             |  med AS slope, med2 AS intercept
             |FROM med, med2""".stripMargin)),

    // ------------------------------------------------ top session paths
    // The top-20 most common session journeys: each session's first 8
    // event types in (ts, event_id) order joined with '>'. The
    // per-session step cap is applied BEFORE collection (row_number ≤ 8
    // inside the session window), so a pathological bot session packs
    // at most 8 rows into the aggregate — state stays O(1) per
    // session however long the tail. Ties at the top-20 boundary are
    // impossible: the (n DESC, path) order is total because path is
    // the group key.
    Q("q_ev_top_paths",
      (s, d) => {
        val e = Tables.events(s, d)
        val sess = Sessionize.sessionize(e, col("user_id"), col("ts"),
          Seq(col("ts"), col("event_id")), gapSec)
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("session_id"))
          .orderBy(col("ts"), col("event_id"))
        sess.withColumn("__step", row_number().over(win))
          .filter(col("__step") <= 8)
          .groupBy(col("user_id"), col("session_id"))
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("ts"),
              col("event_id").as("id"), col("event_type").as("et")))),
            x => x.getField("et")), ">").as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path"))
          .limit(20)
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts, event_type,
             |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
             |  FROM events),
             |f AS (
             |  SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 1800000000
             |                 THEN 1 ELSE 0 END AS new_s
             |  FROM g),
             |s AS (
             |  SELECT *, CAST(SUM(new_s) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS session_id
             |  FROM f),
             |st AS (
             |  SELECT *, row_number() OVER (
             |      PARTITION BY user_id, session_id
             |      ORDER BY ts, event_id) AS step
             |  FROM s),
             |paths AS (
             |  SELECT user_id, session_id,
             |    array_to_string(
             |      list(event_type ORDER BY ts, event_id), '>') AS path
             |  FROM st WHERE step <= 8 GROUP BY user_id, session_id),
             |c AS (SELECT path, CAST(count(*) AS BIGINT) AS n
             |      FROM paths GROUP BY path)
             |SELECT path, n FROM c
             |ORDER BY n DESC, path LIMIT 20""".stripMargin)),

    // --------------------------------------- RFM customer segmentation
    // The marketing-analytics classic: per-user Recency (days since
    // last purchase vs corpus end), Frequency (purchase count), and
    // Monetary (exact integer cents) quintiles — WITHOUT ntile's
    // global sort: each metric's 20/40/60/80 boundaries come from one
    // histogram-percentile pass over the per-user aggregate (the
    // equi-depth-bins path), broadcast into a parallel CASE
    // assignment. Recency scores invert (5 = most recent). Boundaries
    // are 6-decimal stabilized; integer metrics never straddle the
    // 1e-6 grid, so segment assignment is engine-exact. Output is the
    // segment rollup (`r_q`, `f_q`, `m_q`, users, cents).
    Q("q_ev_rfm",
      (s, d) => {
        def stab6(c: org.apache.spark.sql.Column) =
          graft.functions.Stabilize.stab(c, 6)
        val purch = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
        val maxDay = purch.agg(max(to_date(col("ts"))).as("__end"))
        val rfm = purch.groupBy(col("user_id"))
          .agg(max(to_date(col("ts"))).as("__last"),
            count(lit(1)).as("f"),
            sum(round(col("value") * 100).cast("long")).as("m"))
          .crossJoin(broadcast(maxDay))
          .select(col("user_id"),
            datediff(col("__end"), col("__last")).cast("long").as("r"),
            col("f"), col("m"))
          .cache() // per-user frame feeds 3 boundary scans + assignment
        def bounds(c: String) = graft.operators.Percentiles
          .groupedExactByHistogram(rfm.withColumn("__one", lit(1)),
            Seq("__one"), c,
            Seq(0.2 -> s"${c}1", 0.4 -> s"${c}2", 0.6 -> s"${c}3",
              0.8 -> s"${c}4"))
          .select(stab6(col(s"${c}1")).as(s"${c}1"),
            stab6(col(s"${c}2")).as(s"${c}2"),
            stab6(col(s"${c}3")).as(s"${c}3"),
            stab6(col(s"${c}4")).as(s"${c}4"))
        def bucket(c: String) =
          when(col(c) <= col(s"${c}1"), 1L)
            .when(col(c) <= col(s"${c}2"), 2L)
            .when(col(c) <= col(s"${c}3"), 3L)
            .when(col(c) <= col(s"${c}4"), 4L).otherwise(5L)
        rfm.crossJoin(broadcast(bounds("r")))
          .crossJoin(broadcast(bounds("f")))
          .crossJoin(broadcast(bounds("m")))
          .select(col("user_id"), col("m"),
            (lit(6L) - bucket("r")).as("r_q"),
            bucket("f").as("f_q"), bucket("m").as("m_q"))
          .groupBy(col("r_q"), col("f_q"), col("m_q"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("m")).as("total_m_cents"))
          .orderBy(col("r_q"), col("f_q"), col("m_q"))
      },
      Some {
        def st(e: String) = graft.functions.Stabilize.stabSql(e, 6)
        def bSql(c: String) = (1 to 4).map(i =>
          s"${st(s"quantile_cont($c, 0.${2 * i})")} AS ${c}$i")
          .mkString(", ")
        def caseSql(c: String) =
          s"""CASE WHEN $c <= ${c}1 THEN 1 WHEN $c <= ${c}2 THEN 2
             |WHEN $c <= ${c}3 THEN 3 WHEN $c <= ${c}4 THEN 4
             |ELSE 5 END""".stripMargin
        s"""WITH purch AS (
           |  SELECT user_id, CAST(ts AS DATE) AS day,
           |    CAST(round(value * 100) AS BIGINT) AS cents
           |  FROM events WHERE event_type = 'purchase'),
           |mx AS (SELECT max(day) AS endd FROM purch),
           |rfm AS (
           |  SELECT user_id,
           |    date_diff('day', max(day), (SELECT endd FROM mx)) AS r,
           |    CAST(count(*) AS BIGINT) AS f,
           |    CAST(sum(cents) AS BIGINT) AS m
           |  FROM purch GROUP BY user_id),
           |b AS (SELECT ${bSql("r")}, ${bSql("f")}, ${bSql("m")}
           |      FROM rfm),
           |seg AS (
           |  SELECT user_id, m,
           |    6 - (${caseSql("r")}) AS r_q,
           |    ${caseSql("f")} AS f_q,
           |    ${caseSql("m")} AS m_q
           |  FROM rfm, b)
           |SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
           |  CAST(m_q AS BIGINT) AS m_q,
           |  CAST(count(*) AS BIGINT) AS n_users,
           |  CAST(sum(m) AS BIGINT) AS total_m_cents
           |FROM seg GROUP BY 1, 2, 3
           |ORDER BY r_q, f_q, m_q""".stripMargin
      }),

    // ------------------------------- Markov removal-effect attribution
    // Data-driven multi-touch attribution (operators/MarkovAttribution,
    // Anderl et al. 2016): session journeys become a first-order
    // Markov chain (virtual start state, purchase absorbing), each
    // channel's credit is the conversion probability lost when every
    // path through it is deleted — the principled alternative to the
    // first/last-touch heuristics of q_ev_attribution. One
    // corpus-scale pass builds transition counts; the 6-step power
    // iterations (base + 4 removals) run on the ≤30-row transition
    // frame with from-ordered mass folds, so the whole report is
    // engine-exact. The oracle unrolls all five chains.
    Q("q_ev_markov_attribution",
      (s, d) => graft.operators.MarkovAttribution.removalEffects(
        graft.operators.MarkovAttribution.transitions(
          Tables.events(s, d), "user_id", "ts", "event_id", "event_type",
          gapSec, absorbing = "purchase"),
        absorbing = "purchase",
        channels = Seq("click", "error", "signup", "view"), steps = 6),
      Some {
        val channels = Seq("click", "error", "signup", "view")
        def variant(x: String): String = {
          val t = s"t_$x"
          val v0 = s"v_${x}_0 AS (SELECT 'start' AS state, " +
            "CAST(1.0 AS DOUBLE) AS pv)"
          val stepsSql = (1 to 6).map { st =>
            val prev = s"v_${x}_${st - 1}"
            s"""v_${x}_$st AS MATERIALIZED (
               |  SELECT to_type AS state,
               |    list_sum(list(p * pv ORDER BY from_type)) AS pv
               |  FROM $t JOIN $prev ON $t.from_type = $prev.state
               |  GROUP BY to_type)""".stripMargin
          }
          (Seq(v0) ++ stepsSql :+
            (s"conv_$x AS (SELECT coalesce(sum(pv), 0.0) AS conv " +
              s"FROM v_${x}_6 WHERE state = 'purchase')")).mkString(",\n")
        }
        val removalTs = channels.map(ch =>
          s"""t_$ch AS MATERIALIZED (SELECT * FROM t_base
             |  WHERE from_type <> '$ch' AND to_type <> '$ch')"""
            .stripMargin).mkString(",\n")
        val effRows = channels.map(ch =>
          s"""SELECT '$ch' AS channel,
             |    (SELECT conv FROM conv_base) AS cb,
             |    (SELECT conv FROM conv_$ch) AS cr""".stripMargin)
          .mkString("\n  UNION ALL ")
        s"""WITH g AS (
           |  SELECT user_id, event_id, ts, event_type,
           |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
           |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
           |  FROM events),
           |f AS (
           |  SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 1800000000
           |                 THEN 1 ELSE 0 END AS new_s
           |  FROM g),
           |s AS (
           |  SELECT *, CAST(SUM(new_s) OVER (
           |      PARTITION BY user_id ORDER BY ts, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |    AS BIGINT) AS session_id
           |  FROM f),
           |tr0 AS (
           |  SELECT from_type, to_type FROM (
           |    SELECT event_type AS from_type,
           |      lead(event_type) OVER (PARTITION BY user_id, session_id
           |        ORDER BY ts, event_id) AS to_type
           |    FROM s)
           |  WHERE to_type IS NOT NULL AND from_type <> 'purchase'),
           |st0 AS (
           |  SELECT 'start' AS from_type, event_type AS to_type FROM (
           |    SELECT event_type, row_number() OVER (
           |      PARTITION BY user_id, session_id
           |      ORDER BY ts, event_id) AS rk
           |    FROM s)
           |  WHERE rk = 1),
           |c AS (
           |  SELECT from_type, to_type, count(*) AS n FROM (
           |    SELECT * FROM tr0 UNION ALL SELECT * FROM st0)
           |  GROUP BY 1, 2),
           |ft AS (SELECT from_type, sum(n) AS ftot FROM c GROUP BY 1),
           |t_base AS MATERIALIZED (
           |  SELECT c.from_type, c.to_type,
           |    CAST(n AS DOUBLE) / CAST(ftot AS DOUBLE) AS p
           |  FROM c JOIN ft USING (from_type)
           |  UNION ALL
           |  SELECT 'purchase', 'purchase', CAST(1.0 AS DOUBLE)),
           |$removalTs,
           |${variant("base")},
           |${channels.map(variant).mkString(",\n")},
           |eff AS (
           |  SELECT channel, cb AS conv_base, cr AS conv_removed,
           |    (cb - cr) / cb AS removal_effect
           |  FROM (
           |  $effRows)),
           |tot AS (SELECT list_sum(list(removal_effect ORDER BY channel))
           |        AS te FROM eff)
           |SELECT channel, conv_base, conv_removed, removal_effect,
           |  removal_effect / te AS share
           |FROM eff, tot ORDER BY channel""".stripMargin
      }),

    // ------------------------------------- daily peak session concurrency
    // Sweep-line concurrency: how many sessions overlap at the busiest
    // instant of each day — the capacity-planning number (connection
    // pools, executor targets) an interval self-join would compute in
    // O(n²). Sessions are clipped to day segments (a session spanning
    // midnight contributes a +1/−1 boundary pair to EACH day), the
    // boundary stream sorts by (ts, delta DESC) so arrivals precede
    // departures at the same instant (inclusive-overlap convention),
    // and the running sum peaks per day. All integers; the windows
    // PARTITION BY day, so the sweep distributes — no global sort, no
    // self-join.
    Q("q_ev_concurrency",
      (s, d) => {
        val e = Tables.events(s, d)
        val sess = Sessionize.sessionize(e, col("user_id"), col("ts"),
            Seq(col("ts"), col("event_id")), gapSec)
          .groupBy(col("user_id"), col("session_id"))
          .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
        val seg = sess.select(col("st"), col("en"),
          explode(sequence(to_date(col("st")), to_date(col("en"))))
            .as("day"))
        val bounds = seg.select(col("day"),
          greatest(unix_micros(col("st")),
            unix_micros(col("day").cast("timestamp"))).as("s_us"),
          least(unix_micros(col("en")),
            unix_micros(date_add(col("day"), 1).cast("timestamp")))
            .as("e_us"))
        val ev = bounds.select(col("day"), col("s_us").as("ts_us"),
            lit(1L).as("delta"))
          .unionAll(bounds.select(col("day"), col("e_us"), lit(-1L)))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("day"))
          .orderBy(col("ts_us"), col("delta").desc)
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        ev.withColumn("c", sum(col("delta")).over(w))
          .groupBy(col("day"))
          .agg(sum(when(col("delta") === 1L, 1L).otherwise(0L))
            .as("n_active_sessions"),
            max(col("c")).as("peak"))
          .orderBy(col("day"))
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts,
             |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
             |  FROM events),
             |f AS (
             |  SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 1800000000
             |                 THEN 1 ELSE 0 END AS new_s
             |  FROM g),
             |s AS (
             |  SELECT *, CAST(SUM(new_s) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS session_id
             |  FROM f),
             |b AS (
             |  SELECT user_id, session_id, min(ts) AS st, max(ts) AS en
             |  FROM s GROUP BY 1, 2),
             |seg AS (
             |  SELECT CAST(unnest(generate_series(CAST(st AS DATE),
             |    CAST(en AS DATE), INTERVAL 1 DAY)) AS DATE) AS day,
             |    st, en
             |  FROM b),
             |bd AS (
             |  SELECT day,
             |    greatest(epoch_us(st),
             |      epoch_us(CAST(day AS TIMESTAMP))) AS s_us,
             |    least(epoch_us(en),
             |      epoch_us(CAST(day AS TIMESTAMP) + INTERVAL 1 DAY))
             |      AS e_us
             |  FROM seg),
             |ev AS (
             |  SELECT day, s_us AS ts_us, 1 AS delta FROM bd
             |  UNION ALL SELECT day, e_us, -1 FROM bd),
             |run AS (
             |  SELECT day, delta, sum(delta) OVER (
             |      PARTITION BY day ORDER BY ts_us, delta DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
             |  FROM ev)
             |SELECT day,
             |  CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_active_sessions,
             |  CAST(max(c) AS BIGINT) AS peak
             |FROM run GROUP BY day ORDER BY day""".stripMargin)),

    // ------------------------------------ interval merge (union coverage)
    // operators/Intervals.mergeIslands: give each event a duration
    // (`value` minutes, floored to exact micros) and union the
    // overlapping extents per user into maximal disjoint islands — the
    // busy-time statistic that sum-of-durations double-counts under
    // overlap. Differs from sessionization: an event STARTING inside an
    // earlier event's extent merges regardless of the start-to-start
    // gap. One user-key window + one rollup shuffle, no interval
    // self-join; all arithmetic in integer epoch micros (floor() before
    // the cast — Spark truncates double→long, DuckDB rounds, floor
    // makes both exact on the same value).
    Q("q_ev_interval_merge",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("s_us"),
          (unix_micros(col("ts")) + floor(col("value") * 60000000d)
            .cast("long")).as("e_us"))
        graft.operators.Intervals.mergeIslands(ev, Seq(col("user_id")),
            col("s_us"), col("e_us"), Seq(col("s_us"), col("e_us"),
              col("event_id")))
          .select(col("user_id"), col("island_id"),
            col("island_start"), col("island_end"),
            (col("island_end") - col("island_start")).as("busy_us"),
            col("n_intervals"))
          .orderBy(col("user_id"), col("island_id"))
      },
      Some("""WITH iv AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS s_us,
             |    epoch_us(ts) + CAST(floor(value * 60000000) AS BIGINT)
             |      AS e_us
             |  FROM events),
             |g AS (
             |  SELECT *, max(e_us) OVER (
             |      PARTITION BY user_id ORDER BY s_us, e_us, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |    AS prev_max_end
             |  FROM iv),
             |f AS (
             |  SELECT *, CASE WHEN prev_max_end IS NULL
             |                   OR s_us > prev_max_end
             |                 THEN 1 ELSE 0 END AS opens
             |  FROM g),
             |isl AS (
             |  SELECT *, CAST(sum(opens) OVER (
             |      PARTITION BY user_id ORDER BY s_us, e_us, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS island_id
             |  FROM f)
             |SELECT user_id, island_id,
             |  min(s_us) AS island_start, max(e_us) AS island_end,
             |  max(e_us) - min(s_us) AS busy_us,
             |  CAST(count(*) AS BIGINT) AS n_intervals
             |FROM isl GROUP BY 1, 2
             |ORDER BY user_id, island_id""".stripMargin)),

    // ------------------------ Kaplan–Meier time-to-first-purchase
    // operators/Survival.kaplanMeier on time-to-conversion: duration =
    // whole days from a user's first event to their FIRST purchase;
    // users who never purchase are CENSORED at the snapshot edge
    // (duration first-event → max ts) — still at risk until then,
    // which the naive conversion-by-duration histogram gets wrong.
    // At-risk counts fold from the duration histogram (one cumulative
    // window over O(distinct durations) rows), the survival curve is
    // an ordered prefix-product in a single array fold, and the
    // oracle replays it with DuckDB's ordered windowed product —
    // survival is 6-decimal stabilized, everything else is exact
    // integers.
    Q("q_ev_survival_km",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val per = ev.groupBy(col("user_id"))
          .agg(min(col("us")).as("f"),
            min(when(col("event_type") === "purchase", col("us")))
              .as("fp"))
        val tmax = ev.agg(max(col("us")).as("T"))
        val subjects = per.crossJoin(broadcast(tmax))
          .select(
            expr("(coalesce(fp, T) - f) div 86400000000")
              .as("dur_days"),
            when(col("fp").isNotNull, 1L).otherwise(0L)
              .as("converted"))
        graft.operators.Survival.kaplanMeier(subjects, "dur_days",
          "converted")
      },
      Some(s"""WITH ev AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS us
             |  FROM events),
             |per AS (
             |  SELECT user_id, min(us) AS f,
             |    min(CASE WHEN event_type = 'purchase' THEN us END)
             |      AS fp
             |  FROM ev GROUP BY 1),
             |tmax AS (SELECT max(us) AS T FROM ev),
             |subj AS (
             |  SELECT (coalesce(fp, T) - f) // 86400000000 AS t,
             |    CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END
             |      AS churned
             |  FROM per, tmax),
             |h AS (
             |  SELECT t, count(*) AS c, sum(churned) AS d
             |  FROM subj GROUP BY 1),
             |tot AS (SELECT sum(c) AS n FROM h),
             |r AS (
             |  SELECT t, c, d, coalesce(sum(c) OVER (ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |    0) AS cb
             |  FROM h),
             |e AS (
             |  SELECT t, n - cb AS n_risk, d,
             |    1.0 - CAST(d AS DOUBLE) / CAST(n - cb AS DOUBLE)
             |      AS factor
             |  FROM r, tot WHERE d >= 1),
             |s AS (
             |  SELECT t, n_risk, d, product(factor) OVER (ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS surv
             |  FROM e)
             |SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
             |  CAST(d AS BIGINT) AS d_events,
             |  ${graft.functions.Stabilize.stabSql("surv", 6)} AS survival
             |FROM s ORDER BY t""".stripMargin)),

    // --------------------------------------- period-over-period growth
    // The WoW growth report every BI layer ships: ISO-week value
    // totals per event type, previous-period comparison by lag window
    // (weeks-per-type bounded partitions riding the rollup
    // partitioning), growth = (cur − prev)/prev as ONE IEEE division
    // on exact decimal sums — null on the first week or a zero base.
    // Weeks are keyed by ISO WEEK-YEAR·100 + week, not the bare week
    // number: across a year boundary ISO week numbers repeat (and
    // late-December dates carry ISO week 1), so a bare-week key would
    // merge different years and lag() against the wrong period. The
    // week-year is the year of the week's THURSDAY (the ISO
    // definition), computed arithmetically on both engines because
    // Spark bans the 'Y' week-year pattern: isodow = Mon-1..Sun-7,
    // thursday = date + (4 − isodow) days.
    Q("q_ev_growth_wow",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val d0 = to_date(col("ts"))
        val isodow = ((dayofweek(d0) + lit(5)) % 7) + 1
        val thursday = date_add(d0, lit(4) - isodow)
        val weekly = Tables.events(s, d)
          .groupBy(col("event_type"),
            (year(thursday).cast("long") * 100
              + weekofyear(d0).cast("long")).as("week"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).as("__v"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("week"))
        weekly
          .withColumn("__prev", lag(col("__v"), 1).over(w))
          .select(col("event_type"), col("week"), col("n_events"),
            col("__v").cast("double").as("total_value"),
            when(col("__prev").isNotNull && col("__prev") =!= 0,
              ((col("__v") - col("__prev")).cast("double")
                / col("__prev").cast("double"))).as("wow_growth"))
          .orderBy(col("event_type"), col("week"))
      },
      Some("""WITH weekly AS (
             |  SELECT event_type,
             |    CAST(year(CAST(ts AS DATE)
             |        + (4 - CAST(isodow(ts) AS INT))) AS BIGINT) * 100
             |      + CAST(weekofyear(ts) AS BIGINT) AS week,
             |    count(*) AS n_events,
             |    sum(CAST(value AS DECIMAL(18,2))) AS v
             |  FROM events GROUP BY 1, 2),
             |l AS (
             |  SELECT event_type, week, n_events, v,
             |    lag(v) OVER (PARTITION BY event_type ORDER BY week)
             |      AS prev
             |  FROM weekly)
             |SELECT event_type, week, CAST(n_events AS BIGINT)
             |    AS n_events,
             |  CAST(v AS DOUBLE) AS total_value,
             |  CASE WHEN prev IS NOT NULL AND prev <> 0 THEN
             |    CAST(v - prev AS DOUBLE) / CAST(prev AS DOUBLE)
             |  END AS wow_growth
             |FROM l ORDER BY event_type, week""".stripMargin)),

    // -------------------------------------- forecast backtest scoring
    // Walk-forward one-step evaluation of two forecasters over the
    // daily value series per event type: naive (yesterday) and the
    // 3-day moving average, scored with MAE / MAPE / sMAPE and MASE
    // (MAE relative to naive — the scale-free standard). Series live
    // in day-count-bounded windows per type. Error terms live in
    // 3-SCALED exact-decimal space: |3y − Σ₃y| is pure DECIMAL
    // arithmetic (no division until after the sum), so mae_ma3
    // = Σ|3y−ms| / (3n) needs NO stabilizer — the r13 sf10 sweep
    // caught the previous stab9 form losing one representation-tie
    // rounding (bround vs round_even disagreed on a single row's
    // ae·1e9, a 1e-9 shift in the sum → 4.5e-13 in the mean). The
    // ratio metrics (mape/smape) keep the stab9+DECIMAL-sum treatment:
    // their per-row terms are single-IEEE-op doubles over exact-decimal
    // inputs, bit-identical across engines. One shuffle for the daily
    // rollup; the scoring windows ride the same partitioning.
    Q("q_ts_forecast_error",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val stab9 = (c: org.apache.spark.sql.Column) =>
          graft.functions.Stabilize.stab(c, 9).cast("decimal(24,12)")
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("y"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        val wma = w.rowsBetween(-3, -1)
        val scored = daily
          .withColumn("naive", lag(col("y"), 1).over(w))
          .withColumn("__ms", sum(col("y")).over(wma))
          .withColumn("__mn", count(col("y")).over(wma))
          .filter(col("naive").isNotNull && col("__mn") === 3)
          .withColumn("ma3", col("__ms").cast("double") / 3)
          .withColumn("yd", col("y").cast("double"))
          .withColumn("ae_naive", abs(col("y") - col("naive")))
          // |3y − ms| in DECIMAL: exact, order-independent under sum
          .withColumn("ae3", abs(col("y") * 3 - col("__ms")))
          .withColumn("ae_ma3", abs(col("yd") - col("ma3")))
        scored.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            (sum(col("ae_naive")).cast("double") /
              count(lit(1)).cast("double")).as("mae_naive"),
            (sum(col("ae3")).cast("double") /
              (count(lit(1)) * 3).cast("double")).as("mae_ma3"),
            (sum(stab9(col("ae_ma3") / col("yd"))).cast("double") /
              count(lit(1)).cast("double")).as("mape_ma3"),
            (sum(stab9(col("ae_ma3") /
              ((abs(col("yd")) + abs(col("ma3"))) / 2)))
              .cast("double") / count(lit(1)).cast("double"))
              .as("smape_ma3"))
          .withColumn("mase_ma3", col("mae_ma3") / col("mae_naive"))
          .orderBy(col("event_type"))
      },
      Some {
        val stab9 = (e: String) =>
          s"CAST(${graft.functions.Stabilize.stabSql(e, 9)}" +
            " AS DECIMAL(24,12))"
        s"""WITH daily AS (
           |  SELECT event_type, CAST(ts AS DATE) AS day,
           |    sum(CAST(value AS DECIMAL(18,2))) AS y
           |  FROM events GROUP BY 1, 2),
           |sc AS (
           |  SELECT event_type, day, y,
           |    lag(y) OVER w AS naive,
           |    sum(y) OVER (PARTITION BY event_type ORDER BY day
           |      ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS ms,
           |    count(y) OVER (PARTITION BY event_type ORDER BY day
           |      ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS mn
           |  FROM daily
           |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
           |f AS (
           |  SELECT event_type, y, naive, ms,
           |    CAST(ms AS DOUBLE) / 3 AS ma3,
           |    CAST(y AS DOUBLE) AS yd
           |  FROM sc WHERE naive IS NOT NULL AND mn = 3),
           |t AS (
           |  SELECT event_type, abs(y - naive) AS ae_naive,
           |    abs(y * 3 - ms) AS ae3,
           |    abs(yd - ma3) AS ae_ma3, yd, ma3
           |  FROM f),
           |g AS (
           |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           |    CAST(sum(ae_naive) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           |      AS mae_naive,
           |    CAST(sum(ae3) AS DOUBLE)
           |      / CAST(count(*) * 3 AS DOUBLE) AS mae_ma3,
           |    CAST(sum(${stab9("ae_ma3 / yd")}) AS DOUBLE)
           |      / CAST(count(*) AS DOUBLE) AS mape_ma3,
           |    CAST(sum(${stab9("ae_ma3 / ((abs(yd) + abs(ma3)) / 2)")})
           |      AS DOUBLE) / CAST(count(*) AS DOUBLE) AS smape_ma3
           |  FROM t GROUP BY 1)
           |SELECT event_type, n_days, mae_naive, mae_ma3, mape_ma3,
           |  smape_ma3, mae_ma3 / mae_naive AS mase_ma3
           |FROM g ORDER BY event_type""".stripMargin
      }),

    // --------------------------------------------- Welch's t (A/B test)
    // Experimentation readout over user-level value sums: variant =
    // user parity (a deterministic 50/50 assignment), metric = each
    // user's Jan-16-onward value total. The unit rollup is one
    // groupBy; Welch's t and the Satterthwaite df come from ONE exact
    // decimal moment pass (operators/Experiment — identical IEEE
    // formula trees both engines, 1e-6 stabilized).
    Q("q_ab_welch_ttest",
      (s, d) => {
        val units = Tables.events(s, d)
          .filter(col("ts") >= lit("2024-01-16").cast("timestamp"))
          .groupBy(col("user_id"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("__y"))
        graft.operators.Experiment.welchTTest(
          units, col("user_id") % 2 === 1, col("__y"))
      },
      Some("""WITH units AS (
             |  SELECT user_id,
             |    sum(CAST(value AS DECIMAL(18,2))) AS y
             |  FROM events
             |  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
             |  GROUP BY 1),
             |m AS (
             |  SELECT
             |    count(*) FILTER (WHERE user_id % 2 = 0) AS na,
             |    sum(y) FILTER (WHERE user_id % 2 = 0) AS sa,
             |    sum(y * y) FILTER (WHERE user_id % 2 = 0) AS qa,
             |    count(*) FILTER (WHERE user_id % 2 = 1) AS nb,
             |    sum(y) FILTER (WHERE user_id % 2 = 1) AS sb,
             |    sum(y * y) FILTER (WHERE user_id % 2 = 1) AS qb
             |  FROM units),
             |f AS (
             |  SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT)
             |      AS n_b,
             |    CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd,
             |    CAST(sa AS DOUBLE) AS sad, CAST(sb AS DOUBLE) AS sbd,
             |    CAST(qa AS DOUBLE) AS qad, CAST(qb AS DOUBLE) AS qbd
             |  FROM m),
             |v AS (
             |  SELECT *,
             |    (qad - sad * sad / nad) / (nad - 1) AS va,
             |    (qbd - sbd * sbd / nbd) / (nbd - 1) AS vb
             |  FROM f),
             |se AS (SELECT *, va / nad + vb / nbd AS se2 FROM v)
             |SELECT n_a, n_b, sad / nad AS mean_a, sbd / nbd AS mean_b,
             |  CASE WHEN nad > 1 AND nbd > 1 AND se2 > 0 THEN
             |    round_even((sbd / nbd - sad / nad) / sqrt(se2)
             |      * 1000000.0, 0) / 1000000.0 END AS t_stat,
             |  CASE WHEN nad > 1 AND nbd > 1 AND se2 > 0 THEN
             |    round_even((se2 * se2) / ((va / nad) * (va / nad)
             |        / (nad - 1) + (vb / nbd) * (vb / nbd) / (nbd - 1))
             |      * 1000000.0, 0) / 1000000.0 END AS df
             |FROM se""".stripMargin)),

    // ------------------------------------------- difference-in-differences
    // The non-randomized-assignment companion: per-user pre (Jan 1-15)
    // and post (Jan 16-30) value totals, arms by user parity; DiD =
    // mean per-unit delta difference between arms with Welch SE over
    // the deltas (operators/Experiment.diffInDiff — one exact decimal
    // moment pass on δ = post − pre).
    Q("q_ab_diff_in_diff",
      (s, d) => {
        val boundary = lit("2024-01-16").cast("timestamp")
        val units = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(
            coalesce(sum(when(col("ts") < boundary,
              col("value").cast("decimal(18,2)"))),
              lit(0).cast("decimal(18,2)")).as("__pre"),
            coalesce(sum(when(col("ts") >= boundary,
              col("value").cast("decimal(18,2)"))),
              lit(0).cast("decimal(18,2)")).as("__post"))
        graft.operators.Experiment.diffInDiff(units,
          col("user_id") % 2 === 1, col("__pre"), col("__post"))
      },
      Some("""WITH units AS (
             |  SELECT user_id,
             |    COALESCE(sum(CAST(value AS DECIMAL(18,2)))
             |      FILTER (WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
             |      CAST(0 AS DECIMAL(18,2))) AS pre,
             |    COALESCE(sum(CAST(value AS DECIMAL(18,2)))
             |      FILTER (WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
             |      CAST(0 AS DECIMAL(18,2))) AS post
             |  FROM events GROUP BY 1),
             |m AS (
             |  SELECT
             |    count(*) FILTER (WHERE user_id % 2 = 0) AS nc,
             |    sum(post - pre) FILTER (WHERE user_id % 2 = 0) AS sc,
             |    sum((post - pre) * (post - pre))
             |      FILTER (WHERE user_id % 2 = 0) AS qc,
             |    count(*) FILTER (WHERE user_id % 2 = 1) AS nt,
             |    sum(post - pre) FILTER (WHERE user_id % 2 = 1) AS st,
             |    sum((post - pre) * (post - pre))
             |      FILTER (WHERE user_id % 2 = 1) AS qt
             |  FROM units),
             |f AS (
             |  SELECT CAST(nc AS BIGINT) AS n_c, CAST(nt AS BIGINT)
             |      AS n_t,
             |    CAST(nc AS DOUBLE) AS ncd, CAST(nt AS DOUBLE) AS ntd,
             |    CAST(sc AS DOUBLE) AS scd, CAST(st AS DOUBLE) AS std,
             |    CAST(qc AS DOUBLE) AS qcd, CAST(qt AS DOUBLE) AS qtd
             |  FROM m),
             |v AS (
             |  SELECT *,
             |    (qcd - scd * scd / ncd) / (ncd - 1) AS vc,
             |    (qtd - std * std / ntd) / (ntd - 1) AS vt
             |  FROM f)
             |SELECT n_c, n_t, scd / ncd AS delta_c, std / ntd AS delta_t,
             |  round_even((std / ntd - scd / ncd) * 1000000.0, 0)
             |    / 1000000.0 AS did,
             |  CASE WHEN ncd > 1 AND ntd > 1 THEN
             |    round_even(sqrt(vc / ncd + vt / ntd) * 1000000.0, 0)
             |      / 1000000.0 END AS se
             |FROM v""".stripMargin)),

    // ----------------------------------------- minimum detectable effect
    // The pre-experiment sizing readout: pooled variance of the
    // post-period user metric and the two-sample MDE at α = 5%
    // two-sided, 80% power — (z_{α/2} + z_β)·√(2σ̂²/n_arm), z literals
    // shared between engines (operators/Experiment.minDetectableEffect).
    Q("q_ab_mde",
      (s, d) => {
        val units = Tables.events(s, d)
          .filter(col("ts") >= lit("2024-01-16").cast("timestamp"))
          .groupBy(col("user_id"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("__y"))
        graft.operators.Experiment.minDetectableEffect(
          units, col("user_id") % 2 === 1, col("__y"))
      },
      Some {
        import graft.operators.Experiment.{zAlphaHalf, zPower}
        s"""WITH units AS (
           |  SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS y
           |  FROM events
           |  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
           |  GROUP BY 1),
           |m AS (
           |  SELECT
           |    count(*) FILTER (WHERE user_id % 2 = 0) AS na,
           |    sum(y) FILTER (WHERE user_id % 2 = 0) AS sa,
           |    sum(y * y) FILTER (WHERE user_id % 2 = 0) AS qa,
           |    count(*) FILTER (WHERE user_id % 2 = 1) AS nb,
           |    sum(y) FILTER (WHERE user_id % 2 = 1) AS sb,
           |    sum(y * y) FILTER (WHERE user_id % 2 = 1) AS qb
           |  FROM units),
           |f AS (
           |  SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT)
           |      AS n_b,
           |    CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd,
           |    CAST(sa AS DOUBLE) AS sad, CAST(sb AS DOUBLE) AS sbd,
           |    CAST(qa AS DOUBLE) AS qad, CAST(qb AS DOUBLE) AS qbd
           |  FROM m),
           |v AS (
           |  SELECT n_a, n_b, nad, nbd,
           |    (sad + sbd) / (nad + nbd) AS mean,
           |    ((qad - sad * sad / nad) + (qbd - sbd * sbd / nbd))
           |      / (nad + nbd - 2) AS v,
           |    least(nad, nbd) AS narm
           |  FROM f),
           |w AS (
           |  SELECT *, ($zAlphaHalf + $zPower) * sqrt(2.0 * v / narm)
           |    AS mde
           |  FROM v)
           |SELECT n_a, n_b,
           |  round_even(mean * 1000000.0, 0) / 1000000.0 AS pooled_mean,
           |  CASE WHEN nad > 1 AND nbd > 1 THEN
           |    round_even(v * 1000000.0, 0) / 1000000.0 END AS pooled_var,
           |  CASE WHEN nad > 1 AND nbd > 1 THEN
           |    round_even(mde * 1000000.0, 0) / 1000000.0 END AS mde_abs,
           |  CASE WHEN nad > 1 AND nbd > 1 AND mean <> 0 THEN
           |    round_even(mde / mean * 1000000.0, 0) / 1000000.0
           |  END AS mde_rel
           |FROM w""".stripMargin
      }),

    // ------------------------------------------- delta-method ratio SE
    // Standard error of the value-per-event ratio metric (Deng et al.
    // KDD 2018): per-user (Σvalue, n_events) pairs make the metric a
    // ratio of means, whose variance the naive per-user-ratio formula
    // misstates. Both the naive SE (stabilized per-unit ratios,
    // DECIMAL-summed) and the correct first-order delta SE come from
    // ONE exact decimal moment pass (operators/Experiment.ratioDelta).
    Q("q_ab_ratio_delta",
      (s, d) => {
        val units = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(coalesce(sum(col("value").cast("decimal(18,2)")),
              lit(0).cast("decimal(18,2)")).as("__x"),
            count(lit(1)).cast("decimal(18,0)").as("__y"))
        graft.operators.Experiment.ratioDelta(
          units, col("__x"), col("__y"))
      },
      Some {
        def stab9(e: String) = graft.functions.Stabilize.stabSql(e, 9)
        s"""WITH units AS (
           |  SELECT user_id,
           |    COALESCE(sum(CAST(value AS DECIMAL(18,2))),
           |      CAST(0 AS DECIMAL(18,2))) AS x,
           |    CAST(count(*) AS DECIMAL(18,0)) AS y
           |  FROM events GROUP BY 1),
           |m AS (
           |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
           |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy,
           |    count(*) FILTER (WHERE y <> 0) AS nr,
           |    sum(CAST(${stab9("CAST(x AS DOUBLE) / CAST(y AS DOUBLE)")}
           |        AS DECIMAL(24,12))) FILTER (WHERE y <> 0) AS sr,
           |    sum(CAST(${stab9(
                  "(CAST(x AS DOUBLE) / CAST(y AS DOUBLE)) *" +
                  " (CAST(x AS DOUBLE) / CAST(y AS DOUBLE))")}
           |        AS DECIMAL(24,12))) FILTER (WHERE y <> 0) AS srr
           |  FROM units),
           |f AS (
           |  SELECT CAST(n AS BIGINT) AS n_units,
           |    CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
           |    CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
           |    CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd,
           |    CAST(nr AS DOUBLE) AS nrd, CAST(sr AS DOUBLE) AS srd,
           |    CAST(srr AS DOUBLE) AS srrd
           |  FROM m),
           |v AS (
           |  SELECT n_units, nd, sxd, syd, nrd,
           |    sxd / nd AS mx, syd / nd AS my,
           |    (sxyd - sxd * syd / nd) / (nd - 1) AS cov,
           |    (sxxd - sxd * sxd / nd) / (nd - 1) AS vx,
           |    (syyd - syd * syd / nd) / (nd - 1) AS vy,
           |    (srrd - srd * srd / nrd) / (nrd - 1) AS vnaive
           |  FROM f)
           |SELECT n_units,
           |  CASE WHEN syd <> 0 THEN ${stab9("mx / my")} END AS ratio,
           |  CASE WHEN nrd > 1 THEN
           |    ${stab9("sqrt(vnaive / nrd)")} END AS se_naive,
           |  CASE WHEN syd <> 0 AND nd > 1 THEN
           |    ${stab9("sqrt((vx / (my * my) - 2 * mx * cov" +
                " / (my * my * my) + mx * mx * vy" +
                " / (my * my * my * my)) / nd)")} END AS se_delta
           |FROM v""".stripMargin
      }),

    // ------------------------------------------- CUPED variance reduction
    // The pre-period companion (Deng et al., WSDM 2013): covariate =
    // each user's Jan-1..15 value total, metric = the Jan-16-onward
    // total; θ = cov/var_x and the adjusted variance via the closed
    // form var(y − θx) = var_y − cov²/var_x, all from ONE exact
    // decimal moment pass over the unit frame — var_reduction is the
    // squared pre/post correlation.
    Q("q_ab_cuped",
      (s, d) => {
        val boundary = lit("2024-01-16").cast("timestamp")
        val units = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(
            coalesce(sum(when(col("ts") < boundary,
              col("value").cast("decimal(18,2)"))),
              lit(0).cast("decimal(18,2)")).as("__x"),
            coalesce(sum(when(col("ts") >= boundary,
              col("value").cast("decimal(18,2)"))),
              lit(0).cast("decimal(18,2)")).as("__y"))
        graft.operators.Experiment.cuped(units, col("__x"), col("__y"))
      },
      Some("""WITH units AS (
             |  SELECT user_id,
             |    COALESCE(sum(CAST(value AS DECIMAL(18,2)))
             |      FILTER (WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
             |      CAST(0 AS DECIMAL(18,2))) AS x,
             |    COALESCE(sum(CAST(value AS DECIMAL(18,2)))
             |      FILTER (WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
             |      CAST(0 AS DECIMAL(18,2))) AS y
             |  FROM events GROUP BY 1),
             |m AS (
             |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
             |  FROM units),
             |f AS (
             |  SELECT CAST(n AS BIGINT) AS n_units,
             |    CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
             |    CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
             |    CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
             |  FROM m),
             |v AS (
             |  SELECT n_units,
             |    (sxyd - sxd * syd / nd) / (nd - 1) AS cov,
             |    (sxxd - sxd * sxd / nd) / (nd - 1) AS vx,
             |    (syyd - syd * syd / nd) / (nd - 1) AS vy
             |  FROM f)
             |SELECT n_units,
             |  CASE WHEN vx > 0 THEN
             |    round_even(cov / vx * 1000000.0, 0) / 1000000.0
             |  END AS theta,
             |  round_even(vy * 1000000.0, 0) / 1000000.0 AS var_y,
             |  CASE WHEN vx > 0 THEN
             |    round_even((vy - cov * cov / vx) * 1000000.0, 0)
             |      / 1000000.0 END AS var_y_adj,
             |  CASE WHEN vx > 0 AND vy > 0 THEN
             |    round_even(cov * cov / (vx * vy) * 1000000.0, 0)
             |      / 1000000.0 END AS var_reduction
             |FROM v""".stripMargin))
  )
}
