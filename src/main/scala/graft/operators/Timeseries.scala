package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series smoothing operators.
  *
  * Reference anchor: the notebooks smooth training-load series with
  * rolling means (`ML Python Scripts/ML_Model_Data_Cleaning.ipynb`,
  * ATL/CTL exponential decay in `Final Datasets/atl.csv`'s derivation);
  * the general form every monitoring/feature pipeline needs is the
  * exponentially weighted moving average, so the engine ships it as a
  * first-class grouped operator.
  */
object Timeseries {

  /** Per-key exponentially weighted moving average, folded in event-time
    * order: `s_1 = x_1`, `s_t = (1-alpha)*s_{t-1} + alpha*x_t`.
    *
    * Engine-portability contract: `alpha` (and `1-alpha`) must be exact
    * binary fractions (k/2^m, e.g. 0.25/0.75) so each fold step is one
    * IEEE multiply-add chain with no representation error — two engines
    * folding the same doubles in the same order then agree bit-for-bit
    * (DuckDB mirror: `list_reduce(list(v ORDER BY ord), ...)`, which
    * seeds from the first element exactly like this fold).
    *
    * Scale shape: one hash shuffle on the keys; each key's series is
    * packed into a single task (`collect_list`), which is the right
    * trade while series-per-key are bounded (events per user/device —
    * the 100 TB axis is #keys, which spreads across tasks). For
    * unbounded single-key series the fold is an affine map `s' = A*s +
    * B` per segment and composes associatively, so a segmented
    * map-side partial exists — but it re-orders float operations and
    * breaks the bit-exact contract, so this operator keeps the
    * sequential fold and documents the trade.
    *
    * Null values are filtered before folding (Spark's `collect_list`
    * skips nulls but DuckDB's `list()` keeps them; filtering makes both
    * engines see the same series).
    *
    * Output: key columns + `n_events`, `last_value`, `ewma`, and
    * `drift` = last_value - ewma (a control-chart style deviation of
    * the newest point from its smoothed history).
    */
  def ewma(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
           valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0,1)")
    val ks = keyCols.map(col)
    val vs = transform(
      array_sort(collect_list(struct(ordCols :+ col(valueCol).as("__v"): _*))),
      x => x.getField("__v"))
    val g = df.filter(col(valueCol).isNotNull)
      .groupBy(ks: _*)
      .agg(count(lit(1)).as("n_events"), vs.as("__vs"))
    g.select(ks ++ Seq(
        col("n_events"),
        element_at(col("__vs"), size(col("__vs"))).as("last_value"),
        aggregate(
          slice(col("__vs"), lit(2), greatest(size(col("__vs")) - 1, lit(0))),
          element_at(col("__vs"), 1),
          (acc, x) => acc * lit(1.0 - alpha) + x * lit(alpha)).as("ewma")): _*)
      .withColumn("drift", col("last_value") - col("ewma"))
  }

  /** Seasonal-baseline decomposition: each row's value is split into a
    * seasonal component (the exact mean of its (key, season-slot)
    * cell — e.g. event type × hour-of-day) and a residual. This is the
    * profile half of an STL-style decomposition, and the right
    * de-seasonalizer for anomaly pipelines where "normal for 3 a.m."
    * differs from "normal for noon": a value judged against the global
    * baseline false-alarms every rush hour.
    *
    * Exactness: cell means accumulate as DECIMAL(18,6) sums (order-
    * independent, partial-aggregation safe) with one IEEE division;
    * the residual is one IEEE subtraction. Bit-identical cross-engine.
    *
    * Scale shape (100 TB): one partial-aggregated groupBy over
    * (keys × slots) — a bounded cell table (|keys|·|slots|) that
    * BROADCASTS back onto the row stream; the flagging pass is
    * map-only. No windows, no global sort.
    *
    * `slotCol` is any deterministic season-slot expression (hour,
    * day-of-week, month…). Output: input columns + `seasonal` +
    * `residual`.
    */
  def seasonalResiduals(df: DataFrame, keyCols: Seq[String],
                        slotCol: Column, valueCol: String): DataFrame = {
    val slotted = df.withColumn("__slot", slotCol)
    val cellKeys = keyCols.map(col) :+ col("__slot")
    val cells = slotted
      .groupBy(cellKeys: _*)
      .agg((sum(col(valueCol).cast("decimal(18,6)")).cast("double") /
        count(lit(1))).as("seasonal"))
    slotted.join(broadcast(cells), keyCols :+ "__slot")
      .withColumn("residual", col(valueCol) - col("seasonal"))
      .drop("__slot")
  }

  /** Per-group ordinary-least-squares trend: slope and intercept of
    * `yCol` regressed on `xCol`, from the classic moment sums
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²).
    *
    * Engine-portability contract: the four moment sums accumulate in
    * DECIMAL (exact, order-independent — partial aggregation cannot
    * change them; the x·y / x·x doubles sit within ulps of the
    * `prodScale`-decimal grid, so both engines' double→decimal casts
    * land on the same grid point), and only the final slope/intercept
    * arithmetic runs in DOUBLE over those exact operands with one
    * fixed parenthesization — identical IEEE ops, identical bits.
    *
    * Scale shape: ONE partial-aggregating groupBy — the same plan as
    * any sum, no window, no collect. This is the map-side-combining
    * form of what a per-key `regr_slope` would do.
    */
  /** Holt double-exponential smoothing (level + linear trend), folded
    * in event-time order per key — the forecasting step above [[ewma]]
    * when the series actually trends:
    *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1},  l_1 = x_1, b_1 = 0.
    * Output per key: n_events, level, trend, forecast = level + trend
    * (the one-step-ahead prediction).
    *
    * Same engine-portability contract as [[ewma]]: α and β must be
    * exact binary fractions so each fold step is the same IEEE op
    * chain on both engines (DuckDB mirror: list_reduce over a 2-list
    * [level, trend] accumulator, seeded [x_1, 0]); same scale shape —
    * one hash shuffle on the keys, each key's series folds in one
    * task, the 100 TB axis is #keys.
    */
  def holtLinear(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
                 valueCol: String, alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0,1)")
    require(beta > 0 && beta < 1, "beta must be in (0,1)")
    val ks = keyCols.map(col)
    val vs = transform(
      array_sort(collect_list(struct(ordCols :+ col(valueCol).as("__v"): _*))),
      x => x.getField("__v"))
    val g = df.filter(col(valueCol).isNotNull)
      .groupBy(ks: _*)
      .agg(count(lit(1)).as("n_events"), vs.as("__vs"))
    def step(acc: Column, x: Column): Column = {
      val l = acc.getField("l"); val b = acc.getField("b")
      val lNew = x * lit(alpha) + (l + b) * lit(1.0 - alpha)
      struct(lNew.as("l"),
        ((lNew - l) * lit(beta) + b * lit(1.0 - beta)).as("b"))
    }
    val folded = aggregate(
      slice(col("__vs"), lit(2), greatest(size(col("__vs")) - 1, lit(0))),
      struct(element_at(col("__vs"), 1).as("l"), lit(0.0).as("b")),
      (acc, x) => step(acc, x))
    g.withColumn("__st", folded)
      .select(ks ++ Seq(col("n_events"),
        col("__st.l").as("level"),
        col("__st.b").as("trend"),
        (col("__st.l") + col("__st.b")).as("forecast")): _*)
  }

  /** Linear interpolation of missing values over a dense per-key grid
    * (pandas `interpolate(method='linear')`, the gap-fill step between
    * scaffold-densify and model-ready series): rows where `valueCol`
    * is null get prev + (next − prev)·(t − t_prev)/(t_next − t_prev)
    * from the nearest non-null neighbors in `ordCol` order; leading/
    * trailing gaps fall back to the single available neighbor
    * (pandas `limit_direction='both'` endpoint extension).
    *
    * `ordCol` must be a DATE column (gap fractions use datediff —
    * exact integer day arithmetic, so the lerp factor is an exact
    * ratio). Scale shape: four IGNORE-NULLS window functions over
    * per-key partitions — series are calendar-bounded, keys spread
    * across tasks, nothing global.
    */
  def interpolateLinear(df: DataFrame, keyCols: Seq[String],
                        ordCol: String, valueCol: String,
                        outCol: String = "filled"): DataFrame = {
    val asc = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val obsOrd = when(v.isNotNull, col(ordCol))
    val pv = last(v, ignoreNulls = true).over(asc)
    val pd = last(obsOrd, ignoreNulls = true).over(asc)
    val nv = first(v, ignoreNulls = true).over(desc)
    val nd = first(obsOrd, ignoreNulls = true).over(desc)
    df.withColumn(outCol,
      when(v.isNotNull, v)
        .when(pv.isNotNull && nv.isNotNull,
          pv + (nv - pv) * (datediff(col(ordCol), pd).cast("double")
            / datediff(nd, pd).cast("double")))
        .otherwise(coalesce(pv, nv)))
  }

  /** Autocorrelation function at day lags 1..`maxLag` of an
    * INTEGER-valued day-grain series (`ordCol` a DATE column, `valueCol`
    * a count/long — the bounded-domain contract of the exact-moment
    * family). Mean-centering is exact: with S = Σx over n points, the
    * n²-scaled centered product is Σ(n·x_t − S)(n·x_{t+k} − S) — all
    * integer arithmetic, carried in DECIMAL(38,0) so petabyte-scale
    * daily counts cannot overflow. r_k is then ONE IEEE division of
    * that numerator against the lag-0 denominator Σ(n·x_t − S)², both
    * correctly rounded from exact integers — bit-identical on any
    * engine. Missing days simply contribute no pair at the lags they
    * break (the calendar-lag convention; the oracle mirrors it).
    *
    * Scale shape: the series is the OUTPUT of a day-grain aggregation
    * (O(days) rows), so the totals broadcast, and the lag self-join is
    * a broadcast join of the exploded (day, lag) frame against the
    * O(days) series — the raw table is never re-scanned.
    *
    * Output: `lag`, `n_pairs`, `r`, ordered by lag.
    */
  def acf(series: DataFrame, ordCol: String, valueCol: String,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"need maxLag >= 1, got $maxLag")
    val t = series.agg(count(lit(1)).as("__n"),
      sum(col(valueCol).cast("long")).as("__s"))
    val c = series.crossJoin(broadcast(t))
      .select(col(ordCol).as("__d"),
        (col("__n") * col(valueCol).cast("long") - col("__s"))
          .cast("decimal(38,0)").as("__dev"))
      .cache() // O(days); feeds the denominator, both join sides
    val den = c.agg(sum(col("__dev") * col("__dev")).as("__den"))
    val left = c.select(col("__d"), col("__dev"),
      explode(sequence(lit(1L), lit(maxLag.toLong))).as("lag"))
    val right = c.select(col("__d").as("__d2"), col("__dev").as("__dev2"))
    left.join(broadcast(right),
        date_add(col("__d"), col("lag").cast("int")) === col("__d2"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__dev") * col("__dev2")).as("__num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        (col("__num").cast("double") / col("__den").cast("double")).as("r"))
      .orderBy(col("lag"))
  }

  /** CUSUM changepoint scan over an INTEGER-valued day-grain series:
    * the running sum of mean deviations s_t = Σ_{i≤t}(x_i − x̄) peaks
    * in magnitude at the most likely single changepoint (Page 1954's
    * offline form). Scaled by n it is pure integer arithmetic:
    * n·s_t = Σ(n·x_i − S), carried in DECIMAL(38,0) (BIGINT in the
    * report). `is_peak` marks every row attaining max|n·s_t| — the
    * tie rule both engines replay exactly, no float anywhere.
    *
    * Scale shape: one day-grain aggregation upstream, broadcast
    * totals, and a cumulative window over the O(days) series (the
    * bounded-domain contract — the single-partition window never
    * touches the raw table).
    *
    * Output: ordCol, valueCol, `cusum_num`, `is_peak`, ordered by day.
    */
  def cusum(series: DataFrame, ordCol: String, valueCol: String): DataFrame = {
    val t = series.agg(count(lit(1)).as("__n"),
      sum(col(valueCol).cast("long")).as("__s"))
    val dev = (col("__n") * col(valueCol).cast("long") - col("__s"))
      .cast("decimal(38,0)")
    val w = Window.orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cs = series.crossJoin(broadcast(t))
      .select(col(ordCol), col(valueCol), sum(dev).over(w).as("__cs"))
      .cache() // O(days); feeds the max aggregate and the report
    val mx = cs.agg(max(abs(col("__cs"))).as("__mx"))
    cs.crossJoin(broadcast(mx))
      .select(col(ordCol), col(valueCol),
        col("__cs").cast("long").as("cusum_num"),
        when(abs(col("__cs")) === col("__mx"), 1L).otherwise(0L)
          .as("is_peak"))
      .orderBy(col(ordCol))
  }

  /** Exact lower-median via the textbook rank rule (odd m: the middle
    * value; even m: the mean of the two middles — an average of two
    * identical-on-both-engines doubles, itself deterministic). The
    * rank window is single-partition over the CALLER-BOUNDED candidate
    * set (O(days²) slopes at most) — never a corpus.
    */
  private def medianOf(df: DataFrame, vCol: String): DataFrame = {
    val w = Window.orderBy(col(vCol))
    val ranked = df.select(col(vCol))
      .withColumn("__rk", row_number().over(w))
    val m = df.agg(count(lit(1)).as("__m"))
    ranked.crossJoin(broadcast(m))
      .filter(col("__rk") === expr("(__m + 1) div 2") ||
        col("__rk") === expr("(__m + 2) div 2"))
      .agg(avg(col(vCol)).as("median"))
  }

  /** Theil–Sen robust trend of an integer day-grain series: slope =
    * median of all pairwise slopes (x_j−x_i)/(j−i), intercept =
    * median of x_i − slope·i — the estimator that shrugs off the
    * outlier days OLS chases (29% breakdown point). Pairwise slopes
    * are single IEEE divisions of exact integers and median selection
    * is the exact rank rule, so the report replays bit-for-bit.
    *
    * Scale shape: the O(days²) pair frame is built by a broadcast
    * self-join of the O(days) aggregated series — for a 10-year daily
    * series that is ~6.7M slope pairs, a few tasks' work; the raw
    * table is never re-scanned. Output: one row (n_days, n_pairs,
    * slope, intercept).
    */
  def theilSen(series: DataFrame, ordCol: String,
               valueCol: String): DataFrame = {
    val d0 = series.agg(min(col(ordCol)).as("__d0"))
    val idx = series.crossJoin(broadcast(d0))
      .select(datediff(col(ordCol), col("__d0")).cast("long").as("__i"),
        col(valueCol).cast("long").as("__x"))
      .cache() // O(days); feeds pairs, residuals, and the count
    val a = idx.select(col("__i").as("__ia"), col("__x").as("__xa"))
    val b = idx.select(col("__i").as("__ib"), col("__x").as("__xb"))
    val slopes = a.join(broadcast(b), col("__ib") > col("__ia"))
      .select(((col("__xb") - col("__xa")).cast("double")
        / (col("__ib") - col("__ia")).cast("double")).as("__s"))
      .cache() // O(days²); feeds the rank window and the pair count
    val slope = medianOf(slopes, "__s")
    val resid = idx.crossJoin(broadcast(slope))
      .select((col("__x").cast("double")
        - col("median") * col("__i").cast("double")).as("__b"))
    val intercept = medianOf(resid, "__b")
    idx.agg(count(lit(1)).as("n_days"))
      .crossJoin(slopes.agg(count(lit(1)).as("n_pairs")))
      .crossJoin(slope.select(col("median").as("slope")))
      .crossJoin(intercept.select(col("median").as("intercept")))
  }

  def olsByGroup(df: DataFrame, keyCols: Seq[String], xCol: String,
                 yCol: String, prodScale: Int = 4): DataFrame = {
    def dec(c: Column, s: Int) = sum(c.cast(s"decimal(38,$s)"))
    val x = col(xCol); val y = col(yCol)
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        dec(x, prodScale).as("__sx"), dec(y, prodScale).as("__sy"),
        dec(x * x, prodScale).as("__sxx"),
        dec(x * y, prodScale).as("__sxy"))
      .select(keyCols.map(col) ++ Seq(col("n"), {
        val n  = col("n").cast("double")
        val sx = col("__sx").cast("double")
        val sy = col("__sy").cast("double")
        val sxx = col("__sxx").cast("double")
        val sxy = col("__sxy").cast("double")
        val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        slope.as("slope")
      }, {
        val n  = col("n").cast("double")
        val sx = col("__sx").cast("double")
        val sy = col("__sy").cast("double")
        val sxx = col("__sxx").cast("double")
        val sxy = col("__sxy").cast("double")
        val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        ((sy - slope * sx) / n).as("intercept")
      }): _*)
  }
}
