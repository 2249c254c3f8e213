package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling + data-dependent pruning (SURVEY §2.2 P3/P4, §2.5 A5/A6).
  *
  * Reference: `dropna(axis=1, how='all')` (`ETL Scripts/transform_all_datasets.py:47`)
  * and drop-if-`nunique()==1` (`PBI ...Wrangling.ipynb:534,1498`).
  *
  * Data-dependent schema needs an action before the output plan can be
  * finalized (SURVEY §7.4#3), so this is explicitly two-phase: ONE profiling
  * aggregate pass over every column, then a generated `select` of the
  * survivors. The profile pass is a single job with map-side partial
  * aggregation — never one job per column.
  *
  * Scale note: exact `countDistinct` per column is a wide aggregate; for
  * 100 TB profiling set `exact = false` to use `approx_count_distinct`
  * (HLL, single pass, no per-column shuffle explosion). The pruning
  * decision only needs "is it >= 2 distinct", which HLL answers reliably.
  */
object Profile {

  /** Non-null count + distinct count per column, as a single 1-row frame
    * with columns `nonnull_<c>` / `distinct_<c>`.
    */
  def stats(df: DataFrame, exact: Boolean = true): DataFrame = {
    val aggs = df.columns.toSeq.flatMap { c =>
      val dc = if (exact) countDistinct(col(c))
               else approx_count_distinct(col(c))
      Seq(count(col(c)).as(s"nonnull_$c"), dc.as(s"distinct_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group distribution-shape profile: n, mean, population
    * variance, skewness, excess kurtosis — from the four raw power
    * sums in ONE map-side-combining pass (pandas `describe`+
    * `skew`/`kurt` per segment, the profiling row every feature-drift
    * dashboard wants).
    *
    * Exactness: power sums accumulate in DECIMAL (order-independent —
    * partial aggregation can't change them; both engines cast the
    * same IEEE power doubles to the same grid point), and every
    * downstream statistic is ONE fixed parenthesization over those
    * exact operands — identical IEEE ops, identical bits, no
    * stabilizer (m2^1.5 is written m2·sqrt(m2): sqrt is correctly
    * rounded, pow is not). Values must keep x⁴ within double's exact
    * range for truth-exactness; parity holds regardless.
    */
  def momentsByGroup(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     prodScale: Int = 4): DataFrame = {
    val x = col(valueCol)
    def dec(c: org.apache.spark.sql.Column) =
      sum(c.cast(s"decimal(38,$prodScale)"))
    val m = df.filter(x.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        dec(x).as("__s1"), dec(x * x).as("__s2"),
        dec(x * x * x).as("__s3"), dec(x * x * x * x).as("__s4"))
    val n  = col("n").cast("double")
    val s1 = col("__s1").cast("double"); val s2 = col("__s2").cast("double")
    val s3 = col("__s3").cast("double"); val s4 = col("__s4").cast("double")
    val mean = s1 / n
    val m2 = s2 / n - mean * mean
    val m3 = s3 / n - lit(3.0) * mean * (s2 / n) + lit(2.0) * mean * mean * mean
    val m4 = s4 / n - lit(4.0) * mean * (s3 / n) +
      lit(6.0) * mean * mean * (s2 / n) -
      lit(3.0) * mean * mean * mean * mean
    m.select(keyCols.map(col) ++ Seq(col("n"),
      mean.as("mean"), m2.as("variance"),
      (m3 / (m2 * sqrt(m2))).as("skewness"),
      (m4 / (m2 * m2) - lit(3.0)).as("kurtosis")): _*)
  }

  /** Key-skew diagnostic for choosing a partition/join strategy: the
    * frequency concentration of `keyCols` as a 1-row report —
    * n_keys, total rows, the hottest key's count and share, the
    * Herfindahl concentration index hhi = Σ share_i², and
    * effective_keys = 1/hhi (the "as if uniformly distributed over
    * this many keys" number an AQE/salting decision wants: salt when
    * effective_keys ≪ shuffle partitions).
    *
    * Sort-free on purpose: a Gini coefficient needs a GLOBAL rank over
    * distinct keys (a single-partition window at 100 TB); HHI is two
    * plain aggregates with map-side combine. All outputs are exact
    * integer ratios (Σ c_i² accumulates in DECIMAL(38,0)), so the
    * report is bit-identical across engines.
    */
  def keySkewReport(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
    counts.agg(
        count(lit(1)).as("n_keys"),
        sum(col("__c")).as("total"),
        max(col("__c")).as("max_cnt"),
        sum((col("__c") * col("__c")).cast("decimal(38,0)")).as("__s2"))
      .select(col("n_keys"), col("total"), col("max_cnt"),
        (col("max_cnt").cast("double") / col("total").cast("double"))
          .as("max_share"),
        (col("__s2").cast("double")
          / (col("total").cast("double") * col("total").cast("double")))
          .as("hhi"),
        ((col("total").cast("double") * col("total").cast("double"))
          / col("__s2").cast("double")).as("effective_keys"))
  }

  /** Long-form distinct-cardinality report certifying the HLL scale
    * path against the exact answer: one row per column with the EXACT
    * distinct count (cross-engine checkable) and `sketch_ok` =
    * "approx_count_distinct landed within `tol` of exact".
    *
    * Both families run in ONE aggregate pass (the exact distincts plan
    * through Spark's Expand, the HLL sketches are single-pass
    * mergeable); at 100 TB you run the sketches alone
    * (`stats(df, exact = false)`) — this report is how that
    * substitution is certified at test scale. Both engines' estimates
    * are deterministic for fixed data, so the boolean is a stable,
    * hash-checkable assertion rather than a flaky tolerance.
    */
  def distinctSketchReport(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.02, tol: Double = 0.05): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(countDistinct(col(c)).as(s"__d_$c"),
        approx_count_distinct(col(c), rsd).as(s"__a_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // explode(array(struct(...))) instead of a stack() SQL string: the
    // column names travel as literals/backticked refs, not SQL text, so
    // a name with quotes or dots can't be mangled by the lexer.
    val stacked = one.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(s"`__d_$c`").as("n_distinct"),
          col(s"`__a_$c`").as("__approx"))): _*)).as("r"))
      .select(col("r.col_name").as("col_name"),
        col("r.n_distinct").as("n_distinct"),
        col("r.__approx").as("__approx"))
    stacked.select(col("col_name"), col("n_distinct"),
        (abs(col("__approx") - col("n_distinct"))
          <= col("n_distinct") * lit(tol)).as("sketch_ok"))
      .orderBy(col("col_name"))
  }

  /** P3 + P4: drop columns that are entirely null and/or carry a single
    * distinct value. Returns the pruned frame (original column order kept).
    */
  /** Mergeable DISTINCT-count catalog (the incremental-profile pattern
    * at 100 TB): build one DataSketches HLL sketch per partition key
    * (here a day), PERSIST the binary sketches to `catalogDir`
    * partitioned by day with DYNAMIC partition overwrite — so calling
    * with just a new day's rows rewrites ONLY that day's partition and
    * leaves every prior day's stored sketch untouched (the incremental
    * maintenance path: history is never re-shingled into sketches).
    * The global distinct is answered by UNION-merging the stored
    * sketches. The exact per-day distincts ride along so the catalog's
    * claims stay oracle-checkable.
    *
    * The RETURNED report is the test-scale CERTIFICATION face and
    * recomputes the exact distinct over the frame it is given — call
    * it with the full input (as the registered query does). At 100 TB
    * you maintain the catalog incrementally (new-day frames) and
    * answer distincts from the merged sketches alone, skipping the
    * exact rescan entirely.
    *
    * Returns the merged report: `(n_days, sum_day_distinct,
    * exact_distinct, union_ok)` — sum_day_distinct > exact_distinct is
    * the cross-day overlap the union dedups; union_ok asserts the
    * merged estimate landed within 5% of exact (deterministic for
    * fixed data, so the oracle pins it TRUE — the
    * [[distinctSketchReport]] certification discipline).
    */
  def distinctSketchCatalog(df: DataFrame, dayCol: org.apache.spark.sql.Column,
                            keyCol: String, catalogDir: String): DataFrame = {
    val daily = df
      .groupBy(dayCol.as("day"))
      .agg(hll_sketch_agg(col(keyCol)).as("sk"),
        count_distinct(col(keyCol)).as("exact_day"))
    daily.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(catalogDir)
    // Empty first input → partition-less dir → read.parquet throws.
    // A never-written catalog is a valid state: no days, no distincts,
    // and the 5% bound over 0-vs-0 holds (r14 advice).
    if (!CountMin.catalogHasDays(df, catalogDir))
      return df.sparkSession.range(1).select(
        lit(0L).as("n_days"), lit(0L).as("sum_day_distinct"),
        lit(0L).as("exact_distinct"), lit(true).as("union_ok"))
    val catalog = df.sparkSession.read.parquet(catalogDir)
    val merged = catalog.agg(
      count(lit(1)).as("n_days"),
      sum(col("exact_day")).as("sum_day_distinct"),
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("__est"))
    val exact = df.agg(count_distinct(col(keyCol)).as("exact_distinct"))
    merged.crossJoin(broadcast(exact))
      .select(col("n_days"), col("sum_day_distinct"),
        col("exact_distinct"),
        (abs(col("__est") - col("exact_distinct")).cast("double")
          <= col("exact_distinct").cast("double") * 0.05)
          .as("union_ok"))
  }

  def pruneUninformative(df: DataFrame,
                         dropAllNull: Boolean = true,
                         dropSingleValue: Boolean = true,
                         exact: Boolean = true): DataFrame = {
    val row = stats(df, exact).head()
    val keep = df.columns.filter { c =>
      val nonnull  = row.getAs[Long](s"nonnull_$c")
      val distinct = row.getAs[Long](s"distinct_$c")
      val allNull  = nonnull == 0L
      val single   = distinct <= 1L
      !(dropAllNull && allNull) && !(dropSingleValue && single && !allNull)
    }
    df.select(keep.map(col).toSeq: _*)
  }
}
