package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted aggregation for skewed group keys.
  *
  * A groupBy on a low-cardinality or skewed key (3 return flags over
  * 100 TB of lineitem; one bot user among millions) funnels each hot
  * key through ONE reducer task. Salting splits every key into
  * `buckets` sub-keys for a fully parallel partial aggregate, then
  * reduces the (keys × buckets) partials — tiny — to the final result.
  * Cost: one extra (small) shuffle stage; benefit: no reducer ever sees
  * more than 1/buckets of a hot key.
  *
  * Only algebraic aggregates (sum/count/min/max and compositions like
  * mean = sum/count) can be salted this way; holistic aggregates
  * (median, exact distinct) need different machinery. AQE's skew-join
  * handling covers the JOIN side of the same problem; this covers the
  * aggregation side, and unlike AQE it also helps when a single key is
  * hot enough that even a split shuffle partition stays hot.
  */
object Salt {

  /** Deterministic salt in [0, buckets) from an arbitrary column (use a
    * high-cardinality input column, not rand() — reruns and oracle
    * replays must agree).
    */
  def saltFrom(c: Column, buckets: Int): Column = pmod(c, lit(buckets))

  final case class SaltedAgg(partial: Column => Column,
                             merge: Column => Column)

  /** sum: partial-sum per salt, sum the partials. */
  val sum2: SaltedAgg = SaltedAgg(sum, sum)
  /** count: partial count, sum the partials. */
  val count2: SaltedAgg = SaltedAgg(c => count(c), sum)
  val min2: SaltedAgg = SaltedAgg(min, min)
  val max2: SaltedAgg = SaltedAgg(max, max)

  /** Salted equi-join for a skewed BIG side: every big-side row gets a
    * deterministic salt in [0, buckets); the SMALL side is exploded
    * `buckets` times (one copy per salt value) and the join runs on
    * (key, salt) — a hot join key's rows now spread over `buckets`
    * reducer tasks instead of funneling through one. Result set is
    * row-for-row the plain join (each big row matches exactly its own
    * salt's copy). Replication cost is |small| × buckets — use for
    * big-skewed × small joins; for big × big skew, AQE's skew-join
    * split is the tool. `salt` must be DETERMINISTIC (derive from a
    * high-cardinality column via [[saltFrom]], never rand(): reruns,
    * retried tasks, and oracle replays must agree).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Column, buckets: Int): DataFrame = {
    // fresh against BOTH frames: withColumn on the small side would
    // silently overwrite (then drop) a same-named small column
    val sn = Dedup.freshName(big.columns.toSet ++ small.columns, "__jsalt")
    // null-safe: a NULL salt (null input to the salt expression) must
    // not silently drop the row from an inner equi-join — route it to
    // bucket 0, preserving the row-for-row plain-join guarantee
    val saltedBig = big.withColumn(sn, coalesce(salt.cast("long"), lit(0L)))
    val replicated = small
      .withColumn(sn, explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedBig.join(replicated, Seq(key, sn)).drop(sn)
  }

  /** Salted groupBy: `aggs` maps output-column name -> (input column,
    * two-phase aggregate).
    */
  def aggregate(df: DataFrame, keys: Seq[Column], salt: Column,
                aggs: Seq[(String, (Column, SaltedAgg))]): DataFrame = {
    val sn = Dedup.freshName(df, "__salt")
    val partials = df.withColumn(sn, salt)
      .groupBy(keys :+ col(sn): _*)
      .agg(aggs.head._2._2.partial(aggs.head._2._1).as(aggs.head._1),
        aggs.tail.map { case (n, (c, a)) => a.partial(c).as(n) }: _*)
    partials.groupBy(keys: _*)
      .agg(aggs.head._2._2.merge(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, (_, a)) => a.merge(col(n)).as(n) }: _*)
  }
}
