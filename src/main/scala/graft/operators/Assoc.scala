package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining: co-occurrence pairs with support
  * and lift (Agrawal & Srikant's a-priori pruning, re-derived for the
  * pair case). The recommendation/feature-engineering primitive over
  * any (basket, item) relation — orders×parts, sessions×pages,
  * documents×entities.
  *
  * Scale shape: the dangerous step is per-basket pair generation
  * (quadratic in basket size). Two structural guards: (1) a-priori —
  * pair support <= item support, so items below `minSupport` are
  * dropped BEFORE pairing (one aggregate + one semi-join-shaped hash
  * join, typically removing the long tail); (2) the pair self-join is
  * an equi-join on the basket id, so AQE's skew split applies to a
  * pathological mega-basket, and the pair aggregate map-side combines.
  * Lift is an exact integer ratio — bit-identical across engines.
  */
object Assoc {

  /** Frequent item pairs over a (`basketCol`, `itemCol`) frame.
    * Output: (item_a, item_b, support, lift) with item_a < item_b,
    * support >= `minSupport`, lift = support·n_baskets/(c_a·c_b).
    */
  def copurchasePairs(df: DataFrame, basketCol: String, itemCol: String,
                      minSupport: Long): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    val b = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val itemCnt = b.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    val totals = b.agg(count_distinct(col("__b")).as("__nb"))
    val frequent = b.join(
      itemCnt.filter(col("__c") >= minSupport).select(col("__i")), Seq("__i"))
    val pairs = frequent.select(col("__b"), col("__i").as("item_a"))
      .join(frequent.select(col("__b"), col("__i").as("item_b")), Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    pairs
      .join(itemCnt.select(col("__i").as("item_a"), col("__c").as("__ca")),
        Seq("item_a"))
      .join(itemCnt.select(col("__i").as("item_b"), col("__c").as("__cb")),
        Seq("item_b"))
      .crossJoin(broadcast(totals))
      .select(col("item_a"), col("item_b"), col("support"),
        ((col("support").cast("double") * col("__nb").cast("double"))
          / (col("__ca").cast("double") * col("__cb").cast("double")))
          .as("lift"))
  }
}
