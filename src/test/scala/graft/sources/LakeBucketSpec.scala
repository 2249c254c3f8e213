package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class LakeBucketSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("co-bucketed tables join without any shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    Lake.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_orderkey", 8)
    Lake.writeBucketed(
      Tables.lineitem(spark, sf)
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 8)

    // disable auto-broadcast so the join strategy at this toy scale is
    // the same sort-merge it would be fact-vs-fact at 100 TB; the claim
    // under test is NO SHUFFLE, which bucketing provides
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), Seq("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") &&
        !plan.contains("Exchange hashpartitioning"),
        s"bucketed join/agg must be shuffle-free:\n$plan")

      // sanity: same result as the un-bucketed join
      val direct = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      assert(joined.orderBy("o_orderkey").collect().toSeq ==
        direct.orderBy("o_orderkey").collect().toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      prevThreshold)
  }

  test("co-bucketed BM25 postings ⋈ dfreq joins without shuffling the index") {
    // The claim q_text_bm25_lake's layout makes at 100 TB: the two
    // index tables are co-bucketed on `term`, so a term-keyed
    // postings ⋈ dfreq join (the serve-time composition, and any
    // index-maintenance join) runs as a bucket-local sort-merge with
    // ZERO exchanges — broadcast disabled so toy scale can't cheat.
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.explode
    val toks = Tables.documents(spark, sf).select(col("doc_id"),
      explode(graft.functions.TextFns.tokens(col("text"))).as("term"))
    val (postings, dfreq, _) =
      graft.operators.Bm25.buildIndex(toks.filter(col("doc_id") >= 5))
    Lake.writeBucketed(postings, "bspec_postings", "term", 8)
    Lake.writeBucketed(dfreq, "bspec_dfreq", "term", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bspec_postings")
        .join(spark.table("bspec_dfreq"), Seq("term"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") &&
        !plan.contains("Exchange hashpartitioning"),
        s"co-bucketed index join must be shuffle-free:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
