package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class FusionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("RRF matches the hand formula and rewards cross-ranker agreement") {
    // ranker A: d1, d2, d3 ; ranker B: d3, d1, d4.
    // d1: 1/61 + 1/62, d3: 1/63 + 1/61, d2: 1/62, d4: 1/63.
    // agreement (d1, d3) beats single-ranker hits; d1 > d3.
    val a = Seq((9L, 1L, 1), (9L, 2L, 2), (9L, 3L, 3)).toDF("qid", "doc_id", "rk")
    val b = Seq((9L, 3L, 1), (9L, 1L, 2), (9L, 4L, 3)).toDF("qid", "doc_id", "rk")
    val got = Fusion.rrf(Seq(a, b), k0 = 60, topK = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._2).toSeq == Seq(1L, 3L, 2L, 4L))
    assert(math.abs(got(0)._3 - (1.0 / 61 + 1.0 / 62)) < 1e-15)
    assert(math.abs(got(1)._3 - (1.0 / 63 + 1.0 / 61)) < 1e-15)
    // d2 (rank 2 in A) outranks d4 (rank 3 in B) on part value,
    // and the doc_id tie-break never fires since parts differ
    assert(math.abs(got(2)._3 - 1.0 / 62) < 1e-15)
  }

  test("a doc ranked by only one ranker can still win if ranked first") {
    val a = Seq((1L, 10L, 1)).toDF("qid", "doc_id", "rk")
    val b = Seq((1L, 11L, 1), (1L, 10L, 2)).toDF("qid", "doc_id", "rk")
    val got = Fusion.rrf(Seq(a, b), 60, 2)
      .collect().map(_.getLong(2)).toSeq
    assert(got == Seq(10L, 11L)) // 1/61+1/62 > 1/61
  }

  test("ANN semantic arm recall@20: radius-2 probing holds the floor " +
      "and dominates radius-1") {
    // Pins the recall claim in q_text_rrf_fusion_ann's comment: the
    // multi-probe sign-bit candidate pool, exact-cosine re-ranked to
    // top-20, must recover most of the EXACT ranker's top-20. Measured
    // on the sf0.001 embeddings (500 vecs, 4 adaptive bits): deeper
    // probing strictly widens the pool, so recall(r2) >= recall(r1),
    // and the r2 floor is pinned below the measured value. If the
    // bucketing or probe enumeration regresses, this fails before the
    // hash-oracle does.
    import org.apache.spark.sql.functions._
    import graft.sources.Tables
    val sf = "/root/testdata/sf0.001"
    val base = Tables.embeddings(spark, sf)
    val bits = Similarity.adaptiveSignBits(base.count())
    val e = base
      .withColumn("bucket", Similarity.signBitBucket(col("embedding"), bits))
      .withColumn("nrm", Similarity.norm(col("embedding")))
      .cache()
    val corpus = e.filter(col("vec_id") >= 5)
      .select(col("bucket"), col("vec_id").as("doc_id"),
        col("embedding").as("ce"), col("nrm").as("cn"))
    def rank20(cand: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      graft.operators.Windows
        .topKPerGroupRanked(
          cand.select(col("qid"), col("doc_id"),
            (Similarity.dot(col("qe"), col("ce"))
              / (col("qn") * col("cn"))).as("cos")),
          Seq(col("qid")), Seq(col("cos").desc, col("doc_id")), 20, "rk")
        .select("qid", "doc_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet }
    val qBase = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("bucket"))
    val exact = rank20(qBase.drop("bucket").crossJoin(corpus.drop("bucket")))
    def annRecall(probe: org.apache.spark.sql.Column): Double = {
      val pool = rank20(
        qBase.select(col("qid"), col("qe"), col("qn"),
            explode(probe).as("bucket"))
          .join(corpus, Seq("bucket")))
      exact.map { case (q, ex) =>
        pool.getOrElse(q, Set.empty[Long]).intersect(ex).size / 20.0
      }.sum / exact.size
    }
    val r1 = annRecall(Similarity.multiProbeBuckets(col("bucket"), bits))
    val r2 = annRecall(Similarity.multiProbeBuckets2(col("bucket"), bits))
    e.unpersist()
    info(f"recall@20 radius-1=$r1%.3f radius-2=$r2%.3f (bits=$bits)")
    assert(r2 >= r1, s"radius-2 recall $r2 below radius-1 $r1")
    assert(r2 >= 0.5, s"ANN arm recall@20 fell to $r2 (floor 0.5)")
  }
}
