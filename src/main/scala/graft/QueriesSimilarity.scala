package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.HashFns
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Deduplication + similarity-search operators over `documents` (text)
  * and `embeddings` (64-dim float vectors): exact content dedup,
  * MinHash signatures, banded-LSH near-dup pairs with exact-Jaccard
  * verification, brute-force cosine top-k, and a sign-bit LSH-bucketed
  * ANN variant (the 100 TB scale path — candidates meet only inside a
  * bucket, the all-pairs join never exists).
  *
  * Oracle parity: hashes are md5-derived (HashFns) so DuckDB reproduces
  * them exactly; dot products accumulate in DOUBLE in index order on
  * both engines (Spark aggregate(zip_with(...)) ≡ DuckDB
  * list_sum(list_transform(list_zip(...)))), giving bit-identical
  * cosines.
  */
object QueriesSimilarity {

  private val K = 8 // minhash signature width
  private val R = 2 // rows per LSH band -> 4 bands

  /** DuckDB mirror of Similarity.charShingles(k=5). */
  private val shinglesSql =
    """SELECT doc_id, substr(text, CAST(i AS INT), 5) AS shingle
      |  FROM documents, unnest(range(1, greatest(length(text)-3, 1))) t(i)""".stripMargin

  private def sigSelectSql: String =
    (0 until K).map(i =>
      s"MIN(${HashFns.md5LongSql("shingle", i)}) AS mh$i").mkString(",\n  ")

  /** DuckDB mirror of the double-accumulated dot product. */
  private def dotSql(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b),
       |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))""".stripMargin
  private def normSql(a: String): String =
    s"sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)})"

  val qs: Seq[Q] = Seq(

    // ------------------------------------------------- exact content dedup
    // The corpus unioned with 50 re-keyed copies; dedup keeps the lowest
    // id per identical text. Shuffle key is the 128-bit digest, never the
    // document body.
    Q("q_sim_exact_dedup",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val dupes = docs.filter(col("doc_id") < 50)
          .withColumn("doc_id", col("doc_id") + 1000)
        Dedup.exactByContent(docs.unionByName(dupes), "text", "doc_id")
          .select(col("doc_id"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text, n_chars FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000, text, n_chars FROM documents
             |  WHERE doc_id < 50),
             |r AS (SELECT *, row_number() OVER (
             |        PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |      FROM all_docs)
             |SELECT doc_id, n_chars FROM r WHERE rn = 1
             |ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------- MinHash signature
    Q("q_sim_minhash_signature",
      (s, d) => {
        val sh = Similarity.charShingles(Tables.documents(s, d),
          "doc_id", "text", 5)
        Similarity.minhashSignature(sh, "doc_id", K).orderBy(col("doc_id"))
      },
      Some(s"""WITH sh AS (
              |$shinglesSql)
              |SELECT doc_id,
              |  $sigSelectSql
              |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ------------------------------------- banded LSH near-dup + verification
    // sig -> 4 bands of 2 -> bucket-join candidates -> exact Jaccard over
    // shingle sets (candidates only) -> pairs with j >= 0.8.
    Q("q_sim_lsh_neardup",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val sh = Similarity.charShingles(docs, "doc_id", "text", 5)
        val sig = Similarity.minhashSignature(sh, "doc_id", K)
        val bands = Similarity.lshBands(sig, "doc_id", K, R)
        val cand = Similarity.candidatePairs(bands, "doc_id")
        Similarity.jaccardForPairs(cand, sh, "doc_id")
          .filter(col("jaccard") >= 0.8)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""WITH sh AS (
              |$shinglesSql),
              |sig AS (
              |  SELECT doc_id,
              |  $sigSelectSql
              |  FROM sh GROUP BY doc_id),
              |cand AS (
              |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
              |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
              |    (a.mh0 = b.mh0 AND a.mh1 = b.mh1) OR
              |    (a.mh2 = b.mh2 AND a.mh3 = b.mh3) OR
              |    (a.mh4 = b.mh4 AND a.mh5 = b.mh5) OR
              |    (a.mh6 = b.mh6 AND a.mh7 = b.mh7))),
              |shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
              |sz AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
              |inter AS (
              |  SELECT c.id_a, c.id_b, count(*) AS n_inter
              |  FROM cand c
              |  JOIN shd a ON a.doc_id = c.id_a
              |  JOIN shd b ON b.doc_id = c.id_b AND b.shingle = a.shingle
              |  GROUP BY c.id_a, c.id_b)
              |SELECT id_a, id_b,
              |  n_inter / (sa.n + sb.n - n_inter) AS jaccard
              |FROM inter
              |JOIN sz sa ON sa.doc_id = id_a
              |JOIN sz sb ON sb.doc_id = id_b
              |WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.8
              |ORDER BY id_a, id_b""".stripMargin)),

    // -------------------------------------------- brute-force cosine top-k
    // The correctness baseline for ANN: 10 query vectors scored against
    // the full corpus. At scale the candidate side is bucketed (next
    // query); this one stays the oracle for recall measurement.
    Q("q_sim_cosine_topk",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val c = e.select(col("vec_id").as("nid"), col("embedding").as("ce"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("cos_sim").desc, col("nid"))
        q.crossJoin(c).filter(col("qid") =!= col("nid"))
          .select(col("qid"), col("nid"),
            Similarity.cosine(col("qe"), col("ce")).as("cos_sim"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("qid"), col("rk"), col("nid"), col("cos_sim"))
          .orderBy(col("qid"), col("rk"))
      },
      Some(s"""WITH q AS (
              |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
              |  WHERE vec_id < 10),
              |s AS (
              |  SELECT qid, e.vec_id AS nid,
              |    ${cosSql("qe", "e.embedding")} AS cos_sim
              |  FROM q, embeddings e WHERE e.vec_id <> qid),
              |r AS (SELECT *, row_number() OVER (
              |        PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rk
              |      FROM s)
              |SELECT qid, rk, nid, cos_sim FROM r WHERE rk <= 5
              |ORDER BY qid, rk""".stripMargin)),

    // --------------------------------------------- sign-bit LSH ANN top-k
    // Scale path: candidates restricted to the query's sign-bit bucket
    // (8 bits over the first dimensions — a random-projection LSH family
    // for cosine). The bucket join replaces the cross join; at 100 TB
    // use more bits + multi-probe for recall.
    Q("q_sim_ann_signbit",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .withColumn("bucket", Similarity.signBitBucket(col("embedding"), 8))
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
                  col("bucket"))
        val c = e.select(col("vec_id").as("nid"), col("embedding").as("ce"),
                         col("bucket"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("cos_sim").desc, col("nid"))
        q.join(c, Seq("bucket")).filter(col("qid") =!= col("nid"))
          .select(col("qid"), col("bucket"), col("nid"),
            Similarity.cosine(col("qe"), col("ce")).as("cos_sim"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("qid"), col("bucket"), col("rk"), col("nid"))
          .orderBy(col("qid"), col("rk"))
      },
      Some {
        val bucketSql = (0 until 8).map(i =>
          s"CASE WHEN embedding[${i + 1}] >= 0 THEN ${1L << i} ELSE 0 END")
          .mkString("CAST(", " + ", " AS BIGINT)")
        s"""WITH b AS (
           |  SELECT vec_id, embedding, $bucketSql AS bucket
           |  FROM embeddings),
           |q AS (SELECT vec_id AS qid, embedding AS qe, bucket FROM b
           |      WHERE vec_id < 10),
           |s AS (
           |  SELECT qid, q.bucket, c.vec_id AS nid,
           |    ${cosSql("qe", "c.embedding")} AS cos_sim
           |  FROM q JOIN b c ON q.bucket = c.bucket AND c.vec_id <> qid),
           |r AS (SELECT *, row_number() OVER (
           |        PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rk
           |      FROM s)
           |SELECT qid, bucket, rk, nid FROM r WHERE rk <= 3
           |ORDER BY qid, rk""".stripMargin
      }),

    // --------------------------------------------- embedding near-dup pairs
    // Cosine near-duplicate pairs (keep-lowest-id dedup decision comes
    // from these). Brute force at test scale; the signbit-bucketed join
    // above is the same computation's scale path.
    Q("q_sim_embedding_neardup",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val a = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
        val b = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
        a.crossJoin(b).filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            Similarity.cosine(col("ea"), col("eb")).as("cos_sim"))
          .filter(col("cos_sim") >= 0.45)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              |  ${cosSql("a.embedding", "b.embedding")} AS cos_sim
              |FROM embeddings a, embeddings b
              |WHERE a.vec_id < b.vec_id
              |  AND ${cosSql("a.embedding", "b.embedding")} >= 0.45
              |ORDER BY id_a, id_b""".stripMargin))
  )
}
