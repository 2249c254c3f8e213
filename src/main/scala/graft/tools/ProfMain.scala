package graft.tools
// Scratch profiling main (not part of the library surface).
object ProfMain {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = graft.Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    import graft.operators.{Dedup, Similarity}
    import graft.sources.Tables
    val docs = Tables.documents(spark, d)
    val uniq = Dedup.exactByContent(docs, "text", "doc_id")
    val sh = Similarity.charShingles(uniq, "doc_id", "text", 5).cache()
    val sig = Similarity.minhashSignature(sh, "doc_id", 8)
    val bands = Similarity.lshBands(sig, "doc_id", 8, 2)
    val cand = Similarity.candidatePairs(bands, "doc_id", maxBucket = 20)
    val pairs = time("pairs (lsh+verify)") {
      Similarity.jaccardForPairs(cand, sh, "doc_id")
        .filter(col("jaccard") >= 0.8)
        .select(col("id_a"), col("id_b")).localCheckpoint(true)
    }
    println("[prof] n_pairs=" + pairs.count())
    val cc = time("components total") {
      graft.operators.Components.connectedComponents(pairs, "id_a", "id_b")
        .orderBy(col("id")).collect()
    }
    println("[prof] n_cc=" + cc.length)
    spark.stop()
  }
}
