package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def run(xs: Seq[String], k: Int, parts: Int = 4) =
    HeavyHitters.exact(
      xs.toDF("key").repartition(parts), "key", k)
      .orderBy(desc("exact_n"), col("key"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq

  private def brute(xs: Seq[String], k: Int) = {
    val n = xs.size.toLong
    xs.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (k + 1) > n }
      .toSeq.map { case (x, c) => (x, c, n) }
      .sortBy { case (x, c, _) => (-c, x) }
  }

  test("hot keys over a long uniform tail: exact counts, nothing missed") {
    // 3 hot keys x 60 + 200 tail keys x 1: n = 380, k = 9 -> threshold
    // 38; only the hot keys qualify. distinct (203) >> k, so the
    // Misra-Gries phase genuinely evicts and decrements.
    val xs = Seq("a", "b", "c").flatMap(x => Seq.fill(60)(x)) ++
      (0 until 200).map(i => s"t$i")
    assert(run(xs, k = 9) == brute(xs, 9))
    assert(run(xs, k = 9).map(_._1) == Seq("a", "b", "c"))
  }

  test("adversarial near-uniform stream at the threshold boundary") {
    // 50 keys with counts straddling n/(k+1): the worst regime for the
    // sketch phase (constant decrement churn) — the exact verify phase
    // must still return precisely the strict-majority set.
    val xs = (0 until 50).flatMap(i => Seq.fill(10 + (i % 3))(f"k$i%02d"))
    val k = 49
    assert(run(xs, k) == brute(xs, k))
    assert(run(xs, k).nonEmpty && run(xs, k).size < 50)
  }

  test("partitioning does not change the answer") {
    val xs = Seq.fill(40)("hot") ++ (0 until 100).map(i => s"t$i")
    val one = run(xs, k = 6, parts = 1)
    assert(one == brute(xs, 6))
    assert(run(xs, k = 6, parts = 7) == one)
    assert(run(xs, k = 6, parts = 32) == one)
  }

  test("no heavy hitters and empty input both return zero rows") {
    assert(run(Seq("a", "b", "c", "d"), k = 1).isEmpty) // all f = 1 <= n/2
    val empty = HeavyHitters.exact(
      Seq.empty[String].toDF("key"), "key", 5)
    assert(empty.columns.toSeq == Seq("key", "exact_n", "total_n"))
    assert(empty.count() == 0)
  }

  test("weighted detection: exact weights, any partitioning, zero weights ok") {
    // 2 heavy keys by WEIGHT (not by row count: each has few rows of
    // large weight) over a 100-key tail of small weights; k chosen so
    // the sketch phase must evict. Zero-weight rows change nothing.
    val rows = Seq(("big1", 500L), ("big1", 400L), ("big2", 700L)) ++
      (0 until 100).flatMap(i => Seq((s"t$i", 30L), (s"t$i", 0L)))
    val w = rows.map(_._2).sum // 4600
    val k = 7                  // threshold: > 575
    val brute = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).sum)
      .filter { case (_, c) => c * (k + 1) > w }
      .toSeq.map { case (x, c) => (x, c, w) }
      .sortBy { case (x, c, _) => (-c, x) }
    assert(brute.map(_._1) == Seq("big1", "big2")) // fixture intent
    for (parts <- Seq(1, 5, 32)) {
      val got = HeavyHitters.exactWeighted(
        rows.toDF("key", "wt").repartition(parts), "key", "wt", k)
        .orderBy(desc("exact_w"), col("key"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(got == brute, s"parts=$parts")
    }
    // empty input keeps the schema and returns no rows
    val empty = HeavyHitters.exactWeighted(
      Seq.empty[(String, Long)].toDF("key", "wt"), "key", "wt", 3)
    assert(empty.columns.toSeq == Seq("key", "exact_w", "total_w"))
    assert(empty.count() == 0)
  }

  test("stored summaries merge without losing any strict-threshold key") {
    // The storable face: per-shard summaries written as (key, c) rows,
    // merged by the m-way rule. Any key with TOTAL count > n/(k+1)
    // must survive the merge, for any sharding; output stays <= k rows.
    val xs = Seq.fill(50)("hot1") ++ Seq.fill(45)("hot2") ++
      (0 until 150).map(i => s"t${i % 60}")
    val k = 7
    for (shards <- Seq(1, 2, 5)) {
      val parts = xs.grouped(math.ceil(xs.size / shards.toDouble).toInt).toSeq
      val stored = parts.map(p =>
        HeavyHitters.summary(p.toDF("key"), "key", k))
        .reduce(_ unionAll _)
      val merged = HeavyHitters.mergeSummaryRows(stored, k)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(merged.length <= k, s"shards=$shards: ${merged.length} > k")
      val n = xs.size.toLong
      val must = xs.groupBy(identity).collect {
        case (x, o) if o.size.toLong * (k + 1) > n => x
      }.toSet
      assert(must.nonEmpty && must.subsetOf(merged.map(_._1).toSet),
        s"shards=$shards: merged summary lost a strict-threshold key")
    }
  }

  test("nulls are excluded from candidates and the count base") {
    val df = (Seq.fill(5)(Some("x")) ++ Seq.fill(4)(Option.empty[String]) ++
      Seq(Some("y"))).toDF("key")
    // n = 6 non-null; threshold with k=2 is f > 2 -> only x (5)
    val got = HeavyHitters.exact(df, "key", 2).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("x", 5L, 6L)))
  }

  test("weighted detection rejects negative weights loudly") {
    // r14 advice: a negative weight breaks the Misra-Gries superset
    // guarantee silently (a true heavy hitter can be evicted with no
    // error anywhere downstream), so the aggregator must fail at the
    // offending row instead of producing wrong output.
    val bad = Seq(("a", 10L), ("b", -1L), ("a", 5L)).toDF("key", "wt")
    val ex = intercept[org.apache.spark.SparkException] {
      HeavyHitters.exactWeighted(bad, "key", "wt", 3).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("negative weight")),
      s"wrong failure: ${msgs(ex).mkString(" | ")}")
  }
}
