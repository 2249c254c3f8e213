package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Broadcast bloom-filter prefilter — the scale pattern for "big side
  * joins a much smaller key set" (decontamination against an eval set,
  * blocklist lookups, dimension membership).
  *
  * At 100 TB the big side's shuffle dominates such a join even though
  * almost none of it survives. A bloom filter over the SMALL side's
  * keys (a few MB for 10⁷ keys at 1% fpp) rides the task closure to
  * every executor and drops non-members BEFORE the exchange, so the
  * shuffle carries only probable matches; the exact join that follows
  * removes the false positives, leaving results bit-identical
  * (q_text_contamination_bloom shares q_text_contamination's oracle).
  * This is the manual form of Spark's own runtime-filter rewrite
  * (spark.sql.optimizer.runtime.bloomFilter.enabled) for joins the
  * optimizer can't see through — here the join key is a derived n-gram
  * column produced mid-pipeline.
  *
  * Build side uses `DataFrameStatFunctions.bloomFilter` (a distributed
  * treeAggregate; only the fixed-size bit array returns to the driver),
  * probe side reuses Spark's codegen'd `BloomFilterMightContain`
  * expression over the serialized filter, so the hashing on both sides
  * is the same sketch implementation by construction.
  */
object Bloom {

  /** Serialized bloom filter over the LongType column `keyCol`.
    * `expectedItems <= 0` means "count the keys first" — one extra
    * pass over the (small) build side buys a correctly-sized filter.
    */
  def buildLongFilter(keys: DataFrame, keyCol: String,
      expectedItems: Long = -1L, fpp: Double = 0.01): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    // Spark's bloomFilter aggregate yields a NULL bit buffer over an
    // EMPTY build side (surfacing as an NPE — found by the sf10 sweep,
    // where a df<=50 rare-ngram gate empties under the 100-replica
    // tiling). Zero keys is a legitimate filter: nothing is a member,
    // so hand back an explicit empty filter — probes return false
    // everywhere, vacuously preserving no-false-negatives.
    def emptyFilter(): Unit =
      org.apache.spark.util.sketch.BloomFilter.create(64L, fpp)
        .writeTo(bos)
    if (expectedItems > 0) {
      // Explicitly-sized build: ONE job (the sketch treeAggregate
      // itself), no extra count/isEmpty action (r13 advice). The
      // empty case surfaces as the aggregate's null result / NPE —
      // but an NPE alone must NOT become an empty filter (that would
      // silently convert an unrelated Spark bug into false negatives,
      // breaking the no-false-negatives contract), so the emptiness
      // is re-verified positively before the empty filter is handed
      // back; a non-empty build side rethrows loudly. The recheck
      // runs against a CACHED build side (r14 advice): re-evaluating
      // a non-deterministic plan (sampling, first-wins dedup) could
      // report empty for a frame whose aggregate pass saw rows —
      // converting a transient failure into silent false negatives.
      // The aggregate populates the cache; isEmpty then reads the
      // same materialized rows. Nothing lazy escapes this method (the
      // result is a byte array), so the cache is dropped on exit.
      val cached = keys.cache()
      try {
        val f = cached.stat.bloomFilter(keyCol, expectedItems, fpp)
        if (f == null && cached.isEmpty) emptyFilter()
        else if (f == null)
          sys.error("bloomFilter returned null on a NON-empty build side")
        else f.writeTo(bos)
      } catch {
        case e: NullPointerException =>
          if (cached.isEmpty) emptyFilter() else throw e
      } finally cached.unpersist(blocking = false)
    } else {
      // expectedItems <= 0 means "count the keys first" — the count
      // both sizes the filter and detects the empty build side; the
      // cache makes the second pass read the rows the count saw.
      val cached = keys.cache()
      try {
        val cnt = cached.count()
        if (cnt == 0L) emptyFilter()
        else cached.stat.bloomFilter(keyCol, math.max(cnt, 64L), fpp)
          .writeTo(bos)
      } finally cached.unpersist(blocking = false)
    }
    bos.toByteArray
  }

  /** Membership predicate of the LongType column `c` against a filter
    * from [[buildLongFilter]]. False positives at the filter's fpp;
    * NEVER false negatives.
    */
  def mightContain(filterBytes: Array[Byte], c: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(filterBytes, BinaryType), ColumnBridge.expression(c)))
}
