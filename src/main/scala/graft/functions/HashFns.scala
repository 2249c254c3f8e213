package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hashing. Spark's `hash()`/`xxhash64()` are
  * Spark-specific (seeded Murmur3/XXH64), so results can't be reproduced
  * by other engines. For oracle-checkable dedup/LSH we derive a 60-bit
  * non-negative long from the md5 hex digest — md5 is identical
  * everywhere (DuckDB: `CAST('0x'||substr(md5(s),1,15) AS BIGINT)`).
  *
  * `conv(hex,16,10)` on 15 hex chars (60 bits) always fits a signed long.
  * This composes inside higher-order-function lambdas (transform/filter),
  * which Scala UDFs cannot, and stays codegen'd.
  */
object HashFns {

  /** Deterministic 60-bit hash of a string column (md5-derived).
    * Backed by the native codegen'd expression
    * [[graft.expressions.Md5Long]] — bit-identical to
    * `conv(substring(md5(c),1,15),16,10)` but with no intermediate
    * hex-string materialization (md5-per-row is the hot path of every
    * MinHash/SimHash/fingerprint query).
    */
  def md5Long(c: Column): Column = graft.expressions.Md5Long(c)

  /** Seeded variant: hash of (salt || value). Seeds give independent
    * hash families for MinHash signatures.
    */
  def md5Long(c: Column, seed: Int): Column =
    md5Long(concat(lit(s"s$seed:"), c))

  /** DuckDB SQL fragment mirroring [[md5Long]] — kept adjacent so the two
    * sides can't drift. `expr` is a SQL expression evaluating to VARCHAR.
    */
  def md5LongSql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  def md5LongSql(expr: String, seed: Int): String =
    md5LongSql(s"'s$seed:' || $expr")

  private val lowMask = (1L << 49) - 1

  /** Cheap hash family derived from ONE base hash by xor-shift mixing:
    * family(h, 0) = h, family(h, i) = (h >> i) xor ((h & (2^49-1)) << i).
    * For K-wide MinHash this replaces K md5 computations per row with
    * one (md5 dominates the signature cost at corpus scale); the family
    * members are pairwise-decorrelated enough for banding, though not
    * truly independent — callers needing cryptographic independence pay
    * for per-seed md5 instead. Always non-negative and < 2^60.
    */
  def hashFamily(h: Column, i: Int): Column =
    if (i == 0) h
    else shiftright(h, i).bitwiseXOR(
      shiftleft(h.bitwiseAND(lit(lowMask)), i))

  /** DuckDB mirror of [[hashFamily]]; `e` must be a simple identifier. */
  def hashFamilySql(e: String, i: Int): String =
    if (i == 0) e else s"xor($e >> $i, ($e & $lowMask) << $i)"
}
