package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Bins (F18/F19), UnitFns (F15–F17/F20), Headers (F1), HashFns, TextFns. */
class ScalarFnsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("native md5_long equals the composed conv/substring/md5 form") {
    val inputs = Seq("", "a", "hello world", "s3:многоязычный",
      "emoji 😀 tail", "x" * 10000)
    val df = inputs.toDF("s")
    val rows = df.select(
        HashFns.md5Long(col("s")).as("native"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")
          .as("composed"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(rows.map(_.getLong(0)).forall(_ >= 0L)) // 60-bit, non-negative
    // null propagates
    assert(Seq[Option[String]](None).toDF("s")
      .select(HashFns.md5Long(col("s"))).head().isNullAt(0))
    // SQL registration
    assert(spark.sql("SELECT md5_long('abc')").head().getLong(0) ==
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest("abc".getBytes("UTF-8"))
          .take(8).map(b => f"${b & 0xff}%02x").mkString.substring(0, 15), 16))
    // codegen participation (same check as py_round: a range-backed
    // projection keeps the expression inside a whole-stage-codegen span)
    val frame = spark.range(3)
      .select(HashFns.md5Long(col("id").cast("string")).as("h"))
    frame.collect()
    val plan = frame.queryExecution.executedPlan.toString
    assert(plan.contains("*(") && plan.contains("md5_long"))
  }

  test("F18/F19 bin edges are left-closed [lo, hi)") {
    val df = Seq(-0.1, 0.0, 2.999, 3.0, 9.99, 10.0, 13.0, 1e9).toDF("v")
      .select(col("v"),
        Bins.binLabel(col("v"), Bins.distanceBins).as("label"),
        Bins.binId(col("v"), Bins.distanceBins).as("id"))
    val rows = df.collect().map(r => (r.get(1), r.get(2))).toSeq
    assert(rows == Seq(
      (null, null), ("0-3km", 1), ("0-3km", 1), ("3-5km", 2),
      ("7-10km", 4), ("10-13km", 5), ("13km+", 6), ("13km+", 6)))
  }

  test("F16 stripThousands and F17 sentinelToDefault") {
    val df = Seq("3,000", "--", "1,234,567", "42").toDF("v")
      .select(UnitFns.sentinelToDefault(col("v")).as("r"))
    assert(df.collect().map(_.getDouble(0)).toSeq ==
      Seq(3000.0, 0.0, 1234567.0, 42.0))
  }

  test("F15 conversions") {
    val r = Seq(802500.0).toDF("v").select(
      UnitFns.cmToKm(col("v")).as("km"),
      UnitFns.msToSeconds(col("v")).as("s"),
      UnitFns.secondsToHours(col("v")).as("h")).head()
    assert(r.getDouble(0) == 8.025)
    assert(r.getDouble(1) == 802.5)
    assert(r.getDouble(2) == 222.9) // round(802500/3600, 1)
  }

  test("F1 header normalization strips specials, keeps underscores") {
    assert(Headers.normalizeName("Total Price($)") == "Total_Price")
    assert(Headers.normalizeName("Order Key") == "Order_Key")
    assert(Headers.normalizeName("already_ok_9") == "already_ok_9")
    val df = Seq((1, 2)).toDF("A b!", "c#d")
    assert(Headers.normalize(df).columns.toSeq == Seq("A_b", "cd"))
  }

  test("HashFns.md5Long matches a JVM-side md5 computation") {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("abc".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = java.lang.Long.parseLong(hex.take(15), 16)
    val got = Seq("abc").toDF("v")
      .select(HashFns.md5Long(col("v")).as("h")).head().getLong(0)
    assert(got == expected)
    // seeded family differs from unseeded and from other seeds
    val s = Seq("abc").toDF("v").select(
      HashFns.md5Long(col("v"), 0).as("h0"),
      HashFns.md5Long(col("v"), 1).as("h1")).head()
    assert(Set(expected, s.getLong(0), s.getLong(1)).size == 3)
  }

  test("native dot_f equals the composed zip_with form, all type mixes") {
    val a = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.5, -6.25)))
      .toDF("f", "d")
    def composed(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val r = a.select(
      graft.expressions.DotF(col("f"), col("f")).as("ff"),
      graft.expressions.DotF(col("f"), col("d")).as("fd"),
      graft.expressions.DotF(col("d"), col("d")).as("dd"),
      composed(col("f"), col("f")).as("cff"),
      composed(col("f"), col("d")).as("cfd"),
      composed(col("d"), col("d")).as("cdd")).head()
    assert(r.getDouble(0) == r.getDouble(3))
    assert(r.getDouble(1) == r.getDouble(4))
    assert(r.getDouble(2) == r.getDouble(5))
    // zip_with contract: length mismatch and null element -> null
    val m = Seq((Array(1.0f, 2.0f), Array(1.0f), Array(Some(1.0f), None)))
      .toDF("x", "y", "z")
    val rm = m.select(
      graft.expressions.DotF(col("x"), col("y")).as("mismatch"),
      graft.expressions.DotF(col("z"), col("z")).as("nullelem")).head()
    assert(rm.isNullAt(0) && rm.isNullAt(1))
    // empty arrays -> 0.0 (the aggregate identity)
    val e = Seq((Array.empty[Float], Array.empty[Float])).toDF("x", "y")
    assert(e.select(graft.expressions.DotF(col("x"), col("y")))
      .head().getDouble(0) == 0.0)
    // codegen participation
    val frame = spark.range(3)
      .select(array(col("id").cast("float")).as("v"))
      .select(graft.expressions.DotF(col("v"), col("v")).as("d"))
    frame.collect()
    val plan = frame.queryExecution.executedPlan.toString
    assert(plan.contains("*(") && plan.contains("dot_f"))
  }

  test("native dot_i8 equals the composed long zip_with form") {
    // Array[Byte] encodes as BINARY; build true array<tinyint> columns
    // the way the quantizer does (transform + cast)
    val df = spark.range(1).selectExpr(
      "array(cast(127 as tinyint), cast(-128 as tinyint), cast(5 as tinyint)) as a",
      "array(cast(127 as tinyint), cast(127 as tinyint), cast(-3 as tinyint)) as b")
    val r = df.select(
      graft.expressions.DotI8(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"),
          (x, y) => x.cast("long") * y.cast("long")),
        lit(0L), (acc, v) => acc + v).as("composed")).head()
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) == 127L * 127 - 128L * 127 - 15L)
    val m = spark.range(1).selectExpr(
      "array(cast(1 as tinyint)) as a",
      "array(cast(1 as tinyint), cast(2 as tinyint)) as b")
    assert(m.select(graft.expressions.DotI8(col("a"), col("b")))
      .head().isNullAt(0))
  }

  test("dot_i8 / dot_f reject wrong element types at ANALYSIS") {
    // array<int> through dot_i8 used to be rejected only on the
    // interpreted path; a codegen'd plan would read int words through
    // getByte and return garbage. checkInputDataTypes fails the query
    // before either path runs.
    val ints = spark.range(1).selectExpr(
      "array(1, 2) as a", "array(3, 4) as b")
    val exI8 = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(graft.expressions.DotI8(col("a"), col("b"))).collect()
    }
    assert(exI8.getMessage.contains("dot_i8"))
    val exF = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(graft.expressions.DotF(col("a"), col("b"))).collect()
    }
    assert(exF.getMessage.contains("dot_f"))
  }

  test("TextFns.normalize canonicalizes case, punctuation, whitespace") {
    val r = Seq("  The  QUICK, brown-fox! ").toDF("v")
      .select(TextFns.normalize(col("v")).as("r")).head().getString(0)
    assert(r == "the quick brownfox")
  }

  test("TextFns word/punct counts and stopword membership") {
    val r = Seq("The cat and the hat!").toDF("v").select(
      TextFns.wordCount(col("v")).as("w"),
      TextFns.punctCount(col("v")).as("p"),
      TextFns.countIn(TextFns.tokens(col("v")), TextFns.enStopwords).as("sw"))
      .head()
    assert(r.getLong(0) == 5L)
    assert(r.getLong(1) == 1L) // the '!'
    assert(r.getLong(2) == 3L) // the, and, the
  }

  test("TextFns.fingerprint is invariant to formatting noise") {
    val df = Seq("Hello,   World!", "hello world").toDF("v")
      .select(TextFns.fingerprint(col("v")).as("f"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
  }
}
