package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PrivacySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // (id, segment, bin, nation): class (A,1) has 3 rows, (A,2) has 1,
  // (B,1) has 2; nations make (A,1) homogeneous and (B,1) diverse.
  private val rows = Seq(
    (1L, "A", 1L, 10), (2L, "A", 1L, 10), (3L, "A", 1L, 10),
    (4L, "A", 2L, 20),
    (5L, "B", 1L, 30), (6L, "B", 1L, 40))
  private def df = rows.toDF("id", "seg", "bin", "nat")

  test("kAnonymitySuppress nulls QIs only in small classes") {
    val out = Privacy.kAnonymitySuppress(df, Seq("seg", "bin"), 2L)
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getLong(0),
        Option(r.getAs[String]("seg")), Option(r.getAs[Any]("bin")),
        r.getAs[Long]("k_size"), r.getAs[Boolean]("suppressed")))
    // class (A,2) of size 1 is suppressed; the others survive intact
    assert(out.toSeq == Seq(
      (1L, Some("A"), Some(1L), 3L, false),
      (2L, Some("A"), Some(1L), 3L, false),
      (3L, Some("A"), Some(1L), 3L, false),
      (4L, None, None, 1L, true),
      (5L, Some("B"), Some(1L), 2L, false),
      (6L, Some("B"), Some(1L), 2L, false)))
    // non-QI columns pass through untouched
    val kept = Privacy.kAnonymitySuppress(df, Seq("seg", "bin"), 2L)
      .select("id", "nat").as[(Long, Int)].collect().toSet
    assert(kept == rows.map(t => (t._1, t._4)).toSet)
  }

  test("k=1 suppresses nothing; huge k suppresses everything") {
    val none = Privacy.kAnonymitySuppress(df, Seq("seg"), 1L)
    assert(none.filter(col("suppressed")).count() == 0)
    val all = Privacy.kAnonymitySuppress(df, Seq("seg"), 100L)
    assert(all.filter(!col("suppressed")).count() == 0)
    assert(all.filter(col("seg").isNotNull).count() == 0)
  }

  test("lDiversityReport flags homogeneous classes") {
    val rep = Privacy.lDiversityReport(df, Seq("seg", "bin"), "nat", 2L)
      .orderBy(col("seg"), col("bin"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("k_size"),
        r.getAs[Long]("l_distinct"), r.getAs[Boolean]("diverse")))
    assert(rep.toSeq == Seq(
      ("A", 1L, 3L, 1L, false), // 3 rows, all nation 10 — homogeneous
      ("A", 2L, 1L, 1L, false),
      ("B", 1L, 2L, 2L, true)))
  }

  /** Brute-force TVD: ½ Σ over the full sensitive domain of
    * |class share − global share|.
    */
  private def bruteTvd(cls: Seq[Int], all: Seq[Int]): Double = {
    val n = cls.size.toDouble
    val bigN = all.size.toDouble
    all.distinct.map { v =>
      math.abs(cls.count(_ == v) / n - all.count(_ == v) / bigN)
    }.sum / 2
  }

  test("tClosenessReport matches the brute-force TVD per class") {
    val all = rows.map(_._4)
    val rep = Privacy.tClosenessReport(df, Seq("seg", "bin"), "nat", 0.55)
      .orderBy(col("seg"), col("bin")).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getAs[Long]("k_size"),
        r.getAs[Double]("tvd"), r.getAs[Boolean]("t_close")))
    val classes = rows.groupBy(t => (t._2, t._3))
      .view.mapValues(_.map(_._4)).toMap
    assert(rep.map(_._1).toSeq == classes.keys.toSeq.sorted)
    rep.foreach { case (key, k, tvd, close) =>
      assert(k == classes(key).size)
      assert(math.abs(tvd - bruteTvd(classes(key), all)) < 1e-12,
        s"class $key")
      assert(close == (tvd <= 0.55))
    }
    // hand-checked values: (A,1) pure nation-10 class vs 50% global
    assert(rep.find(_._1 == ("A", 1L)).get._3 == 0.5)
    assert(rep.find(_._1 == ("B", 1L)).get._3 == 2.0 / 3)
  }

  test("tClosenessReport: the whole table as one class has TVD 0") {
    val one = df.withColumn("c", lit("x"))
    val rep = Privacy.tClosenessReport(one, Seq("c"), "nat", 0.2)
      .collect()
    assert(rep.length == 1 && rep.head.getAs[Double]("tvd") == 0.0 &&
      rep.head.getAs[Boolean]("t_close"))
  }

  test("tClosenessReport treats a null sensitive value as a category") {
    val withNull = Seq(
      (1L, "A", 1L, Some(10)), (2L, "A", 1L, None),
      (3L, "B", 1L, Some(10)), (4L, "B", 1L, Some(10)))
      .toDF("id", "seg", "bin", "nat")
    val rep = Privacy.tClosenessReport(withNull, Seq("seg"), "nat", 0.2)
      .orderBy(col("seg")).collect()
      .map(r => (r.getString(0), r.getAs[Double]("tvd")))
    // global: {10: 3/4, null: 1/4}; class A = {10: 1/2, null: 1/2}
    // → TVD = ¼; class B = {10: 1} → TVD = ¼
    assert(rep.toSeq == Seq(("A", 0.25), ("B", 0.25)))
  }

  test("null QI values form their own equivalence class") {
    val withNull = (rows :+ (7L, null.asInstanceOf[String], 1L, 50))
      .toDF("id", "seg", "bin", "nat")
    val out = Privacy.kAnonymitySuppress(withNull, Seq("seg", "bin"), 2L)
    // the lone (null, 1) row is a size-1 class -> suppressed
    assert(out.filter(col("id") === 7L).head().getAs[Boolean]("suppressed"))
  }
}
