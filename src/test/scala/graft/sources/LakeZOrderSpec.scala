package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class LakeZOrderSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("zValue interleaves bits: known codes, monotone blocks") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L),
      (65535L, 65535L))
      .toDF("x", "y")
      .select(Lake.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // z(x,y) = interleave with x on even bits, y on odd:
    // (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3; (2,3)= x bits 10 -> 100,
    // y bits 11 -> 1010 -> 1110 = 14; full-mask -> 2^32-1
    assert(got == Seq(0L, 1L, 2L, 3L, 14L, 4294967295L))
  }

  test("writeZOrdered files cover disjoint z-ranges and bounded rectangles") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // a 64x64 grid of points — every (x, y) combination once
    val pts = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    Lake.writeZOrdered(pts, "x", "y", s"$dir/pts", nFiles = 8)
    val files = new java.io.File(s"$dir/pts").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length > 1)
    val perFile = files.map { f =>
      val d = spark.read.parquet(f)
        .select(Lake.zValue(col("x"), col("y")).as("z"),
          col("x"), col("y"))
      val r = d.agg(min("z"), max("z"), min("x"), max("x"),
        min("y"), max("y"), count(lit(1))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
    }.filter(_._7 > 0).sortBy(_._1)
    // z-ranges are disjoint: each file's min z exceeds the previous max
    perFile.sliding(2).foreach {
      case Array(a, b) => assert(a._2 < b._1,
        s"overlapping z-ranges: $a vs $b")
      case _ =>
    }
    // bounded rectangles: every non-boundary file spans far less than
    // the global 0..63 extent on BOTH dims (z-locality), where a
    // row-major sort would span the full 0..63 on y in every file
    val spans = perFile.map(f => (f._4 - f._3) * (f._6 - f._5))
    assert(spans.count(_ <= 32L * 32L) >= perFile.length / 2,
      s"z files not rectangle-local: ${spans.mkString(",")}")
  }
}
