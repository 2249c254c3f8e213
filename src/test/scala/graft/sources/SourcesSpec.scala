package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sinks.Jdbc

class SourcesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val fx = sys.env.getOrElse("GRAFT_FIXTURES_DIR",
    "/root/repo/src/test/resources/fixtures")

  test("S1/S2 glob scan unifies drifting JSON schemas (missing -> null)") {
    val df = JsonSources.scanJsonArrays(spark, s"$fx/json_plain/*.json",
      JsonSources.activitySchema)
    assert(df.count() == 6)
    // file 2 records lack calories -> null, never dropped
    assert(df.filter(col("calories").isNull).count() == 2)
    assert(df.schema("activityType").dataType.isInstanceOf[StructType])
  }

  test("S3 envelope explode yields one row per inner activity") {
    val df = JsonSources.scanEnvelope(spark,
      s"$fx/json_envelope/summarizedActivities.json")
    assert(df.count() == 5)
    assert(df.columns.contains("activityId"))
    assert(df.filter(col("activityType.typeKey") === "running").count() == 3)
  }

  test("S4 CSV scan keeps sentinels and thousands-commas as strings") {
    val schema = StructType(Seq("Date", "Name", "Distance", "Total Ascent",
      "Max Elevation", "Steps", "Calories").map(StructField(_, StringType)))
    val df = CsvSources.scan(spark, s"$fx/csv/running.csv", schema)
    assert(df.filter(col("Total Ascent") === "--").count() == 2)
    assert(df.filter(col("Steps") === "9,876").count() == 1) // quoted comma
  }

  test("S5 CSV sink round-trips") {
    val dir = Files.createTempDirectory("graft_s5").toString
    val in = JsonSources.scanEnvelope(spark,
        s"$fx/json_envelope/summarizedActivities.json")
      .select(col("activityId"), col("activityName"))
    CsvSources.write(in, dir)
    val back = CsvSources.scan(spark, dir, StructType(Seq(
      StructField("activityId", LongType),
      StructField("activityName", StringType))))
    assert(back.orderBy("activityId").collect().toSeq ==
           in.orderBy("activityId").collect().toSeq)
  }

  test("S9 GPX scan parses trkpt attributes and children across files") {
    val df = Gpx.scanPoints(spark, s"$fx/gpx/*.gpx")
    assert(df.count() == 7)
    val first = df.orderBy("point_date", "point_time").head()
    assert(first.getAs[java.sql.Date]("point_date").toString == "2024-03-01")
    assert(first.getAs[String]("point_time") == "12:00:05")
    assert(first.getAs[Double]("latitude") == 35.2271)
  }

  test("S10 zip extraction restores entries; zip-slip is rejected") {
    val dest = Files.createTempDirectory("graft_s10").toString
    val paths = ZipUtil.extract(s"$fx/zip/garmin_export.zip", dest)
    assert(paths.size == 1 && paths.head.toString.endsWith("daily_steps.csv"))
    val content = new String(Files.readAllBytes(paths.head))
    assert(content.startsWith("calendarDate,totalSteps"))
    // zip-slip: craft an archive with a traversal entry
    val evil = Paths.get(dest, "evil.zip")
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(evil))
    zos.putNextEntry(new java.util.zip.ZipEntry("../escape.txt"))
    zos.write("x".getBytes); zos.closeEntry(); zos.close()
    intercept[IllegalArgumentException] {
      ZipUtil.extract(evil.toString, Paths.get(dest, "out").toString)
    }
  }

  test("S6/S7/S11 JDBC load modes, count verify, exists probe") {
    val dbDir = Files.createTempDirectory("graft_derby")
    System.setProperty("derby.system.home", dbDir.toString)
    val url = s"jdbc:derby:$dbDir/testdb;create=true"
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    assert(!Jdbc.tableExists(url, "spec_t"))
    Jdbc.load(df, url, "spec_t", ifExists = "replace")
    assert(Jdbc.tableExists(url, "spec_t"))
    assert(Jdbc.rowCount(spark, url, "spec_t") == 2L)
    Jdbc.load(df, url, "spec_t", ifExists = "append")
    assert(Jdbc.rowCount(spark, url, "spec_t") == 4L)
    Jdbc.load(df, url, "spec_t", ifExists = "replace")
    assert(Jdbc.rowCount(spark, url, "spec_t") == 2L)
    intercept[Exception] { Jdbc.load(df, url, "spec_t", ifExists = "fail") }
    // S8 passthrough
    val q = Jdbc.query(spark, url, """SELECT "id" FROM spec_t WHERE "id" > 1""")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
