package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TimeFnsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): Any =
    Seq(input).toDF("v").select(c.as("r")).head().get(0)

  test("F6 dropMilliseconds strips fractional seconds") {
    assert(one(TimeFns.dropMilliseconds(col("v")), "8:58.3") == "8:58")
    assert(one(TimeFns.dropMilliseconds(col("v")), "8:58") == "8:58")
  }

  test("F7 mmssToSeconds parses M:SS and MM:SS") {
    assert(one(TimeFns.mmssToSeconds(col("v")), "8:58") == 538L)
    assert(one(TimeFns.mmssToSeconds(col("v")), "12:03") == 723L)
    assert(one(TimeFns.mmssToSeconds(col("v")), "1:02:03") == null) // 3-part
  }

  test("F8 standardizeHms zero-pads 2-part times, passes 3-part through") {
    assert(one(TimeFns.standardizeHms(col("v")), "35:54") == "0:35:54")
    assert(one(TimeFns.standardizeHms(col("v")), "1:35:54") == "1:35:54")
  }

  test("F9 hmsToSeconds handles H:MM:SS, MM:SS, and fractional input") {
    assert(one(TimeFns.hmsToSeconds(col("v")), "1:02:03") == 3723L)
    assert(one(TimeFns.hmsToSeconds(col("v")), "35:54") == 2154L)
    assert(one(TimeFns.hmsToSeconds(col("v")), "35:54.2") == 2154L)
  }

  test("F10 secondsToHms formats without leading zero on hours") {
    val df = Seq(3723L, 0L, 59L, 86399L).toDF("s")
      .select(TimeFns.secondsToHms(col("s")).as("r"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("1:02:03", "0:00:00", "0:00:59", "23:59:59"))
  }

  test("F12 paceFromSpeed: 3.33 m/s ~ 5:00/km; non-positive speed -> null") {
    val df = Seq(3.33, 2.0, 0.0, -1.0).toDF("v")
      .select(TimeFns.paceFromSpeed(col("v")).as("r"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("5:00", "8:20", null, null))
  }

  test("F3 epochMillisToTimestamp matches UTC wall time") {
    val r = Seq(852120000000L).toDF("v")
      .select(date_format(TimeFns.epochMillisToTimestamp(col("v")),
        "yyyy-MM-dd HH:mm:ss").as("r")).head().getString(0)
    assert(r == "1997-01-01 12:00:00")
  }

  test("F14 durationSeconds is end minus start") {
    val r = Seq(("2024-03-01 10:00:00", "2024-03-01 11:30:05"))
      .toDF("a", "b")
      .select(TimeFns.durationSeconds(
        col("a").cast("timestamp"), col("b").cast("timestamp")).as("r"))
      .head().getLong(0)
    assert(r == 5405L)
  }
}
