package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (suites may run
  * concurrently; SparkSession is thread-safe and a per-suite session
  * would pay ~5 s spin-up each).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.builder("local[4]", 4)
      .appName("graft-tests")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
