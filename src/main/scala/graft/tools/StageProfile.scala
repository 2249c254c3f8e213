package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev-only profiler for the sf10 text-family tail investigation
  * (SCALING.md round 12): runs the named queries with a stage-metrics
  * listener and prints, per completed stage, where the time actually
  * goes — executor run/CPU/GC time, shuffle read/write volume, and
  * memory/disk spill — so a 12-13×/decade ratio can be attributed to a
  * NAMED leg (scan-side text work vs sort/shuffle spill) instead of a
  * hypothesis. Usage:
  *   SPARK_GRAFT_SF_DIR=target/sf10 sbt "runMain graft.tools.StageProfile q_corpus_clean"
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val stages = mutable.ArrayBuffer.empty[(Int, String, Long, Long, Long,
      Long, Long, Long, Long, Long)]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(90),
          m.executorRunTime, m.executorCpuTime / 1000000,
          m.jvmGCTime, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.memoryBytesSpilled,
          m.diskBytesSpilled, i.numTasks.toLong))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    args.foreach { q =>
      stages.clear()
      val t0 = System.nanoTime()
      graft.Queries.all(q)(spark, sf)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain (private API)
      println(f"PROFILE $q wall=$wall%.1fs (sums are across-task totals)")
      println("stageId  runMs    cpuMs    gcMs     shRdMB  shWrMB  spillMemMB spillDiskMB tasks  name")
      stages.sortBy(-_._3).take(20).foreach {
        case (id, name, run, cpu, gc, srd, swr, smem, sdisk, tasks) =>
          println(f"$id%7d $run%8d $cpu%8d $gc%8d ${srd / 1e6}%7.1f " +
            f"${swr / 1e6}%7.1f ${smem / 1e6}%10.1f ${sdisk / 1e6}%11.1f " +
            f"$tasks%5d  $name")
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
