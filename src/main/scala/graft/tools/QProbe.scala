package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Round-7 measurement harness (guide §1: measure first). For each named
  * catalog query, runs it `reps` times in one session and prints, per run:
  * wall sec, #jobs, #stages/tasks, summed executor task time and summed
  * shuffle bytes — attributing fixed driver/job-latency overhead vs real
  * compute. Never used by the driver; Bench.scala stays the official
  * harness.
  *
  * Usage: runMain graft.tools.QProbe <sfDir> <reps> <query> [query...]
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.runtime.Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    val shuffleRead = new AtomicLong(0L)
    val shuffleWrite = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        taskTimeMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        shuffleRead.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })

    names.foreach { n =>
      (1 to reps).foreach { r =>
        jobs.set(0); stages.set(0); tasks.set(0)
        taskTimeMs.set(0); shuffleRead.set(0); shuffleWrite.set(0)
        val t0 = System.nanoTime()
        val cnt = graft.Queries.all(n)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        // drain the listener bus so the stage metrics belong to this run
        org.apache.spark.graftshim.GraftCore.drainListenerBus(spark.sparkContext, 5000)
        println(f"QPROBE $n run=$r rows=$cnt sec=$sec%.3f jobs=${jobs.get} " +
          f"stages=${stages.get} tasks=${tasks.get} taskSec=${taskTimeMs.get / 1e3}%.2f " +
          f"shufR=${shuffleRead.get / 1e6}%.1fMB shufW=${shuffleWrite.get / 1e6}%.1fMB")
      }
    }
    spark.stop()
  }
}
