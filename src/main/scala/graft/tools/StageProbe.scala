package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Diagnostic main: run the staged KG pipeline once at one parallelism
  * level with a task-metrics listener, and attribute executor-side cost
  * (CPU vs run time, GC, spill, shuffle bytes, peak execution memory) to
  * each pipeline lap. Laps run sequentially on the driver thread, so
  * tasks are bucketed by wall-clock finish time against the cumulative
  * lap boundaries — exact enough to localize a scale residual to a stage.
  *
  * Usage: SPARK_GRAFT_PROBE_FILES=1280000 SPARK_GRAFT_PROBE_CPUS=8 \
  *          sbt 'runMain graft.tools.StageProbe'
  * Parts default to Sessions.shufflePartitionsFor(cpus, files) — a
  * SCALING PAIR must pin SPARK_GRAFT_PROBE_PARTS (to the high level's
  * value) so both levels run plan-identical jobs, as Bench does.
  */
object StageProbe {
  private final class Agg {
    var tasks = 0L; var runMs = 0L; var cpuNs = 0L; var gcMs = 0L
    var memSpill = 0L; var diskSpill = 0L; var peakExec = 0L
    var shufR = 0L; var shufW = 0L; var shufWNs = 0L
    def add(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        tasks += 1
        runMs += m.executorRunTime; cpuNs += m.executorCpuTime
        gcMs += m.jvmGCTime
        memSpill += m.memoryBytesSpilled; diskSpill += m.diskBytesSpilled
        peakExec = math.max(peakExec, m.peakExecutionMemory)
        shufR += m.shuffleReadMetrics.totalBytesRead
        shufW += m.shuffleWriteMetrics.bytesWritten
        shufWNs += m.shuffleWriteMetrics.writeTime
      }
    }
    def json: String =
      f""""tasks":$tasks,"runSec":${runMs / 1e3}%.1f,"cpuSec":${cpuNs / 1e9}%.1f,""" +
        f""""gcSec":${gcMs / 1e3}%.1f,"memSpillMB":${memSpill / 1e6}%.0f,""" +
        f""""diskSpillMB":${diskSpill / 1e6}%.0f,"peakExecMB":${peakExec / 1e6}%.0f,""" +
        f""""shufReadMB":${shufR / 1e6}%.0f,"shufWriteMB":${shufW / 1e6}%.0f,""" +
        f""""shufWriteSec":${shufWNs / 1e9}%.1f"""
  }

  private def stealTicks(): (Long, Long) =
    try {
      val cpu = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).get.trim.split("\\s+").drop(1).map(_.toLong)
      (cpu(7), cpu.sum)
    } catch { case _: Throwable => (0L, 1L) }

  private def calibrate(iters: Int = 20000): Double = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val buf = new Array[Byte](4096)
    val t0 = System.nanoTime()
    var i = 0
    while (i < iters) { buf(0) = i.toByte; md.digest(buf); i += 1 }
    iters.toLong * 4096 / ((System.nanoTime() - t0) / 1e9) / 1e6
  }

  def main(args: Array[String]): Unit = {
    val files = sys.env.getOrElse("SPARK_GRAFT_PROBE_FILES", "320000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_PROBE_CPUS", "8").toInt
    val parts = sys.env.get("SPARK_GRAFT_PROBE_PARTS").map(_.toInt)
      .getOrElse(graft.runtime.Sessions.shufflePartitionsFor(cpus, files))
    val spark = graft.runtime.Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), parts)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (finishMs, taskEnd) buffer; bucketing happens after the run once
    // lap boundaries are known
    val events = new java.util.concurrent.ConcurrentLinkedQueue[(Long, SparkListenerTaskEnd)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit =
        events.add((System.currentTimeMillis(), taskEnd))
    })

    val cal0 = calibrate()
    val (s0, tt0) = stealTicks()
    val t0 = System.currentTimeMillis()
    val staged = graft.pipeline.KgPipeline.runSyntheticStaged(spark, files)
    val totalSec = (System.currentTimeMillis() - t0) / 1e3
    val (s1, tt1) = stealTicks()
    val stealPm = (s1 - s0) * 1000 / math.max(1, tt1 - tt0)
    // end-of-run calibration: a clean LAUNCH gate can't see a window that
    // degrades mid-run (2.56M runs span 7-13 min, host episodes recur on
    // a few-minute cadence) — the start/end pair bounds the drift
    val cal1 = calibrate()

    // cumulative wall boundaries per lap (laps are sequential, driver-timed)
    var cum = t0.toDouble
    val bounds = staged.stageSec.map { case (name, sec) =>
      val lo = cum; cum += sec * 1000; (name, lo, cum)
    }
    val aggs = bounds.map { case (n, _, _) => n -> new Agg }.toMap
    val other = new Agg
    events.forEach { case (ts, e) =>
      bounds.find { case (_, lo, hi) => ts >= lo && ts < hi } match {
        case Some((n, _, _)) => aggs(n).add(e)
        case None            => other.add(e)
      }
    }
    println(f"""{"probe":"stage","files":$files,"cpus":$cpus,"parts":$parts,"wallSec":$totalSec%.1f,"stealPermille":$stealPm,"calMBs":$cal0%.0f,"calMBsEnd":$cal1%.0f,"triples":${staged.tripleCount},""" +
      staged.stageSec.map { case (n, s) =>
        f""""$n":{"wallSec":$s%.1f,${aggs(n).json}}"""
      }.mkString(",") + s""","unattributed":{${other.json}}}""")
    spark.stop()
  }
}
