package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Ad-hoc profiler for the link_cc stage (round-5: stage efficiency 0.24-0.31
 * — fixed driver latency per the round-4 verdict; this enumerates where the
 * seconds actually go at a given corpus size / parallelism so the fix
 * targets the measured sub-step, not a guess).
 *
 * Run: sbt 'runMain graft.tools.LinkProfile 320000 8'
 */
object LinkProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 320000L
    val cpus = if (args.length > 1) args(1).toInt else 8
    val spark = graft.runtime.Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"),
        shufflePartitions = 16)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val x = f
      println(f"[linkprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      x
    }

    val files = graft.corpus.CorpusGen.generate(spark, n)
    val segments = graft.segment.CodeSegmenter.windows(files)
    val (mentions, _) = graft.extract.Extractor.extract(segments)
    val deduped = graft.link.EntityMerge.dedupeMentionsFast(mentions)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[linkprof] canonical mentions: ${deduped.count()}")

    // warm (JIT) — one full link pass
    time("warm full link")(graft.link.Linker.link(deduped))

    (1 to 2).foreach { round =>
      println(s"[linkprof] ---- round $round")
      val pairs = time("candidatePairs plan+job") {
        val p = graft.link.Linker.candidatePairs(deduped)
          .select($"id1".as("src"), $"id2".as("dst"))
          .localCheckpoint(true)
        p
      }
      println(s"[linkprof] pairs: ${pairs.count()}")
      time("cc on materialized pairs") {
        graft.link.ConnectedComponents.run(pairs)
      }
      time("full link (all-in)") {
        graft.link.Linker.link(deduped)
      }
    }
    spark.stop()
  }
}
