package graft.app

import org.apache.spark.sql.SparkSession
import graft.pipeline.CheckpointedPipeline

/**
 * spark-submit entry point for the checkpointed, resumable pipeline:
 *
 *   spark-submit --class graft.app.PipelineMain <jar> \
 *     <checkpointRoot> <nFiles> [seed]
 *
 * Re-running with the same root resumes from the last committed stage
 * (north-rule resumability). On a cluster the session comes from
 * spark-submit's conf; in local dev the Sessions defaults apply.
 */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val nFiles = args(1).toLong
    val seed = if (args.length > 2) args(2).toLong else 42L

    val base = SparkSession.builder()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // partition contract (round-6 lesson, wired here per the round-6
    // verdict): shuffle partitions scale with the corpus so per-task
    // aggregate/join state stays in the measured regime — a flat
    // cores-sized setting re-enters the 671 MB/task, 2.2x CPU-inflation
    // regime at ≥2.56M files that the bench harnesses were already
    // protected against. Env-overridable like the bench's SPARK_GRAFT_PARTS.
    val parts = sys.env.get("SPARK_GRAFT_PARTS").map(_.toInt)
      .getOrElse(graft.runtime.Sessions.shufflePartitionsFor(cpus, nFiles))
    val spark = graft.runtime.Sessions
      .configure(
        if (sys.env.contains("SPARK_GRAFT_CPUS"))
          base.master(s"local[${sys.env("SPARK_GRAFT_CPUS")}]")
        else base,
        shufflePartitions = parts)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tripleSet = CheckpointedPipeline.run(spark, root, nFiles, seed)
    val n = tripleSet.count()
    println(s"""{"tripleSet":$n,"root":"$root","files":$nFiles}""")

    val cp = new graft.runtime.Checkpoint(spark, root)
    cp.manifests().foreach(m => println(s"MANIFEST $m"))
    spark.stop()
  }
}
