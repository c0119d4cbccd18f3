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
    val spark = graft.runtime.Sessions
      .configure(
        if (sys.env.contains("SPARK_GRAFT_CPUS"))
          base.master(s"local[${sys.env("SPARK_GRAFT_CPUS")}]")
        else base,
        shufflePartitions =
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
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
