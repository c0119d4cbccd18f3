package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-7 scratch probe: staged 400-file pipeline laps at catalog-session
  * settings (local[cpus], parts=cpus) — attributes kg_stats's first-call
  * cost to pipeline stages. Not used by the driver.
  */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 400L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.runtime.Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach { r =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val staged = graft.pipeline.KgPipeline.runSyntheticStaged(spark, n)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"PIPE run=$r files=$n wall=$wall%.2f triples=${staged.tripleCount} " +
        staged.stageSec.map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
    }
    spark.stop()
  }
}
