package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time the KG pipeline at one parallelism level with the
  * same per-stage laps the bench records.
  * Usage: runMain graft.ScalingProbe <cpus> <files> [rounds]
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val files = args(1).toLong
    val rounds = if (args.length > 2) args(2).toInt else 2
    val parts = sys.env.get("SPARK_GRAFT_PARTS").map(_.toInt).getOrElse(cpus)
    val spark = graft.runtime.Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), shufflePartitions = parts)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to rounds).foreach { r =>
      val t0 = System.nanoTime()
      val staged = pipeline.KgPipeline.runSyntheticStaged(spark, files)
      val dt = (System.nanoTime() - t0) / 1e9
      staged.stageSec.foreach { case (n, s) => println(f"  LAP $n $s%.2f s") }
      println(f"PROBE cpus=$cpus files=$files round=$r sec=$dt%.2f " +
        f"triples=${staged.tripleCount} tps=${staged.tripleCount / dt}%.0f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
