package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named catalog queries to files —
  * the plans/r07 evidence the optimization rounds commit.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <query> [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.runtime.Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = graft.Queries.all(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
      println(s"PLAN $n -> $outDir/${n}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
