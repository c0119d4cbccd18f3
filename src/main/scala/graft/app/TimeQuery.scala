package graft.app

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual catalog queries.
  * Usage: runMain graft.app.TimeQuery <sfDir> <queryName> [queryName...]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.runtime.Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = graft.Queries.all(n)(spark, sfDir).count()
      println(f"TIMEQ $n rows=$cnt sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
