package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timing of the q24 minhash dedup path. */
object ProbeDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.runtime.Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def lap[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val x = f
      println(f"  LAP $name ${(System.nanoTime() - t0) / 1e9}%.2f s -> $x")
      x
    }
    val pairs = graft.ops.Dedup.minhashLshPairs(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lap("lsh pairs")(pairs.count())
    val est = pairs.where(col("jaccard_est") >= 0.5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lap("est>=0.5")(est.count())
    lap("ngram verify")(
      graft.ops.Dedup.ngramJaccard(docs, est.select("idA", "idB"))
        .where(col("jaccard") >= 0.8).count())
    spark.stop()
  }
}
