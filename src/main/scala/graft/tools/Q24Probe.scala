package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-7 scratch probe: q24 sub-part attribution. Not used by the driver. */
object Q24Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.runtime.Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def lap[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val x = f
      println(f"Q24LAP $name ${(System.nanoTime() - t0) / 1e9}%.2f"); x
    }
    (1 to 2).foreach { r =>
      println(s"== run $r")
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val pairs = lap("lsh_pairs") {
        val p = graft.ops.Dedup.minhashLshPairs(docs).where(col("jaccard_est") >= 0.5)
        p.count(); p
      }
      lap("ngram_verify") {
        graft.ops.Dedup.ngramJaccard(docs, pairs.select("idA", "idB"))
          .where(col("jaccard") >= 0.8).count()
      }
      val slice = docs.where(col("doc_id") < 200 &&
        size(split(col("text"), "\\s+")) >= 3)
      val ids = slice.select(col("doc_id"))
      val allPairs = ids.select(col("doc_id").as("idA"))
        .crossJoin(ids.select(col("doc_id").as("idB")))
        .where(col("idA") < col("idB"))
      lap("gate_exact") {
        graft.ops.Dedup.ngramJaccard(slice, allPairs)
          .where(col("jaccard") >= 0.8).count()
      }
    }
    spark.stop()
  }
}
