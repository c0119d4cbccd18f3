package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: micro-timing of minhash LSH internals. */
object ProbeDedup2 {
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
    import graft.ops.Dedup._
    lap("shingles only")(docs.select(size(shingles(col("text"))).as("s"))
      .agg(sum("s")).head().getLong(0))
    val withMh = docs.select(col("doc_id").as("id"), minhashes(shingles(col("text")), 32).as("mh"))
    lap("withMh k=32")(withMh.agg(sum(size(col("mh")))).head().getLong(0))
    val mh = withMh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lap("withMh persisted")(mh.count())
    val r = 4
    val banded = mh.select(
      col("id"),
      posexplode(array((0 until 8).map { b =>
        xxhash64(concat_ws(",", slice(col("mh"), b * r + 1, r).cast("array<string>")), lit(b))
      }: _*)).as(Seq("band", "bandHash")))
    lap("banded")(banded.count())
    lap("bucket histogram")(banded.groupBy("band", "bandHash").count()
      .agg(max("count"), count(lit(1))).head().toString)
    spark.stop()
  }
}
