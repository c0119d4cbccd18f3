package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.extract.Extractor
import graft.model.{CodeFile, Segment}
import graft.segment.CodeSegmenter

/**
 * Incremental ingest (SURVEY.md §2.10: the reference is batch-only; this
 * is the documented extension point, not a port requirement). New corpus
 * rows arrive as a stream; each micro-batch runs the SAME batch stage
 * functions (segment → extract) via foreachBatch and appends to the
 * per-stage checkpoint tables, so incremental and backfill runs share one
 * code path. Canonicalization/linking remain periodic batch jobs over the
 * accumulated mention table (the standard lambda-ish split for KG
 * construction: append-heavy extraction streams, compaction-style
 * linking).
 */
object StreamingIngest {

  /** Wire a streaming Dataset[CodeFile] through segment+extract into
    * append-mode parquet stage tables. Returns the running query.
    */
  def run(files: Dataset[CodeFile], outRoot: String,
          checkpointDir: String): StreamingQuery = {
    val spark = files.sparkSession
    import spark.implicits._
    files.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[CodeFile], batchId: Long) =>
        // IDEMPOTENT per-batch writes (round-6 review): foreachBatch is
        // at-least-once — a crash between the parquet append and the
        // streaming commit log replays the batch, and a bare append
        // would then hold every triple id twice, violating
        // GraphBuilder.build's row-unique id contract (the id-keyed
        // winner fetch passes duplicates through). Writing each batch to
        // its own batch=<id> partition dir with overwrite makes replays
        // rewrite instead of duplicate — the standard foreachBatch
        // exactly-once recipe.
        val segments: Dataset[Segment] = CodeSegmenter.windows(batch)
        val (mentions, triples) = Extractor.extract(segments)
        mentions.toDF().write.mode("overwrite")
          .parquet(s"$outRoot/mentions/batch=$batchId")
        triples.toDF().write.mode("overwrite")
          .parquet(s"$outRoot/triples/batch=$batchId")
        ()
      }
      .start()
  }

  /** Periodic compaction: read accumulated mention/triple tables and run
    * the batch linking + graph build (the same functions the batch
    * pipeline uses).
    */
  def compact(spark: SparkSession, outRoot: String): DataFrame = {
    import spark.implicits._
    // drop the batch=<id> partition-discovery column the per-batch
    // idempotent layout introduces — downstream schemas are the model
    // case classes
    val mentions = spark.read.parquet(s"$outRoot/mentions")
      .drop("batch").as[graft.model.Entity]
    val triples = spark.read.parquet(s"$outRoot/triples")
      .drop("batch").as[graft.model.Triple]
    val deduped = graft.link.EntityMerge.dedupeMentionsFast(mentions)
    val linked = graft.link.Linker.link(deduped)
    val redirected = graft.link.Linker.redirectEdges(triples, linked.rewrite)
    val g = graft.graphout.GraphBuilder.build(linked.canonical, redirected)
    // zero-join projection — the SAME shape as the batch pipelines'
    // triple-set stage: build() attaches canonical srcName/dstName to
    // every edge, so re-joining nodes here would pay two redundant
    // node-side exchanges per compaction to recompute names the edge
    // rows already carry
    g.edges.toDF()
      .select($"srcName".as("subjName"), $"relType", $"dstName".as("objName"))
      .distinct()
  }
}
