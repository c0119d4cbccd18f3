package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Streaming document dedup for continuous ingest — the Structured-
 * Streaming counterpart of the batch [[graft.ops.Dedup]] operators.
 *
 * Both variants keep the FIRST arrival of each key and drop later
 * duplicates via `dropDuplicatesWithinWatermark`: state holds one row
 * per distinct key seen within the watermark horizon and is EVICTED once
 * the watermark passes, so state size is bounded by the dedup horizon ×
 * ingest rate — never by stream history (plain `dropDuplicates` on an
 * unbounded stream grows state forever; this is the scale-safe form).
 * The trade-off is explicit: a duplicate arriving after its original
 * left the state horizon is re-emitted (at-least-once dedup), exactly
 * the contract large ingest pipelines run with a downstream batch
 * compaction (the batch Dedup.exact over the compacted table).
 *
 *  - [[exactDedup]]: key = md5 of the text (batch Dedup.exact parity).
 *  - [[simhashDedup]]: key = the native [[graft.functions.SimHash64]]
 *    fingerprint — drops near-boilerplate re-crawls whose fingerprints
 *    collide exactly; candidate-pair near-dup mining below the exact-
 *    collision bar stays a batch concern (banded LSH needs a self-join,
 *    which streaming state cannot express incrementally).
 */
object StreamingDedup {

  final case class Doc(docId: Long, ts: Timestamp, text: String)

  def exactDedup(docs: Dataset[Doc], watermark: String = "10 minutes"): DataFrame =
    docs.toDF()
      .withWatermark("ts", watermark)
      .withColumn("text_hash", md5(col("text")))
      .dropDuplicatesWithinWatermark("text_hash")

  def simhashDedup(docs: Dataset[Doc], watermark: String = "10 minutes"): DataFrame =
    docs.toDF()
      .withWatermark("ts", watermark)
      .withColumn("simhash", graft.functions.SimHash64(col("text")))
      .dropDuplicatesWithinWatermark("simhash")
}
