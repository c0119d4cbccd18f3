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

  /** Static-side signature table for [[bandedNearDup]]: one row per
    * (band, bandVal, matchId, matchSh) — EXACTLY the batch
    * [[graft.ops.Dedup.simhashPairs]] banding (the SHARED
    * `Dedup.simhashBandCols` definition), built by the periodic compaction
    * job over the corpus-so-far, with the SAME per-bucket skew cap as the
    * batch path (a degenerate band value — boilerplate or empty documents
    * — would otherwise fan every arriving document out against thousands
    * of static rows): the `maxBucket` lowest ids per (band, bandVal)
    * survive, drops are counted via observe. At scale this table is
    * bucketed on (band, bandVal) and refreshed on the compaction cadence;
    * candidates against documents newer than the last compaction surface
    * on the next refresh (the documented freshness lag).
    */
  def bandSignatures(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id", maxBucket: Int = 256): DataFrame = {
    val banded = docs.select(col(idCol).as("matchId"),
      graft.functions.SimHash64(col(textCol)).as("matchSh"))
      .select(col("matchId"), col("matchSh"),
        graft.ops.Dedup.simhashBandCols(col("matchSh")))
    graft.runtime.Observed.install(docs.sparkSession)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "bandVal").orderBy("matchId")
    banded.withColumn("rn", row_number().over(w))
      .observe(graft.runtime.Observed.name("stream_band_cap"),
        sum(when(col("rn") > maxBucket, 1L).otherwise(0L)).as("dropped"))
      .where(col("rn") <= maxBucket)
      .drop("rn")
  }

  /** Streaming banded NEAR-dup candidates (below the exact-collision bar
    * [[simhashDedup]] handles): each arriving document joins STREAM-STATIC
    * against the compacted signature table on (band, bandVal) — no
    * stream-stream self-join, no unbounded state; the only state is the
    * within-watermark (docId, matchId) dedup (a pair can match in up to 4
    * bands). Emits (docId, ts, matchId, hamming ≤ maxHamming). Candidate
    * generation is identical to the batch path restricted to
    * (new, already-compacted) pairs — StreamingSpec pins that equality —
    * up to the shared bucket cap: on a capped bucket the batch path keeps
    * pairs among the cap survivors, the stream path checks the arriving
    * document against the same survivors (an arriving document always
    * probes — it is one row, so the stream side cannot skew).
    */
  def bandedNearDup(docs: Dataset[Doc], signatures: DataFrame,
                    maxHamming: Int = 3, watermark: String = "10 minutes"): DataFrame = {
    val streamBands = docs.toDF()
      .withWatermark("ts", watermark)
      .withColumn("sh", graft.functions.SimHash64(col("text")))
      .select(col("docId"), col("ts"), col("sh"),
        graft.ops.Dedup.simhashBandCols(col("sh")))
    streamBands.join(signatures, Seq("band", "bandVal"))
      .where(col("docId") =!= col("matchId"))
      .withColumn("hamming", bit_count(col("sh").bitwiseXOR(col("matchSh"))))
      .where(col("hamming") <= maxHamming)
      .select(col("docId"), col("ts"), col("matchId"), col("hamming"))
      .dropDuplicatesWithinWatermark("docId", "matchId")
  }
}
