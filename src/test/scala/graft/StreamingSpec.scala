package graft

import java.nio.file.Files
import graft.model.CodeFile
import graft.streaming.StreamingIngest

class StreamingSpec extends SparkSpec {
  test("streaming ingest + compaction equals the batch pipeline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("stream-out").toString
    val ckpt = Files.createTempDirectory("stream-ckpt").toString

    val files = graft.corpus.CorpusGen.generate(spark, 80).collect().toSeq
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[CodeFile]
    // two micro-batches
    source.addData(files.take(40))
    val q = StreamingIngest.run(source.toDS(), out, ckpt)
    q.awaitTermination()
    source.addData(files.drop(40))
    val q2 = StreamingIngest.run(source.toDS(), out, ckpt)
    q2.awaitTermination()

    val streamed = StreamingIngest.compact(spark, out)
      .as[(String, String, String)].collect().toSet
    val batch = graft.pipeline.KgPipeline.runSynthetic(spark, 80)
      .tripleSet.as[(String, String, String)].collect().toSet
    assert(streamed == batch)
  }

  test("streaming dedup: first arrival kept, in-horizon duplicates dropped, state evicted past watermark") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    import graft.streaming.StreamingDedup.Doc
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("dedup-ckpt").toString
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)

    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Doc]
    val q = StreamingDedup.exactDedup(source.toDS(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()

    // batch 1: two distinct texts + one duplicate → 2 rows out
    source.addData(Doc(1, ts(0), "alpha text"), Doc(2, ts(1), "beta text"),
      Doc(3, ts(2), "alpha text"))
    q.processAllAvailable()
    // batch 2: duplicate arrives within the horizon → dropped
    source.addData(Doc(4, ts(3), "beta text"))
    q.processAllAvailable()
    def ids() = spark.table("dedup_out").as[(Long, java.sql.Timestamp, String, String)]
      .collect().map(_._1).toSet
    assert(ids() == Set(1L, 2L), ids().toString)

    // advance the watermark far past the originals, then re-send a dup:
    // state was evicted, so the late duplicate is re-emitted — the
    // documented at-least-once horizon contract
    source.addData(Doc(5, ts(100), "gamma text"))
    q.processAllAvailable()
    source.addData(Doc(6, ts(101), "alpha text"))
    q.processAllAvailable()
    q.stop()
    assert(ids() == Set(1L, 2L, 5L, 6L), ids().toString)
  }

  test("streaming banded near-dup matches batch LSH candidates for stream-vs-compacted pairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamingDedup
    import graft.streaming.StreamingDedup.Doc
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("neardup-ckpt").toString
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)

    // compacted corpus (the static side) + an arriving stream with planted
    // near-dups: identical text, small token edits, and unrelated noise
    val base = "the quick brown fox jumps over the lazy dog near the riverbank today"
    val oldDocs = Seq(
      (0L, base),
      (1L, "completely different content about distributed spark sql engines"),
      (2L, base + " again"),
      (3L, "unrelated third text body with its own distinct vocabulary set")
    ).toDF("doc_id", "text")
    val newDocs = Seq(
      Doc(100L, ts(0), base), // identical → hamming 0
      Doc(101L, ts(1), base.replace("today", "tonight")), // 1-token edit
      Doc(102L, ts(2), "entirely novel text that resembles none of the compacted corpus rows"),
      Doc(103L, ts(3), "completely different content about distributed spark sql engines")
    )

    val signatures = StreamingDedup.bandSignatures(oldDocs)
    val q = StreamingDedup.bandedNearDup(
      (org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Doc] match {
        case s => s.addData(newDocs); s
      }).toDS(), signatures)
      .writeStream.format("memory").queryName("neardup_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("neardup_out")
      .select("docId", "matchId").collect()
      .map(r => (r.getLong(1), r.getLong(0))).toSet // (old, new)

    // batch oracle: simhashPairs over old ∪ new, restricted to cross pairs
    val union = oldDocs.unionByName(
      newDocs.toDF().select(col("docId").as("doc_id"), col("text")))
    val batch = graft.ops.Dedup.simhashPairs(union, maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("idA"), r.getAs[Long]("idB")))
      .filter { case (a, b) => a < 100 && b >= 100 }.toSet
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    // the planted pairs are really found (non-vacuous)
    assert(streamed.contains((0L, 100L)) && streamed.contains((1L, 103L)))
  }

  test("bandSignatures caps hot band buckets with an observed drop counter") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    // 30 identical docs share every band value — a degenerate bucket
    val docs = (0 until 30)
      .map(i => (i.toLong, "identical boilerplate text shared by every document row"))
      .toDF("doc_id", "text")
    graft.runtime.Observed.clear("stream_band_cap")
    val sigs = StreamingDedup.bandSignatures(docs, maxBucket = 4)
    // 4 bands × cap 4 survivors
    assert(sigs.count() == 16L)
    val perBucket = sigs.groupBy("band", "bandVal").count()
      .collect().map(_.getLong(2))
    assert(perBucket.forall(_ <= 4), perBucket.mkString(","))
    def poll(): Option[Long] =
      graft.runtime.Observed.get("stream_band_cap").map(_("dropped"))
    val deadline = System.currentTimeMillis() + 10000
    while (poll().isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
    // 30 docs × 4 bands, cap 4 → 26 dropped per band = 104
    assert(poll().contains(104L), s"observed=${poll()}")
  }

  test("stateful streaming sessionization: gap closes on arrival, watermark timeout closes the tail") {
    import spark.implicits._
    import graft.streaming.StreamingSessions
    import graft.streaming.StreamingSessions.{Event, Session}
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("sess-ckpt").toString
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)

    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val q = StreamingSessions.sessionize(source.toDS(), gapMinutes = 30,
      watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()

    // user 1: two events 10 min apart (one session), then a 2h-later event
    // → the gap closes session 1 on arrival
    source.addData(Event(1, ts(0), 1.0), Event(1, ts(10), 2.0))
    q.processAllAvailable()
    source.addData(Event(1, ts(130), 5.0))
    q.processAllAvailable()
    // a much later event for ANOTHER user advances the watermark past
    // session 2's timeout → event-time timeout closes it
    source.addData(Event(2, ts(1000), 7.0))
    q.processAllAvailable()
    source.addData(Event(2, ts(2000), 9.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sessions_out").as[Session].collect()
      .map(s => (s.userId, s.sessionStart.getTime, s.nEvents, s.totalValue)).toSet
    assert(got.contains((1L, ts(0).getTime, 2L, 3.0)), got.toString) // gap-closed
    assert(got.contains((1L, ts(130).getTime, 1L, 5.0)), got.toString) // timeout-closed
  }

  /** Protocol-scale stream ≡ batch pin (round-5 verdict item 4), gated
    * behind GRAFT_STREAM_SCALE=<files> — a 320k run takes minutes and
    * belongs to the evidence protocol (BASELINE.md carries the measured
    * row), not the per-commit suite. The same harness runs ungated at toy
    * size elsewhere in this spec via StreamingIngest directly.
    */
  test("protocol-scale streaming ingest + compaction ≡ batch pipeline (env-gated)") {
    assume(sys.env.contains("GRAFT_STREAM_SCALE"),
      "set GRAFT_STREAM_SCALE=<files> to run the protocol-scale pin")
    val n = sys.env("GRAFT_STREAM_SCALE").toLong
    val r = graft.streaming.StreamScale.run(spark, n)
    assert(r.equalToBatch,
      s"stream+compact diverged from batch at $n files: $r")
    assert(r.microBatches > 1, s"admission control produced one mega-batch: $r")
  }
}
