package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.CorpusGen
import graft.extract.Extractor
import graft.graphout.GraphBuilder
import graft.link.{EntityMerge, Linker}
import graft.model.{CodeFile, Entity, Segment, Triple}
import graft.segment.CodeSegmenter

/**
 * The flagship segment → extract → link → build flow (reference
 * KnowledgeExtractionPipeline, src/knowledge/pipeline.py:71-210), as lazy
 * Dataset stages. Unlike the reference (§3.1 note in SURVEY.md), edges ARE
 * re-pointed to merged entities (C5) before materialization, and dangling
 * edges are counted rather than silently dropped.
 *
 * Shuffle census for the full run (what matters at 100 TB — round-4
 * shape: duplicate mass collapses BEFORE any join, and the two cached
 * tables carry join-aligned hash partitioning so downstream joins are
 * exchange-free on the cached sides):
 *   segment+extract: ZERO shuffles (flatMap/mapPartitions chains)
 *   mention dedup:   1 shuffle (hash agg on deterministic entityId,
 *                    partial agg map-side via commutative Aggregator)
 *   linking:         blocking shuffle + O(log n) CC iterations (alias
 *                    pair graph is tiny relative to corpus)
 *   edge redirect:   0 shuffles (broadcast rewrite map)
 *   graph build:     keep-max dedup agg (map-side combined, FIRST) +
 *                    2 edge-side semi-join exchanges; node build sides
 *                    read the id-partitioned cache (no exchange)
 *   tripleSet:       ZERO joins — canonical names ride the edge rows from
 *                    build's endpoint joins; one distinct aggregate
 *                    (map-side partial) is the stage's only exchange
 */
object KgPipeline {

  final case class Result(
      files: Dataset[CodeFile],
      segments: Dataset[Segment],
      mentions: Dataset[Entity],
      canonicalEntities: Dataset[Entity],
      graph: GraphBuilder.Graph,
      /** The P/R-scored projection: distinct (subjName, relType, objName). */
      tripleSet: DataFrame
  )

  /** Per-stage wall-clock laps from [[runStaged]] (bench evidence for the
    * two-cluster-size scaling rule — stage-attributed, not argued).
    * Stage names: extract_dedup (segmentation + extraction fused into the
    * mention-dedup action — the narrow chain has no cheaper observable
    * boundary), link_cc (pair scoring + connected components + rewrite
    * map), merge_build (entity merge + graph materialization + edge
    * redirect), triple_set (name attachment + distinct).
    */
  final case class Staged(result: Result, tripleCount: Long,
                          stageSec: Seq[(String, Double)])

  def run(spark: SparkSession, files: Dataset[CodeFile],
          linkThreshold: Double = Linker.DefaultThreshold): Result =
    assemble(spark, files, linkThreshold, force = false)._1

  /** [[run]] with each stage FORCED at its natural persist boundary and
    * timed — the bench's per-stage scaling instrument. The forced actions
    * are materializations the lazy run performs anyway on first downstream
    * use; only their attribution changes.
    */
  def runStaged(spark: SparkSession, files: Dataset[CodeFile],
                linkThreshold: Double = Linker.DefaultThreshold): Staged = {
    val (res, n, laps) = assemble(spark, files, linkThreshold, force = true)
    Staged(res, n, laps)
  }

  private def assemble(spark: SparkSession, files: Dataset[CodeFile],
                       linkThreshold: Double, force: Boolean)
      : (Result, Long, Seq[(String, Double)]) = {
    import spark.implicits._
    val laps = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def lap[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val x = f
      laps += name -> (System.nanoTime() - t0) / 1e9
      x
    }

    val segments = CodeSegmenter.windows(files)
    // Two independent narrow extraction passes (mentions, triples). Regex
    // work runs twice, but narrow chains recompute for free in parallel
    // and nothing large is pinned in executor memory — caching the raw
    // per-segment extraction (nested Seq rows) thrashes memory at high
    // task concurrency. At production scale the extraction output is a
    // checkpoint table (see CheckpointedPipeline) and this choice vanishes.
    val (mentions, rawTriples) = Extractor.extract(segments)

    // exact-identity dedup first (deterministic id = sha(normName|type)):
    // one shuffle, map-side combined. The canonical mention table is small
    // (distinct (name,type) pairs) and read 3+ times downstream → persist.
    val deduped = lap("extract_dedup") {
      val d = EntityMerge.dedupeMentionsFast(mentions)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      if (force) d.count()
      d
    }

    // fuzzy linking over the already-deduped canonical mentions; the
    // CC + rewrite map are eager (localCheckpoint) inside
    val linked = lap("link_cc")(Linker.link(deduped, linkThreshold))

    val parts = spark.sessionState.conf.numShufflePartitions
    val (nodes, edges) = lap("merge_build") {
      // nodes cached HASH-PARTITIONED ON ID (explicit count so AQE cannot
      // coalesce it away from the join requirement): the nodeIds builds in
      // GraphBuilder.build and both tripleSet name-attach sides read the
      // cache co-partitioned — zero node-side exchanges for the whole run
      val n = linked.canonical.repartition(parts, $"id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // redirected edges are NOT cached by default: GraphBuilder.build
      // does read the raw edge table from two plan sides (narrow winner
      // aggregate, then the wide semi-join side), so caching looks like
      // it should save an extraction pass — but the interleaved StageProbe
      // A/B at 320k (BASELINE.md round 6) measured the cache at +439 MB
      // shuffle write and +19 s CPU versus just recomputing the narrow
      // regex lineage: the columnar cache write/read of the wide rows
      // costs more than the extraction chain it saves, and the extra
      // pass overlaps with other work. Knob kept for corpora whose
      // extraction is genuinely expensive (the checkpointed pipeline gets
      // the single-pass property from its committed parquet stages).
      // The cache is gated on `force` as well: only the eager path has a
      // release point (below, once the edge cache materializes). A lazy
      // run() hands the caller unevaluated datasets with no hook to free
      // the wide-row cache, so persisting there would pin it for the
      // session and evict the node/edge caches it exists to serve.
      val cacheRaw = force &&
        spark.conf.get("spark.graft.pipeline.cacheRaw", "false").toBoolean
      val redirected0 = Linker.redirectEdges(rawTriples, linked.rewrite)
      val redirected = if (cacheRaw)
        redirected0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else redirected0
      val g = GraphBuilder.build(n, redirected)
      // edges cached hash-partitioned on srcId (the union with reversed
      // rows erases the semi-join's partitioning metadata): the srcId
      // name-attach and every downstream traversal join start co-located
      val e = g.edges.repartition(parts, $"srcId")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      if (force) { n.count(); e.count()
        if (cacheRaw) redirected.unpersist(blocking = false) }
      (n, e)
    }
    val graph = GraphBuilder.Graph(nodes, edges)

    // triple-set projection: ZERO joins (round-4 verdict item 2). Edges
    // carry canonical srcName/dstName since GraphBuilder.build attaches
    // them inside the endpoint-existence joins, so the stage is one
    // cached-scan + distinct — the partial aggregate collapses duplicate
    // name-triples map-side and the single exchange ships the distinct
    // set only. The dstId re-shuffle of the joined rows (the pipeline's
    // last read-path exchange, 0.43-0.57 stage efficiency in round 4) no
    // longer exists.
    val tripleSet = graph.edges.toDF()
      .select($"srcName".as("subjName"), $"relType", $"dstName".as("objName"))
      .distinct()
    val nTriples = lap("triple_set")(if (force) tripleSet.count() else 0L)

    (Result(files, segments, mentions, linked.canonical, graph, tripleSet),
      nTriples, laps.toSeq)
  }

  def runSynthetic(spark: SparkSession, n: Long, seed: Long = 42L): Result =
    run(spark, CorpusGen.generate(spark, n, seed))

  def runSyntheticStaged(spark: SparkSession, n: Long, seed: Long = 42L): Staged =
    runStaged(spark, CorpusGen.generate(spark, n, seed))
}
