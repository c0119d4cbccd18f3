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
 * Shuffle census for the full run (what matters at 100 TB):
 *   segment+extract: ZERO shuffles (flatMap/mapPartitions chains)
 *   mention dedup:   1 shuffle (hash agg on deterministic entityId,
 *                    partial agg map-side via commutative Aggregator)
 *   linking:         blocking shuffle + O(log n) CC iterations (alias
 *                    pair graph is tiny relative to corpus)
 *   edge redirect:   0 shuffles (broadcast rewrite map)
 *   graph build:     semi-join vs nodes (broadcast-able dim) + window dedup
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

  def run(spark: SparkSession, files: Dataset[CodeFile],
          linkThreshold: Double = Linker.DefaultThreshold): Result = {
    import spark.implicits._

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
    val deduped = EntityMerge.dedupeMentionsFast(mentions)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // fuzzy linking over the already-deduped canonical mentions
    val linked = Linker.link(deduped, linkThreshold)
    val redirected = Linker.redirectEdges(rawTriples, linked.rewrite)

    val graph = {
      val g = GraphBuilder.build(linked.canonical, redirected)
      // nodes are joined twice by tripleSet and re-read by stats/queries;
      // persist both sides (at production scale these are the materialized
      // node/edge tables, so the cache stands in for the table write)
      GraphBuilder.Graph(
        g.nodes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
        g.edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }

    // name attachment via SHUFFLE_HASH: the node dim grows with the
    // corpus (never broadcast-able at 100 TB) and a broadcast build is
    // serial on the driver — the hint keeps the hash build parallel
    val tripleSet = graph.edges.toDF()
      .join(graph.nodes.toDF().select($"id".as("srcId"), $"name".as("subjName"))
        .hint("shuffle_hash"), Seq("srcId"))
      .join(graph.nodes.toDF().select($"id".as("dstId"), $"name".as("objName"))
        .hint("shuffle_hash"), Seq("dstId"))
      .select($"subjName", $"relType", $"objName")
      .distinct()

    Result(files, segments, mentions, linked.canonical, graph, tripleSet)
  }

  def runSynthetic(spark: SparkSession, n: Long, seed: Long = 42L): Result =
    run(spark, CorpusGen.generate(spark, n, seed))
}
