package graft.graphout

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.{Entity, Triple}

/**
 * Graph materialization (SURVEY.md §2.7; reference
 * src/graph_management/graph_creator.py:43-88, graph.py:58-134).
 *
 *  - edges referencing a missing endpoint are dropped (reference skips
 *    them with a warning, graph.py:92-98) — expressed as two left-semi
 *    joins against the node set; drop counts surface via `danglingCount`.
 *  - bidirectional relationships materialize a reverse row with id suffix
 *    `_reverse`, exactly as graph.py:116-129.
 *  - duplicate (srcId, relType, dstId) edges collapse keeping the max
 *    confidence row (deterministic tiebreak by id).
 */
object GraphBuilder {

  final case class Graph(nodes: Dataset[Entity], edges: Dataset[Triple])

  def build(entities: Dataset[Entity], triples: Dataset[Triple]): Graph = {
    val spark = entities.sparkSession
    import spark.implicits._

    val nodeIds = entities.select($"id").distinct()

    // endpoint existence: two semi-joins (the inverse of verifier V2)
    val valid = triples.toDF()
      .join(nodeIds.withColumnRenamed("id", "srcId"), Seq("srcId"), "left_semi")
      .join(nodeIds.withColumnRenamed("id", "dstId"), Seq("dstId"), "left_semi")

    // keep-max dedup per (srcId, relType, dstId): max_by(struct) aggregate
    // — a single hash aggregate with map-side partial combine; a window
    // row_number would sort every partition instead. Column ops only (a
    // typed filter/map here deserializes every Triple object — measured
    // as the pipeline's biggest stage cost).
    val cols = valid.columns
    val deduped = valid
      .groupBy("srcId", "relType", "dstId")
      .agg(min_by(struct(cols.map(col): _*),
        struct((-col("confidence")).as("nc"), col("id").as("tid"))).as("row"))
      .select(col("row.*"))

    // bidirectional expansion (graph.py:116-129)
    val reversed = deduped.where(col("bidirectional"))
      .withColumn("id", concat(col("id"), lit("_reverse")))
      .withColumn("tmpS", col("srcId")).withColumn("tmpSN", col("srcName"))
      .withColumn("srcId", col("dstId")).withColumn("srcName", col("dstName"))
      .withColumn("dstId", col("tmpS")).withColumn("dstName", col("tmpSN"))
      .drop("tmpS", "tmpSN")
    Graph(entities,
      deduped.select(cols.map(col): _*).union(reversed.select(cols.map(col): _*)).as[Triple])
  }

  /** Count of dropped dangling edges (for the metrics table). */
  def danglingCount(entities: Dataset[Entity], triples: Dataset[Triple]): Long = {
    val nodeIds = entities.select(col("id")).distinct()
    triples.toDF()
      .join(nodeIds.withColumnRenamed("id", "srcId"), Seq("srcId"), "left_anti")
      .union(
        triples.toDF()
          .join(nodeIds.withColumnRenamed("id", "srcId"), Seq("srcId"), "left_semi")
          .join(nodeIds.withColumnRenamed("id", "dstId"), Seq("dstId"), "left_anti"))
      .count()
  }

  /** G5 remove entity with cascade delete of touching edges
    * (graph.py:136-164) — anti-join form for batch removal.
    */
  def removeEntities(g: Graph, ids: Seq[String]): Graph = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val idDf = broadcast(ids.toDF("rmId"))
    val nodes = g.nodes.join(idDf, g.nodes("id") === col("rmId"), "left_anti").as[Entity]
    val edges = g.edges
      .join(idDf, g.edges("srcId") === col("rmId"), "left_anti")
      .join(idDf, col("dstId") === col("rmId"), "left_anti")
      .as[Triple]
    Graph(nodes, edges)
  }

  /** G4 graph stats: counts by type + density (reference graph.py:483-524;
    * clustering/avg-path deferred exactly as the reference try/excepts them).
    */
  def stats(g: Graph): DataFrame = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val n = g.nodes.count().toDouble
    val e = g.edges.count().toDouble
    val density = if (n > 1) e / (n * (n - 1)) else 0.0
    val byEType = g.nodes.groupBy($"entityType").count()
      .select(concat(lit("entity:"), $"entityType").as("key"), $"count".cast("double").as("value"))
    val byRType = g.edges.groupBy($"relType").count()
      .select(concat(lit("rel:"), $"relType").as("key"), $"count".cast("double").as("value"))
    val scalars = Seq(
      ("nodes", n), ("edges", e), ("density", density)
    ).toDF("key", "value")
    scalars.union(byEType).union(byRType)
  }
}
