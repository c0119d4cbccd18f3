package graft.graphout

import org.apache.spark.sql.Dataset
import graft.graphout.GraphBuilder.Graph
import graft.model.Segment

/**
 * Export-time assembly of nested JSON trees — the one reference surface
 * that returned nested structures where the engine returns flat rows
 * (SURVEY.md §1 defers nesting to export time; this is that exporter).
 *
 *  - [[traverseTreeJson]]: the recursive traversal result of
 *    graph_query.py:110-177 — {"entity": id, "children":
 *    [{"relationship", "rel_type", "direction", "child": {...}}]} —
 *    assembled from the flat (parentId, relId, relType, direction,
 *    childId, depth) rows of [[graft.query.GraphQueryOps.traverse]].
 *  - [[segmentHierarchyJson]]: the segment hierarchy of
 *    segment.py:178-212 / the committed reference segments.json schema —
 *    {"segments": [{id, text, segment_type, level, title, parent_id,
 *    position{start,end}, metadata, children: [...]}]}.
 *
 * Both are DRIVER-side by design, exactly like the reference's recursive
 * builders: the input is a traversal result / one document's segment tree
 * (bounded by visited-once + maxDepth / per-document segment counts), not
 * the corpus. A maxNodes backstop with an observed drop counter keeps a
 * runaway input from OOMing the driver — no silent caps.
 */
object TreeExport {

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def js(s: String): String = "\"" + esc(s) + "\""
  private def jsOpt(s: Option[String]): String = s.map(js).getOrElse("null")

  /** Nested traversal tree (graph_query.py:110-177 result shape). */
  def traverseTreeJson(
      g: Graph,
      startId: String,
      maxDepth: Int = 3,
      direction: String = "outgoing",
      relTypes: Option[Seq[String]] = None,
      entityTypes: Option[Seq[String]] = None,
      maxNodes: Int = 10000): String = {
    val flat = graft.query.GraphQueryOps
      .traverse(g, startId, maxDepth, direction, relTypes, entityTypes)
    // deterministic shallow-first truncation: ordering by depth keeps a
    // complete depth-prefix, so a kept row's parent is always kept — the
    // cap can never orphan a subtree, and the same call yields the same
    // string (an unordered limit() keeps partition-order-dependent rows)
    val rows = flat
      .orderBy(org.apache.spark.sql.functions.col("depth"),
        org.apache.spark.sql.functions.col("parentId"),
        org.apache.spark.sql.functions.col("childId"))
      .limit(maxNodes + 1).collect()
    if (rows.length > maxNodes)
      graft.runtime.Observed.record("tree_export_cap",
        Map("truncatedAtNodes" -> maxNodes.toLong))
    val kept = rows.take(maxNodes)
    // visited-once traversal ⇒ each child appears exactly once ⇒ the flat
    // rows ARE a tree; children grouped by parent, ordered
    // deterministically by (relId, childId)
    val byParent = kept.groupBy(_.getAs[String]("parentId"))
    def build(id: String): String = {
      val children = byParent.getOrElse(id, Array.empty)
        .sortBy(r => (r.getAs[String]("relId"), r.getAs[String]("childId")))
        .map { r =>
          s"""{"relationship":${js(r.getAs[String]("relId"))},""" +
            s""""rel_type":${js(r.getAs[String]("relType"))},""" +
            s""""direction":${js(r.getAs[String]("direction"))},""" +
            s""""child":${build(r.getAs[String]("childId"))}}"""
        }
      s"""{"entity":${js(id)},"children":[${children.mkString(",")}]}"""
    }
    build(startId)
  }

  /** Segment hierarchy in the reference's committed segments.json node
    * schema (id, text, segment_type, level, title, parent_id,
    * position{start,end}, metadata, children), roots under "segments".
    * Children are ordered by (start, segId) — document order.
    */
  def segmentHierarchyJson(segments: Dataset[Segment], maxNodes: Int = 100000): String = {
    // deterministic cap (mirrors traverseTreeJson's depth-prefix order): an
    // unordered limit keeps partition-order-dependent rows, so the same
    // call could emit different JSON and keep children of dropped parents.
    // (level, start, segId) is a total order — parents (lower level, same
    // start) survive before their children.
    val rows = segments
      .orderBy(org.apache.spark.sql.functions.col("level"),
        org.apache.spark.sql.functions.col("start"),
        org.apache.spark.sql.functions.col("segId"))
      .limit(maxNodes + 1).collect()
    if (rows.length > maxNodes)
      graft.runtime.Observed.record("tree_export_cap",
        Map("truncatedAtNodes" -> maxNodes.toLong))
    val kept = rows.take(maxNodes)
    val byParent = kept.filter(_.parentId.isDefined).groupBy(_.parentId.get)
    // cycle guard: an IMPORTED segment table carries no acyclicity
    // guarantee — a parent_id loop must not hang the exporter; a depth
    // bound keeps a degenerate 10^5-deep parent chain from blowing the
    // stack (engine-built hierarchies are ≤ 4 levels)
    val maxTreeDepth = 1000
    var emitted = 0
    val onPath = scala.collection.mutable.Set.empty[String]
    def build(s: Segment): String = {
      emitted += 1
      onPath += s.segId
      val children =
        if (onPath.size >= maxTreeDepth) Array.empty[String]
        else byParent.getOrElse(s.segId, Array.empty)
          .filterNot(c => onPath.contains(c.segId))
          .sortBy(c => (c.start, c.segId)).map(build)
      onPath -= s.segId
      s"""{"id":${js(s.segId)},"text":${js(s.text)},""" +
        s""""segment_type":${js(s.segType)},"level":${s.level},""" +
        s""""title":${jsOpt(s.title)},"parent_id":${jsOpt(s.parentId)},""" +
        s""""position":{"start":${s.start},"end":${s.end}},""" +
        s""""metadata":{"repo":${js(s.repo)},"path":${js(s.path)},""" +
        s""""lang":${js(s.lang)},"content_sha":${js(s.contentSha)}},""" +
        s""""children":[${children.mkString(",")}]}"""
    }
    val roots = kept.filter(_.parentId.isEmpty).sortBy(s => (s.start, s.segId)).map(build)
    // no-silent-caps: nodes unreachable from any root (cycles with no
    // rootward path, depth-bound cutoffs) are counted, never dropped mute
    if (emitted < kept.length)
      graft.runtime.Observed.record("tree_export_orphans",
        Map("unreachableNodes" -> (kept.length - emitted).toLong))
    s"""{"segments":[${roots.mkString(",")}]}"""
  }
}
