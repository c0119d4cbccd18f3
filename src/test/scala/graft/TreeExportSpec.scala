package graft

import graft.graphout.TreeExport

/** Nested-export shapes vs the reference: traversal tree
  * (graph_query.py:110-177) and the committed segments.json node schema
  * (id, text, segment_type, level, title, parent_id, position, metadata,
  * children).
  */
class TreeExportSpec extends SparkSpec {

  private def parse(json: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.read.option("mode", "FAILFAST").json(Seq(json).toDS)
  }

  test("traverse tree nests children under relationship/direction/child keys") {
    val g = Fixtures.queryGraph(spark)
    val json = TreeExport.traverseTreeJson(g, "alice", maxDepth = 2)
    val df = parse(json)
    val top = df.schema.fieldNames.toSet
    assert(top == Set("entity", "children"), top.toString)
    val row = df.head()
    assert(row.getAs[String]("entity") == "alice")
    val children = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("children")
    assert(children.nonEmpty)
    val childFields = children.head.schema.fieldNames.toSet
    assert(childFields == Set("relationship", "rel_type", "direction", "child"), childFields.toString)
    children.foreach { c =>
      assert(c.getAs[String]("direction") == "outgoing")
      val sub = c.getAs[org.apache.spark.sql.Row]("child")
      assert(sub.schema.fieldNames.contains("entity"))
    }
    // deterministic: same call, same string
    assert(json == TreeExport.traverseTreeJson(g, "alice", maxDepth = 2))
  }

  test("segment hierarchy matches the reference segments.json node schema") {
    import spark.implicits._
    val f = graft.model.CodeFile("org/r", "src/T.scala", "c" * 40, "scala",
      "package p\nclass A extends Base {\n  fn1(x)\n  fn2(y)\n}\n\n" +
        "class B extends Base {\n  fn3(z)\n}\n")
    val segs = graft.segment.CodeSegmenter.segment(Seq(f).toDS())
    val json = TreeExport.segmentHierarchyJson(segs)
    val df = parse(json)
    assert(df.schema.fieldNames.toSet == Set("segments"))
    val roots = df.head().getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("segments")
    assert(roots.nonEmpty)
    val keys = roots.head.schema.fieldNames.toSet
    // the committed reference segments.json node keys (position nested)
    assert(Set("id", "text", "segment_type", "level", "title", "parent_id",
      "position", "metadata", "children").subsetOf(keys), keys.toString)
    val pos = roots.head.getAs[org.apache.spark.sql.Row]("position")
    assert(pos.schema.fieldNames.toSet == Set("start", "end"))
    // children's parent_id points at the enclosing node
    roots.foreach { r =>
      val id = r.getAs[String]("id")
      val kids = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("children")
      Option(kids).getOrElse(Nil).foreach { k =>
        assert(k.getAs[String]("parent_id") == id,
          s"child ${k.getAs[String]("id")} parent ${k.getAs[String]("parent_id")} != $id")
      }
    }
    // every segment appears exactly once across the forest
    def count(rows: Seq[org.apache.spark.sql.Row]): Int =
      rows.map(r => 1 + count(Option(
        r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("children"))
        .getOrElse(Nil).toSeq)).sum
    assert(count(roots.toSeq) == segs.count())
  }
}
