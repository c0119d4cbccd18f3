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

  test("markdown headers open section segments: file → section → paragraph (T4 hierarchy)") {
    import spark.implicits._
    val md = "# Intro\n\nFirst paragraph of intro.\n\nSecond paragraph.\n\n" +
      "## Details\n\nDetail paragraph one.\n"
    val f = graft.model.CodeFile("org/r", "docs/d.md", "d" * 40, "en", md)
    val segs = graft.segment.CodeSegmenter.segment(Seq(f).toDS()).collect()
    // exact offsets hold for every level
    segs.foreach(s => assert(md.substring(s.start.toInt, s.end.toInt) == s.text))
    val sections = segs.filter(_.segType == "section")
    assert(sections.map(_.title.get).toSet == Set("Intro", "Details"))
    assert(sections.forall(_.level == 1))
    val intro = sections.find(_.title.contains("Intro")).get
    val paras = segs.filter(_.segType == "paragraph")
    assert(paras.forall(_.level == 2))
    // heading line + two body paragraphs — children cover the FULL
    // section span so heading mentions stay on the extraction surface
    assert(paras.count(_.parentId.contains(intro.segId)) == 3)
    // root parents the sections
    val root = segs.find(_.level == 0).get
    assert(sections.forall(_.parentId.contains(root.segId)))
    // extraction surface stays leaf-only: no section rows, no double
    // text, and the heading text IS on it
    val w = graft.segment.CodeSegmenter.windows(Seq(f).toDS()).collect()
    assert(w.forall(s => s.segType != "section" && s.level > 0))
    assert(w.map(_.text).mkString.length < md.length)
    assert(w.exists(_.text.contains("# Intro")))
    // heading-only section: single child with the SAME span must not
    // collide ids with its container (section ids are marker-derived)
    val only = graft.segment.CodeSegmenter.segment(
      Seq(graft.model.CodeFile("org/r", "docs/h.md", "e" * 40, "en", "# Lone\n")).toDS())
      .collect()
    val sec = only.find(_.segType == "section").get
    val kid = only.find(_.segType == "paragraph").get
    assert(sec.segId != kid.segId && kid.parentId.contains(sec.segId))
    // nested export nests paragraphs under their section
    val json = graft.graphout.TreeExport.segmentHierarchyJson(
      graft.segment.CodeSegmenter.segment(Seq(f).toDS()))
    val roots = parse(json).head()
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("segments")
    assert(roots.size == 1)
    val secRows = roots.head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("children")
    assert(secRows.map(_.getAs[String]("segment_type")).forall(_ == "section"))
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
