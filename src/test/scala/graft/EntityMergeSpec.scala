package graft

import graft.corpus.CorpusGen
import graft.extract.Extractor
import graft.link.EntityMerge
import graft.segment.CodeSegmenter

class EntityMergeSpec extends SparkSpec {

  test("attribute conflict lists round-trip values containing commas/quotes") {
    import graft.model.Entity
    def e(conf: Double, seg: String, attrs: Map[String, String]) =
      Entity("id1", "N", "t", None, attrs, conf, seg, "", "", "")
    // scalar→list-on-conflict (entity.py:66-72) with a comma-bearing value:
    // a bare split(",") would shred "a,b" into corrupt fragments
    val m1 = EntityMerge.merge2(
      e(1.0, "s1", Map("k" -> "a,b")), e(0.9, "s2", Map("k" -> "c")))
    assert(m1.attributes("k") == "[\"a,b\",\"c\"]", m1.attributes("k"))
    // merging the list with a third value keeps elements intact
    val m2 = EntityMerge.merge2(m1, e(0.8, "s3", Map("k" -> "d\"x")))
    assert(m2.attributes("k") == "[\"a,b\",\"c\",\"d\\\"x\"]", m2.attributes("k"))
    // associativity under a different fold order
    val alt = EntityMerge.merge2(
      e(1.0, "s1", Map("k" -> "a,b")),
      EntityMerge.merge2(e(0.9, "s2", Map("k" -> "c")), e(0.8, "s3", Map("k" -> "d\"x"))))
    assert(alt.attributes("k") == m2.attributes("k"))
  }

  test("fast SQL dedup ≡ typed Aggregator dedup on extractor output") {
    import spark.implicits._
    val segs = CodeSegmenter.windows(CorpusGen.generate(spark, 200))
    val (mentions, _) = Extractor.extract(segs)
    val slow = EntityMerge.dedupeMentions(mentions).collect()
      .map(e => e.id -> e).toMap
    val fast = EntityMerge.dedupeMentionsFast(mentions).collect()
      .map(e => e.id -> e).toMap
    assert(slow.keySet == fast.keySet)
    for ((id, s) <- slow) {
      val f = fast(id)
      assert(s.name == f.name, s"name mismatch for ${s.name}")
      assert(s.confidence == f.confidence)
      assert(s.entityType == f.entityType)
      assert(s.context == f.context, s"context mismatch for ${s.name}: ${s.context} vs ${f.context}")
      assert(s.segId == f.segId && s.repo == f.repo && s.path == f.path)
    }
  }
}
