package graft

import graft.corpus.CorpusGen
import graft.extract.Extractor
import graft.link.EntityMerge
import graft.segment.CodeSegmenter

class EntityMergeSpec extends SparkSpec {
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
