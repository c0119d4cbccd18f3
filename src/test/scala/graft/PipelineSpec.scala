package graft

import graft.corpus.CorpusGen
import graft.link.Similarity
import graft.model.Ids
import graft.pipeline.KgPipeline

class SimilaritySpec extends SparkSpec {
  test("ratio matches difflib semantics on known pairs") {
    // difflib.SequenceMatcher(None,'abcd','bcde').ratio() == 0.75
    assert(math.abs(Similarity.ratio("abcd", "bcde") - 0.75) < 1e-9)
    assert(Similarity.ratio("", "") == 1.0)
    assert(Similarity.ratio("same", "same") == 1.0)
    // 'knowledgegraph' vs 'knowledge_graph': 2*14/29
    assert(math.abs(Similarity.ratio("knowledgegraph", "knowledge_graph") - 28.0 / 29) < 1e-9)
  }
  test("acronym rule links KG to KnowledgeGraph and knowledge_graph") {
    assert(Similarity.isAcronymOf("KG", "KnowledgeGraph"))
    assert(Similarity.isAcronymOf("KG", "knowledge_graph"))
    assert(!Similarity.isAcronymOf("KG", "Keg"))
    assert(Similarity.score("KG", "KnowledgeGraph") == 1.0)
    assert(Similarity.score("KnowledgeGraph", "knowledge_graph") >= 0.7)
  }
}

class CorpusSpec extends SparkSpec {
  test("corpus is deterministic across parallelism levels") {
    import spark.implicits._
    val a = CorpusGen.generate(spark, 200).repartition(1)
      .map(f => f.repo + "|" + f.path + "|" + Ids.contentSha(f.content))
      .collect().sorted.toSeq
    val b = CorpusGen.generate(spark, 200).repartition(7)
      .map(f => f.repo + "|" + f.path + "|" + Ids.contentSha(f.content))
      .collect().sorted.toSeq
    assert(a == b)
  }
  test("mega-repo skew is planted (repos 0+1 hold ~30%)") {
    import spark.implicits._
    val byRepo = CorpusGen.generate(spark, 2000)
      .groupByKey(_.repo).count().collect().toMap
    val hot = byRepo.getOrElse("org/repo-000000", 0L) + byRepo.getOrElse("org/repo-000001", 0L)
    assert(hot > 400 && hot < 800, s"hot=$hot")
  }
}

class PipelineSpec extends SparkSpec {
  // shared across tests: one pipeline run on 300 synthetic files
  lazy val res: KgPipeline.Result = KgPipeline.runSynthetic(spark, 300)

  test("end-to-end: planted facts appear in the triple set") {
    import spark.implicits._
    val triples = res.tripleSet.as[(String, String, String)].collect().toSet

    // planted is-a cycle (i % 101 ∈ {11,12,13} exists for n=300)
    assert(triples.contains(("CycleA", "is-a", "CycleB")))
    assert(triples.contains(("CycleB", "is-a", "CycleC")))
    assert(triples.contains(("CycleC", "is-a", "CycleA")))
    // planted contradiction
    assert(triples.contains(("Smoking", "causes", "Cancer")))
    assert(triples.contains(("Smoking", "prevents", "Cancer")))
    // structural facts: every file declares its class and extends Base
    assert(triples.exists { case (s, r, o) => r == "is-a" && s.startsWith("Class") && o.startsWith("Base") })
    assert(triples.exists { case (_, r, o) => r == "imports" && o.startsWith("lib") })
    assert(triples.exists { case (_, r, _) => r == "defines" })
    assert(triples.exists { case (_, r, _) => r == "calls" })
  }

  test("alias family KnowledgeGraph/knowledge_graph/KG canonicalizes to one entity") {
    val kgNodes = res.graph.nodes
      .filter(e => graft.link.Linker.squash(e.name) == "knowledgegraph" || e.name.toLowerCase == "kg")
      .collect()
    assert(kgNodes.length == 1, s"expected 1 canonical KG entity, got ${kgNodes.map(_.name).mkString(",")}")
  }

  test("pipeline is idempotent: same triple set at different parallelism") {
    import spark.implicits._
    val t1 = KgPipeline.runSynthetic(spark, 120).tripleSet
      .as[(String, String, String)].collect().toSet
    val t2 = KgPipeline.runSynthetic(spark, 120).tripleSet
      .as[(String, String, String)].collect().toSet
    assert(t1 == t2)
    assert(t1.nonEmpty)
  }

  test("content sha invariant: segments carry parent file sha") {
    import spark.implicits._
    val files = CorpusGen.generate(spark, 50)
    val segs = graft.segment.CodeSegmenter.segment(files)
    val fileShas = files.map(f => (f.repo + "|" + f.path, Ids.contentSha(f.content))).collect().toMap
    val bad = segs.map(s => (s.repo + "|" + s.path, s.contentSha)).collect()
      .count { case (k, sha) => fileShas(k) != sha }
    assert(bad == 0)
  }

  test("segment offsets reconstruct the exact text") {
    import spark.implicits._
    val files = CorpusGen.generate(spark, 30).collect()
    files.foreach { f =>
      graft.segment.CodeSegmenter.segmentFile(f).foreach { s =>
        assert(f.content.substring(s.start.toInt, s.end.toInt) == s.text)
      }
    }
  }
}
