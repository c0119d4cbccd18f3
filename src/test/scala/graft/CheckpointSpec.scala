package graft

import java.nio.file.{Files, Paths}
import graft.pipeline.CheckpointedPipeline

class CheckpointSpec extends SparkSpec {

  test("checkpointed run commits all stages with manifests and resumes without recompute") {
    import spark.implicits._
    val root = Files.createTempDirectory("ckpt").toString

    val t0 = System.nanoTime()
    val first = CheckpointedPipeline.run(spark, root, 150).count()
    val firstSec = (System.nanoTime() - t0) / 1e9
    assert(first > 0)

    // every stage committed with a manifest carrying rows + lineage
    val cp = new graft.runtime.Checkpoint(spark, root)
    val manifests = cp.manifests()
    assert(manifests.size == 11, s"expected 11 stage manifests, got ${manifests.size}")
    // error side-output stage committed with zero failures on this corpus
    assert(manifests.exists(m => m.contains("\"02_errors\"") && m.contains("\"rows\":0")))
    assert(manifests.forall(_.contains("\"rows\":")))
    assert(manifests.exists(m => m.contains("08_triple_set") && m.contains("07_edges")))
    // single-pass extraction: mentions/triples derive from 02_extracted
    assert(manifests.exists(m => m.contains("\"02_mentions\"") && m.contains("02_extracted")))
    assert(manifests.exists(m => m.contains("\"03_triples\"") && m.contains("02_extracted")))
    // observed cap counters are part of the lineage record
    assert(manifests.forall(_.contains("\"observed\":")))

    // resume: a second run must read committed outputs (much faster, same rows)
    val t1 = System.nanoTime()
    val second = CheckpointedPipeline.run(spark, root, 150).count()
    val secondSec = (System.nanoTime() - t1) / 1e9
    assert(second == first)
    assert(secondSec < firstSec / 2, f"resume took $secondSec%.1fs vs fresh $firstSec%.1fs")
  }

  test("a killed run resumes from the last committed stage") {
    val root = Files.createTempDirectory("ckpt2").toString
    // simulate a partial run: commit only the first two stages
    val cp = new graft.runtime.Checkpoint(spark, root)
    import spark.implicits._
    cp.runStage("00_corpus", Nil) {
      graft.corpus.CorpusGen.generate(spark, 80).toDF()
        .withColumn("content_sha", org.apache.spark.sql.functions.sha2(
          org.apache.spark.sql.functions.col("content"), 256))
    }
    assert(cp.isCommitted("00_corpus") && !cp.isCommitted("01_segments"))

    // full run picks up from the committed corpus (same seed ⇒ same rows)
    val out = CheckpointedPipeline.run(spark, root, 80)
    assert(out.count() > 0)
    assert(cp.isCommitted("08_triple_set"))

    // triple set equals an uncheckpointed run on the same corpus
    val expected = graft.pipeline.KgPipeline.runSynthetic(spark, 80)
      .tripleSet.as[(String, String, String)].collect().toSet
    val actual = out.as[(String, String, String)].collect().toSet
    assert(actual == expected)
  }
}
