package graft

import graft.corpus.CorpusGen
import graft.model.CodeFile
import graft.pipeline.KgPipeline

/**
 * The triple-set P/R harness (north rule: emitted (subj, pred, obj) set
 * must match the reference at P/R ≥ 0.95; FIXTURES.md §2).
 *
 * The expected set is computed in closed form by an INDEPENDENT
 * line-based parser over the generated corpus (no shared code with the
 * mapPartitions extractor's regex bank), so a regression in either the
 * segmenter (window boundaries dropping facts) or the extractor
 * (pattern drift) breaks P or R.
 */
class PRHarnessSpec extends SparkSpec {

  /** Independent fact extraction: plain line scans, no regex bank (shared
    * with the kg_tripleset driver entry's in-run invariant —
    * [[graft.corpus.ClosedFormTriples]]).
    */
  def expectedTriples(f: CodeFile): Seq[(String, String, String)] =
    graft.corpus.ClosedFormTriples.expectedTriples(f)

  test("triple-set precision and recall ≥ 0.95 vs the closed-form expected set") {
    import spark.implicits._
    val n = 600L
    val nRepos = math.max(8, math.sqrt(n.toDouble).toInt)
    val expected: Set[(String, String, String)] =
      (0L until n).flatMap(i => expectedTriples(CorpusGen.genFile(42L, i, nRepos))).toSet

    val actual: Set[(String, String, String)] =
      KgPipeline.runSynthetic(spark, n).tripleSet
        .as[(String, String, String)].collect().toSet

    val hit = (actual intersect expected).size.toDouble
    val precision = hit / actual.size
    val recall = hit / expected.size
    info(f"P=$precision%.4f R=$recall%.4f |expected|=${expected.size} |actual|=${actual.size}")
    // diagnostics on failure
    if (precision < 0.95) {
      (actual -- expected).take(10).foreach(t => info(s"  unexpected: $t"))
    }
    if (recall < 0.95) {
      (expected -- actual).take(10).foreach(t => info(s"  missing: $t"))
    }
    assert(precision >= 0.95, f"precision $precision%.4f < 0.95")
    assert(recall >= 0.95, f"recall $recall%.4f < 0.95")
  }

  test("segmentation does not lose facts at window boundaries (recall of a long file)") {
    import spark.implicits._
    // a file long enough for 3+ overlapping windows
    val longBody = (0 until 120).map(i => s"  fn$i(x)").mkString("\n")
    val f = CodeFile("org/r", "src/Long.scala", "c" * 40, "scala",
      s"package p\nclass Long0 extends Base0 {\n$longBody\n}\n")
    val segs = graft.segment.CodeSegmenter.windows(Seq(f).toDS())
    val (_, triples) = graft.extract.Extractor.extract(segs)
    val calls = triples.filter(_.relType == "calls").map(_.dstName).collect().toSet
    assert((0 until 120).forall(i => calls.contains(s"fn$i")))
  }
}
