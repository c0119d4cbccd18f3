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
    assert(manifests.size == 12, s"expected 12 stage manifests, got ${manifests.size}")
    // dual-sort-order edge copy committed bucketed on dstId (round-4
    // verdict item 2)
    assert(manifests.exists(m => m.contains("\"07_edges_bydst\"") &&
      m.contains("\"bucketedBy\":\"dstId\"")))
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

  test("per-partition commits: mid-stage kill resumes without recomputing committed buckets") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("ckpt3").toString
    val cp = new graft.runtime.Checkpoint(spark, root)
    val nB = 8
    def compute = graft.corpus.CorpusGen.generate(spark, 120).toDF()

    val full = cp.runStagePartitioned("00_corpus_p", Nil, "path", nB)(compute)
      .orderBy("path").collect().map(_.getAs[String]("path")).toSeq
    assert(full.size == 120)
    assert((0 until nB).forall(b => Files.exists(Paths.get(s"$root/00_corpus_p/_BUCKET_$b.json"))))

    // simulate a kill after 5 of 8 bucket commits: stage manifest and the
    // last 3 bucket commits never happened
    Files.delete(Paths.get(s"$root/00_corpus_p/_MANIFEST.json"))
    def rmr(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try { import scala.jdk.CollectionConverters._; s.iterator().asScala.toSeq.foreach(rmr) }
        finally s.close()
      }
      Files.deleteIfExists(p)
    }
    (5 until nB).foreach { b =>
      Files.delete(Paths.get(s"$root/00_corpus_p/_BUCKET_$b.json"))
      rmr(Paths.get(s"$root/00_corpus_p/data/bucket=$b"))
    }
    // survivors' data files must NOT be rewritten on resume — record mtimes
    def dataFiles(b: Int): Map[String, java.nio.file.attribute.FileTime] = {
      val dir = Paths.get(s"$root/00_corpus_p/data/bucket=$b")
      val s = Files.walk(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(p => p.toString.endsWith(".parquet"))
          .map(p => p.toString -> Files.getLastModifiedTime(p)).toMap
      } finally s.close()
    }
    val before = (0 until 5).map(dataFiles)

    val resumed = cp.runStagePartitioned("00_corpus_p", Nil, "path", nB)(compute)
      .orderBy("path").collect().map(_.getAs[String]("path")).toSeq
    assert(resumed == full)
    assert(cp.isCommitted("00_corpus_p"))
    val after = (0 until 5).map(dataFiles)
    assert(before == after, "committed buckets were rewritten on resume")
    // the stage manifest records how many buckets were resumed vs recomputed
    assert(Files.readString(Paths.get(s"$root/00_corpus_p/_MANIFEST.json"))
      .contains("\"resumedBuckets\":5"))
  }

  test("bucketed node/edge stages join exchange-free and re-register after a fresh-JVM resume") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("ckpt4").toString
    CheckpointedPipeline.run(spark, root, 100).count()
    val cp = new graft.runtime.Checkpoint(spark, root)
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val nodes = cp.readBucketed("05_nodes")
      val edges = cp.readBucketed("07_edges")
      // the 100 TB join: edges bucketed on srcId ⨝ nodes bucketed on id —
      // pre-partitioned AND pre-sorted, so the plan has NO Exchange and
      // (bucketed sortBy) no Sort on the scan sides
      val joined = edges.join(
        nodes.select(col("id").as("srcId"), col("name").as("subjName")), Seq("srcId"))
      assert(joined.count() > 0)
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p.take(2000))

      // fresh-JVM resume: the in-memory catalog forgets the table; drop it
      // and readBucketed must re-register over the committed files with
      // bucket metadata intact (join stays exchange-free)
      val spec = Files.readString(Paths.get(s"$root/05_nodes/_TABLE.json"))
      val table = "\"table\":\"([^\"]+)\"".r.findFirstMatchIn(spec).get.group(1)
      spark.sql(s"DROP TABLE $table")
      val again = cp.readBucketed("05_nodes")
      assert(again.count() == nodes.count())
      val j2 = edges.join(
        again.select(col("id").as("srcId"), col("name").as("subjName")), Seq("srcId"))
      assert(j2.count() > 0)
      assert(!j2.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
  }

  test("runStageBucketed resumes a stage committed by the pre-bucketed layout") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("ckpt5").toString
    val cp = new graft.runtime.Checkpoint(spark, root)
    import spark.implicits._
    // legacy commit: plain parquet + manifest, no _TABLE.json
    cp.runStage("05_nodes", Nil)(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    assert(!Files.exists(Paths.get(s"$root/05_nodes/_TABLE.json")))
    // the bucketed stage honors the committed data instead of crashing
    val out = cp.runStageBucketed("05_nodes", Nil, bucketCol = "id") {
      fail("must not recompute a committed stage"); null
    }
    assert(out.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
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
