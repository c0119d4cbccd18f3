package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Fixture generator for the kg_tripleset DuckDB oracle (round-4 verdict
 * item 5): dumps the independent closed-form expected triple set for the
 * 400-file synthetic corpus to a committed parquet fixture the driver's
 * DuckDB reads via read_parquet(). Also prints the exact diff between the
 * pipeline's triple set and the closed form, so any non-exactness is
 * enumerated (not just summarized as P/R) before the oracle is enabled.
 *
 * Run: sbt 'runMain graft.tools.FixtureGen'
 */
object FixtureGen {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "tools/fixtures"
    val spark = graft.runtime.Sessions
      .configure(SparkSession.builder().master("local[8]"), shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val expected = graft.corpus.ClosedFormTriples.expectedSet(400L)
    val res = graft.pipeline.KgPipeline.runSynthetic(spark, 400)
    val actual = res.tripleSet.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

    val missing = expected -- actual
    val extra = actual -- expected
    println(s"[fixturegen] expected=${expected.size} actual=${actual.size} " +
      s"missing=${missing.size} extra=${extra.size}")
    missing.take(10).foreach(t => println(s"[fixturegen] MISSING $t"))
    extra.take(10).foreach(t => println(s"[fixturegen] EXTRA   $t"))

    // the coref-canonicalized expectation must be EXACT (hash-oracle-able)
    val canon = graft.corpus.ClosedFormTriples.canonicalizedExpectedSet(400L)
    val cMissing = canon -- actual
    val cExtra = actual -- canon
    println(s"[fixturegen] canonicalized: expected=${canon.size} " +
      s"missing=${cMissing.size} extra=${cExtra.size}")
    cMissing.take(10).foreach(t => println(s"[fixturegen] C-MISSING $t"))
    cExtra.take(10).foreach(t => println(s"[fixturegen] C-EXTRA   $t"))
    require(cMissing.isEmpty && cExtra.isEmpty,
      "canonicalized closed form does not match the pipeline exactly; " +
        "fix the divergence before committing the oracle fixture")

    // deterministic single-FILE fixture with a stable name (no per-run
    // UUID part files churning in git), sorted for a stable byte layout
    val tmp = java.nio.file.Files.createTempDirectory("graft_fixture").toString
    canon.toSeq.sorted.toDF("subjName", "relType", "objName")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    val dst = java.nio.file.Paths.get(s"$out/closed_form_triples_400.parquet")
    java.nio.file.Files.createDirectories(dst.getParent)
    java.nio.file.Files.copy(part, dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"[fixturegen] wrote $dst")
    spark.stop()
  }
}
