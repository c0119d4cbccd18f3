package graft

import graft.functions.SimilarityScore
import graft.runtime.Skew
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions: the optimizations the engine relies on
  * must actually appear in `explain` output (pushdown regressions are
  * silent otherwise), plus specs for the custom expression and salting.
  */
class PlanSpec extends SparkSpec {
  val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters are pushed to the parquet scan (q02)") {
    val p = plan(Queries.q02_filter_project(spark, dir))
    assert(p.contains("PushedFilters") && p.contains("l_discount"), p.take(800))
  }

  test("projection pruning: scan reads only needed columns (q02)") {
    val p = plan(Queries.q02_filter_project(spark, dir))
    val readSchema = p.split("ReadSchema:")(1).split("\n")(0)
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"),
      readSchema)
    assert(readSchema.contains("l_orderkey"))
  }

  test("small dim join broadcasts (q03)") {
    val p = plan(Queries.q03_broadcast_join(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("aggregates are hash-based with map-side partial aggregation (q01)") {
    val p = plan(Queries.q01_agg(spark, dir))
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_sum"), p.take(800)) // map-side combine before the exchange
    // whole-stage codegen boundaries only materialize in the final AQE
    // plan; force execution and check the final plan has codegen spans
    val df = Queries.q01_agg(spark, dir)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark whole-stage-codegen spans in the final plan
    assert("\\*\\(\\d+\\)".r.findFirstIn(finalPlan).isDefined, finalPlan.take(800))
  }

  test("mention dedup is a hash aggregate, not object/sort aggregation") {
    import spark.implicits._
    val segs = graft.segment.CodeSegmenter.windows(graft.corpus.CorpusGen.generate(spark, 50))
    val (mentions, _) = graft.extract.Extractor.extract(segs)
    val p = plan(graft.link.EntityMerge.dedupeMentionsFast(mentions).toDF())
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"))
    assert(!p.contains("SortAggregate"), p.take(1200))
  }

  test("SimilarityScore expression evaluates and registers for SQL") {
    import spark.implicits._
    val df = Seq(("KnowledgeGraph", "knowledge_graph"), ("KG", "KnowledgeGraph"),
      ("alpha", "omega")).toDF("a", "b")
    val out = df.select(SimilarityScore(col("a"), col("b")).as("s"))
      .collect().map(_.getDouble(0))
    assert(out(0) >= 0.9 && out(1) == 1.0 && out(2) < 0.5)

    // SQL registration via extensions-style injection on the live session
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_similarity",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.SimilarityScore(children(0), children(1)),
      "scala_udf")
    val viaSql = spark.sql("SELECT graft_similarity('KG', 'KnowledgeGraph')")
      .head().getDouble(0)
    assert(viaSql == 1.0)
  }

  test("salted join equals unsalted join; salted count equals plain count") {
    import spark.implicits._
    val big = (1 to 1000).map(i => (if (i % 3 == 0) "hot" else s"k$i", i))
      .toDF("key", "v")
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "label")
    val plainJoin = big.join(dim, Seq("key")).count()
    val salted = Skew.saltedJoin(big, dim, Seq("key"), "v", nSalts = 8).count()
    assert(salted == plainJoin)

    val plainCount = big.groupBy("key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val saltedCnt = Skew.saltedCount(big, Seq("key"), "v", nSalts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(saltedCnt == plainCount)
  }
}
