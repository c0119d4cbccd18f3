package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * The driver-facing query catalog: each entry exercises one operator
 * family from SURVEY.md §2 (or a training-data-pipeline op) over the
 * shared /root/testdata parquet tables, with a DuckDB-equivalent oracle in
 * `Queries.oracles` where SQL-expressible.
 *
 * Determinism rules (driver hash-compares values after sorting columns by
 * name): money aggregates are summed as DECIMAL(18,2) (exact, order-
 * independent — double sums are not), floating scores are rounded, and
 * every query's output is fully ordered or orderless (a bag of rows).
 */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- scans/aggs

  /** E3/G4-style hash aggregate with partial (map-side) combine. */
  val q01_agg: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).as("sum_price"),
        count(lit(1)).as("cnt"))

  /** Filter + projection, pushed to the parquet scan (predicate pushdown). */
  val q02_filter_project: Q = (s, d) =>
    t(s, d, "lineitem")
      .where(col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05)
      .select(col("l_orderkey"), col("l_partkey"), dec(col("l_extendedprice")).as("price"))

  // ---------------------------------------------------------------- joins

  /** R2-style broadcast equi-join (small dim side broadcast). */
  val q03_broadcast_join: Q = (s, d) =>
    t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n_customers"),
        sum(dec(col("c_acctbal"))).as("total_bal"))

  /** V2 dangling-reference analog: anti join (customers with no
    * high-value order).
    */
  val q04_anti_join: Q = (s, d) =>
    t(s, d, "customer")
      .join(t(s, d, "orders").where(col("o_totalprice") > 150000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** Q6 induced-subgraph analog: semi join. */
  val q05_semi_join: Q = (s, d) =>
    t(s, d, "part")
      .join(t(s, d, "lineitem"), col("p_partkey") === col("l_partkey"), "left_semi")
      .select("p_partkey", "p_name")

  /** V3/X4 contradiction analog: self equi-join on (grouping key), pairs. */
  val q06_self_join_pairs: Q = (s, d) => {
    val li = t(s, d, "lineitem").select("l_orderkey", "l_suppkey").distinct()
    val a = li.select(col("l_orderkey"), col("l_suppkey").as("supp_a"))
    val b = li.select(col("l_orderkey"), col("l_suppkey").as("supp_b"))
    a.join(b, Seq("l_orderkey"))
      .where(col("supp_a") < col("supp_b"))
      .groupBy("supp_a", "supp_b").agg(count(lit(1)).as("n_shared_orders"))
  }

  // ---------------------------------------------------------------- window/topk

  /** X8 keep-max dedup: window ranking, keep best row per group. */
  val q07_keepmax_window: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    t(s, d, "orders")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), dec(col("o_totalprice")).as("best_price"))
  }

  /** Q9 top-k by degree: explode endpoints → count → TakeOrderedAndProject. */
  val q08_degree_topk: Q = (s, d) => {
    val cust = t(s, d, "customer").select(col("c_nationkey").cast("int").as("nk"))
    val supp = t(s, d, "supplier").select(col("s_nationkey").cast("int").as("nk"))
    cust.union(supp).groupBy("nk").agg(count(lit(1)).as("degree"))
      .orderBy(desc("degree"), asc("nk")).limit(10)
  }

  /** Q3 fixed-depth traversal: 2-hop join chain customer→nation→region. */
  val q09_traverse_2hop: Q = (s, d) =>
    t(s, d, "customer")
      .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name").agg(count(lit(1)).as("n_customers"))

  // ---------------------------------------------------------------- text ops

  /** T9 token counting (whitespace tokenization). */
  val q10_token_count: Q = (s, d) =>
    t(s, d, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"),
        length(col("text")).as("n_chars_computed"))

  /** E3 corpus-level term aggregation: explode(split) → groupBy → count. */
  val q11_term_freq: Q = (s, d) =>
    t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("freq"))

  /** Exact dedup: hash-groupBy on md5(text) (training-data dedup op #1). */
  val q12_exact_dedup: Q = (s, d) =>
    t(s, d, "documents")
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_doc_id"))

  /** Text quality scoring: length/word/stopword ratios (training-data op). */
  val q13_quality_score: Q = (s, d) => {
    val stop = Array("the", "a", "of", "and", "to", "in")
    t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"), col("n_chars"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(filter(col("toks"), c => c.isin(stop.map(x => lit(x): Any): _*))).as("n_stopwords"),
        col("n_chars"))
  }

  /** Q5 regex text search over documents. */
  val q14_regex_search: Q = (s, d) =>
    t(s, d, "documents")
      .where(col("text").rlike("spark.*join|join.*spark"))
      .select("doc_id", "lang")

  /** S5 language gate: supported-language filter + counts. */
  val q15_lang_gate: Q = (s, d) =>
    t(s, d, "documents")
      .where(col("lang").isin("en", "es", "de"))
      .groupBy("lang").agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))

  // ---------------------------------------------------------------- embeddings

  /** Brute-force cosine top-k ANN baseline (training-data op). Query
    * vector = vec_id 0; returns 10 nearest others. zip_with+aggregate
    * keeps the dot product inside codegen'd higher-order functions.
    */
  val q16_ann_brute: Q = (s, d) => {
    val emb = t(s, d, "embeddings")
    val qv = emb.where(col("vec_id") === 0)
      .select(col("embedding").as("q"))
    val joined = emb.where(col("vec_id") =!= 0).crossJoin(broadcast(qv))
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y.cast("double")), lit(0.0), (acc, x) => acc + x)
    joined
      .select(col("vec_id"), col("label"),
        round(dot(col("embedding").cast("array<double>"), col("q")) /
          (sqrt(dot(col("embedding").cast("array<double>"), col("embedding").cast("array<double>"))) *
           sqrt(dot(col("q").cast("array<double>"), col("q").cast("array<double>")))), 4).as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("vec_id")).limit(10)
  }

  /** Events sessionization-lite: per-user event counts + value sums by type
    * (window/agg over the events table).
    */
  val q17_events_agg: Q = (s, d) =>
    t(s, d, "events")
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_events"), sum(dec(col("value"))).as("total_value"))

  /** Set op: except — nations with no well-capitalized supplier. */
  val q18_set_ops: Q = (s, d) => {
    val nk = t(s, d, "nation").select(col("n_nationkey").cast("int").as("nk"))
    val sn = t(s, d, "supplier").where(col("s_acctbal") > 7000)
      .select(col("s_nationkey").cast("int").as("nk")).distinct()
    nk.except(sn)
  }

  // ---------------------------------------------------------------- catalog

  val all: Map[String, Q] = Map(
    "q01_agg" -> q01_agg,
    "q02_filter_project" -> q02_filter_project,
    "q03_broadcast_join" -> q03_broadcast_join,
    "q04_anti_join" -> q04_anti_join,
    "q05_semi_join" -> q05_semi_join,
    "q06_self_join_pairs" -> q06_self_join_pairs,
    "q07_keepmax_window" -> q07_keepmax_window,
    "q08_degree_topk" -> q08_degree_topk,
    "q09_traverse_2hop" -> q09_traverse_2hop,
    "q10_token_count" -> q10_token_count,
    "q11_term_freq" -> q11_term_freq,
    "q12_exact_dedup" -> q12_exact_dedup,
    "q13_quality_score" -> q13_quality_score,
    "q14_regex_search" -> q14_regex_search,
    "q15_lang_gate" -> q15_lang_gate,
    "q16_ann_brute" -> q16_ann_brute,
    "q17_events_agg" -> q17_events_agg,
    "q18_set_ops" -> q18_set_ops,
    // engine-native (no SQL oracle → rows-only driver check)
    "kg_tripleset" -> ((s, _) => pipeline.KgPipeline.runSynthetic(s, 400).tripleSet),
    "kg_stats" -> ((s, _) => {
      val r = pipeline.KgPipeline.runSynthetic(s, 200)
      graphout.GraphBuilder.stats(r.graph)
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_price,
        |count(*) AS cnt FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_partkey, CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount >= 0.05""".stripMargin,
    "q03_broadcast_join" ->
      """SELECT n_name, count(*) AS n_customers,
        |sum(CAST(c_acctbal AS DECIMAL(18,2))) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY 1""".stripMargin,
    "q04_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 150000)""".stripMargin,
    "q05_semi_join" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""".stripMargin,
    "q06_self_join_pairs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
        |SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b, count(*) AS n_shared_orders
        |FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        |GROUP BY 1, 2""".stripMargin,
    "q07_keepmax_window" ->
      """SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS best_price
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders) WHERE rn = 1""".stripMargin,
    "q08_degree_topk" ->
      """SELECT nk, count(*) AS degree FROM (
        |  SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        |  UNION ALL SELECT CAST(s_nationkey AS INT) AS nk FROM supplier)
        |GROUP BY 1 ORDER BY degree DESC, nk ASC LIMIT 10""".stripMargin,
    "q09_traverse_2hop" ->
      """SELECT r_name, count(*) AS n_customers FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey GROUP BY 1""".stripMargin,
    "q10_token_count" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |length(text) AS n_chars_computed FROM documents""".stripMargin,
    "q11_term_freq" ->
      """SELECT term, count(*) AS freq FROM (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |WHERE length(term) > 0 GROUP BY 1""".stripMargin,
    "q12_exact_dedup" ->
      """SELECT md5(text) AS text_hash, count(*) AS n_copies,
        |min(doc_id) AS keeper_doc_id FROM documents GROUP BY 1""".stripMargin,
    "q13_quality_score" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |len(list_filter(string_split(text, ' '),
        |  t -> t IN ('the','a','of','and','to','in'))) AS n_stopwords,
        |n_chars FROM documents""".stripMargin,
    "q14_regex_search" ->
      """SELECT doc_id, lang FROM documents
        |WHERE regexp_matches(text, 'spark.*join|join.*spark')""".stripMargin,
    "q15_lang_gate" ->
      """SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars
        |FROM documents WHERE lang IN ('en','es','de') GROUP BY 1""".stripMargin,
    "q16_ann_brute" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, label,
        |round(list_dot_product(embedding, qe) /
        |  (sqrt(list_dot_product(embedding, embedding)) * sqrt(list_dot_product(qe, qe))), 4) AS cos_sim
        |FROM embeddings, q WHERE vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "q17_events_agg" ->
      """SELECT user_id, event_type, count(*) AS n_events,
        |sum(CAST(value AS DECIMAL(18,2))) AS total_value FROM events GROUP BY 1, 2""".stripMargin,
    "q18_set_ops" ->
      """SELECT CAST(n_nationkey AS INT) AS nk FROM nation
        |EXCEPT SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        |WHERE s_acctbal > 7000""".stripMargin
  )
}
