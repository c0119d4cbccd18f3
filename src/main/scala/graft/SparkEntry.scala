package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The query catalog lives in [[graft.Queries]]; the KG engine itself is
  * under graft.{corpus,segment,extract,link,graphout,query,reason,pipeline}.
  */
object SparkEntry {
  /** Flagship: the full segment→extract→link→build KG pipeline on a
    * deterministic synthetic source-code corpus; returns the distinct
    * (subjName, relType, objName) triple set (rows > 0).
    */
  def entry(spark: SparkSession): DataFrame =
    pipeline.KgPipeline.runSynthetic(spark, 300).tripleSet

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only driver check. */
  def oracleSql: Map[String, String] = Queries.oracles
}
