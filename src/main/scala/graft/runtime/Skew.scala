package graft.runtime

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Explicit key-salting helpers (SURVEY.md §4 item 2) — the deterministic
 * backstop for hot join keys beyond what AQE's skew-join splitting
 * handles: mega-repo partitions and celebrity entity names (the R2
 * name→id disambiguation join and the C5 edge-redirect joins).
 *
 * Pattern: the skewed (big) side gets `key#salt` with salt =
 * pmod(hash(row-unique), n); the dim side is exploded n ways so every
 * salted key finds its match. Join fan-out is restored to the unsalted
 * result set.
 */
object Skew {

  /** Add a salt column derived from an arbitrary unique column. */
  def withSalt(df: DataFrame, uniqueCol: String, nSalts: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(uniqueCol)), lit(nSalts)))

  /** Explode the dim side n ways (one replica per salt). */
  def explodeDim(dim: DataFrame, nSalts: Int): DataFrame =
    dim.withColumn("_salt", explode(array((0 until nSalts).map(i => lit(i.toLong)): _*)))

  /** Salted equi-join: big ⋈ dim on (keys..., salt). Equivalent to the
    * unsalted join; the hot key's rows spread over nSalts reducers.
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, keys: Seq[String],
                 uniqueCol: String, nSalts: Int = 16,
                 joinType: String = "inner"): DataFrame =
    withSalt(big, uniqueCol, nSalts)
      .join(explodeDim(dim, nSalts), keys :+ "_salt", joinType)
      .drop("_salt")

  /** Two-level aggregation for skewed groupBy keys: partial aggregate on
    * (key, salt), then final aggregate on key. Caller supplies the same
    * aggregation twice (it must be decomposable, e.g. count/sum/min/max).
    */
  def saltedCount(df: DataFrame, keys: Seq[String], uniqueCol: String,
                  nSalts: Int = 16): DataFrame =
    withSalt(df, uniqueCol, nSalts)
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_partial").as("count"))
}
