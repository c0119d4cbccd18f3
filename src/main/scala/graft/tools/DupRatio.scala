package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: raw-vs-distinct composition of the edge table the
  * keep-max dedup sees (KgPipeline synthetic corpus, post-redirect) —
  * the numbers that decide whether a loser-dropping prefilter can pay
  * (losers = raw - groups) and what the semi join's wide exchange must
  * ship (winner bytes).
  *
  * Usage: SPARK_GRAFT_PROBE_FILES=160000 sbt 'runMain graft.tools.DupRatio'
  */
object DupRatio {
  def main(args: Array[String]): Unit = {
    val files = sys.env.getOrElse("SPARK_GRAFT_PROBE_FILES", "160000").toLong
    val spark = graft.runtime.Sessions
      .configure(SparkSession.builder().master("local[8]"), 16)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val fs = graft.corpus.CorpusGen.generate(spark, files)
    val segments = graft.segment.CodeSegmenter.windows(fs)
    val (mentions, rawTriples) = graft.extract.Extractor.extract(segments)
    val deduped = graft.link.EntityMerge.dedupeMentionsFast(mentions)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val linked = graft.link.Linker.link(deduped, graft.link.Linker.DefaultThreshold)
    val redirected = graft.link.Linker.redirectEdges(rawTriples, linked.rewrite)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val raw = redirected.toDF()
    val nRaw = raw.count()
    val groups = raw.groupBy("srcId", "relType", "dstId").count()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nGroups = groups.count()
    val nDupRows = groups.where($"count" > 1)
      .agg(coalesce(sum($"count"), lit(0L))).as[Long].head()
    val nBidir = raw.where($"bidirectional").count()
    val bytes = raw.withColumn("b",
      length(to_json(struct(raw.columns.map(col): _*))))
      .agg(coalesce(sum($"b".cast("long")), lit(0L))).as[Long].head()
    // the map-side-droppable bound: losers that share an INPUT partition
    // with their group's other rows could be dropped before any exchange
    // by a bounded per-task keep-max map (no global winner set needed) —
    // if this is ≈ 0, the dup mass is cross-partition and no map-side
    // combine of any form can cut the wide exchange
    val nLocalGroups = raw
      .groupBy(spark_partition_id().as("p"), $"srcId", $"relType", $"dstId")
      .count().count()
    println(f"""{"probe":"dup","files":$files,"rawRows":$nRaw,"groups":$nGroups,""" +
      f""""losers":${nRaw - nGroups},"rowsInDupGroups":$nDupRows,""" +
      f""""mapSideDroppable":${nRaw - nLocalGroups},""" +
      f""""bidir":$nBidir,"approxJsonMB":${bytes / 1e6}%.0f}""")
    spark.stop()
  }
}
