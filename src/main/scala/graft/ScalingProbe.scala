package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time the KG pipeline at one parallelism level.
  * Usage: runMain graft.ScalingProbe <cpus> <files> [rounds]
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val files = args(1).toLong
    val rounds = if (args.length > 2) args(2).toInt else 2
    val parts = sys.env.get("SPARK_GRAFT_PARTS").map(_.toInt).getOrElse(cpus)
    val spark = graft.runtime.Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), shufflePartitions = parts)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to rounds).foreach { r =>
      def lap[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val x = f
        println(f"  LAP $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
        x
      }
      val t0 = System.nanoTime()
      val corpus = pipeline.KgPipeline // stages inline for profiling
      import spark.implicits._
      val files_ = graft.corpus.CorpusGen.generate(spark, files)
      val segments = graft.segment.CodeSegmenter.windows(files_)
      lap("segments.count")(segments.count())
      val (mentions, rawTriples) = graft.extract.Extractor.extract(segments)
      lap("mentions.count")(mentions.count())
      val deduped = lap("dedupe") {
        val d = graft.link.EntityMerge.dedupeMentions(mentions)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        d.count(); d
      }
      val linked = lap("link") {
        val l = graft.link.Linker.link(deduped)
        l.canonical.count(); l
      }
      val redirected = lap("redirect") {
        val rd = graft.link.Linker.redirectEdges(rawTriples, linked.rewrite)
        rd // lazy
      }
      val graph = lap("build+materialize") {
        val g = graft.graphout.GraphBuilder.build(linked.canonical, redirected)
        val gg = graft.graphout.GraphBuilder.Graph(
          g.nodes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
          g.edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        gg.edges.count(); gg
      }
      val triples = lap("tripleSet") {
        graph.edges.toDF()
          .join(graph.nodes.toDF().select($"id".as("srcId"), $"name".as("subjName")), Seq("srcId"))
          .join(graph.nodes.toDF().select($"id".as("dstId"), $"name".as("objName")), Seq("dstId"))
          .select($"subjName", $"relType", $"objName").distinct().count()
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROBE cpus=$cpus files=$files round=$r sec=$dt%.2f triples=$triples tps=${triples / dt}%.0f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
