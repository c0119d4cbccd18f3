package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-7 scratch probe: q49 setup attribution (bucketed save laps). */
object Q49Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.runtime.Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def lap[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val x = f
      println(f"Q49LAP $name ${(System.nanoTime() - t0) / 1e9}%.2f"); x
    }
    // warm the session catalog + codegen on a throwaway table first run
    (1 to 2).foreach { r =>
      println(s"== run $r")
      val root = "/tmp/graft_q49probe_" + r
      val st = new graft.graphout.GraphStorage(spark, root)
      val g = lap("tpch_graph_build") {
        val gg = graft.Queries.tpchGraphForProbe(spark, d)
        gg.edges.count(); gg
      }
      lap("saveBucketed") { st.saveBucketed("tpch", g, buckets = 16) }
      lap("load_join_count") {
        val lg = st.loadBucketed("tpch")
        lg.edges.toDF().join(lg.nodes.toDF()
          .select(org.apache.spark.sql.functions.col("id").as("srcId"),
            org.apache.spark.sql.functions.col("name").as("src_name")), Seq("srcId")).count()
      }
    }
    spark.stop()
  }
}
