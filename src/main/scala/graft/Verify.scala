package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // ONE sfName computation feeds both the fixture-file property and the
    // oracle-dropping decision below — they must never desynchronize
    val sfName = Paths.get(sfDir).toAbsolutePath.normalize.getFileName.toString
    // the per-SF fixture oracles key their file names off this property;
    // set it before ANYTHING touches the Queries object
    System.setProperty("graft.sf.name", sfName)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // SF-pinned fixture oracles only hold at their own SF; at any other
    // input dir degrade them to the rows-only check instead of emitting
    // a guaranteed hash mismatch that reads like a kernel regression
    val dropped = Queries.sfPinnedOracles.filterNot(_._2.contains(sfName)).keySet
    dropped.foreach(k => System.err.println(
      s"[verify] $k oracle omitted: fixtures cover ${Queries.sfPinnedOracles(k).mkString("/")}, input is $sfName (rows-only check)"))
    val json = (SparkEntry.oracleSql -- dropped)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
