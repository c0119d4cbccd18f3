package graft.tools
import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val obs = Observation()
    val df = spark.range(100).observe(obs, count(lit(1)).as("n")).localCheckpoint(true)
    val got = new java.util.concurrent.atomic.AtomicReference[String]("TIMEOUT")
    val t = new Thread(() => got.set("GOT n=" + obs.get("n")))
    t.setDaemon(true); t.start(); t.join(15000)
    println("[obsprobe] localCheckpoint(eager): " + got.get())
    println("[obsprobe] rows=" + df.count())
    spark.stop()
  }
}
