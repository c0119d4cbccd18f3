package graft.runtime

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Per-stage checkpoint commits with lineage + counters (the north rule's
 * resumability contract). Production target is an Iceberg catalog —
 * snapshot-per-stage with tags (SURVEY.md §2.1 S6-S8); this sandbox ships
 * no Iceberg jars, so the same contract is implemented over Parquet
 * directories with an atomically-written `_MANIFEST.json`:
 *
 *   <root>/<stage>/data/      parquet (the committed stage output)
 *   <root>/<stage>/_MANIFEST.json   {stage, rows, inputs, wallSec, ts}
 *
 * A stage whose manifest exists is NOT recomputed — `runStage` returns the
 * committed parquet instead (resume-from-checkpoint). Parquet's _SUCCESS
 * marker + manifest-after-write gives commit atomicity at the stage level;
 * Iceberg would give it per-partition.
 */
final class Checkpoint(spark: SparkSession, root: String) {

  private def stageDir(stage: String) = s"$root/$stage"
  private def manifestPath(stage: String) = Paths.get(s"$root/$stage/_MANIFEST.json")

  def isCommitted(stage: String): Boolean = Files.exists(manifestPath(stage))

  def read(stage: String): DataFrame = spark.read.parquet(s"${stageDir(stage)}/data")

  /** Run `compute` unless the stage is already committed; write parquet +
    * manifest (rows counter + lineage inputs + wall-clock).
    */
  def runStage(stage: String, inputs: Seq[String], partitionBy: Seq[String] = Nil)(
      compute: => DataFrame): DataFrame = {
    if (isCommitted(stage)) return read(stage)
    val t0 = System.nanoTime()
    val before = Observed.snapshot()
    val df = compute
    val writer = df.write.mode("overwrite")
    val w = if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer
    w.parquet(s"${stageDir(stage)}/data")
    val out = read(stage)
    val rows = out.count()
    val wallSec = (System.nanoTime() - t0) / 1e9
    // observed cap/drop counters harvested during THIS stage's jobs: the
    // registry is process-cumulative, so the manifest records the
    // before/after DELTA — a stage that dropped nothing shows no counters
    // even when an earlier stage (or run) did (round-2 advice)
    val delta = Observed.snapshot().flatMap { case (name, m) =>
      val prev = before.getOrElse(name, Map.empty[String, Long])
      val d = m.map { case (k, v) => k -> (v - prev.getOrElse(k, 0L)) }
        .filter(_._2 != 0L)
      if (d.isEmpty) None else Some(name -> d)
    }
    val observed = delta
      .map { case (name, m) =>
        "\"" + name + "\":{" +
          m.map { case (k, v) => "\"" + k + "\":" + v }.mkString(",") + "}"
      }.mkString("{", ",", "}")
    val manifest =
      s"""{"stage":"$stage","rows":$rows,"inputs":[${inputs.map(i => "\"" + i + "\"").mkString(",")}],
         |"wallSec":$wallSec,"observed":$observed,"ts":"${java.time.Instant.now()}"}""".stripMargin.replace("\n", "")
    Files.createDirectories(manifestPath(stage).getParent)
    val tmp = Paths.get(manifestPath(stage).toString + ".tmp")
    Files.writeString(tmp, manifest, StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, manifestPath(stage), java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    out
  }

  def manifests(): Seq[String] = {
    val r = Paths.get(root)
    if (!Files.exists(r)) Nil
    else {
      val s = Files.list(r)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.toSeq
          .map(p => p.resolve("_MANIFEST.json"))
          .filter(Files.exists(_))
          .map(Files.readString(_))
      } finally s.close()
    }
  }
}
