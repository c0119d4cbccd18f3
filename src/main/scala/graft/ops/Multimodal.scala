package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing for training-data pipelines: image/audio/
 * video payloads are opaque `binary` columns with typed metadata structs.
 *
 * The actual codec work (JPEG decode, resampling, frame sampling) needs
 * native libraries NOT present in this container — those steps are
 * STUBBED behind `DecoderStub` with a deterministic fake so the Spark-side
 * plumbing (schema, batch shape, partitioning, per-partition decoder
 * amortization) is real and tested. In production the stub body is
 * replaced by the real codec call; nothing around it changes.
 *
 * Batching shape mirrors mapInPandas/Arrow semantics: work happens in
 * `mapPartitions` so the (expensive) decoder context is created once per
 * partition, not per row — the same contract a Pandas UDF would have.
 */
object Multimodal {

  /** Typed media row: payload + metadata. */
  final case class MediaRow(
      mediaId: Long,
      mediaType: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sampleRateHz: Int,
      durationMs: Long
  )

  final case class MediaFeatures(
      mediaId: Long,
      mediaType: String,
      nBytes: Long,
      payloadSha: String,
      // decoded-feature stub outputs:
      meanLuma: Double,
      resizedW: Int,
      resizedH: Int,
      nFramesSampled: Int
  )

  /** Deterministic synthetic media corpus (seeded — payload is a pure
    * function of id) for testing the plumbing at any scale.
    */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n).map { i =>
      val rnd = new scala.util.Random(seed ^ i)
      val mt = Seq("image", "audio", "video")(rnd.nextInt(3))
      val payload = Array.fill((64 + rnd.nextInt(192)))(rnd.nextInt(256).toByte)
      MediaRow(i, mt, payload,
        width = 16 + rnd.nextInt(64), height = 16 + rnd.nextInt(64),
        sampleRateHz = 16000, durationMs = 1000L + rnd.nextInt(9000))
    }
  }

  /** The stubbed decoder. Replace the body with the real codec (e.g.
    * javacpp-ffmpeg / ImageIO) in production; the deterministic fake keeps
    * tests meaningful: outputs depend only on the payload bytes.
    */
  object DecoderStub {
    def decodeImageMeanLuma(payload: Array[Byte]): Double =
      if (payload.isEmpty) 0.0
      else payload.map(b => (b & 0xff).toDouble).sum / payload.length / 255.0

    def resize(w: Int, h: Int, target: Int): (Int, Int) = {
      val scale = target.toDouble / math.max(w, h)
      (math.max(1, math.round(w * scale).toInt), math.max(1, math.round(h * scale).toInt))
    }

    def sampleFrames(durationMs: Long, fps: Double = 1.0): Int =
      math.max(1, (durationMs / 1000.0 * fps).toInt)
  }

  /** Feature extraction stage: mapPartitions so decoder init happens once
    * per partition (the Pandas-UDF batch contract).
    */
  def extractFeatures(media: Dataset[MediaRow], resizeTarget: Int = 224): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder context init would happen here
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { m =>
        md.reset()
        val sha = graft.model.Ids.hex(md.digest(m.payload))
        val (rw, rh) = DecoderStub.resize(m.width, m.height, resizeTarget)
        MediaFeatures(
          mediaId = m.mediaId, mediaType = m.mediaType,
          nBytes = m.payload.length.toLong, payloadSha = sha,
          meanLuma = DecoderStub.decodeImageMeanLuma(m.payload),
          resizedW = rw, resizedH = rh,
          nFramesSampled =
            if (m.mediaType == "video") DecoderStub.sampleFrames(m.durationMs) else 1)
      }
    }
  }

  /** Modality-balanced repartition: large payloads are spread by
    * byte-size-weighted salting so a partition never accumulates only
    * megabyte-scale videos (the multimodal skew hazard at 100 TB).
    */
  def balanceBySize(media: Dataset[MediaRow], partitions: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media
      .withColumn("_salt", pmod(xxhash64(col("mediaId")), lit(partitions)))
      .repartition(partitions, col("_salt"))
      .drop("_salt")
      .as[MediaRow]
  }
}
