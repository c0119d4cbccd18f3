package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing for training-data pipelines: image/audio/
 * video payloads are opaque `binary` columns with typed metadata structs.
 *
 * The IMAGE path is real: payloads are actual PNG bytes and
 * [[ImageDecoder]] decodes them with `javax.imageio` (JDK built-in — no
 * external dependency). The AUDIO path is real too: payloads are actual
 * WAV (PCM) bytes and [[AudioDecoder]] decodes them with
 * `javax.sound.sampled` (also JDK built-in), normalizing any PCM layout
 * (8/16-bit, stereo, either endianness) to 16-bit mono before the RMS
 * computation. VIDEO frame decode needs codec libraries NOT present in
 * this container — that step is STUBBED behind `DecoderStub` with a
 * deterministic fake so the Spark-side plumbing (schema, batch shape,
 * partitioning, per-partition decoder amortization) is real and tested.
 * In production the stub body is replaced by the real codec call;
 * nothing around it changes.
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
      // image: REAL ImageIO-decoded mean luma; audio: REAL decoded RMS
      // level; video: decode stub
      meanLuma: Double,
      resizedW: Int,
      resizedH: Int,
      nFramesSampled: Int,
      /** Per-row decode failure (corrupt payload) — the error-side-output
        * pattern of the extraction stage: one truncated image among
        * millions must not kill the scan.
        */
      decodeError: Option[String]
  )

  /** Real image codec over `javax.imageio` (ships in the JDK). Encode is
    * only used by the synthetic corpus; decode is the production kernel.
    */
  object ImageDecoder {

    /** Deterministic RGB test pattern: pixel (x, y) of image `id` is a
      * pure function of (id, x, y) — so the decoded statistics are
      * reproducible for any (id, w, h).
      */
    def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
          val g = ((id * 17 + x * 11 + y * 3) % 256).toInt
          val b = ((id * 29 + x * 5 + y * 19) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode a PNG/JPEG payload and return (meanLuma ∈ [0,1], w, h) —
      * Rec.601 luma averaged over all pixels, read through ONE bulk
      * getRGB (per-pixel getRGB pays a ColorModel conversion call per
      * pixel — an order of magnitude slower on a full-corpus scan).
      * Throws on an undecodable payload; [[extractFeatures]] isolates the
      * failure into the row's `decodeError` field.
      */
    def decodeMeanLuma(payload: Array[Byte]): (Double, Int, Int) = {
      // per-call in-memory image input stream (round-4 advice): routes the
      // decode through a MemoryCacheImageInputStream explicitly instead of
      // toggling the JVM-GLOBAL ImageIO.setUseCache flag from executor
      // tasks, which would silently change disk-cache behavior for every
      // other ImageIO user sharing the executor JVM
      // no explicit close: ImageIO.read(ImageInputStream) closes the
      // stream itself on completion (javadoc), and a second close throws
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val img = javax.imageio.ImageIO.read(iis)
      require(img != null, "undecodable image payload")
      val (w, h) = (img.getWidth, img.getHeight)
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      var sum = 0.0
      var i = 0
      while (i < px.length) {
        val rgb = px(i)
        sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        i += 1
      }
      (sum / (w.toLong * h) / 255.0, w, h)
    }
  }

  /** Real audio codec over `javax.sound.sampled` (ships in the JDK).
    * Encode is only used by the synthetic corpus; decode is the
    * production kernel.
    */
  object AudioDecoder {

    /** Deterministic 16-bit mono PCM WAV: sample n of clip `id` is a pure
      * integer function of (id, n) — a full-swing sawtooth-ish pattern, so
      * the decoded RMS is reproducible for any (id, rate, duration) and
      * no float transcendentals (platform-dependent bits) are involved.
      */
    def syntheticWav(id: Long, sampleRateHz: Int, durationMs: Long): Array[Byte] = {
      val n = (durationMs * sampleRateHz / 1000L).toInt
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val v = (((id * 31 + i * 7) % 65536L) - 32768L).toInt
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRateHz.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode a WAV payload and return (rms ∈ [0,1], sampleRateHz,
      * durationMs). Any PCM layout is normalized first: the JDK converter
      * handles bit depth / sign / endianness to 16-bit signed
      * little-endian; channel mixing (stereo→mono) is NOT in the JDK
      * converter, so channels are averaged manually per frame. Throws on
      * an undecodable payload; [[extractFeatures]] isolates the failure
      * into the row's `decodeError` field.
      */
    def decodeRms(payload: Array[Byte]): (Double, Int, Long) = {
      val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val sf = src.getFormat
        val channels = sf.getChannels
        val target = new javax.sound.sampled.AudioFormat(
          sf.getSampleRate, 16, channels, true, false)
        val ais =
          if (sf.matches(target)) src
          else javax.sound.sampled.AudioSystem.getAudioInputStream(target, src)
        val frameBytes = 2 * channels
        val buf = new Array[Byte](frameBytes * 4096)
        var sumSq = 0.0
        var frames = 0L
        // AudioInputStream.read returns an integral number of frames, so
        // the per-buffer walk never splits a frame across reads
        var read = ais.read(buf)
        while (read > 0) {
          var off = 0
          while (off + frameBytes <= read) {
            var c = 0
            var acc = 0L
            while (c < channels) {
              val lo = buf(off + 2 * c) & 0xff
              val hi = buf(off + 2 * c + 1)
              acc += (hi << 8) | lo
              c += 1
            }
            val mono = acc.toDouble / channels
            sumSq += mono * mono
            frames += 1
            off += frameBytes
          }
          read = ais.read(buf)
        }
        require(frames > 0, "empty audio payload")
        val rate = sf.getSampleRate.toInt
        (math.sqrt(sumSq / frames) / 32768.0, rate, frames * 1000L / rate)
      } finally src.close()
    }
  }

  /** Deterministic synthetic media corpus (seeded — payload is a pure
    * function of id) for testing the plumbing at any scale. Image rows
    * carry REAL PNG bytes, audio rows REAL WAV bytes; video rows carry
    * opaque byte payloads (the one stubbed modality).
    */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n).map { i =>
      val rnd = new scala.util.Random(seed ^ i)
      val mt = Seq("image", "audio", "video")(rnd.nextInt(3))
      val w = 16 + rnd.nextInt(48)
      val h = 16 + rnd.nextInt(48)
      // 8 kHz keeps the synthetic WAV payloads at ~3–32 KB so corpus-
      // scale tests stay cheap; the decoder itself handles any rate
      val rateHz = 8000
      val durMs = 200L + rnd.nextInt(1800)
      val payload = mt match {
        case "image" => ImageDecoder.syntheticPng(i, w, h)
        case "audio" => AudioDecoder.syntheticWav(i, rateHz, durMs)
        case _       => Array.fill(64 + rnd.nextInt(192))(rnd.nextInt(256).toByte)
      }
      MediaRow(i, mt, payload, width = w, height = h,
        sampleRateHz = rateHz, durationMs = durMs)
    }
  }

  /** The stubbed VIDEO decoder (image and audio decode are real — see
    * [[ImageDecoder]] / [[AudioDecoder]]). Replace the body with the real
    * codec (e.g. javacpp-ffmpeg) in production; the deterministic fake
    * keeps tests meaningful: outputs depend only on the payload bytes.
    */
  object DecoderStub {
    def fakeMeanLevel(payload: Array[Byte]): Double =
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
    * per partition (the Pandas-UDF batch contract). Image rows are decoded
    * for real with ImageIO, audio rows with javax.sound; video goes
    * through the stub.
    */
  def extractFeatures(media: Dataset[MediaRow], resizeTarget: Int = 224): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder context init (an ffmpeg context would be
      // created once here); image decode itself wraps each payload in a
      // MemoryCacheImageInputStream, so no disk-backed ImageIO temp file
      // is created and no JVM-global flag is touched
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { m =>
        md.reset()
        val sha = graft.model.Ids.hex(md.digest(m.payload))
        // per-row failure isolation (the extraction stage's error-side-
        // output pattern): a corrupt payload yields a row with
        // decodeError set, never a dead stage
        val (luma, realW, realH, err) = m.mediaType match {
          case "image" =>
            try {
              val (l, w, h) = ImageDecoder.decodeMeanLuma(m.payload)
              (l, w, h, None)
            } catch {
              case e: Exception =>
                (0.0, m.width, m.height,
                  Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
            }
          case "audio" =>
            try {
              val (rms, _, _) = AudioDecoder.decodeRms(m.payload)
              (rms, m.width, m.height, None)
            } catch {
              case e: Exception =>
                (0.0, m.width, m.height,
                  Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
            }
          case _ => (DecoderStub.fakeMeanLevel(m.payload), m.width, m.height, None)
        }
        val (rw, rh) = DecoderStub.resize(realW, realH, resizeTarget)
        MediaFeatures(
          mediaId = m.mediaId, mediaType = m.mediaType,
          nBytes = m.payload.length.toLong, payloadSha = sha,
          meanLuma = luma,
          resizedW = rw, resizedH = rh,
          nFramesSampled =
            if (m.mediaType == "video") DecoderStub.sampleFrames(m.durationMs) else 1,
          decodeError = err)
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
