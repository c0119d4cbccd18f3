package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing for training-data pipelines: image/audio/
 * video payloads are opaque `binary` columns with typed metadata structs.
 *
 * EVERY modality decodes real payloads with pure-JDK codecs — no
 * external dependency, no stubs:
 *  - IMAGE: PNG/JPEG bytes through `javax.imageio` ([[ImageDecoder]]);
 *  - AUDIO: PCM WAV bytes through `javax.sound.sampled`
 *    ([[AudioDecoder]] — any PCM layout normalized to 16-bit mono
 *    before the RMS computation);
 *  - VIDEO: MJPEG-in-AVI bytes through a RIFF chunk walk + per-frame
 *    ImageIO decode ([[VideoDecoder]]). Inter-frame codecs (H.264 etc.)
 *    need external libraries; they would plug into the same
 *    per-partition decoder slot without changing anything around it.
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
      // level; video: REAL mean luma over the sampled MJPEG frames
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

  /** Real video codec for MJPEG-in-AVI over pure JDK: the RIFF/AVI
    * container (public Microsoft spec) is a fourcc+size chunk walk, and
    * each `00dc` frame chunk is a complete JPEG that `javax.imageio`
    * decodes. Production codecs (H.264 etc.) need external libraries and
    * would plug into the same per-partition decoder slot; MJPEG keeps the
    * whole modality real with zero dependencies. Encode is only used by
    * the synthetic corpus; decode is the production kernel.
    */
  object VideoDecoder {

    private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

    /** Deterministic MJPEG AVI: frame f of clip `id` is the image-pattern
      * formula evaluated at (id*1000+f) and JPEG-encoded — reproducible
      * bytes for any (id, w, h, frames, fps). `recGroup > 0` wraps each
      * group of that many frames in a 'rec ' LIST (the interleaved-muxer
      * layout real AVIs use), exercising the walker's nested-LIST
      * document-order path; 0 = flat 00dc chunks.
      */
    def syntheticMjpegAvi(id: Long, w: Int, h: Int, frames: Int, fps: Int,
                          recGroup: Int = 0): Array[Byte] = {
      val jpegs = (0 until frames).map { f =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val seed = id * 1000 + f
            val r = ((seed * 31 + x * 7 + y * 13) % 256).toInt
            val g = ((seed * 17 + x * 11 + y * 3) % 256).toInt
            val b = ((seed * 29 + x * 5 + y * 19) % 256).toInt
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      val usPerFrame = 1000000 / fps
      val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(frames) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
      val strh = fourcc("vids") ++ fourcc("MJPG") ++ le32(0) ++ le32(0) ++
        le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++ le32(frames) ++
        le32(0) ++ le32(-1) ++ le32(0) ++ le32(0) ++ le32(0)
      val strf = le32(40) ++ le32(w) ++ le32(h) ++
        Array[Byte](1, 0, 24, 0) ++ fourcc("MJPG") ++ le32(w * h * 3) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
      def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
        val padded = if (body.length % 2 == 1) body :+ 0.toByte else body
        fourcc(cc) ++ le32(body.length) ++ padded
      }
      def list(tpe: String, body: Array[Byte]): Array[Byte] =
        fourcc("LIST") ++ le32(body.length + 4) ++ fourcc(tpe) ++ body
      val strl = list("strl", chunk("strh", strh) ++ chunk("strf", strf))
      val hdrl = list("hdrl", chunk("avih", avih) ++ strl)
      val frameChunks = jpegs.map(j => chunk("00dc", j))
      val moviBody =
        if (recGroup <= 0) frameChunks.flatten.toArray
        else frameChunks.grouped(recGroup)
          .flatMap(g => list("rec ", g.flatten.toArray)).toArray
      val movi = list("movi", moviBody)
      val body = fourcc("AVI ") ++ hdrl ++ movi
      fourcc("RIFF") ++ le32(body.length) ++ body
    }

    /** Decode an MJPEG AVI payload, sampling every `sampleEvery`-th frame
      * through the JPEG decoder, and return (mean luma over the sampled
      * frames ∈ [0,1], width, height, framesSampled, durationMs). Walks
      * the RIFF chunk tree (fourcc + LE32 size, chunks padded to even);
      * frame dimensions come from the decoded frames, duration from the
      * avih header's µs-per-frame × total frames. Throws on anything that
      * is not a parseable one-video-stream AVI; [[extractFeatures]]
      * isolates the failure into the row's `decodeError` field.
      */
    def decodeSampled(payload: Array[Byte], sampleEvery: Int = 1)
        : (Double, Int, Int, Int, Long) = {
      require(payload.length >= 12 &&
        new String(payload, 0, 4, "US-ASCII") == "RIFF" &&
        new String(payload, 8, 4, "US-ASCII") == "AVI ", "not a RIFF AVI payload")
      def u32(off: Int): Long =
        (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
          ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
      var usPerFrame = 0L
      var totalFrames = 0L
      var lumaSum = 0.0
      var sampled = 0
      var frameIdx = 0
      var w = 0
      var h = 0
      // iterative chunk walk with an explicit (offset, end) stack — a
      // malformed size can never recurse or loop unboundedly
      var stack = List((12, payload.length))
      while (stack.nonEmpty) {
        val (off, end) = stack.head
        stack = stack.tail
        var p = off
        while (p + 8 <= end) {
          val cc = new String(payload, p, 4, "US-ASCII")
          val size = u32(p + 4)
          val bodyStart = p + 8
          val bodyEnd = bodyStart + size
          require(size >= 0 && bodyEnd <= payload.length, s"chunk $cc overruns payload")
          if (cc == "LIST" && size >= 4) {
            // descend into hdrl/movi/strl/rec BEFORE the rest of this
            // level: push the continuation first, then the list body, so
            // the LIFO pop keeps document order — muxers that group
            // frames in 'rec ' LISTs must sample frames in stream order,
            // not level-by-level
            val resume = (bodyEnd + (size % 2)).toInt
            if (resume < end) stack = (resume, end) :: stack
            stack = ((bodyStart + 4).toInt, bodyEnd.toInt) :: stack
            p = end // this level continues via the pushed continuation
          } else {
            if (cc == "avih" && size >= 40) {
              usPerFrame = u32(bodyStart)
              totalFrames = u32(bodyStart + 16)
            } else if (cc == "00dc" || cc == "00dj") {
              if (frameIdx % sampleEvery == 0) {
                val jpeg = java.util.Arrays.copyOfRange(payload, bodyStart, bodyEnd.toInt)
                val (l, fw, fh) = ImageDecoder.decodeMeanLuma(jpeg)
                lumaSum += l; sampled += 1; w = fw; h = fh
              }
              frameIdx += 1
            }
            // chunks are padded to even length
            p = (bodyEnd + (size % 2)).toInt
          }
        }
      }
      require(sampled > 0, "AVI payload contained no decodable frames")
      val durationMs =
        if (usPerFrame > 0) totalFrames * usPerFrame / 1000 else 0L
      (lumaSum / sampled, w, h, sampled, durationMs)
    }
  }

  /** Deterministic synthetic media corpus (seeded — payload is a pure
    * function of id) for testing the plumbing at any scale. Every
    * modality carries REAL bytes: image rows PNG, audio rows PCM WAV,
    * video rows MJPEG AVI.
    */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n).map(i => syntheticRow(i, seed))
  }

  /** One synthetic media row — a pure function of (id, seed), shared by
    * [[syntheticMedia]] and the serial fixture-gen reference path so the
    * two can never drift (the q31 differential targets the distributed
    * plumbing, not row generation).
    */
  def syntheticRow(i: Long, seed: Long = 42L): MediaRow = {
    val rnd = new scala.util.Random(seed ^ i)
    val mt = Seq("image", "audio", "video")(rnd.nextInt(3))
    val w = 16 + rnd.nextInt(48)
    val h = 16 + rnd.nextInt(48)
    // 8 kHz keeps the synthetic WAV payloads at ~3–32 KB so corpus-
    // scale tests stay cheap; the decoder itself handles any rate
    val rateHz = 8000
    val durMs = 200L + rnd.nextInt(1800)
    // 5 fps MJPEG: 1–9 small JPEG frames per clip (~1–20 KB payloads)
    val fps = 5
    val payload = mt match {
      case "image" => ImageDecoder.syntheticPng(i, w, h)
      case "audio" => AudioDecoder.syntheticWav(i, rateHz, durMs)
      case _ =>
        VideoDecoder.syntheticMjpegAvi(i, w, h,
          frames = math.max(1, (durMs * fps / 1000).toInt), fps = fps)
    }
    MediaRow(i, mt, payload, width = w, height = h,
      sampleRateHz = rateHz, durationMs = durMs)
  }

  /** Aspect-preserving resize arithmetic (the metadata side of a resize
    * stage — the pixel resample itself would ride the same per-partition
    * decoder slot as the codecs above).
    */
  def resizeDims(w: Int, h: Int, target: Int): (Int, Int) = {
    val scale = target.toDouble / math.max(w, h)
    (math.max(1, math.round(w * scale).toInt), math.max(1, math.round(h * scale).toInt))
  }

  /** Feature extraction stage: mapPartitions so decoder init happens once
    * per partition (the Pandas-UDF batch contract). Every modality is
    * decoded for real: images with ImageIO, audio with javax.sound,
    * MJPEG-AVI video frame-by-frame through ImageIO.
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
        val (luma, realW, realH, frames, err) = m.mediaType match {
          case "image" =>
            try {
              val (l, w, h) = ImageDecoder.decodeMeanLuma(m.payload)
              (l, w, h, 1, None)
            } catch {
              case e: Exception =>
                (0.0, m.width, m.height, 0,
                  Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
            }
          case "audio" =>
            try {
              val (rms, _, _) = AudioDecoder.decodeRms(m.payload)
              (rms, m.width, m.height, 1, None)
            } catch {
              case e: Exception =>
                (0.0, m.width, m.height, 0,
                  Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
            }
          case _ =>
            try {
              // every 5th frame ≈ 1 frame/sec at the corpus's 5 fps (a
              // production pipeline derives the stride from the stream's
              // own rate); decodeSampled always decodes frame 0, so short
              // clips still sample at least one frame
              val (l, w, h, n, _) = VideoDecoder.decodeSampled(m.payload, sampleEvery = 5)
              (l, w, h, n, None)
            } catch {
              case e: Exception =>
                (0.0, m.width, m.height, 0,
                  Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
            }
        }
        val (rw, rh) = resizeDims(realW, realH, resizeTarget)
        MediaFeatures(
          mediaId = m.mediaId, mediaType = m.mediaType,
          nBytes = m.payload.length.toLong, payloadSha = sha,
          meanLuma = luma,
          resizedW = rw, resizedH = rh,
          nFramesSampled = frames,
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
