package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One multimodal record: opaque binary payload + typed metadata.
  * Images/audio/video ride through the pipeline as `binary` columns;
  * only the (stubbed) codec at the edge knows the format. */
case class MediaRecord(media_id: Long, media_type: String,
                       payload: Array[Byte], n_bytes: Long)

/** Decoded/feature form of a record. */
case class MediaFeatures(media_id: Long, media_type: String, n_bytes: Long,
                         width: Int, height: Int, channels: Int,
                         checksum: Long, mean_byte: Double)

/** Decoded form of an audio record (PCM). */
case class AudioFeatures(media_id: Long, media_type: String, n_bytes: Long,
                         sample_rate: Int, channels: Int, n_frames: Long,
                         mean_abs: Double)

/** A record the codec edge could not parse — routed to a quarantine
  * output with its identity and a reason column instead of being
  * silently dropped: at 100 TB a silent drop is unauditable data
  * loss; a quarantine table is re-processable after a codec fix. */
case class QuarantinedMedia(media_id: Long, media_type: String,
                            n_bytes: Long, reason: String)

/** One row per media record from the quality filter: keep/drop plus
  * the FIRST failed rule's name — every record keeps a verdict, so
  * the filter is auditable (reject-rate dashboards, rule tuning)
  * rather than a silent drop. */
case class MediaQualityVerdict(media_id: Long, modality: String,
                               ok: Boolean, reason: String)

/** Multimodal-column plumbing for training-data pipelines.
  *
  * The Spark-side contract is real and tested — binary schema, typed
  * Dataset encoders, partition-preserving mapPartitions (the Scala
  * analog of a Pandas-UDF `mapInPandas` batch loop), deterministic
  * output. The codec edge is split by format: PNG/JPEG/BMP/GIF decode
  * is REAL (JDK `javax.imageio` — zero external deps, headless-safe),
  * and WAV/PCM audio decode is REAL (JDK `javax.sound.sampled`, same
  * zero-dep posture); video and unknown types keep the documented
  * [[decodeStub]] (this container ships no media libraries beyond the
  * JDK) — swap it for a JNI/javacpp codec without touching any
  * plumbing.
  */
object Multimodal {

  /** Wrap any (id, string) frame as media records — the test harness
    * treats document text bytes as an opaque payload. */
  def fromText(df: DataFrame, id: String, text: String,
               mediaType: String = "image/fake"): DataFrame =
    df.select(col(id).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      encode(col(text), "UTF-8").as("payload"),
      octet_length(col(text)).cast("long").as("n_bytes"))

  /** STUB codec: a real decoder would parse the container format
    * here. The fake reads "header" bytes 0 and 1 for dimensions and
    * scans the payload once for byte statistics — deterministic, so
    * the pipeline around it is fully testable. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val b0 = if (r.payload.nonEmpty) r.payload(0) & 0xff else 0
    val b1 = if (r.payload.length > 1) r.payload(1) & 0xff else 0
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
    MediaFeatures(r.media_id, r.media_type, r.n_bytes,
      width = 1 + b0 % 64, height = 1 + b1 % 64, channels = 3,
      checksum = sum % 997,
      mean_byte = if (r.payload.isEmpty) 0.0 else sum.toDouble / r.payload.length)
  }

  /** REAL image decode via JDK `javax.imageio` (PNG/JPEG/BMP/GIF):
    * parses the container and returns TRUE decoded dimensions, the
    * raster's band count, the payload checksum (same definition as
    * [[decodeStub]]), and the mean DECODED sample value across all
    * bands — a genuine pixel statistic, not a byte statistic. `None`
    * when no installed reader recognizes the payload. */
  def decodeImage(r: MediaRecord): Option[MediaFeatures] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.payload))
    if (img == null) None
    else {
      val raster = img.getRaster
      val (w, h, ch) = (img.getWidth, img.getHeight, raster.getNumBands)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < ch) { sum += raster.getSample(x, y, b); b += 1 }
          x += 1
        }
        y += 1
      }
      var csum = 0L; var i = 0
      while (i < r.payload.length) { csum += (r.payload(i) & 0xff); i += 1 }
      Some(MediaFeatures(r.media_id, r.media_type, r.n_bytes,
        width = w, height = h, channels = ch, checksum = csum % 997,
        mean_byte = sum.toDouble / (w.toLong * h * ch)))
    }
  }

  /** Format-dispatching codec: real [[decodeImage]] for image-typed
    * payloads imageio can parse; the stub for everything else
    * (including the harness's declared-fake `image/fake`). */
  def decode(r: MediaRecord): MediaFeatures =
    if (r.media_type.startsWith("image/") && r.media_type != "image/fake")
      decodeImage(r).getOrElse(decodeStub(r))
    else decodeStub(r)

  /** Deterministic solid-gray PNG through the REAL encoder — the
    * test/gate synthesizer that lets an arithmetic oracle predict
    * what the decoder must recover (PNG is lossless). */
  def grayPng(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = gray & 0xff
    val rgb = (g << 16) | (g << 8) | g
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL audio decode via JDK `javax.sound.sampled` (WAV/AIFF/AU
    * containers, 16-bit signed PCM): parses the container and returns
    * the TRUE decoded format (sample rate, channels, frame count) and
    * the mean ABSOLUTE sample value across all channels — a genuine
    * waveform statistic computed in exact integer arithmetic (one
    * double division at the end). `None` for payloads no installed
    * reader recognizes or non-16-bit encodings. */
  def decodeAudio(r: MediaRecord): Option[AudioFeatures] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16) None
      else {
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        var sum = 0L
        var i = 0
        while (i < n) {
          val v =
            if (fmt.isBigEndian) (bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xff)
            else (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
          sum += math.abs(v)
          i += 1
        }
        Some(AudioFeatures(r.media_id, r.media_type, r.n_bytes,
          fmt.getSampleRate.toInt, fmt.getChannels, ais.getFrameLength,
          if (n == 0) 0.0 else sum.toDouble / n))
      }
    } catch {
      // NonFatal: valid-header/corrupt-body payloads can throw
      // IOException from the codec — quarantine, don't fail the job
      case scala.util.control.NonFatal(_) => None
    }

  /** Deterministic constant-amplitude 16-bit PCM WAV through the REAL
    * encoder — [[grayPng]]'s audio twin: every sample is `amplitude`,
    * so an arithmetic oracle predicts exactly what the decoder must
    * recover (PCM WAV is lossless). */
  def pcmWav(nFrames: Int, sampleRate: Int, channels: Int,
             amplitude: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false) // signed, little-endian
    val a = amplitude.toShort
    val data = new Array[Byte](nFrames * channels * 2)
    var i = 0
    while (i < nFrames * channels) {
      data(2 * i) = (a & 0xff).toByte
      data(2 * i + 1) = ((a >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Batched audio decode over partitions — [[extractFeatures]]'
    * audio twin; records the codec can't parse are dropped (use
    * [[extractAudioFeaturesWithQuarantine]] to keep them). */
  def extractAudioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(decodeAudio))
  }

  /** [[extractAudioFeatures]] with a quarantine lane: payloads no
    * installed reader parses (or non-16-bit encodings, or mid-read
    * decode failures) land in the second output with their id and a
    * reason. Both outputs derive from one tagged narrow pass (no
    * shuffle); persist `media` upstream when decode cost dominates
    * and both lanes are consumed. */
  def extractAudioFeaturesWithQuarantine(media: Dataset[MediaRecord])
      : (Dataset[AudioFeatures], Dataset[QuarantinedMedia]) = {
    import media.sparkSession.implicits._
    val tagged = media.mapPartitions(_.map { r =>
      val dec = try decodeAudio(r) catch {
        case scala.util.control.NonFatal(_) => None
      }
      dec match {
        case Some(f) => (Some(f), Option.empty[QuarantinedMedia])
        case None => (Option.empty[AudioFeatures], Some(QuarantinedMedia(
          r.media_id, r.media_type, r.n_bytes,
          "unparseable or non-16-bit audio payload")))
      }
    })
    (tagged.flatMap(_._1), tagged.flatMap(_._2))
  }

  /** Batched decode/feature-extract over partitions — each partition
    * streams through the codec without materializing more than one
    * record; the unit a real implementation would hand to a
    * vectorized decoder in batches. Dispatches per record via
    * [[decode]]. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decode))
  }

  /** [[extractFeatures]] with a quarantine lane: an image-typed
    * payload no installed reader recognizes (or that fails mid-decode)
    * lands in the second output with a reason, INSTEAD of the silent
    * [[decodeStub]] fallback [[decode]] applies; declared-fake and
    * non-image types still go through the stub (they are the
    * harness's own contract, not decode failures). */
  def extractFeaturesWithQuarantine(media: Dataset[MediaRecord])
      : (Dataset[MediaFeatures], Dataset[QuarantinedMedia]) = {
    import media.sparkSession.implicits._
    val tagged = media.mapPartitions(_.map { r =>
      if (r.media_type.startsWith("image/") && r.media_type != "image/fake") {
        val dec = try decodeImage(r) catch {
          case scala.util.control.NonFatal(_) => None
        }
        dec match {
          case Some(f) => (Some(f), Option.empty[QuarantinedMedia])
          case None => (Option.empty[MediaFeatures], Some(QuarantinedMedia(
            r.media_id, r.media_type, r.n_bytes,
            "no imageio reader decodes the payload")))
        }
      } else (Some(decodeStub(r)), Option.empty[QuarantinedMedia])
    })
    (tagged.flatMap(_._1), tagged.flatMap(_._2))
  }

  /** 64-bit PERCEPTUAL HASH (pHash, DCT variant — Zauner,
    * "Implementation and Benchmarking of Perceptual Image Hash
    * Functions", 2010): decode via the REAL JDK codec, resize to
    * 32×32 grayscale (bilinear), 2-D DCT-II, keep the 8×8
    * lowest-frequency block, and threshold each AC coefficient
    * against the block's median (DC excluded, so a global
    * brightness offset cannot bias every bit). Visually-identical
    * images — re-encodes, resizes, light noise — land within a few
    * bits; unrelated images differ in ~half. None when no installed
    * reader decodes the payload. Pure JDK, deterministic. */
  /** DCT-II cosine table for [[pHash64]]'s fixed 32×32 input and 8×8
    * band — constants, computed once per JVM/executor instead of 256
    * math.cos calls per hashed image in the corpus-scale hot path. */
  private val dctCos: Array[Array[Double]] = Array.tabulate(8, 32)((u, x) =>
    math.cos((2 * x + 1) * u * math.Pi / 64.0))

  def pHash64(payload: Array[Byte]): Option[Long] = try {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    if (img == null) return None
    val n = 32
    val gray = new java.awt.image.BufferedImage(
      n, n, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val g2 = gray.createGraphics()
    g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g2.drawImage(img, 0, 0, n, n, null)
    g2.dispose()
    val raster = gray.getRaster
    val px = Array.ofDim[Double](n, n)
    var y = 0
    while (y < n) {
      var x = 0
      while (x < n) { px(y)(x) = raster.getSample(x, y, 0).toDouble; x += 1 }
      y += 1
    }
    // separable DCT-II, low 8×8 block only — O(8·n) per row/column
    // pass, not the full n² transform
    val cos = dctCos
    val rowPass = Array.ofDim[Double](n, 8)
    y = 0
    while (y < n) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var x = 0
        while (x < n) { s += px(y)(x) * cos(u)(x); x += 1 }
        rowPass(y)(u) = s; u += 1
      }
      y += 1
    }
    val flat = new Array[Double](63) // (v,u) row-major, DC dropped
    var i = 0
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        if (v != 0 || u != 0) {
          var s = 0.0; var yy = 0
          while (yy < n) { s += rowPass(yy)(u) * cos(v)(yy); yy += 1 }
          flat(i) = s; i += 1
        }
        u += 1
      }
      v += 1
    }
    val sorted = flat.sorted
    val median = (sorted(30) + sorted(31)) / 2.0
    var bits = 0L
    i = 0
    while (i < 63) { if (flat(i) > median) bits |= (1L << i); i += 1 }
    Some(bits)
  } catch {
    // recognized-but-corrupt payloads (valid magic, truncated body)
    // make ImageIO.read THROW rather than return null — one bad image
    // must drop its row, not fail the whole near-dup job
    case scala.util.control.NonFatal(_) => None
  }

  /** pHash signatures for a media frame: (media_id, simhash) — the
    * column name [[graft.pipeline.Dedup.simHashPairs]] expects, so
    * the image hashes ride the SAME banded hamming join as text
    * SimHash. Undecodable payloads are dropped (quarantine them
    * upstream via [[extractFeaturesWithQuarantine]] if auditability
    * matters). */
  def pHashes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r =>
      pHash64(r.payload).map(h => (r.media_id, h))))
      .toDF("media_id", "simhash")
  }

  /** IMAGE NEAR-DUPLICATE pairs — the multimodal twin of the text
    * SimHash dedup (d4): pHash per image, then the banded hamming
    * join from [[Dedup.simHashPairs]] (pigeonhole: with 8 bands any
    * pair within hamming 7 shares a band — recall 1 for
    * `maxHamming` ≤ 7; never all-pairs). Catches re-encoded,
    * resized, and lightly-edited copies that byte-level
    * fingerprints miss — at training-data scale, the image corpus'
    * main duplication mode. */
  def pHashNearDup(media: Dataset[MediaRecord], bands: Int = 8,
                   maxHamming: Int = 6): DataFrame =
    Dedup.simHashPairs(pHashes(media), "media_id", bands, maxHamming)

  /** Deterministic 8×6-block "texture" PNG through the REAL encoder
    * — the [[grayPng]] sibling for perceptual-hash tests: the image
    * is an 8×6 grid of solid blocks whose grays are a mixed hash of
    * (seed, block) — rich LOW-frequency content (block structure ≈
    * the DCT band pHash keeps), so the hash is a pure function of
    * `seed` and nearly invariant to the rendered size. Measured on
    * 150 seeds × two sizes (64×48 vs 96×72): same-seed hamming ≤ 4,
    * cross-seed ≥ 10 — clean margins around the default near-dup
    * threshold 6. (A smooth linear gradient is the WRONG testbed:
    * its near-constant AC spectrum makes median thresholding
    * unstable — same-seed renders landed 10-34 bits apart.) */
  def blockPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val bx = x * 8 / width
        val by = y * 6 / height
        var h = seed * 1000003L + bx * 8887L + by * 92821L
        h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
        val g = (h & 0xff).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Frame sampling stub: every `stride`-th byte stands in for a
    * decoded video frame; shape (media_id, frame_idx, frame_byte).
    * A real sampler would emit (media_id, frame_idx, frame_payload). */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.indices.by(stride).zipWithIndex.map { case (off, idx) =>
        (r.media_id, idx, r.payload(off) & 0xff)
      }
    }.toDF("media_id", "frame_idx", "frame_byte")
  }

  /** REAL multi-frame decode via JDK `javax.imageio` sequence reading
    * (animated GIF — the one multi-frame container the JDK decodes
    * natively): one row per stored frame with its true dimensions and
    * mean pixel value (palette-resolved, integer-exact). The real
    * form of [[sampleFrames]] for formats the JDK can parse; MP4 etc.
    * still need an external codec behind the same row shape. */
  def decodeFrames(r: MediaRecord): Seq[(Long, Int, Int, Int, Double)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(r.payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) Seq.empty
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          (0 until reader.getNumImages(true)).map { i =>
            val img = reader.read(i)
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              // getRGB resolves palette indices to actual channel values
              while (x < w) { sum += img.getRGB(x, y) & 0xff; x += 1 }
              y += 1
            }
            (r.media_id, i, w, h, sum.toDouble / (w.toLong * h))
          }
        } catch {
          // recognized-but-corrupt (e.g. truncated mid-frame): yield no
          // frames rather than failing the whole task — the decodeAudio
          // posture
          case scala.util.control.NonFatal(_) => Seq.empty
        } finally reader.dispose()
      }
    } finally iis.close()
  }

  /** Batched frame extraction over partitions — the decoded-video
    * twin of the byte-stub [[sampleFrames]]. Records yielding no
    * frames are dropped (use [[extractFramesWithQuarantine]] to keep
    * them). */
  def extractFrames(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap(decodeFrames)
      .toDF("media_id", "frame_idx", "width", "height", "mean_byte")
  }

  /** [[extractFrames]] with a quarantine lane: payloads that decode
    * to zero frames (unrecognized container, or recognized but
    * corrupt) land in the second output with their id and a reason. */
  def extractFramesWithQuarantine(media: Dataset[MediaRecord])
      : (DataFrame, Dataset[QuarantinedMedia]) = {
    import media.sparkSession.implicits._
    val tagged = media.mapPartitions(_.map { r =>
      val frames = decodeFrames(r)
      if (frames.isEmpty)
        (frames, Some(QuarantinedMedia(r.media_id, r.media_type, r.n_bytes,
          "no frames decoded (unrecognized or corrupt container)")))
      else (frames, Option.empty[QuarantinedMedia])
    })
    (tagged.flatMap(_._1)
      .toDF("media_id", "frame_idx", "width", "height", "mean_byte"),
      tagged.flatMap(_._2))
  }

  /** 64-bit AUDIO FINGERPRINT (energy-envelope variant of Haitsma &
    * Kalker, "A Highly Robust Audio Fingerprinting System", ISMIR
    * 2002): decode via the REAL JDK codec, mix to mono in exact
    * integer arithmetic, cut the clip into 65 equal-DURATION frames
    * (time-normalized, so the hash is invariant to sample rate —
    * resampled re-encodes are the dominant duplication mode of a
    * crawled audio corpus), and emit one bit per adjacent-frame
    * ENERGY DIFFERENCE sign. Difference signs survive amplitude
    * scaling and codec noise where absolute energies don't (the H&K
    * insight, applied to the envelope instead of 33 spectral bands —
    * the JDK has no FFT, and the envelope keeps the kernel exact
    * integer). The frame comparison cross-multiplies integer sums
    * (`sum1·n0 > sum0·n1`), so there is no floating point anywhere —
    * a fingerprint is a pure function of the decoded waveform. None
    * for payloads no installed reader parses or non-16-bit
    * encodings. */
  def audioFingerprint64(payload: Array[Byte]): Option[Long] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      // ch <= 0 would divide by zero below — a recognized-but-corrupt
      // fmt chunk can report 0 channels
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels <= 0) None
      else {
        val bytes = ais.readAllBytes()
        val ch = fmt.getChannels
        val nFrames = bytes.length / (2 * ch)
        if (nFrames < 65) None
        else {
          // per-PCM-frame absolute mono energy, summed per time bucket
          val nb = 65
          val sums = new Array[Long](nb)
          val cnts = new Array[Long](nb)
          var i = 0
          while (i < nFrames) {
            var acc = 0L
            var c = 0
            while (c < ch) {
              val o = 2 * (i * ch + c)
              val v =
                if (fmt.isBigEndian) (bytes(o).toInt << 8) | (bytes(o + 1) & 0xff)
                else (bytes(o + 1).toInt << 8) | (bytes(o) & 0xff)
              acc += math.abs(v)
              c += 1
            }
            val b = (i.toLong * nb / nFrames).toInt
            sums(b) += acc
            cnts(b) += 1
            i += 1
          }
          var bits = 0L
          var k = 0
          while (k < 64) {
            // mean(k+1) > mean(k), cross-multiplied — exact integers
            if (sums(k + 1) * cnts(k) > sums(k) * cnts(k + 1))
              bits |= (1L << k)
            k += 1
          }
          Some(bits)
        }
      }
    } catch {
      // NonFatal, not just UnsupportedAudioFileException: a payload
      // with a valid RIFF header but corrupt body can surface an
      // IOException from the codec mid-decode — one bad clip must
      // quarantine itself, never fail the whole near-dup job (the
      // batch mapPartitions path has no outer guard)
      case scala.util.control.NonFatal(_) => None
    }

  /** Audio fingerprints for a media frame: (media_id, simhash) — the
    * [[pHashes]] twin for audio, riding the SAME banded hamming join
    * as text SimHash and image pHash. Undecodable payloads are
    * dropped (quarantine upstream via
    * [[extractAudioFeaturesWithQuarantine]] if auditability
    * matters). */
  def audioFingerprints(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r =>
      audioFingerprint64(r.payload).map(h => (r.media_id, h))))
      .toDF("media_id", "simhash")
  }

  /** AUDIO NEAR-DUPLICATE pairs — the audio member of the near-dup
    * family (d4 text SimHash, mm6 image pHash): fingerprint per clip,
    * then the banded hamming join from [[Dedup.simHashPairs]]
    * (pigeonhole recall 1 for `maxHamming` < `bands`; never
    * all-pairs). Catches resampled and re-encoded copies that byte
    * fingerprints miss. */
  def audioNearDup(media: Dataset[MediaRecord], bands: Int = 8,
                   maxHamming: Int = 6): DataFrame =
    Dedup.simHashPairs(audioFingerprints(media), "media_id", bands,
      maxHamming)

  /** Deterministic amplitude-STEP 16-bit PCM WAV through the REAL
    * encoder — [[blockPng]]'s audio twin for fingerprint tests: the
    * clip is `amps.length` constant-amplitude segments of
    * `framesPerStep` frames each. Rendering the same `amps` at two
    * sample rates with proportional `framesPerStep` yields the same
    * DURATION profile, so [[audioFingerprint64]]'s time-normalized
    * buckets recover the identical difference-sign sequence — hamming
    * 0 across rates, by exact integer arithmetic (no measured-margin
    * caveat needed). */
  def stepWav(amps: Seq[Int], framesPerStep: Int,
              sampleRate: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false) // signed, little-endian, mono
    val n = amps.length * framesPerStep
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val a = amps(i / framesPerStep).toShort
      data(2 * i) = (a & 0xff).toByte
      data(2 * i + 1) = ((a >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** MEDIA QUALITY FILTER — the decode→threshold gate every
    * multimodal training pipeline runs before anything expensive
    * (LAION-style dimension/aspect floors and exposure bounds for
    * images; duration and silence floors for audio). One narrow pass
    * per record through the REAL codecs, no shuffle; each record gets
    * a verdict with the FIRST failed rule's name, so rejects are
    * auditable and re-processable after a threshold change — never a
    * silent drop. Rules, in order:
    *   images:  undecodable → too_small (min(w,h) < `minDim`) →
    *            extreme_aspect (max > `maxAspect`·min) →
    *            dark_or_blown (mean decoded sample outside
    *            [`minMean`,`maxMean`]) → ok
    *   audio:   undecodable → too_short (frames/rate < `minSeconds`)
    *            → silent (mean |sample| < `minMeanAbs`) → ok
    * Everything is a pure function of the decoded payload — both the
    * solid-PNG mean and the constant-PCM mean are integer-exact, so
    * an arithmetic oracle can predict every verdict. */
  def qualityVerdicts(media: Dataset[MediaRecord], minDim: Int = 64,
                      maxAspect: Double = 2.0, minMean: Double = 16.0,
                      maxMean: Double = 240.0, minSeconds: Double = 0.25,
                      minMeanAbs: Double = 50.0): Dataset[MediaQualityVerdict] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      if (r.media_type.startsWith("audio/")) {
        val dec = try decodeAudio(r) catch {
          case scala.util.control.NonFatal(_) => None
        }
        val reason = dec match {
          case None => "undecodable"
          case Some(a) =>
            if (a.sample_rate <= 0 ||
              a.n_frames.toDouble / a.sample_rate < minSeconds) "too_short"
            else if (a.mean_abs < minMeanAbs) "silent"
            else "ok"
        }
        MediaQualityVerdict(r.media_id, "audio", reason == "ok", reason)
      } else if (r.media_type.startsWith("image/")) {
        val dec = try decodeImage(r) catch {
          case scala.util.control.NonFatal(_) => None
        }
        val reason = dec match {
          case None => "undecodable"
          case Some(f) =>
            if (math.min(f.width, f.height) < minDim) "too_small"
            else if (math.max(f.width, f.height) >
              maxAspect * math.min(f.width, f.height)) "extreme_aspect"
            else if (f.mean_byte < minMean || f.mean_byte > maxMean)
              "dark_or_blown"
            else "ok"
        }
        MediaQualityVerdict(r.media_id, "image", reason == "ok", reason)
      } else {
        // video/, text/, anything else: reject AS ITS OWN MODALITY —
        // running the image codec on an mp4 would misattribute it as
        // a broken image and skew the per-modality reject dashboards
        // this lane exists for
        val modality = r.media_type.takeWhile(_ != '/') match {
          case "" => "unknown"
          case m => m
        }
        MediaQualityVerdict(r.media_id, modality, ok = false,
          "unsupported_modality")
      }
    })
  }

  /** [[blockPng]] at one of the two fixed test renders: the 64×48
    * master, or the 96×72 RESIZE of the same block pattern. The
    * single definition is shared by the mm6 gate and its spec — like
    * [[stepWavAt]] for audio, their oracles only stay aligned if
    * every site renders the identical pair. */
  def blockPngAt(seed: Long, alt: Boolean): Array[Byte] =
    if (alt) blockPng(96, 72, seed) else blockPng(64, 48, seed)

  /** The 65-step amplitude pattern for a fingerprint-test clip —
    * pseudo-random per (seed, step) via the FULL murmur3 finalizer
    * (two multiply rounds). The 1-round mix [[blockPng]] uses leaves
    * enough linear structure across lattice inputs that two SEEDS'
    * difference-sign sequences can collide outright (measured:
    * hamming 0 at 150 seeds) — the DCT smooths that out for images;
    * the envelope hash has no such smoothing, so the amplitudes must
    * be genuinely independent. The single definition is shared by the
    * mm7/st15 gates and their specs: their oracles only stay aligned
    * if every site generates the identical pattern. */
  def stepAmps(seed: Long): IndexedSeq[Int] = (0 until 65).map { seg =>
    var h = seed * 1000003L + seg * 8887L
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
    h *= 0xc4ceb9fe1a85ec53L; h ^= (h >>> 33)
    (h & 0x3fff).toInt
  }

  /** [[stepAmps]] rendered through [[stepWav]] at one of two rates:
    * the 8 kHz master, or the 16 kHz RESAMPLED re-encode of the same
    * clip (identical duration profile → identical fingerprint). */
  def stepWavAt(seed: Long, highRate: Boolean): Array[Byte] =
    if (highRate) stepWav(stepAmps(seed), framesPerStep = 100, sampleRate = 16000)
    else stepWav(stepAmps(seed), framesPerStep = 50, sampleRate = 8000)

  /** Deterministic animated GIF through the REAL encoder: frame i is
    * solid gray `grays(i)`. GIF palettes are exact for solid frames,
    * so [[decodeFrames]] must recover every (index, dims, gray)
    * verbatim — [[grayPng]]/[[pcmWav]]'s video twin. */
  def animatedGif(width: Int, height: Int, grays: Seq[Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    grays.foreach { g0 =>
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g = g0 & 0xff
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }
}
