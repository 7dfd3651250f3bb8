package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus partition-batched decode / feature-extract /
  * frame-sample operators.
  *
  * IMAGE decode is REAL: the JDK's built-in `javax.imageio` codecs
  * (png/jpeg/gif/bmp ship with every JRE) extract true width/height/
  * channels/brightness on the executors. AUDIO decode is REAL for
  * WAV/AU/AIFF via the JDK's `javax.sound.sampled` (header-only parse —
  * sample rate, channels, frame count, duration). VIDEO decode and
  * frame sampling are REAL for MJPEG-in-AVI (a RIFF walk finds the
  * `movi` stream chunks; each MJPEG frame is a standalone JPEG ImageIO
  * decodes natively — [[aviVideoFrames]]/[[videoDecode]]/
  * [[sampleVideoFrames]]). Bytes no installed reader understands
  * (non-MJPEG codecs, compressed audio, arbitrary blobs) fall back to
  * deterministic stand-ins derived from the bytes and flagged
  * `decoded = false`, so the Spark-side plumbing — schema, batch shape,
  * partition-iterator processing — stays exercised end-to-end even for
  * the formats whose codecs aren't on this classpath.
  *
  * Scale notes: media blobs ride in parquet binary columns; the decode
  * operators run as `mapPartitions` over whole partitions (one JVM-side
  * batch per partition, the Scala analogue of `mapInPandas`), so per-row
  * overhead is amortized and the blob bytes never shuffle — only extracted
  * features do. Keep blobs out of shuffle keys; partition by content id.
  */
object Multimodal {

  /** Canonical media schema: id + blob + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)
    )), nullable = true)
  ))

  /** Wrap any table with a text-ish payload column into the media schema
    * (test harness: treats utf-8 bytes as the "blob"). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      col(payloadCol).cast(BinaryType).as("content"),
      struct(
        lit(mime).as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))

  /** Real image decode via JDK ImageIO. Returns None when no installed
    * reader understands the bytes — the caller then falls back to the
    * deterministic stub. Brightness is mean luminance over a bounded
    * sample grid (≤ ~64×64 pixels), so a 100-megapixel scan costs the
    * same as a thumbnail. */
  private[graft] def imageDecode(bytes: Array[Byte]): Option[(Int, Int, Int, Double)] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      javax.imageio.ImageIO.setUseCache(false) // no temp-file churn on executors
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val channels = img.getRaster.getNumBands
        val sx = math.max(1, w / 64)
        val sy = math.max(1, h / 64)
        var sum = 0.0
        var n = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
            n += 1
            x += sx
          }
          y += sy
        }
        Some((w, h, channels, math.rint(sum / n / 255.0 * 10000) / 10000))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real audio decode via the JDK's `javax.sound.sampled` (WAV/AU/AIFF
    * codecs ship with every JRE, same as ImageIO's image codecs). Returns
    * (sampleRateHz, channels, frames, durationMs); None when no installed
    * reader understands the bytes. Only the header is parsed — the PCM
    * payload is never buffered, so cost is O(1) per blob. */
  private[graft] def audioDecode(bytes: Array[Byte])
      : Option[(Int, Int, Long, Long)] = {
    if (bytes == null || bytes.length < 12) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val rate = fmt.getSampleRate
        if (rate <= 0 || frames < 0) None
        else Some((rate.toInt, fmt.getChannels, frames,
          (frames * 1000.0 / rate).toLong))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Little-endian u32 at `off` (RIFF chunk sizes). */
  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** REAL video container parse for the one format the bare JVM can
    * fully decode: MJPEG-in-AVI. AVI is RIFF — `RIFF <size> AVI `
    * followed by LIST chunks; the `movi` LIST holds the stream data as
    * `##dc`/`##db` chunks (compressed/uncompressed frame of stream ##),
    * each a standalone JPEG for the MJPEG codec, which the JDK's
    * ImageIO decodes natively. Returns the raw frame payloads in
    * stream order; None when the bytes are not a parseable AVI with at
    * least one video chunk (the caller falls back to the deterministic
    * stand-in, so unparseable codecs keep the plumbing exercised).
    * Bounded and allocation-safe on hostile input: all offsets advance
    * in Long (a crafted 2^31-adjacent chunk size cannot wrap an Int
    * back into range), sizes clamp to the buffer, odd sizes take RIFF's
    * even padding, and nested LIST/`rec ` groups walk via an explicit
    * worklist — no recursion to overflow on adversarially deep
    * nesting. */
  private[graft] def aviVideoFrames(
      bytes: Array[Byte]): Option[Vector[Array[Byte]]] = {
    if (bytes == null || bytes.length < 12) return None
    def fourcc(off: Int) =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    val frames = Vector.newBuilder[Array[Byte]]
    // (start, end) regions still to scan; a LIST pushes its body as a
    // new region — iterative, so hostile nesting depth costs heap-free
    // loop turns, never stack frames
    val regions = scala.collection.mutable.Stack((12L, bytes.length.toLong))
    while (regions.nonEmpty) {
      var (i, end) = regions.pop()
      var open = true
      while (open && i + 8 <= end) {
        val id = fourcc(i.toInt)
        val sz = le32(bytes, i.toInt + 4) // in [0, 2^32)
        val dataStart = i + 8
        val dataEnd = math.min(dataStart + sz, end)
        if (id == "LIST" && dataEnd - dataStart >= 4) {
          val sub = fourcc(dataStart.toInt)
          if (sub == "movi" || sub == "rec ") {
            // resume THIS region after the list, then scan the body
            regions.push((dataStart + sz + (sz & 1), end))
            regions.push((dataStart + 4, dataEnd))
            open = false
          }
        } else if (id(0).isDigit && id(1).isDigit && id(2) == 'd' &&
            (id(3) == 'c' || id(3) == 'b') && dataEnd > dataStart) {
          frames += java.util.Arrays.copyOfRange(bytes, dataStart.toInt,
            dataEnd.toInt)
        }
        if (open) i = dataStart + sz + (sz & 1)
      }
    }
    val f = frames.result()
    if (f.isEmpty) None else Some(f)
  }

  /** Real video decode: MJPEG-AVI frames via [[aviVideoFrames]], first
    * frame's dimensions/brightness via [[imageDecode]]. None when the
    * container or the first frame doesn't parse. */
  private[graft] def videoDecode(
      bytes: Array[Byte]): Option[(Int, Int, Int, Long, Double)] =
    aviVideoFrames(bytes).flatMap { fs =>
      imageDecode(fs.head).map { case (w, h, c, bright) =>
        (w, h, c, fs.length.toLong, bright)
      }
    }

  /** STUB decoder for non-decodable media — deterministic fake:
    * "decodes" a blob into (width, height, channels, brightness)
    * derived from its bytes. Images decode for real via [[imageDecode]],
    * audio via [[audioDecode]], MJPEG-AVI video via [[videoDecode]];
    * other video codecs land here (classpath re-checked through round
    * 14 — still no jcodec/javacv/ffmpeg/bytedeco jar under
    * /opt/spark/jars, so non-MJPEG codecs have no JVM decoder). */
  private[graft] def fakeDecode(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    if (bytes == null || bytes.isEmpty) (0, 0, 0, 0.0)
    else {
      val w = 16 + (math.abs(bytes.head.toInt) % 64)
      val h = 16 + (math.abs(bytes.last.toInt) % 64)
      val brightness = bytes.take(256).map(b => (b & 0xff).toDouble).sum /
        math.min(bytes.length, 256) / 255.0
      (w, h, 3, math.rint(brightness * 10000) / 10000)
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("brightness", DoubleType, nullable = false)))

  /** Decode + feature-extract, batched per partition. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val (w, h, c, bright) = imageDecode(bytes).getOrElse(fakeDecode(bytes))
        Row(id, bytes.length.toLong, w, h, c, bright)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Audio decode + feature-extract, batched per partition like
    * [[extractFeatures]]. Real for WAV/AU/AIFF (JDK codecs); bytes no
    * reader understands fall back to a deterministic stand-in (sample
    * rate 16 kHz, 1 channel, one "frame" per 32 bytes) so the plumbing
    * stays exercised for compressed formats whose codecs aren't on this
    * classpath. */
  def extractAudioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val (rate, ch, frames, durMs) = audioDecode(bytes).getOrElse {
          val frames = bytes.length / 32L
          (16000, 1, frames, frames * 1000 / 16000)
        }
        Row(id, bytes.length.toLong, rate, ch, frames, durMs)
      }
    }
    spark.createDataFrame(rdd, audioFeatureSchema)
  }

  val videoFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("brightness", DoubleType, nullable = false),
    StructField("decoded", BooleanType, nullable = false)))

  /** Video decode + feature-extract, batched per partition like
    * [[extractFeatures]]. REAL for MJPEG-in-AVI (RIFF parse + per-frame
    * JDK ImageIO — [[videoDecode]]); other bytes fall back to the
    * deterministic stand-in with one "frame" per 4096 bytes, flagged
    * `decoded = false` so downstream QC can split real from plumbed. */
  def extractVideoFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes =
          if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        videoDecode(bytes) match {
          case Some((w, h, c, nf, bright)) =>
            Row(id, bytes.length.toLong, w, h, c, nf, bright, true)
          case None =>
            val (w, h, c, bright) = fakeDecode(bytes)
            // ceil, matching sampleVideoFrames' fallback slice count —
            // the two operators must agree on a blob's frame count
            Row(id, bytes.length.toLong, w, h, c,
              (bytes.length + 4095L) / 4096L, bright, false)
        }
      }
    }
    spark.createDataFrame(rdd, videoFeatureSchema)
  }

  val videoFrameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false),
    StructField("decoded", BooleanType, nullable = false)))

  /** REAL frame sampling: every `stride`-th video frame of an
    * MJPEG-AVI blob as a standalone JPEG binary (each row feeds
    * [[imageDHash]]/[[extractFeatures]] directly — the video near-dup
    * path is image near-dup over sampled frames). Blobs that don't
    * parse as AVI fall back to [[sampleFrames]]-style 4096-byte slices
    * flagged `decoded = false`. Partition-batched; frame bytes never
    * shuffle unless the caller keys on them. */
  def sampleVideoFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes =
          if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        aviVideoFrames(bytes) match {
          case Some(fs) =>
            fs.iterator.zipWithIndex.collect {
              case (f, i) if i % stride == 0 => Row(id, i, f, true)
            }
          case None =>
            // Long arithmetic to match extractVideoFeatures' count for
            // blobs within 4095 bytes of Int.MaxValue (Int form wraps
            // negative there and would emit zero frames)
            val n = ((bytes.length + 4095L) / 4096L).toInt
            (0 until n by stride).iterator.map { i =>
              val from = i * 4096
              Row(id, i, java.util.Arrays.copyOfRange(bytes, from,
                math.min(from + 4096, bytes.length)), false)
            }
        }
      }
    }
    spark.createDataFrame(rdd, videoFrameSchema)
  }

  /** Frame-sampling plumbing: split a blob into fixed-size "frames" and
    * emit every `stride`-th one — the partitioning/explode shape of video
    * frame extraction, with byte-slicing standing in for a codec. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    media.select(col("media_id"), col("content"))
      .withColumn("n_frames",
        ceil(octet_length(col("content")).cast("double") / frameBytes).cast("int"))
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), col("n_frames") - 1), i => i % stride === 0)))
      .select(col("media_id"), col("frame_idx"),
        col("content").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame"))
  }

  /** "Resize": truncate/pad the blob to a target byte budget — stands in
    * for image resize; shows the binary-in/binary-out operator shape. */
  def resizeBlob(media: DataFrame, targetBytes: Int): DataFrame =
    media.withColumn("content",
      substring(col("content"), 1, targetBytes))

  /** 64-bit difference hash (dHash) of a REAL decoded image: 9×8
    * point-sampled luminances, one bit per horizontal gradient sign —
    * the standard perceptual near-dup fingerprint (crop-resistant within
    * a few bits, compression/resize-invariant). None when no installed
    * ImageIO reader understands the bytes. Cost is 72 pixel reads per
    * blob regardless of resolution. */
  private[graft] def imageDHash(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 1 || img.getHeight < 1) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val lum = Array.ofDim[Double](8, 9)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 9) {
            val px = math.min(w - 1, x * w / 9)
            val py = math.min(h - 1, y * h / 8)
            val rgb = img.getRGB(px, py)
            lum(y)(x) =
              (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
            x += 1
          }
          y += 1
        }
        var hash = 0L
        var bit = 0
        y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (lum(y)(x) > lum(y)(x + 1)) hash |= (1L << bit)
            bit += 1
            x += 1
          }
          y += 1
        }
        Some(hash)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  val dHashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("dhash", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false)))

  /** Per-blob dHash extraction, batched per partition like
    * [[extractFeatures]]. Non-decodable blobs carry `decoded = false`
    * with a deterministic byte-derived stand-in hash (FNV-1a) so the
    * plumbing runs on any corpus; [[imageNearDupPairs]] drops them —
    * a byte-hash is content-exact, and exact dups are the fingerprint
    * operator's job, not the perceptual one's. */
  def imageDHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        imageDHash(bytes) match {
          case Some(hs) => Row(id, hs, true)
          case None =>
            var h = 0xcbf29ce484222325L
            bytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
            Row(id, h, false)
        }
      }
    }
    spark.createDataFrame(rdd, dHashSchema)
  }

  /** Perceptual image near-dup pairs: dHash per blob, then the Manku
    * 4-block bucketing shared with simhash ([[Dedup.hash64Pairs]]) —
    * exact recall for Hamming ≤ 3, one shuffle on the block keys, never
    * all-pairs. At 100 TB of images only (id, 8-byte hash) rows enter
    * the pair stage; the blobs never shuffle. */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    Dedup.hash64Pairs(imageDHashes(media).filter(col("decoded")),
      "media_id", "dhash", maxHamming, maxBucket)

  /** Perceptual VIDEO near-dup pairs — image near-dup over sampled
    * frames: every `stride`-th MJPEG-AVI frame dHashes
    * ([[sampleVideoFrames]] → [[imageDHash]]), and two videos pair when
    * ANY of their sampled frames land within `maxHamming` — robust to
    * re-encoding, trims that keep shared footage, and frame-rate
    * changes coarser than the stride. Same scale shape as the image
    * family (only (id, 8-byte hash) rows reach the pair stage; one
    * shuffle on the Manku block keys); non-AVI blobs and non-decodable
    * frames are excluded (byte-exactness is the fingerprint operator's
    * job). Frames of the SAME video sharing a hash are filtered out
    * after the bucket join. */
  def videoNearDupPairs(media: DataFrame, stride: Int = 1,
      maxHamming: Int = 3, maxBucket: Int = Dedup.DefaultMaxBucket)
      : DataFrame = {
    val frameHashes = imageDHashes(
      sampleVideoFrames(media, stride).filter(col("decoded"))
        .select(col("media_id"), col("frame").as("content")))
      .filter(col("decoded"))
    Dedup.hash64Pairs(frameHashes, "media_id", "dhash", maxHamming,
        maxBucket)
      .filter(col("id_a") =!= col("id_b"))
      .groupBy("id_a", "id_b").agg(min(col("hamming")).as("hamming"))
  }

  /** 64-bit energy-envelope fingerprint of a REAL decoded audio blob —
    * the dHash idea on the time axis (a Chromaprint-style acoustic
    * fingerprint without the FFT): the PCM stream's mean absolute
    * amplitude over 65 equal windows, one bit per consecutive-window
    * energy gradient. Duration/sample-rate-invariant by construction
    * (windows are fractions of the clip); robust to gain changes (sign
    * of the gradient survives scaling). None when no installed reader
    * understands the bytes (JDK codecs: WAV/AU/AIFF). */
  private[graft] def audioEnvelopeHash(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.length < 12) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val frameSize = fmt.getFrameSize
        val nFrames = in.getFrameLength
        if (frameSize <= 0 || nFrames <= 0) return None
        val pcm = in.readAllBytes()
        val bytesPerSample = math.max(1, fmt.getSampleSizeInBits / 8)
        val big = fmt.isBigEndian
        val signed = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val totalSamples = pcm.length / bytesPerSample
        if (totalSamples < 65) return None
        def sampleAbs(i: Int): Double = {
          val off = i * bytesPerSample
          val v = bytesPerSample match {
            case 1 => if (signed) pcm(off).toInt else (pcm(off) & 0xff) - 128
            case _ =>
              val (hi, lo) = if (big) (pcm(off), pcm(off + 1))
                else (pcm(off + 1), pcm(off))
              (hi.toInt << 8) | (lo & 0xff)
          }
          math.abs(v.toDouble)
        }
        val env = new Array[Double](65)
        var w = 0
        while (w < 65) {
          val start = (w.toLong * totalSamples / 65).toInt
          val end = ((w + 1).toLong * totalSamples / 65).toInt
          var s = 0.0; var i = start
          while (i < end) { s += sampleAbs(i); i += 1 }
          env(w) = if (end > start) s / (end - start) else 0.0
          w += 1
        }
        var hash = 0L
        var b = 0
        while (b < 64) {
          if (env(b) > env(b + 1)) hash |= (1L << b)
          b += 1
        }
        Some(hash)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-blob audio fingerprints ([[audioEnvelopeHash]]), stub-flagged
    * like [[imageDHashes]]. */
  def audioFingerprints(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        audioEnvelopeHash(bytes) match {
          case Some(hs) => Row(id, hs, true)
          case None =>
            var h = 0xcbf29ce484222325L
            bytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
            Row(id, h, false)
        }
      }
    }
    spark.createDataFrame(rdd, dHashSchema)
  }

  /** Acoustic near-dup pairs over real decoded audio — the audio sibling
    * of [[imageNearDupPairs]], riding the same [[Dedup.hash64Pairs]]
    * block bucketing; only (id, 8-byte hash) rows enter the pair stage. */
  def audioNearDupPairs(media: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    Dedup.hash64Pairs(audioFingerprints(media).filter(col("decoded")),
      "media_id", "dhash", maxHamming, maxBucket)
}
