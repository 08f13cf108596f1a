package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, plus the transform
  * stages (decode → feature-extract → frame-sample) as real Spark
  * plans.
  *
  * Decoding: [[decodeFeaturesJvm]] is a REAL `mapPartitions` decode
  * stage for the formats the JDK ships codecs for — PNG/JPEG/BMP/GIF
  * via `javax.imageio` (features = side×side grayscale thumbnail
  * luminances, the aHash-style image fingerprint) and PCM WAV via
  * `javax.sound.sampled` (features = per-segment RMS energy).
  * Undecodable payloads surface as null features, never a crash of the
  * task. [[decodeFeaturesStub]] remains for formats with no JVM codec
  * (video containers, MP3) — swap in a `mapInArrow` stage batching to a
  * Python worker with the same (bytes → Array[Float]) contract and
  * nothing else in the plan changes. */
object Multimodal {

  /** Canonical media table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("format", StringType))))))

  /** Deterministic synthetic media frame for tests/demos: payload bytes
    * derived from the id (stands in for real files on object storage). */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("id") % 3 + 1).cast("int")).as("media_type"),
      sha2(col("id").cast("string"), 256).cast("binary").as("bytes"),
      struct(
        (col("id") % 1920 + 1).cast("int").as("width"),
        (col("id") % 1080 + 1).cast("int").as("height"),
        (col("id") * 7919 % 60000 + 1000).as("duration_ms"),
        lit("synthetic").as("format")).as("meta"))
  }

  /** STUB decode for formats with no JVM codec (video containers,
    * MP3): deterministic pseudo-features from the payload hash, `dim`
    * floats in [-1, 1]. JDK-codec formats use [[decodeFeaturesJvm]];
    * the real swap-in here is a `mapInArrow` stage batching ~1k rows to
    * a Python worker — identical (bytes → Array[Float]) contract, same
    * downstream plan. */
  def decodeFeaturesStub(dim: Int)(bytesCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(bytesCol, i), lit(2000L)).cast("double") / 1000.0) - 1.0)

  /** Synthetic media with REAL encoded payloads (deterministic from the
    * id): image rows carry an actual PNG (8×8 two-tone pattern), audio
    * rows an actual PCM WAV (square wave, amplitude keyed to the id),
    * video rows an opaque payload (no JVM codec — the stub/Arrow
    * path). Encoding runs inside mapPartitions on executors — the
    * driver never holds the corpus. */
  def syntheticMediaReal(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].mapPartitions { it =>
      it.map { id =>
        val tpe = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val bytes: Array[Byte] = tpe match {
          case "image" =>
            val img = new java.awt.image.BufferedImage(8, 8,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                val on = ((x + y + id) % 3) == 0
                img.setRGB(x, y, if (on) 0xffffff else 0x202020)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            if (!javax.imageio.ImageIO.write(img, "png", bos))
              throw new IllegalStateException(
                "no PNG ImageWriter on this JVM — cannot synthesize image payloads")
            bos.toByteArray
          case "audio" =>
            val nSamples = 400
            val amp = (8000 + (id % 8) * 3000).toInt
            val raw = new Array[Byte](2 * nSamples)
            var i = 0
            while (i < nSamples) {
              val v = (if ((i / 4) % 2 == 0) amp else -amp).toShort
              raw(2 * i) = (v & 0xff).toByte
              raw(2 * i + 1) = ((v >> 8) & 0xff).toByte
              i += 1
            }
            val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
            val bos = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(
              new javax.sound.sampled.AudioInputStream(
                new java.io.ByteArrayInputStream(raw), fmt, nSamples.toLong),
              javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
            bos.toByteArray
          case _ =>
            java.security.MessageDigest.getInstance("SHA-256")
              .digest(id.toString.getBytes)
        }
        (id, tpe, bytes)
      }
    }.toDF("media_id", "media_type", "bytes")
  }

  /** Synthetic image corpus with PLANTED near-duplicates, as real
    * PNGs: `nGroups` base 16×16 patterns (deterministic from the
    * group id), each emitted in `variants` copies differing by two
    * flipped pixels — the "same photo, tiny edit" shape a perceptual
    * near-dup pass must catch. media_id = group·variants + variant.
    * Encoding runs on executors ([[syntheticMediaReal]] discipline). */
  def syntheticNearDupImages(
      spark: SparkSession, nGroups: Int, variants: Int = 3): DataFrame = {
    import spark.implicits._
    spark.range(nGroups.toLong * variants).as[Long].mapPartitions { it =>
      it.map { id =>
        val g = id / variants
        val v = (id % variants).toInt
        val img = new java.awt.image.BufferedImage(16, 16,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val flipA = ((g * 31 + v * 97) % 256).toInt
        val flipB = ((g * 59 + v * 151 + 13) % 256).toInt
        var p = 0
        while (p < 256) {
          val x = p % 16; val y = p / 16
          // deterministic per-group texture: splitmix64-style mix so
          // every (group, pixel) bit is independent — a linear formula
          // here collapses 60 groups onto a handful of patterns
          var h = g * 0x9E3779B97F4A7C15L + p * 0xC2B2AE3D27D4EB4FL
          h ^= (h >>> 29); h *= 0xBF58476D1CE4E5B9L; h ^= (h >>> 32)
          val base = (h & 7L) < 3L
          val on = if (p == flipA || p == flipB) !base else base
          img.setRGB(x, y, if (on) 0xe0e0e0 else 0x101010)
          p += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        if (!javax.imageio.ImageIO.write(img, "png", bos))
          throw new IllegalStateException("no PNG ImageWriter on this JVM")
        (id, "image", bos.toByteArray)
      }
    }.toDF("media_id", "media_type", "bytes")
  }

  /** Row of the decoded-features frame (mapPartitions output). */
  final case class MediaFeatures(
      media_id: Long, media_type: String, features: Array[Float])

  /** REAL decode → feature-extract for JDK-codec formats, as the
    * `mapPartitions` stage the class doc promises: images decode with
    * `ImageIO` and reduce to a side×side grayscale thumbnail of
    * luminances in [0,1] (the perceptual aHash layout — near-dup images
    * land near each other in cosine space); audio decodes with
    * `javax.sound.sampled` and reduces to per-segment RMS energy.
    * Partition-local work only — codecs run inside the task, bytes
    * never leave the executor, nulls mark undecodable payloads. */
  def decodeFeaturesJvm(
      df: DataFrame, side: Int = 8, audioBins: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("media_type").cast("string"),
      col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, tpe, bytes) =>
          val feats = tpe match {
            case "image" => imageFeatures(bytes, side)
            case "audio" => audioFeatures(bytes, audioBins)
            case _ => null // no JVM codec (video): stub/Arrow stage territory
          }
          MediaFeatures(id, tpe, feats)
        }
      }
      .toDF()
  }

  /** side×side grayscale luminance thumbnail in [0,1], row-major; null
    * when ImageIO has no codec for (or cannot parse) the payload. */
  private[operators] def imageFeatures(bytes: Array[Byte], side: Int): Array[Float] = {
    if (bytes == null) return null
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return null
      val scaled = new java.awt.image.BufferedImage(
        side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = scaled.createGraphics()
      try g.drawImage(img, 0, 0, side, side, null) finally g.dispose()
      val out = new Array[Float](side * side)
      var y = 0
      while (y < side) {
        var x = 0
        while (x < side) {
          val rgb = scaled.getRGB(x, y)
          val lum = 0.299 * ((rgb >> 16) & 0xff) +
            0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          out(y * side + x) = (lum / 255.0).toFloat
          x += 1
        }
        y += 1
      }
      out
    } catch { case _: Exception => null }
  }

  /** Per-segment RMS energy over `bins` equal time slices of a PCM WAV
    * payload (16-bit signed, any channel count
    * (channels averaged per frame); null when the payload is not a
    * parseable audio stream. */
  private[operators] def audioFeatures(bytes: Array[Byte], bins: Int): Array[Float] = {
    if (bytes == null) return null
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16) return null
        val channels = math.max(1, fmt.getChannels)
        val raw = ais.readAllBytes()
        val bigEndian = fmt.isBigEndian
        // bin on FRAME boundaries (one frame = all channels' samples at
        // one instant), averaging channels — slicing the interleaved
        // stream directly would split frames mid-channel and drift the
        // bin time boundaries on multi-channel input
        val nFrames = raw.length / (2 * channels)
        if (nFrames == 0) return null
        def sampleAt(idx: Int): Double = {
          val lo = raw(2 * idx) & 0xff; val hi = raw(2 * idx + 1) & 0xff
          (if (bigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort / 32768.0
        }
        val out = new Array[Float](bins)
        val perBin = math.max(1, nFrames / bins)
        var b = 0
        while (b < bins) {
          val from = b * perBin
          val to = if (b == bins - 1) nFrames else math.min(nFrames, from + perBin)
          var sum = 0.0
          var f = from
          while (f < to) {
            var c = 0
            var frame = 0.0
            while (c < channels) { frame += sampleAt(f * channels + c); c += 1 }
            val v = frame / channels
            sum += v * v
            f += 1
          }
          out(b) = (if (to > from) math.sqrt(sum / (to - from)) else 0.0).toFloat
          b += 1
        }
        out
      } finally ais.close()
    } catch { case _: Exception => null }
  }

  /** Resize plumbing: metadata transform only (the byte transform is
    * part of the stubbed codec stage). */
  def resizeMeta(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide) / col("meta.width"), lit(maxSide) / col("meta.height"), lit(1.0))
    df.withColumn("meta", struct(
      ceil(col("meta.width") * scale).cast("int").as("width"),
      ceil(col("meta.height") * scale).cast("int").as("height"),
      col("meta.duration_ms").as("duration_ms"),
      col("meta.format").as("format")))
  }

  /** Frame sampling for video rows: one output row per sampled
    * timestamp (explode of a sequence — distributes, no driver loop). */
  def frameSample(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("media_type") === "video")
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))))
      .select(col("media_id"), col("frame_ts_ms"), col("bytes"), col("meta"))

  /** Full feature-extraction stage: decode stub → feature column,
    * repartitioned for downstream ANN (bucket-friendly layout). */
  def extractFeatures(df: DataFrame, dim: Int, partitions: Int): DataFrame =
    df.repartition(partitions, col("media_id"))
      .withColumn("features", decodeFeaturesStub(dim)(col("bytes")))
      .select(col("media_id"), col("media_type"), col("features"))
}
