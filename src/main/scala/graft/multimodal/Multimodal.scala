package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing for training-data pipelines: media payloads
 * travel as opaque `BINARY` columns beside a typed metadata struct; decode /
 * feature-extraction / frame-sampling run batched per partition (the Scala
 * analog of `mapInPandas` — one task streams its rows through a reusable
 * kernel, never materializing the partition).
 *
 * Image decode is REAL (`javax.imageio`: PNG/JPEG/GIF/BMP → luminance
 * grid-pool features, [[imageFeatures]]). Audio decode is REAL
 * (`javax.sound.sampled`: WAV/AIFF/AU PCM → per-band RMS features,
 * [[audioFeatures]] — driver-checked bit-exactly via `multimodal_audio`).
 * Video codecs are not available on a bare JVM, so that kernel remains a
 * deterministic STUB (clearly marked) over raw bytes; the Spark-side
 * plumbing — schema, batch shape, partitioning, the feature column feeding
 * the ANN index — is real and tested either way. Swapping the stub for a
 * JNI/javacpp codec changes one function.
 */
object Multimodal {

  /** Metadata struct carried beside every payload column. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  def mediaSchema(idCol: String = "media_id"): StructType = StructType(Seq(
    StructField(idCol, LongType),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaSchema)))

  // ------------------------------------------------------- real image kernel

  /**
   * REAL image decode via `javax.imageio` (PNG/JPEG/GIF/BMP — the formats a
   * bare JVM ships): decode → luminance → `grid`×`grid` mean-pool → flat
   * feature vector in [0,1], row-major. The multimodal analog of the
   * reference's embedding columns: the output is shaped like an embedding
   * and feeds the ANN index directly (tested in MultimodalSpec).
   *
   * Returns null when the payload is not a decodable image — callers choose
   * the fallback (featurizeImages uses the byte-histogram stub so mixed
   * corpora never fail mid-job).
   */
  def imageFeatures(payload: Array[Byte], grid: Int = 4): Array[Float] = {
    if (payload == null || payload.length == 0) return null
    // NonFatal, not just IOException: ImageIO decoders throw runtime
    // exceptions (AIOOBE, NegativeArraySize, IAE) on malformed bodies whose
    // headers looked valid — any decode failure must mean "not an image"
    val img = try {
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    } catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth == 0 || img.getHeight == 0) return null
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Double](grid * grid)
    val counts = new Array[Long](grid * grid)
    var y = 0
    while (y < h) {
      val gy = math.min(y * grid / h, grid - 1)
      var x = 0
      while (x < w) {
        val gx = math.min(x * grid / w, grid - 1)
        val rgb = img.getRGB(x, y)
        // ITU-R BT.601 luma from sRGB bytes, scaled to [0,1]
        val lum = (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)) / 255.0
        val cell = gy * grid + gx
        sums(cell) += lum
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(grid * grid)(c =>
      if (counts(c) == 0) 0.0f else (sums(c) / counts(c)).toFloat)
  }

  /** Batched per-partition image featurization: decode each payload with
   *  [[imageFeatures]]; non-image payloads fall back to the byte-histogram
   *  stub so a mixed binary corpus featurizes in one pass. Adds
   *  `features ARRAY<FLOAT>` (length grid*grid) and `decoded BOOLEAN`. */
  def featurizeImages(df: DataFrame, payloadCol: String, grid: Int = 4): DataFrame = {
    val dims = grid * grid
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("features", ArrayType(FloatType, containsNull = false)),
      StructField("decoded", BooleanType)))
    val idx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val img = imageFeatures(payload, grid)
        val f = if (img != null) img
          else if (payload == null) new Array[Float](dims)
          else stubFeatures(payload, dims)
        Row.fromSeq(r.toSeq ++ Seq(f.toSeq, img != null))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  // ------------------------------------------------------- real audio kernel

  /**
   * REAL audio decode via `javax.sound.sampled` (WAV/AIFF/AU — the formats a
   * bare JVM ships): decode → 16-bit PCM → mono mix → `bands` equal time
   * windows → RMS per window, as a flat feature vector in [0,1]. The audio
   * analog of [[imageFeatures]]' grid pool: shaped like an embedding, feeds
   * the ANN index directly.
   *
   * All accumulation is double-precision; for PCM input the decode is
   * bit-faithful, so a synthesized constant-amplitude band round-trips to
   * exactly `round(amp·32767)/32768` — which is what the `multimodal_audio`
   * DuckDB oracle recomputes analytically.
   *
   * Returns null when the payload is not decodable audio — callers choose
   * the fallback (featurizeAudio uses the byte-histogram stub).
   */
  def audioFeatures(payload: Array[Byte], bands: Int = 8): Array[Float] = {
    if (payload == null || payload.length == 0) return null
    import javax.sound.sampled.{AudioSystem, AudioFormat}
    val in = try {
      AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
    } catch { case scala.util.control.NonFatal(_) => return null }
    try {
      val base = in.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        base.getSampleRate, 16, base.getChannels, base.getChannels * 2,
        base.getSampleRate, false)
      val pcm = if (base.matches(target)) in
        else AudioSystem.getAudioInputStream(target, in)
      val bytes = pcm.readAllBytes()
      val ch = base.getChannels
      val nFrames = bytes.length / (2 * ch)
      if (nFrames == 0) return null
      val sums = new Array[Double](bands)
      val counts = new Array[Long](bands)
      var f = 0
      while (f < nFrames) {
        var acc = 0.0
        var c = 0
        while (c < ch) {
          val off = (f * ch + c) * 2
          val s = (((bytes(off + 1): Int) << 8) | (bytes(off) & 0xff)).toShort
          acc += s / 32768.0
          c += 1
        }
        val v = acc / ch
        val b = math.min(f * bands / nFrames, bands - 1)
        sums(b) += v * v
        counts(b) += 1L
        f += 1
      }
      Array.tabulate(bands)(b =>
        if (counts(b) == 0L) 0.0f else math.sqrt(sums(b) / counts(b)).toFloat)
    } catch { case scala.util.control.NonFatal(_) => null }
    finally in.close()
  }

  /** Batched per-partition audio featurization: decode each payload with
   *  [[audioFeatures]]; non-audio payloads fall back to the byte-histogram
   *  stub so a mixed binary corpus featurizes in one pass. Adds
   *  `features ARRAY<FLOAT>` (length `bands`) and `decoded BOOLEAN`. */
  def featurizeAudio(df: DataFrame, payloadCol: String, bands: Int = 8): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("features", ArrayType(FloatType, containsNull = false)),
      StructField("decoded", BooleanType)))
    val idx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val af = audioFeatures(payload, bands)
        val f = if (af != null) af
          else if (payload == null) new Array[Float](bands)
          else stubFeatures(payload, bands)
        Row.fromSeq(r.toSeq ++ Seq(f.toSeq, af != null))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Deterministic 16-bit mono PCM WAV test signal: `bands` segments of
   *  `samplesPerBand` samples, segment `b` a square wave of constant
   *  amplitude `round(((seed·7 + b) % 16 + 1)/32 · 32767)` — so each band's
   *  RMS is analytically `round(amp·32767)/32768`, reproducible in plain
   *  SQL (the `multimodal_audio` oracle). Also the fixture MultimodalSpec
   *  decodes. */
  def synthWav(seed: Long, bands: Int, samplesPerBand: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioSystem, AudioFormat, AudioInputStream, AudioFileFormat}
    val n = bands * samplesPerBand
    val raw = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val b = i / samplesPerBand
      val amp = ((seed * 7 + b) % 16 + 1) / 32.0
      val mag = Math.round(amp * 32767.0).toInt
      val s = if (i % 2 == 0) mag else -mag
      raw(i * 2) = (s & 0xff).toByte
      raw(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  // ------------------------------------------------------------ stub kernels

  /** STUB decode: byte histogram over `bins` buckets (deterministic fake of
   *  "decode then pool features"). Real impl would decode the payload. */
  def byteHistogram(payload: Array[Byte], bins: Int): Array[Long] = {
    val h = new Array[Long](bins)
    var i = 0
    while (i < payload.length) {
      h((payload(i) & 0xff) % bins) += 1
      i += 1
    }
    h
  }

  /** STUB feature extraction: L1-normalized histogram as Array[Float] —
   *  shaped like an embedding so it can feed the ANN index. */
  def stubFeatures(payload: Array[Byte], dims: Int): Array[Float] = {
    val h = byteHistogram(payload, dims)
    val total = math.max(1L, payload.length.toLong)
    val out = new Array[Float](dims)
    var i = 0
    while (i < dims) { out(i) = h(i).toFloat / total; i += 1 }
    out
  }

  /** STUB frame sampling: every `stride`-th `frameSize`-byte slice (a real
   *  impl samples decoded video frames). */
  def sampleFrames(payload: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] = {
    require(frameSize > 0 && stride > 0)
    val out = Seq.newBuilder[Array[Byte]]
    var off = 0
    var i = 0
    while (off + frameSize <= payload.length) {
      if (i % stride == 0) out += java.util.Arrays.copyOfRange(payload, off, off + frameSize)
      off += frameSize
      i += 1
    }
    out.result()
  }

  // ------------------------------------------------------ DataFrame surface

  /** Batched per-partition featurization (mapInPandas-shaped): adds a
   *  `features ARRAY<FLOAT>` column from a BINARY payload column. */
  def featurize(df: DataFrame, payloadCol: String, dims: Int = 16): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val idx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val f = if (payload == null) new Array[Float](dims) else stubFeatures(payload, dims)
        Row.fromSeq(r.toSeq :+ f.toSeq)
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Exploded frame table: (original columns..., frame_idx INT, frame
   *  BINARY). */
  def explodeFrames(df: DataFrame, payloadCol: String, frameSize: Int,
      stride: Int): DataFrame = {
    val framesUdf = udf((p: Array[Byte]) =>
      if (p == null) Seq.empty[Array[Byte]] else sampleFrames(p, frameSize, stride))
    df.withColumn("__frames", framesUdf(col(payloadCol)))
      .select(col("*"), posexplode(col("__frames")).as(Seq("frame_idx", "frame")))
      .drop("__frames")
  }

}
