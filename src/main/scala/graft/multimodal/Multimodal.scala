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
 * The actual image/audio codecs are NOT available in this environment, so
 * the decode kernels are deterministic STUBS (clearly marked) over raw
 * bytes; the Spark-side plumbing — schema, batch shape, partitioning, the
 * feature column feeding the ANN index — is real and tested. Swapping a
 * stub for a JNI/javacpp codec changes one function.
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
