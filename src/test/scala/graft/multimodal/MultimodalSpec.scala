package graft.multimodal

import org.apache.spark.sql.{SparkSession, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.index.Ann

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.ann.root", s"/tmp/graft-mm-indexes-${System.nanoTime()}")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def mediaDf() = {
    import spark.implicits._
    (0L until 50L).map { i =>
      val payload = Array.tabulate(200 + i.toInt)(j => ((i * 37 + j) % 251).toByte)
      (i, payload, s"img/$i")
    }.toDF("media_id", "payload", "uri")
  }

  test("byteHistogram + stubFeatures deterministic and normalized") {
    val p = Array[Byte](0, 1, 2, 3, 16, 17, 18, 19)
    val h = Multimodal.byteHistogram(p, 16)
    assert(h.sum == p.length)
    assert(h(0) == 2 && h(1) == 2 && h(2) == 2 && h(3) == 2)
    val f = Multimodal.stubFeatures(p, 16)
    assert(math.abs(f.sum - 1.0f) < 1e-6)
  }

  test("featurize adds ARRAY<FLOAT> features per row, batched per partition") {
    val out = Multimodal.featurize(mediaDf(), "payload", dims = 16)
    assert(out.schema("features").dataType.typeName == "array")
    val rows = out.select("media_id", "features").collect()
    assert(rows.length == 50)
    assert(rows.forall(_.getAs[scala.collection.Seq[Float]](1).length == 16))
    // deterministic: same payload → same features
    val again = Multimodal.featurize(mediaDf(), "payload", 16)
      .select("media_id", "features").collect().map(r =>
        r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1)).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.getAs[scala.collection.Seq[Float]](1)))
  }

  test("features feed the ANN index end-to-end (media → embedding → search)") {
    val feats = Multimodal.featurize(mediaDf(), "payload", 16)
    Ann.buildIndex(feats, "features", "media_id", "mm_ix",
      Ann.BuildParams(engine = "flat"))
    val q = Multimodal.stubFeatures(
      Array.tabulate(210)(j => ((10 * 37 + j) % 251).toByte), 16)
    val hits = Ann.search(feats, "media_id", "mm_ix", q, 3).collect()
    assert(hits.head.getLong(0) == 10L, "identical payload features → top-1")
  }

  test("explodeFrames: stride sampling with frame index") {
    val df = mediaDf().where(col("media_id") === 0L)
    val frames = Multimodal.explodeFrames(df, "payload", frameSize = 50, stride = 2)
      .select("media_id", "frame_idx", "frame").collect()
    // payload length 200 → 4 slices of 50, stride 2 → slices 0 and 2
    assert(frames.length == 2)
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1))
    assert(frames.forall(_.getAs[Array[Byte]](2).length == 50))
  }

  test("media schema round-trips through parquet with metadata struct") {
    import spark.implicits._
    val rows = java.util.Arrays.asList(
      Row(1L, Array[Byte](1, 2, 3), Row("png", 64, 64, 0L)),
      Row(2L, Array[Byte](4, 5), Row("wav", 0, 0, 1500L)))
    val df = spark.createDataFrame(rows, Multimodal.mediaSchema())
    val p = s"/tmp/graft-mm-parquet-${System.nanoTime()}"
    df.write.parquet(p)
    val back = spark.read.parquet(p)
    assert(back.schema("meta").dataType == Multimodal.mediaMetaSchema)
    assert(back.count() == 2)
  }
}
