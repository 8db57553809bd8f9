package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.PcaCodec

/** Pins the PCAR<d> (random-rotation) and PCAW<d> (whitening) flavors of
 *  the PCA transform chain (FAISS PCAMatrix random_rotation /
 *  eigen_power=-0.5 analogs). Both fold into the stored rotation matrix at
 *  fit time, so this spec checks the FOLDED semantics: PCAR stays a pure
 *  rotation (orthonormal rows, full-dim == exact top-k) while actually
 *  differing from the plain eigenbasis; PCAW's output coordinates are
 *  unit-variance on the training sample and its indexes refuse radius
 *  semantics at any dim. */
class PcaVariantsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.graft.ann.root", s"/tmp/graft-test-pcav-${System.nanoTime()}")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val sf = "/root/testdata/sf0.001"
  lazy val emb: DataFrame = spark.read.parquet(s"$sf/embeddings.parquet")

  private lazy val all: Array[(Long, Array[Float])] = emb
    .select("vec_id", "embedding").collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  private lazy val q0: Array[Float] = all.minBy(_._1)._2

  private def exactTop(k: Int, q: Array[Float]): Seq[Long] =
    all.map { case (id, v) =>
      (graft.core.VectorOps.l2SqDoubleAcc(v, q), id)
    }.sortBy(t => (t._1, t._2)).take(k).map(_._2).toSeq

  test("PCAR fit: rows orthonormal AND distinct from the plain eigenbasis") {
    val sample = all.take(300).map(_._2)
    val dim = sample(0).length
    val plain = PcaCodec.fit(sample, dim)
    val pcar = PcaCodec.fit(sample, dim, "r")
    for (a <- pcar.rotation.indices; b <- a until pcar.rotation.length) {
      var s = 0.0
      pcar.rotation(a).indices.foreach(i =>
        s += pcar.rotation(a)(i).toDouble * pcar.rotation(b)(i).toDouble)
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(s - want) < 1e-4, s"pcar[$a]·pcar[$b] = $s, want $want")
    }
    // the random rotation actually composed: rows are not the eigenrows
    val same = plain.rotation.indices.count { r =>
      plain.rotation(r).indices.forall(i =>
        math.abs(plain.rotation(r)(i) - pcar.rotation(r)(i)) < 1e-6)
    }
    assert(same < plain.rotation.length / 2,
      s"$same/${plain.rotation.length} PCAR rows equal the plain eigenrows — rotation not applied")
  }

  test("PCAW fit: transformed sample has ~unit variance per component") {
    val sample = all.take(300).map(_._2)
    val pcaw = PcaCodec.fit(sample, 16, "w")
    val ys = sample.map(pcaw.transform)
    for (c <- 0 until 16) {
      val col = ys.map(_(c).toDouble)
      val m = col.sum / col.length
      val v = col.map(y => (y - m) * (y - m)).sum / (col.length - 1)
      assert(math.abs(v - 1.0) < 0.05, s"whitened component $c variance $v != 1")
    }
  }

  test("full-dim PCAR chain == exact top-k (Q·R is still a rotation)") {
    Ann.buildIndexFactory(emb, "embedding", "vec_id", "pcar_full", "PCAR64,Flat")
    val meta = IndexCatalog.load(Ann.root(spark), "pcar_full")
    assert(meta.engine == "flat" && meta.pcaVariant == "r" && meta.inputDim == 64)
    val got = Ann.search(emb, "vec_id", "pcar_full", q0, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got.sorted == exactTop(10, q0).sorted,
      s"PCAR-rotated top-10 set differs from exact: $got")
  }

  test("PCAW chain end-to-end: self-retrieval at 0 over an IVF terminal") {
    Ann.buildIndexFactory(emb, "embedding", "vec_id", "pcaw_ivf",
      "PCAW16,IVF8,Flat", Ann.BuildParams(nprobe = 8))
    val meta = IndexCatalog.load(Ann.root(spark), "pcaw_ivf")
    assert(meta.engine == "ivfflat" && meta.pcaVariant == "w" && meta.dim == 16)
    val got = Ann.search(emb, "vec_id", "pcaw_ivf", q0, 10)
      .select("vec_id", "_distance").collect()
      .map(r => (r.getLong(0), r.getFloat(1)))
    // any linear map sends the self-query to its own stored point
    assert(got.head._1 == all.minBy(_._1)._1 && got.head._2 == 0.0f,
      s"whitened self-query did not retrieve itself first: ${got.toSeq}")
    assert(got.length == 10)
  }

  test("range search REJECTS whitened indexes at any dim (Mahalanobis space)") {
    Ann.buildIndexFactory(emb, "embedding", "vec_id", "pcaw_full", "PCAW64,Flat")
    val e = intercept[IllegalArgumentException] {
      Ann.rangeSearch(emb, "vec_id", "pcaw_full", q0, 1.0f)
    }
    assert(e.getMessage.contains("Mahalanobis"), e.getMessage)
    // PCAR full-dim stays allowed: still a metric-space rotation
    Ann.buildIndexFactory(emb, "embedding", "vec_id", "pcar_rng", "PCAR64,Flat")
    assert(Ann.rangeSearch(emb, "vec_id", "pcar_rng", q0, Float.MaxValue)
      .count() == all.length)
  }

  test("factory grammar: variants parse, bad variants reject") {
    assert(Ann.parseFactory("PCAR32,Flat").pcaVariant == "r")
    assert(Ann.parseFactory("pcaw16,IVF8,Flat").pcaVariant == "w")
    assert(Ann.parseFactory("PCA32,Flat").pcaVariant == "")
    val e = intercept[IllegalArgumentException] {
      Ann.parseFactory("PCAR32,HNSW16")
    }
    assert(e.getMessage.contains("terminal"), e.getMessage)
  }
}
