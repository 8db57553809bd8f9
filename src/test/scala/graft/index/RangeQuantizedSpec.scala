package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Sq8Codec

/**
 * Pins quantized range search (FAISS range_search on quantized indexes):
 * the radius filters CODE-SPACE distances — the metric distance to the
 * dequantized reconstruction, computed as a sequential double fold — and
 *  - ivfsq + L2 answers EXACTLY in code space at ANY nprobe, because its
 *    cluster-pruning radii are computed over the reconstructions themselves
 *    (buildIvfSq's radii.bin);
 *  - pq answers exactly in code space via a full code scan;
 *  - ivfpq at saturating nprobe equals the reconstruction brute force
 *    (centroid + decoded residual), and at nprobe < nlist returns a subset.
 */
class RangeQuantizedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.graft.ann.root", s"/tmp/graft-test-rangeq-${System.nanoTime()}")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val sf = "/root/testdata/sf0.001"
  lazy val emb: DataFrame = spark.read.parquet(s"$sf/embeddings.parquet")

  private lazy val all: Array[(Long, Array[Float])] = emb
    .select("vec_id", "embedding").orderBy("vec_id").collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
  private lazy val q0: Array[Float] = all.head._2
  private val radius = 16.5f

  private def dirOf(name: String): String =
    IndexCatalog.indexDir(Ann.root(spark), name)

  private def gotIds(name: String): Set[Long] =
    Ann.rangeSearch(emb, "vec_id", name, q0, radius)
      .select("vec_id").collect().map(_.getLong(0)).toSet

  /** Reconstruction-distance ball via a supplied per-row reconstructor. */
  private def ballOf(reconstruct: Array[Float] => Array[Float]): Set[Long] =
    all.filter { case (_, v) =>
      val vhat = reconstruct(v)
      var s = 0.0
      var d = 0
      while (d < vhat.length) {
        val diff = vhat(d).toDouble - q0(d).toDouble
        s += diff * diff
        d += 1
      }
      s <= radius
    }.map(_._1).toSet

  test("ivfsq: exact in code space at nprobe=1 via dequantized radii pruning") {
    Ann.buildIndexFactory(emb, "embedding", "vec_id", "rq_isq", "IVF4,SQ8",
      Ann.BuildParams(nprobe = 1))
    val sq = IndexCatalog.readCentroids(s"${dirOf("rq_isq")}/sq.bin")
    val (mins, scales) = (sq(0), sq(1))
    val want = ballOf { v =>
      val code = Sq8Codec.encodeRow(v, mins, scales)
      Array.tabulate(v.length)(d =>
        mins(d) + ((code(d) & 0xff) / 255.0f) * scales(d))
    }
    val got = gotIds("rq_isq")
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("pq: full code scan equals the decoded-reconstruction ball") {
    Ann.buildIndexFactory(emb, "embedding", "vec_id", "rq_pq", "PQ8",
      Ann.BuildParams(seedK = 16))
    val cb = PqCodec.read(s"${dirOf("rq_pq")}/pq.bin")
    val want = ballOf(v => PqCodec.decode(cb, PqCodec.encode(cb, v)))
    assert(gotIds("rq_pq") == want)
  }

  test("ivfpq: saturating nprobe equals the residual-reconstruction ball; " +
      "probe-limited is a subset") {
    Ann.buildIndexFactory(emb, "embedding", "vec_id", "rq_ipq", "IVF4,PQ8",
      Ann.BuildParams(seedK = 16, nprobe = 4))
    val dir = dirOf("rq_ipq")
    val cents = IndexCatalog.readCentroids(s"$dir/centroids.bin")
    val cb = PqCodec.read(s"$dir/pq.bin")
    val want = ballOf { v =>
      val c = cents(KMeansLite.nearest(cents, v))
      val r = Array.tabulate(v.length)(d => v(d) - c(d))
      val rhat = PqCodec.decode(cb, PqCodec.encode(cb, r))
      Array.tabulate(v.length)(d => c(d) + rhat(d))
    }
    assert(gotIds("rq_ipq") == want)
    Ann.setNprobe(spark, "rq_ipq", 1)
    val pruned = gotIds("rq_ipq")
    assert(pruned.subsetOf(want))
  }
}
