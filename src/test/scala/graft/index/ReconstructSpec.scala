package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Ann.reconstruct]] (FAISS reconstruct/reconstruct_n analog) per
 *  engine: raw storage round-trips exactly (flat/ivf/graph), quantized
 *  engines return their decode (PQ subspace centroids, OPQ inverse
 *  rotation, ivfpq centroid+residual, ivfsq dequantization levels),
 *  RFlat-refined engines return the refine storage's exact vectors,
 *  tombstoned ids are omitted, and LSH rejects. The oracled `ann_reconstruct`
 *  entry covers the ivfsq VALUE replay against DuckDB; this spec pins the
 *  in-JVM decode identities the SQL cannot express. */
class ReconstructSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.graft.ann.root", s"/tmp/graft-test-recon-${System.nanoTime()}")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val sf = "/root/testdata/sf0.001"
  lazy val emb: DataFrame = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val raw: Map[Long, Array[Float]] = emb
    .select("vec_id", "embedding").collect()
    .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def recon(name: String, ids: Seq[Long]): Map[Long, Array[Float]] =
    Ann.reconstruct(spark, name, ids).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  test("flat and ivfflat return the stored vectors exactly") {
    Ann.buildIndex(emb, "embedding", "vec_id", "rc_flat",
      Ann.BuildParams(engine = "flat"))
    Ann.buildIndexFactory(emb, "embedding", "vec_id", "rc_ivf", "IVF4,Flat",
      Ann.BuildParams(nprobe = 4))
    for (nm <- Seq("rc_flat", "rc_ivf")) {
      val got = recon(nm, Seq(0L, 5L, 17L))
      assert(got.keySet == Set(0L, 5L, 17L))
      got.foreach { case (id, v) => assert(v.toSeq == raw(id).toSeq, s"$nm id=$id") }
    }
  }

  test("graph engines return shard-stored vectors; quantized diskann dequantizes") {
    Ann.buildIndex(emb, "embedding", "vec_id", "rc_hnsw",
      Ann.BuildParams(engine = "hnsw"))
    val got = recon("rc_hnsw", Seq(1L, 2L))
    got.foreach { case (id, v) => assert(v.toSeq == raw(id).toSeq) }
    // SQ8-quantized diskann: reconstruct == the shard's own dequantization,
    // which differs from raw but matches it to quantization tolerance
    Ann.buildIndex(emb, "embedding", "vec_id", "rc_dsq",
      Ann.BuildParams(engine = "diskann", quantization = "sq8"))
    val q = recon("rc_dsq", Seq(3L))(3L)
    val r = raw(3L)
    assert(q.toSeq != r.toSeq) // actually quantized
    val maxErr = q.zip(r).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr < 0.05f, s"sq8 reconstruction err $maxErr")
  }

  test("pq decode; opq applies the inverse rotation") {
    Ann.buildIndexFactory(emb, "embedding", "vec_id", "rc_pq", "PQ8",
      Ann.BuildParams(seedK = 16))
    val dir = IndexCatalog.indexDir(Ann.root(spark), "rc_pq")
    val cb = PqCodec.read(s"$dir/pq.bin")
    val got = recon("rc_pq", Seq(0L))(0L)
    val want = PqCodec.decode(cb, PqCodec.encode(cb, raw(0L)))
    assert(got.toSeq == want.toSeq)
    // OPQ: reconstruct(encode(x)) must be Rᵀ·decode — verify the round trip
    // is closer to the raw vector than leaving the rotation unapplied
    Ann.buildIndexFactory(emb, "embedding", "vec_id", "rc_opq", "OPQ8,PQ8")
    val gotO = recon("rc_opq", Seq(0L))(0L)
    assert(gotO.length == raw(0L).length)
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val dirO = IndexCatalog.indexDir(Ann.root(spark), "rc_opq")
    val cbO = PqCodec.read(s"$dirO/pq.bin")
    val rot = IndexCatalog.readCentroids(s"$dirO/rotation.bin")
    val rotated = OpqCodec.rotate(rot, raw(0L))
    val decoded = PqCodec.decode(cbO, PqCodec.encode(cbO, rotated))
    // exact identity: gotO = Rᵀ·decoded
    val rotT = Array.tabulate(rot.length)(i =>
      Array.tabulate(rot.length)(j => rot(j)(i)))
    assert(gotO.toSeq == OpqCodec.rotate(rotT, decoded).toSeq)
    assert(l2(gotO, raw(0L)) < l2(decoded, raw(0L)) + 1e-6)
  }

  test("ivfpq returns centroid + residual decode") {
    Ann.buildIndexFactory(emb, "embedding", "vec_id", "rc_ivfpq", "IVF4,PQ8",
      Ann.BuildParams(seedK = 16, nprobe = 4))
    val dir = IndexCatalog.indexDir(Ann.root(spark), "rc_ivfpq")
    val cb = PqCodec.read(s"$dir/pq.bin")
    val cents = IndexCatalog.readCentroids(s"$dir/centroids.bin")
    val meta = IndexCatalog.load(Ann.root(spark), "rc_ivfpq")
    val row = spark.read.parquet(meta.sourcePath)
      .where(col("id") === 7L).select("code", "cluster").collect()(0)
    val code = row.getAs[Array[Byte]](0)
    val cl = row.getInt(1)
    val res = PqCodec.decode(cb, code)
    val want = res.indices.map(i => cents(cl)(i) + res(i))
    assert(recon("rc_ivfpq", Seq(7L))(7L).toSeq == want)
  }

  test("RFlat-refined engines return exact raw vectors; tombstones omitted; lsh rejects") {
    Ann.buildIndexFactory(emb, "embedding", "vec_id", "rc_ref", "IVF4,SQ8,RFlat",
      Ann.BuildParams(nprobe = 4))
    assert(recon("rc_ref", Seq(9L))(9L).toSeq == raw(9L).toSeq)
    Ann.delete(spark, "rc_ref", Seq(9L))
    assert(recon("rc_ref", Seq(9L, 10L)).keySet == Set(10L))
    Ann.buildIndexFactory(emb, "embedding", "vec_id", "rc_lsh", "LSH32")
    intercept[IllegalArgumentException](Ann.reconstruct(spark, "rc_lsh", Seq(0L)))
    // LSH,RFlat keeps the raw vectors: reconstruct returns them exactly
    // (the refined arm must win over the unrefined-LSH reject)
    Ann.buildIndexFactory(emb, "embedding", "vec_id", "rc_lshr", "LSH32,RFlat")
    assert(recon("rc_lshr", Seq(4L))(4L).toSeq == raw(4L).toSeq)
  }

  test("100k-id reconstruct rides one InSet, not a 100k-literal In; rows identical") {
    Ann.buildIndexFactory(emb, "embedding", "vec_id", "rc_big", "IVF4,Flat",
      Ann.BuildParams(nprobe = 4))
    val present = Seq(0L, 5L, 17L, 23L)
    val bigIds: Seq[Long] = present ++ (1000000L until 1100000L)
    val df = Ann.reconstruct(spark, "rc_big", bigIds)
    import org.apache.spark.sql.catalyst.expressions.{In, InSet}
    val collected = df.queryExecution.optimizedPlan
      .collect { case p => p.expressions }.flatten.flatMap(_.collect {
        case e: InSet => ("inset", e.hset.size)
        case e: In => ("in", e.list.size)
      })
    assert(collected.exists(_._1 == "inset"),
      s"expected an InSet node above TombInlineMax, got $collected")
    assert(!collected.exists(c => c._1 == "in" && c._2 > Ann.TombInlineMax),
      s"literal In above the inline threshold: $collected")
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    val small = recon("rc_big", present).map { case (k, v) => k -> v.toSeq }
    assert(got == small)
  }

  test("reconstructN returns the contiguous range, range-pushed, tombstones omitted") {
    Ann.buildIndexFactory(emb, "embedding", "vec_id", "rc_rn", "IVF4,Flat",
      Ann.BuildParams(nprobe = 4))
    val df = Ann.reconstructN(spark, "rc_rn", 5L, 4L)
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    assert(got.keySet == Set(5L, 6L, 7L, 8L))
    got.foreach { case (id, v) => assert(v == raw(id).toSeq) }
    // the range reaches the parquet scan as two comparison filters — no
    // per-id literals at any ni
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(id,5"), plan.take(2000))
    assert(plan.contains("LessThan(id,9"), plan.take(2000))
    Ann.delete(spark, "rc_rn", Seq(6L))
    val after = Ann.reconstructN(spark, "rc_rn", 5L, 4L).collect().map(_.getLong(0))
    assert(after.toSet == Set(5L, 7L, 8L))
    // parity with the id-list route over the same surviving range
    val byIds = recon("rc_rn", Seq(5L, 6L, 7L, 8L))
    assert(byIds.keySet == Set(5L, 7L, 8L))
  }
}
