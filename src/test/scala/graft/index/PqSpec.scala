package graft.index

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.index.PqCodec

class PqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.ann.root", s"/tmp/graft-pq-indexes-${System.nanoTime()}")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val dim = 32
  private val rnd = new scala.util.Random(17)

  /** 8 well-separated cluster centers; points jitter around them. */
  private def clustered(n: Int): Seq[(Long, Array[Float])] = {
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextFloat() * 10 - 5))
    (0L until n.toLong).map { i =>
      val c = centers((i % 8).toInt)
      (i, c.map(x => x + rnd.nextFloat() * 0.4f - 0.2f))
    }
  }

  test("factory string PQ<m> parses; bad dims fail loud") {
    val p = Ann.parseFactory("PQ8")
    assert(p.engine == "pq" && p.pqM == 8)
    assert(Ann.parseFactory("pq4").pqM == 4)
    intercept[IllegalArgumentException](Ann.parseFactory("PQ8,HNSW"))
  }

  test("factory RFlat: parses for pq/ivfpq, rejected elsewhere") {
    val p = Ann.parseFactory("PQ8,RFlat")
    assert(p.engine == "pq" && p.refine)
    val p2 = Ann.parseFactory("IVF16,PQ8,RFlat")
    assert(p2.engine == "ivfpq" && p2.nlist == 16 && p2.refine)
    intercept[IllegalArgumentException](Ann.parseFactory("Flat,RFlat"))
    intercept[IllegalArgumentException](Ann.parseFactory("HNSW16,RFlat"))
  }

  test("seeded codebook: verbatim subvector layout; seeded PQ ADC ranking == local replay") {
    import spark.implicits._
    // fromSeeds layout: centroid c of subspace s IS seeds(c)'s s-th slice
    val seeds = Array.tabulate(4)(c => Array.tabulate(dim)(d => (c * dim + d).toFloat))
    val cb = PqCodec.fromSeeds(seeds, m = 4)
    assert(cb.k == 4 && cb.dsub == dim / 4)
    for (s <- 0 until 4; c <- 0 until 4)
      assert(cb.centroids(s)(c).toSeq ==
        seeds(c).slice(s * cb.dsub, (s + 1) * cb.dsub).toSeq)
    // end-to-end: seeded build's ranking equals a local brute-force ADC
    // replay (the ann_pq_exact entry repeats this against DuckDB at sf0.01).
    // Own generator: the suite's shared `rnd` sequence feeds later tests.
    val rnd2 = new scala.util.Random(91)
    val rows = (0L until 160L).map(i => (i, Array.fill(dim)(rnd2.nextFloat() * 10 - 5)))
    val df = rows.toDF("id", "vec")
    Ann.buildIndex(df, "vec", "id", "pq_seed_spec",
      Ann.BuildParams(engine = "pq", pqM = 4, seedK = 8))
    val q = rows(3)._2
    val got = Ann.search(df, "id", "pq_seed_spec", q, 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val seedVecs = rows.sortBy(_._1).take(8).map(_._2).toArray
    val cb2 = PqCodec.fromSeeds(seedVecs, 4)
    val lut = PqCodec.lut(cb2, q, l2 = true)
    val want = rows.map { case (id, v) =>
      (PqCodec.adc(lut, cb2.k, PqCodec.encode(cb2, v)), id)
    }.sortBy(x => (x._1, x._2)).take(10).map(_._2).toSet
    assert(got == want)
    // determinism: rebuilding from the same frame gives identical codes
    val codebookPath = s"${Ann.root(spark)}/pq_seed_spec/pq.bin"
    val before = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(codebookPath))
    Ann.buildIndex(df, "vec", "id", "pq_seed_spec2",
      Ann.BuildParams(engine = "pq", pqM = 4, seedK = 8))
    val after = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"${Ann.root(spark)}/pq_seed_spec2/pq.bin"))
    assert(java.util.Arrays.equals(before, after))
  }

  test("OPQ: factory parses; rotation is orthogonal; quantization error <= plain PQ") {
    val p = Ann.parseFactory("OPQ8,PQ8")
    assert(p.engine == "pq" && p.pqM == 8 && p.opq)
    assert(Ann.parseFactory("OPQ4,PQ4,RFlat").refine)
    intercept[IllegalArgumentException](Ann.parseFactory("OPQ8,PQ4"))
    // NOTE: "OPQ8,IVF16,PQ8" used to be in the reject list — the chain
    // form over the ivfpq terminal is implemented now (OpqChainSpec)
    assert(Ann.parseFactory("OPQ8,IVF16,PQ8").opqChain)
    intercept[IllegalArgumentException](Ann.parseFactory("OPQ8,Flat"))

    // correlated data: a fixed dense rotation of an axis-aligned decaying-
    // variance source, so the natural subspace split is misaligned — the
    // setting OPQ exists for
    val rnd2 = new scala.util.Random(123)
    val mix = {
      val m = Array.fill(dim * dim)(rnd2.nextDouble() * 2 - 1)
      OpqCodec.polar(m, dim) // orthogonal mixing matrix
    }
    assert(mix != null)
    val sample = Array.fill(1500) {
      val z = Array.tabulate(dim)(d => (rnd2.nextFloat() * 2 - 1) / (1 + d * 0.5f))
      OpqCodec.rotate(mix, z)
    }
    val trained = OpqCodec.train(sample, 8)
    // rotation orthogonality: ||R x|| == ||x||
    val x0 = sample(0)
    val rx = OpqCodec.rotate(trained.rotation, x0)
    def norm(v: Array[Float]) = math.sqrt(v.map(f => f.toDouble * f).sum)
    assert(math.abs(norm(rx) - norm(x0)) < 1e-3 * (1 + norm(x0)))
    // mean squared reconstruction error must not exceed plain PQ's
    val plainCb = PqCodec.train(sample, 8)
    def mse(encode: Array[Float] => Array[Float]): Double =
      sample.map { x =>
        val xh = encode(x)
        x.indices.map(i => math.pow(x(i) - xh(i), 2)).sum
      }.sum / sample.length
    val plainMse = mse(x => PqCodec.decode(plainCb, PqCodec.encode(plainCb, x)))
    // OPQ error measured in rotated space (rotation-invariant, same scale)
    val opqMse2 = sample.map { x =>
      val y = OpqCodec.rotate(trained.rotation, x)
      val yh = PqCodec.decode(trained.codebook, PqCodec.encode(trained.codebook, y))
      y.indices.map(i => math.pow(y(i) - yh(i), 2)).sum
    }.sum / sample.length
    assert(opqMse2 <= plainMse * 1.001,
      s"OPQ must not quantize worse than PQ on correlated data: $opqMse2 vs $plainMse")
  }

  test("OPQ end-to-end: build, search, refine, append") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // own generator: consuming the suite's shared `rnd` would shift the
    // stream under the later codebook tests
    val rnd3 = new scala.util.Random(57)
    val centers = Array.fill(8)(Array.fill(dim)(rnd3.nextFloat() * 10 - 5))
    val data = (0L until 2000L).map { i =>
      val c = centers((i % 8).toInt)
      (i, c.map(x => x + rnd3.nextFloat() * 0.4f - 0.2f).toSeq)
    }.toDF("id", "vec")
    val q = data.where(col("id") === 7L).collect()(0).getSeq[Float](1).toArray
    Ann.buildIndexFactory(data, "vec", "id", "opq_ix", "OPQ8,PQ8")
    val got = Ann.search(data, "id", "opq_ix", q, 10).collect()
    assert(got.length == 10)
    // refined: the exact re-rank must surface the query's own row at dist 0
    Ann.buildIndexFactory(data, "vec", "id", "opq_rf", "OPQ8,PQ8,RFlat")
    val top = Ann.search(data, "id", "opq_rf", q, 1).collect()(0)
    assert(top.getLong(0) == 7L && top.getAs[Float]("_distance") == 0.0f)
    // batch path agrees with single-query on the same index
    val batch = Ann.searchBatch(data, "id", "opq_rf", Seq(q), 5)
      .select("id").collect().map(_.getLong(0)).toSet
    val single = Ann.search(data, "id", "opq_rf", q, 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(batch == single)
    // append encodes through the frozen rotation: new row becomes findable
    val far = Array.fill(dim)(99.0f)
    Ann.append(Seq((50000L, far.toSeq)).toDF("id", "vec"), "vec", "id", "opq_ix")
    val all = data.unionByName(Seq((50000L, far.toSeq)).toDF("id", "vec"))
    val hit = Ann.search(all, "id", "opq_ix", far, 1).collect()(0)
    assert(hit.getLong(0) == 50000L)
  }

  test("RFlat refine: recall >= plain PQ; top hit is the exact nearest") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions._
    // own generator: consuming the suite's shared `rnd` here would shift the
    // stream under the later codebook tests
    val rnd2 = new scala.util.Random(91)
    val centers = Array.fill(8)(Array.fill(dim)(rnd2.nextFloat() * 10 - 5))
    val data = (0L until 2000L).map { i =>
      val c = centers((i % 8).toInt)
      (i, c.map(x => x + rnd2.nextFloat() * 0.4f - 0.2f).toSeq)
    }.toDF("id", "vec")
    val q = data.where(col("id") === 42L).collect()(0)
      .getSeq[Float](1).toArray
    val exact = data.select(col("id"),
        array_distance_sq(toFloatVec(col("vec")), floatVec(q.toSeq)).as("d"))
      .orderBy(col("d"), col("id")).limit(10)
      .collect().map(_.getLong(0)).toSet

    Ann.buildIndexFactory(data, "vec", "id", "pq_plain", "PQ8")
    Ann.buildIndexFactory(data, "vec", "id", "pq_rflat", "PQ8,RFlat")
    val plain = Ann.search(data, "id", "pq_plain", q, 10)
      .collect().map(_.getLong(0)).toSet
    val refined = Ann.search(data, "id", "pq_rflat", q, 10)
      .collect().map(_.getLong(0)).toSet
    assert(refined.intersect(exact).size >= plain.intersect(exact).size,
      s"refine must not lose recall: ${refined.intersect(exact).size} < " +
      s"${plain.intersect(exact).size}")
    // the query IS row 42's vector: refined top hit must be id 42, dist 0
    val top = Ann.search(data, "id", "pq_rflat", q, 1).collect()(0)
    assert(top.getLong(0) == 42L && top.getAs[Float]("_distance") == 0.0f)
    // ivfpq + RFlat end-to-end
    Ann.buildIndexFactory(data, "vec", "id", "ipq_rflat", "IVF8,PQ8,RFlat",
      Ann.BuildParams(nprobe = 8))
    val r2 = Ann.search(data, "id", "ipq_rflat", q, 5).collect()
    assert(r2.length == 5 && r2(0).getLong(0) == 42L)
  }

  test("refineK: per-index k_factor overrides session conf; saturating = exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions._
    val rnd3 = new scala.util.Random(133)
    // UNCLUSTERED vectors: ADC ranking is genuinely lossy here, so a narrow
    // refine window measurably differs from a saturating one
    val n = 600L
    val data = (0L until n).map(i =>
      (i, Array.fill(dim)(rnd3.nextFloat()).toSeq)).toDF("id", "vec")
    val q = data.where(col("id") === 7L).collect()(0).getSeq[Float](1).toArray
    val exact = data.select(col("id"),
        array_distance_sq(toFloatVec(col("vec")), floatVec(q.toSeq)).as("d"))
      .orderBy(col("d"), col("id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    Ann.buildIndexFactory(data, "vec", "id", "kf_base", "PQ8,RFlat")
    // catalog clone with a saturating per-index k_factor: k*refineK >= n
    // means the refine stage re-ranks EVERY row exactly -> result must be
    // the exact top-10, regardless of how lossy the ADC ranking is
    val meta = IndexCatalog.load(Ann.root(spark), "kf_base")
    IndexCatalog.save(Ann.root(spark), meta.copy(name = "kf_sat", refineK = 60))
    val pqPath = s"${IndexCatalog.indexDir(Ann.root(spark), "kf_base")}/pq.bin"
    java.nio.file.Files.copy(java.nio.file.Paths.get(pqPath),
      java.nio.file.Paths.get(
        s"${IndexCatalog.indexDir(Ann.root(spark), "kf_sat")}/pq.bin"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // session conf pinned NARROW: meta.refineK must win over it
    spark.conf.set("spark.graft.ann.refineFactor", "1")
    try {
      val sat = Ann.search(data, "id", "kf_sat", q, 10)
        .collect().map(_.getLong(0)).toSet
      assert(sat == exact, s"saturating refineK must equal exact: $sat vs $exact")
      // refineK = 0 falls back to the conf (factor 1 -> re-rank only the ADC
      // top-10; the ADC ORDER inside that set can't add new ids)
      val narrow = Ann.search(data, "id", "kf_base", q, 10)
        .collect().map(_.getLong(0)).toSet
      assert(narrow.size == 10)
      // the same override must hold on the TABLE path (frozen-query refine)
      val qdf = Seq((7L, q.toSeq)).toDF("qid", "qvec")
      val satTbl = Ann.searchTable(qdf, "qvec", data, "id", "kf_sat", 10)
        .collect().map(_.getAs[Long]("id")).toSet
      assert(satTbl == exact, s"table-path saturating refineK: $satTbl vs $exact")
      // serve-time mutation (FAISS k_factor is mutable post-build): widening
      // kf_base in place must give the exact answer without a rebuild
      assert(Ann.setRefineK(spark, "kf_base", 60).refineK == 60)
      val mutated = Ann.search(data, "id", "kf_base", q, 10)
        .collect().map(_.getLong(0)).toSet
      assert(mutated == exact, s"setRefineK(60) must equal exact: $mutated")
      intercept[IllegalArgumentException] {
        Ann.setRefineK(spark, "kf_base", -1)
      }
    } finally spark.conf.unset("spark.graft.ann.refineFactor")
  }

  test("codebook: encode/decode reconstructs clustered points; adc == l2 to reconstruction") {
    val data = clustered(400).map(_._2).toArray
    val cb = PqCodec.train(data, m = 4, k = 32)
    assert(cb.dsub == dim / 4)
    val v = data(7)
    val code = PqCodec.encode(cb, v)
    assert(code.length == 4)
    val rec = PqCodec.decode(cb, code)
    // clustered data quantizes tightly: reconstruction close to the original
    val err = graft.core.VectorOps.l2Sq(v, rec)
    assert(err < 1.0f, s"reconstruction error $err too large for clustered data")
    // ADC of (q, code) must equal exact L2(q, decode(code)) up to float assoc
    val q = data(123)
    val table = PqCodec.lut(cb, q, l2 = true)
    val adc = PqCodec.adc(table, cb.k, code)
    val direct = graft.core.VectorOps.l2Sq(q, rec)
    assert(math.abs(adc - direct) <= 1e-2f * math.max(1f, direct),
      s"adc $adc != direct $direct")
  }

  test("codebook file round-trips") {
    val data = clustered(100).map(_._2).toArray
    val cb = PqCodec.train(data, m = 4, k = 16)
    val p = s"/tmp/graft-pq-cb-${System.nanoTime()}.bin"
    PqCodec.write(p, cb)
    val back = PqCodec.read(p)
    assert(back.m == cb.m && back.dsub == cb.dsub && back.k == cb.k)
    for (s <- 0 until cb.m; c <- 0 until cb.k)
      assert(back.centroids(s)(c).toSeq == cb.centroids(s)(c).toSeq)
  }

  test("ivfpq: residual codes + nprobe pruning recall clusters; factory parses") {
    import spark.implicits._
    val p = Ann.parseFactory("IVF16,PQ4")
    assert(p.engine == "ivfpq" && p.nlist == 16 && p.pqM == 4)

    val rows = clustered(800)
    val df = rows.toDF("id", "vec")
    Ann.buildIndex(df, "vec", "id", "ivfpq_ix",
      Ann.BuildParams(engine = "ivfpq", pqM = 4, nlist = 8, nprobe = 2,
        trainSample = 800))
    val meta = IndexCatalog.load(Ann.root(spark), "ivfpq_ix")
    assert(meta.engine == "ivfpq" && meta.nlist == 8 && meta.quantized)

    val q = rows.find(_._1 == 5L).get._2
    val hits = Ann.search(df, "id", "ivfpq_ix", q, 10).collect().map(_.getLong(0))
    assert(hits.length == 10)
    val sameCluster = hits.count(id => id % 8 == 5)
    assert(sameCluster >= 8, s"only $sameCluster/10 hits from the query's cluster")

    // residual quantization should beat raw-vector pq on the same byte budget
    val rec = {
      val cents = IndexCatalog.readCentroids(
        s"${IndexCatalog.indexDir(Ann.root(spark), "ivfpq_ix")}/centroids.bin")
      val cb = PqCodec.read(
        s"${IndexCatalog.indexDir(Ann.root(spark), "ivfpq_ix")}/pq.bin")
      val v = rows.head._2
      val c = cents(KMeansLite.nearest(cents, v))
      val r = v.indices.map(i => v(i) - c(i)).toArray
      val dec = PqCodec.decode(cb, PqCodec.encode(cb, r))
      v.indices.map(i => { val d = v(i) - (c(i) + dec(i)); d * d }).sum
    }
    assert(rec < 0.5f, s"residual reconstruction error $rec too large")
  }

  test("append to exact/quantized engines: counts update, new rows searchable") {
    import spark.implicits._
    val rows = clustered(160)
    val df = rows.take(120).toDF("id", "vec")
    val extra = rows.drop(120).toDF("id", "vec")
    val all = rows.toDF("id", "vec")
    val cases = Seq(
      "apx_flat" -> Ann.BuildParams(engine = "flat"),
      "apx_ivf" -> Ann.BuildParams(engine = "ivfflat", nlist = 8, nprobe = 8,
        trainSample = 120),
      "apx_pq" -> Ann.BuildParams(engine = "pq", pqM = 4, trainSample = 120),
      "apx_ivfpq" -> Ann.BuildParams(engine = "ivfpq", pqM = 4, nlist = 8,
        nprobe = 8, trainSample = 120))
    val probe = rows.find(_._1 == 150L).get._2 // an APPENDED row's vector
    for ((name, bp) <- cases) {
      Ann.buildIndex(df, "vec", "id", name, bp)
      Ann.append(extra, "vec", "id", name)
      val meta = IndexCatalog.load(Ann.root(spark), name)
      assert(meta.numVectors == 160, s"$name: count ${meta.numVectors} != 160")
      val hits = Ann.search(all, "id", name, probe, 10).collect().map(_.getLong(0))
      if (bp.engine == "flat" || bp.engine == "ivfflat")
        assert(hits.head == 150L, s"$name: appended row should be its own top-1")
      else
        assert(hits.contains(150L), s"$name: appended row missing from top-10")
    }
  }

  test("vacuum on exact/quantized engines drops tombstoned rows physically") {
    import spark.implicits._
    val rows = clustered(160)
    val df = rows.toDF("id", "vec")
    for ((name, bp) <- Seq(
        "vac_flat" -> Ann.BuildParams(engine = "flat"),
        "vac_ivfpq" -> Ann.BuildParams(engine = "ivfpq", pqM = 4, nlist = 8,
          nprobe = 8, trainSample = 160))) {
      Ann.buildIndex(df, "vec", "id", name, bp)
      Ann.delete(spark, name, Seq(0L, 1L, 2L))
      val before = IndexCatalog.load(Ann.root(spark), name)
      assert(before.numDeleted == 3)
      val after = Ann.vacuum(spark, name)
      assert(after.numVectors == 157 && after.numDeleted == 0, s"$name: $after")
      assert(after.sourcePath != before.sourcePath, s"$name: path must version")
      assert(!new java.io.File(IndexCatalog.tombstonePath(Ann.root(spark), name)).exists())
      assert(!new java.io.File(before.sourcePath).exists(), s"$name: old data dir kept")
      val hits = Ann.search(df, "id", name, rows.find(_._1 == 8L).get._2, 10)
        .collect().map(_.getLong(0))
      assert(!hits.contains(0L) && !hits.contains(1L) && !hits.contains(2L))
    }
  }

  test("pq index end-to-end: build, search, recall on clustered data; delete respected") {
    import spark.implicits._
    val rows = clustered(800)
    val df = rows.toDF("id", "vec")
    Ann.buildIndex(df, "vec", "id", "pq_ix",
      Ann.BuildParams(engine = "pq", pqM = 4, trainSample = 800))
    val meta = IndexCatalog.load(Ann.root(spark), "pq_ix")
    assert(meta.engine == "pq" && meta.quantized && meta.numVectors == 800)

    // query at a cluster center: top-10 should come from that cluster (i%8==3)
    val q = rows.find(_._1 == 3L).get._2
    val hits = Ann.search(df, "id", "pq_ix", q, 10).collect().map(_.getLong(0))
    assert(hits.length == 10)
    val sameCluster = hits.count(id => id % 8 == 3)
    assert(sameCluster >= 8, s"only $sameCluster/10 hits from the query's cluster")

    // batch path hits the pq branch too
    val batch = Ann.searchBatch(df, "id", "pq_ix",
      Seq(rows(1)._2, rows(2)._2), 5).collect()
    assert(batch.length == 10)

    // tombstones filter the ADC scan
    Ann.delete(spark, "pq_ix", hits.take(2).toSeq)
    val after = Ann.search(df, "id", "pq_ix", q, 10).collect().map(_.getLong(0))
    assert(!after.contains(hits(0)) && !after.contains(hits(1)))

    // searchTable works via code reconstruction: k rows per query, the
    // query's own cluster dominates
    val qt = rows.take(2).map { case (id, v) => (id, v) }.toDF("qid", "qvec")
    val st = Ann.searchTable(qt, "qvec", df, "id", "pq_ix", 3).collect()
    assert(st.length == 6, s"expected 3 rows per query, got ${st.length}")
    val byQ = st.groupBy(_.getAs[Long]("qid"))
    for ((qid, hits) <- byQ) {
      val clusterHits = hits.count(_.getAs[Long]("id") % 8 == qid % 8)
      assert(clusterHits >= 2, s"query $qid: only $clusterHits/3 from its cluster")
    }
  }
}
