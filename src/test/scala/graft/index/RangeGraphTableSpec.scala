package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Graph-engine TABLE-range search: the single-query expanding-k beam run
 *  per (query, shard) on the same (shard × query-block) task grid as
 *  searchTable. Pins (a) saturating-beam exactness — with beam ≥ shard
 *  size each shard's ball is exact, so the pair set equals the
 *  brute-force cross-join ball bit-for-bit, across shards>1 AND
 *  query-partitions>1 so the grid shuffle is exercised; (b) parity with
 *  the single-query rangeSearch per query row; (c) tombstone exclusion;
 *  (d) the hnsw engine on the same contract. */
class RangeGraphTableSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.graft.ann.root", s"/tmp/graft-rangegt-${System.nanoTime()}")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val sf = "/root/testdata/sf0.001"
  lazy val emb: DataFrame = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val n: Int = emb.count().toInt

  /** Per-query double distances to every base row, driver-side. */
  private lazy val allDists: Map[Long, Array[(Long, Double)]] = {
    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val qs = rows.filter(_._1 < 3)
    qs.map { case (qid, qv) =>
      qid -> rows.map { case (rid, v) =>
        (rid, v.indices.foldLeft(0.0)((s, d) =>
          s + (v(d) - qv(d)) * (v(d) - qv(d))))
      }
    }.toMap
  }

  /** Radius in the widest pooled-distance gap among middle ranks: a gap in
   *  the pooled multiset is a gap for every query, so f32-vs-double
   *  boundary wobble cannot flip any pair's membership. */
  private lazy val radius: Float = {
    val pooled = allDists.values.flatten.map(_._2).toArray.sorted
    val lo = pooled.length / 4; val hi = 3 * pooled.length / 4
    val gapAt = (lo until hi).maxBy(i => pooled(i + 1) - pooled(i))
    assert(pooled(gapAt + 1) - pooled(gapAt) > 1e-4,
      "fixture degenerate: no usable distance gap")
    ((pooled(gapAt) + pooled(gapAt + 1)) / 2).toFloat
  }

  private def expectPairs: Set[(Long, Long)] =
    allDists.toSeq.flatMap { case (qid, ds) =>
      ds.filter(_._2 <= radius.toDouble).map(d => (qid, d._1)).toSeq
    }.toSet

  private def queries: DataFrame = emb.where(col("vec_id") < 3)
    .select(col("vec_id"), col("embedding"))
    .repartition(4) // query partitions > 1: the block axis is real

  private def gotPairs(name: String, sc: Int): Set[(Long, Long)] =
    Ann.rangeSearchTable(queries, "embedding", emb, "vec_id", name,
        radius, searchComplexity = sc)
      .select(col("vec_id"), col("tbl_vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("saturating beam over the (shard x block) grid == brute-force ball per query") {
    Ann.buildIndex(emb, "embedding", "vec_id", "rgt_disk",
      Ann.BuildParams(engine = "diskann", numShards = 3, maxDegree = 32,
        buildComplexity = 64))
    val got = gotPairs("rgt_disk", n)
    val want = expectPairs
    assert(got == want,
      s"missing ${(want -- got).take(5)}, extra ${(got -- want).take(5)}")
    // and it matches the single-query path per query row
    allDists.keys.foreach { qid =>
      val qv = emb.where(col("vec_id") === qid).select("embedding")
        .collect()(0).getSeq[Float](0).toArray
      val single = Ann.rangeSearch(emb, "vec_id", "rgt_disk", qv, radius,
          searchComplexity = n)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(got.filter(_._1 == qid).map(_._2) == single)
    }
  }

  test("hnsw engine answers the same saturating TABLE-range contract") {
    Ann.buildIndex(emb, "embedding", "vec_id", "rgt_hnsw",
      Ann.BuildParams(engine = "hnsw", numShards = 2))
    assert(gotPairs("rgt_hnsw", n) == expectPairs)
  }

  test("tombstoned rows are excluded from every query's ball") {
    Ann.buildIndex(emb, "embedding", "vec_id", "rgt_tomb",
      Ann.BuildParams(engine = "diskann", numShards = 2, maxDegree = 32,
        buildComplexity = 64))
    val del = expectPairs.map(_._2).take(3).toSeq
    Ann.delete(spark, "rgt_tomb", del)
    val got = gotPairs("rgt_tomb", n)
    assert(got == expectPairs.filterNot(p => del.contains(p._2)))
  }

  test("hnsw buildThreads: bulk per-shard build is deterministic across pool sizes") {
    // opt-in per-shard addAll (buildThreads > 1): the pool size bounds
    // oversubscription but CANNOT change the result — shard files must be
    // byte-identical between pool sizes, and match the contract that the
    // content is a pure function of (shard rows, level seed)
    def bytesOf(name: String): Seq[Seq[Byte]] = {
      val meta = IndexCatalog.load(Ann.root(spark), name)
      meta.shards.map(sh =>
        java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(sh.file)).toSeq)
    }
    Ann.buildIndex(emb, "embedding", "vec_id", "rgt_bt4",
      Ann.BuildParams(engine = "hnsw", numShards = 2, buildThreads = 4))
    Ann.buildIndex(emb, "embedding", "vec_id", "rgt_bt8",
      Ann.BuildParams(engine = "hnsw", numShards = 2, buildThreads = 8))
    assert(bytesOf("rgt_bt4") == bytesOf("rgt_bt8"))
    val q = emb.orderBy("vec_id").limit(1).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    assert(Ann.search(emb, "vec_id", "rgt_bt4", q, 5).count() == 5)
  }

  test("realistic beam returns a subset of the exact ball") {
    Ann.buildIndex(emb, "embedding", "vec_id", "rgt_sub",
      Ann.BuildParams(engine = "diskann", numShards = 3, maxDegree = 32,
        buildComplexity = 64))
    val got = gotPairs("rgt_sub", 0)
    assert(got.nonEmpty && got.subsetOf(expectPairs))
  }
}
