package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Oracles the graph `rangeSearch` CONTRACT (FAISS range_search semantics):
  * with the beam width saturating the shard size (searchComplexity ≥ rows
  * per shard), beam search degenerates to full traversal of each connected
  * Vamana graph, so the radius result must EXACTLY equal the brute-force
  * radius filter — not just ≥90% recall. The radius is placed in the widest
  * inter-distance gap so f32-vs-double boundary wobble cannot flip
  * membership; any mismatch is then a real traversal/completeness bug. */
class RangeGraphSaturationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.graft.ann.root", s"/tmp/graft-rangesat-${System.nanoTime()}")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val sf = "/root/testdata/sf0.001"
  lazy val emb: DataFrame = spark.read.parquet(s"$sf/embeddings.parquet")

  private lazy val q0: Array[Float] = {
    val r = emb.orderBy("vec_id").limit(1).collect()(0)
    r.getSeq[Float](r.fieldIndex("embedding")).toArray
  }

  test("saturating beam: graph rangeSearch == exact radius filter, bit-for-bit set") {
    import graft.functions._
    val n = emb.count().toInt
    val dists = emb.select(col("vec_id"),
        array_distance_sq(toFloatVec(col("embedding")), floatVec(q0.toSeq)).as("d"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val sorted = dists.map(_._2).sorted
    // radius in the widest gap among ranks [n/4, 3n/4]: boundary-robust
    val lo = n / 4; val hi = 3 * n / 4
    val gapAt = (lo until hi).maxBy(i => sorted(i + 1) - sorted(i))
    val radius = ((sorted(gapAt) + sorted(gapAt + 1)) / 2).toFloat
    assert(sorted(gapAt + 1) - sorted(gapAt) > 1e-4,
      "fixture degenerate: no usable distance gap")
    val expect = dists.filter(_._2 <= radius.toDouble).map(_._1).toSet
    assert(expect.size >= lo && expect.size <= hi + 1)

    Ann.buildIndex(emb, "embedding", "vec_id", "rs_sat",
      Ann.BuildParams(engine = "diskann", numShards = 2, maxDegree = 32,
        buildComplexity = 64))
    // searchComplexity ≥ corpus size ⇒ ≥ every shard size: the beam holds
    // every visited node, so traversal exhausts each connected component
    val got = Ann.rangeSearch(emb, "vec_id", "rs_sat", q0, radius,
        searchComplexity = n)
      .collect().map(_.getLong(0)).toSet
    assert(got == expect,
      s"saturating-beam range must be exact: missing ${expect -- got}, " +
        s"extra ${got -- expect}")
  }

  test("saturating beam with tombstones: exact minus deleted ids") {
    import graft.functions._
    val n = emb.count().toInt
    val dists = emb.select(col("vec_id"),
        array_distance_sq(toFloatVec(col("embedding")), floatVec(q0.toSeq)).as("d"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val sorted = dists.map(_._2).sorted
    val lo = n / 4; val hi = 3 * n / 4
    val gapAt = (lo until hi).maxBy(i => sorted(i + 1) - sorted(i))
    val radius = ((sorted(gapAt) + sorted(gapAt + 1)) / 2).toFloat
    val inside = dists.filter(_._2 <= radius.toDouble).map(_._1)
    val deleted = inside.take(3).toSet
    Ann.buildIndex(emb, "embedding", "vec_id", "rs_sat_tomb",
      Ann.BuildParams(engine = "diskann", numShards = 2, maxDegree = 32,
        buildComplexity = 64))
    Ann.delete(spark, "rs_sat_tomb", deleted.toSeq)
    val got = Ann.rangeSearch(emb, "vec_id", "rs_sat_tomb", q0, radius,
        searchComplexity = n)
      .collect().map(_.getLong(0)).toSet
    assert(got == inside.toSet -- deleted)
  }
}
