package graft.index

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the job-free single-query serving surface (Ann.searchHits):
  * bit-parity with the full `Ann.search` route's (id, _distance)
  * projection, and ZERO Spark jobs on the warm path — the property that
  * makes e2e serving latency ≈ the in-process index search instead of a
  * job launch. */
class AnnServeLocalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.graft.ann.root", s"/tmp/graft-servelocal-${System.nanoTime()}")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val sf = "/root/testdata/sf0.001"
  lazy val emb: DataFrame = spark.read.parquet(s"$sf/embeddings.parquet")

  private lazy val q0: Array[Float] = {
    val r = emb.orderBy("vec_id").limit(1).collect()(0)
    r.getSeq[Float](r.fieldIndex("embedding")).toArray
  }

  private def hitsOf(df: DataFrame): Seq[(Long, Float)] =
    df.collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq

  test("searchHits == search's (id, _distance) projection, graph engine") {
    Ann.buildIndex(emb, "embedding", "vec_id", "sl_disk",
      Ann.BuildParams(engine = "diskann", numShards = 2))
    val local = hitsOf(Ann.searchHits(spark, "sl_disk", q0, 10,
      searchComplexity = 128))
    val full = Ann.search(emb, "vec_id", "sl_disk", q0, 10,
        searchComplexity = 128)
      .select(col("vec_id"), col("_distance")).collect()
      .map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(local.nonEmpty && local == full)
  }

  test("searchHits == search projection, exact engine (ExactServe route)") {
    Ann.buildIndex(emb, "embedding", "vec_id", "sl_flat",
      Ann.BuildParams(engine = "flat"))
    val local = hitsOf(Ann.searchHits(spark, "sl_flat", q0, 10))
    val full = Ann.search(emb, "vec_id", "sl_flat", q0, 10)
      .select(col("vec_id"), col("_distance")).collect()
      .map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(local.nonEmpty && local == full)
  }

  test("warm searchHits launches ZERO Spark jobs (graph route)") {
    Ann.buildIndex(emb, "embedding", "vec_id", "sl_nojob",
      Ann.BuildParams(engine = "diskann", numShards = 2))
    // warm: shard cache load + any catalog reads
    Ann.searchHits(spark, "sl_nojob", q0, 10, searchComplexity = 64).collect()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = Ann.searchHits(spark, "sl_nojob", q0, 10, searchComplexity = 64)
        .collect()
      Thread.sleep(500) // let any job-start events drain to the listener
      assert(out.length == 10)
      assert(jobs.get() == 0,
        s"warm searchHits launched ${jobs.get()} Spark jobs; must be job-free")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("searchHits respects tombstones like the full route") {
    Ann.buildIndex(emb, "embedding", "vec_id", "sl_tomb",
      Ann.BuildParams(engine = "diskann", numShards = 2))
    val first = hitsOf(Ann.searchHits(spark, "sl_tomb", q0, 5,
      searchComplexity = 128))
    Ann.delete(spark, "sl_tomb", Seq(first.head._1))
    val after = hitsOf(Ann.searchHits(spark, "sl_tomb", q0, 5,
      searchComplexity = 128))
    assert(!after.map(_._1).contains(first.head._1))
    val full = Ann.search(emb, "vec_id", "sl_tomb", q0, 5,
        searchComplexity = 128)
      .select(col("vec_id"), col("_distance")).collect()
      .map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(after == full)
  }
}
