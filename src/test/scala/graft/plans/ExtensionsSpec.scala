package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{toFloatVec, floatVec, array_distance}
import graft.index.Ann

/** The spark.sql.extensions wiring path (how a cluster enables the engine
 *  without code): a fresh session built withExtensions must rewrite top-k
 *  queries and expose the SQL functions. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects the rule and SQL functions into a new session") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.graft.ann.root", s"/tmp/graft-ext-indexes-${System.nanoTime()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      graft.functions.registerAll(spark) // function registry is session state
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val q = (0 until 64).map(i => (i % 8) / 8.0f)
      Ann.buildIndex(emb, "embedding", "vec_id", "ext_l2",
        Ann.BuildParams(engine = "hnsw", numShards = 2))
      val topk = emb.orderBy(array_distance(toFloatVec(col("embedding")), floatVec(q)))
        .limit(10)
      assert(topk.queryExecution.optimizedPlan.toString.contains("ann_index_scan"),
        "extensions-injected rule must rewrite (and pick the hnsw index)")
      assert(topk.count() == 10)
      // SQL function surface
      emb.createOrReplaceTempView("ext_emb")
      val qLit = q.map(v => s"${v}f").mkString("array(", ", ", ")")
      val viaSql = spark.sql(
        s"SELECT vec_id, list_distance(embedding, $qLit) d FROM ext_emb ORDER BY d LIMIT 3")
      assert(viaSql.count() == 3)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
