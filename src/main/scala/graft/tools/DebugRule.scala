package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{toFloatVec, floatVec, array_distance}
import graft.index.{Ann, IndexCatalog}
import graft.plans.Graft

object DebugRule {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.ann.root", "/tmp/graft-debugrule")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.init(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = (0 until 64).map(i => (i % 8) / 8.0f)
    val meta = Ann.buildIndex(emb, "embedding", "vec_id", "dbg",
      Ann.BuildParams(engine = "diskann", numShards = 1))
    println("META sourceFiles=" + meta.sourceFiles + " column=" + meta.column +
      " metric=" + meta.metric + " n=" + meta.numVectors)
    val topk = emb.orderBy(array_distance(toFloatVec(col("embedding")), floatVec(q)))
      .limit(10)
    println("=== analyzed ===")
    println(topk.queryExecution.analyzed.treeString.take(3000))
    println("=== optimized ===")
    println(topk.queryExecution.optimizedPlan.treeString.take(3000))
    spark.stop()
  }
}
