package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the physical plan of the LSH verify join — a one-shot check that
 *  the shuffle-hash hints engage (ShuffledHashJoin, not SortMergeJoin) and
 *  no exchange re-sorts the wide pair side. */
object DebugPlanDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = graft.text.TextOps.jaccardPairs(docs, "text", "doc_id",
      minJaccard = 0.6).queryExecution.executedPlan.toString
    println(plan.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Exchange") || l.contains("Sort") ||
        l.contains("Window")).mkString("\n"))
    spark.stop()
  }
}
