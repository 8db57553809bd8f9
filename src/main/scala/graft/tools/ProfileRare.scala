package graft.tools

import org.apache.spark.sql.SparkSession
import graft.text.TextOps

/** A/B timing for the rare-term extraction plan (fused TermCounts +
 *  broadcast doc-frequency join vs the DuckDB oracle target). */
object ProfileRare {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val df = TextOps.rareTerms(docs, "text", "doc_id", 3)
      val t1 = System.nanoTime()
      val n = df.orderBy("doc_id", "rnk").count()
      val t2 = System.nanoTime()
      println(f"rare_terms trial $i: build ${(t1 - t0) / 1e9}%6.2fs " +
        f"count ${(t2 - t1) / 1e9}%6.2fs rows=$n")
      val t3 = System.nanoTime()
      val m = docs.select("doc_id", "text").collect().length
      println(f"  bare collect: ${(System.nanoTime() - t3) / 1e9}%6.2fs rows=$m")
    }
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val m = docs.select(org.apache.spark.sql.functions.posexplode(
          TextOps.wordLines(org.apache.spark.sql.functions.col("text"), 3)))
        .count()
      val t1 = System.nanoTime()
      val n = TextOps.dedupLines(docs, "text", "doc_id", 3)
        .orderBy("doc_id").count()
      println(f"dedup_lines trial $i: explode ${(t1 - t0) / 1e9}%6.2fs ($m lines) " +
        f"full ${(System.nanoTime() - t1) / 1e9}%6.2fs rows=$n")
    }
    // distributed fallback (the 100 TB plan): local gate off
    spark.conf.set("spark.graft.text.localRareMaxBytes", "0")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = TextOps.rareTerms(docs, "text", "doc_id", 3)
        .orderBy("doc_id", "rnk").count()
      println(f"rare_terms dist trial $i: ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    spark.stop()
  }
}
