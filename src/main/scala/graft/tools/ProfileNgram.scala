package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Stage-by-stage timing of the substring-dedup / decontamination path —
 *  backs the pipelined (count → cap → collect_set → per-bucket pairs) shape
 *  against naive re-evaluated self-joins. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    val toks = TextOps.tokens(col("text"))
    for (_ <- 1 to 3) {
      time("composed tok+ngrams")(docs.select(col("doc_id"),
        explode(TextOps.ngramsDistinctCol(toks, 5)).as("ng")).count())
      time("fused ngramsOfText")(docs.select(col("doc_id"),
        explode(TextOps.ngramsOfTextCol(col("text"), 5)).as("ng")).count())
      time("ngramDupPairs(local)")(TextOps.ngramDupPairs(docs, "text", "doc_id").count())
      time("contamination(local)")(TextOps.contaminationCounts(
        docs, "text", "doc_id", id => id % 5 === 0).count())
    }
    spark.conf.set("spark.graft.text.localNgramMaxBytes", "0")
    for (_ <- 1 to 2) {
      time("ngramDupPairs(dist)")(TextOps.ngramDupPairs(docs, "text", "doc_id").count())
      time("contamination(dist)")(TextOps.contaminationCounts(
        docs, "text", "doc_id", id => id % 5 === 0).count())
    }
    spark.stop()
  }
}
