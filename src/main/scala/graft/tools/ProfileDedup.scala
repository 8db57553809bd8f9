package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps

object ProfileDedup {
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
    time("tokens")(docs.select(toks.as("t")).count())
    time("shingleHashes")(docs.select(TextOps.shingleHashes(toks).as("s")).count())
    val base = docs.select(col("doc_id").as("id"), TextOps.shingleHashes(toks).as("shingles"))
    time("explode")(base.select(col("id"), explode(col("shingles")).as("h")).count())
    val sigs = TextOps.signatures(docs, "text", "doc_id")
    time("signatures")(sigs.count())
    val sigsC = TextOps.signatures(docs, "text", "doc_id").cache()
    time("signatures.cache")(sigsC.count())
    time("candidatePairs")(TextOps.candidatePairs(sigsC).count())
    time("jaccardPairs(fresh)")(TextOps.jaccardPairs(docs, "text", "doc_id").count())
    time("dedup(fresh)")(TextOps.dedupByMinhash(docs, "text", "doc_id").count())
    // A/B: merge-count verify (production path) vs generic array_intersect
    // over the same cached candidates — isolates the verify-stage cost
    val cands = TextOps.candidatePairs(sigsC).cache()
    cands.count()
    val sa = sigsC.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val sb = sigsC.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    val joined = cands.join(sa, "id_a").join(sb, "id_b").cache()
    joined.count()
    val mergeCount = graft.functions.mkCol(graft.expressions.SortedIntersectCount(
      graft.functions.mkExpr(col("sh_a")), graft.functions.mkExpr(col("sh_b"))))
    for (_ <- 1 to 3) {
      time("verify: sorted-merge")(
        joined.select(sum(mergeCount)).collect()(0).getLong(0))
      time("verify: array_intersect")(
        joined.select(sum(size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")))
          .collect()(0).getLong(0))
    }
    spark.stop()
  }
}
