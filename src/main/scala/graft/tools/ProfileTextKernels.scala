package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps

/**
 * A/B profile: the fused text kernels (term_counts, word_lines,
 * ngram_repetition) with real `doGenCode` (one static TextKernels call
 * inside the whole-stage span) vs forced CodegenFallback
 * (`-Dgraft.text.forceInterpreted=true`), over a replicated corpus — the
 * round-7 verdict's "measure first" item on whether the per-row virtual
 * call matters.
 *
 * Measured 2026-08-13 (local[32], median of 3 alternating rounds after
 * warmup):
 *   at 30x (150k docs):  every cell 0.13-0.44s — both variants within
 *                        run-to-run noise of each other
 *   at 150x (750k docs): term_counts 0.80 vs 0.79s, word_lines 0.43 vs
 *                        0.44s, ngram_repetition 0.62 vs 0.66s
 * Verdict: NO measurable difference. The kernel bodies (tokenize + hash
 * maps + string building) dominate so completely that the per-row
 * CodegenFallback boundary does not register — exactly the ceiling the
 * round-7 verdict predicted ("one virtual call per row is the cost").
 * The `doGenCode` path is kept as the default anyway: it costs nothing,
 * removes the boxed-eval boundary from generated plans, and keeps the
 * WholeStageCodegen span intact around these expressions.
 */
object ProfileTextKernels {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "30").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs = (0 until factor).map(r =>
        base.withColumn("doc_id", col("doc_id") + lit(r * 10000000L)))
      .reduce(_ unionByName _)
      .select("doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"docs: ${docs.count()} (${factor}x $sfDir)")

    def time(tag: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-34s $s%6.2fs rows=$n")
      s
    }
    def suite(tag: String): Unit = {
      println(s"== $tag (graft.text.forceInterpreted=" +
        s"${sys.props.getOrElse("graft.text.forceInterpreted", "false")})")
      time(s"$tag term_counts agg") {
        docs.select(explode(TextOps.termCountsCol(col("text"))).as("tc"))
          .groupBy(col("tc.term")).agg(sum("tc.term_freq"))
          .count()
      }
      time(s"$tag word_lines explode") {
        docs.select(posexplode(TextOps.wordLines(col("text"), 3))).count()
      }
      time(s"$tag ngram_repetition") {
        docs.select(TextOps.repetitionColumns(col("text")).map(_._2): _*)
          .agg(count(lit(1))).collect()
        docs.count()
      }
    }
    // warmup once, then alternate codegen / fallback (3 rounds each)
    suite("warmup")
    for (r <- 1 to 3) {
      System.clearProperty("graft.text.forceInterpreted")
      suite(s"codegen r$r")
      System.setProperty("graft.text.forceInterpreted", "true")
      suite(s"fallback r$r")
    }
    System.clearProperty("graft.text.forceInterpreted")
    spark.stop()
  }
}
