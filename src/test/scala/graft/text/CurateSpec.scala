package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curation composition: stage precedence, sequential drop-set semantics,
 *  and consistency between tagged / curate / report views. */
class CurateSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private lazy val docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private val cfg = Curate.Config(langs = Set("en", "de"), minQuality = 0.3,
    maxDupBigramFrac = 0.5, minJaccard = 0.6,
    evalPred = id => id % 5 === 0, samplePermille = lit(700))

  test("tagged covers every row once; curate == kept rows; report adds up") {
    val tagged = Curate.tagged(docs, "text", "doc_id", cfg).cache()
    try {
      assert(tagged.count() == docs.count(), "no rows lost or duplicated")
      val kept = Curate.curate(docs, "text", "doc_id", cfg)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val keptTagged = tagged.where(col("drop_reason").isNull)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == keptTagged && kept.nonEmpty)
      // derive the report from the SAME tagged frame (the tagged-once
      // pattern reportOf/curateOf exist for)
      val report = Curate.reportOf(tagged)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(report.values.sum == docs.count())
      assert(report("kept") == kept.size)
      // eval rows never reach the training output
      assert(kept.forall(_ % 5 != 0))
    } finally tagged.unpersist()
  }

  test("stage precedence: a gated row keeps its gate reason over later stages") {
    val tagged = Curate.tagged(docs, "text", "doc_id", cfg)
    val reasons = tagged.select("doc_id", "drop_reason").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val gateReasons = Set("lang", "quality", "repetitive")
    // holdout applies only to rows that passed every gate; sampling only to
    // non-eval rows (precedence order of the reason chain)
    reasons.foreach { case (id, r) =>
      if (r.contains("eval_holdout")) assert(id % 5 == 0)
      if (r.contains("sampled_out")) assert(id % 5 != 0)
    }
    assert(reasons.values.flatten.toSet.subsetOf(
      gateReasons ++ Set("near_dup", "eval_holdout", "contaminated", "sampled_out")))
    assert(reasons.values.flatten.toSet.size >= 2,
      "corpus should exercise multiple drop stages")
  }
}
