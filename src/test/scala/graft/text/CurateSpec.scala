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

  test("GateReason kernel == langId/quality/repetition Column composition") {
    // the fused kernel must yield the identical per-row verdict as the
    // independent when-chain over the oracled Column signals, on real
    // corpus rows AND constructed edge docs (und-language, empty text,
    // high repetition, marginal quality)
    import spark.implicits._
    val edge = Seq(
      (900001L, ""), (900002L, "zzz qqq 12345 67890"),
      (900003L, Seq.fill(40)("der die und").mkString(" ")),
      (900004L, "the the the the the the the the"),
      (900005L, "el los las una es y que por con es y que"),
      // en by stopword majority but sub-threshold quality: one stopword in
      // 51 short tokens, punct-heavy tail
      (900006L, "the " + (1 to 50).map(i => s"z$i").mkString(" ") +
        " " + "!" * 600))
      .toDF("doc_id", "text")
    val all = docs.select(col("doc_id"), col("text")).unionByName(edge)
    val toks = TextOps.tokens(col("text"))
    val quality = TextOps.qualityColumns(col("text"))
      .find(_._1 == "quality").get._2
    val rep = TextOps.repetitionColumns(col("text"))
      .find(_._1 == "dup_bigram_frac").get._2
    val viaCols = all.select(col("doc_id"),
        when(!TextOps.langId(toks).isin("en", "de"), "lang")
          .when(quality < 0.3, "quality")
          .when(rep > 0.5, "repetitive").as("r"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val viaKernel = all.select(col("doc_id"),
        TextOps.gateReason(col("text"), Set("en", "de"), 0.3, 0.5).as("r"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(viaKernel.keySet == viaCols.keySet)
    for ((id, v) <- viaKernel) assert(v == viaCols(id), s"doc $id")
    // at least one of each verdict appears across corpus + edge docs
    val verdicts = viaKernel.values.flatten.toSet
    assert(verdicts.contains("lang") && verdicts.contains("quality"))
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
