package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * End-to-end training-data curation — the composition a real pipeline runs
 * over a raw corpus, assembled from this library's oracled primitives and
 * itself bit-reproducible (the `curate_report` query's DuckDB oracle
 * replays every stage in SQL):
 *
 *   1. language gate (detected [[TextOps.langId]] ∈ allowed)   → `lang`
 *   2. quality gate ([[TextOps.qualityColumns]] score ≥ min)   → `quality`
 *   3. repetition gate (dup-bigram fraction ≤ max)             → `repetitive`
 *   4. MinHash near-dup over gate survivors                    → `near_dup`
 *   5. eval-holdout rows excluded from training                → `eval_holdout`
 *   6. n-gram contamination vs the eval split                  → `contaminated`
 *   7. deterministic hash-gate downsampling                    → `sampled_out`
 *
 * Every input row is tagged with the FIRST stage that dropped it (or NULL
 * when kept), so the pipeline yields both the curated corpus and an audit
 * report in one DAG: row-local gates are pure codegen projections; the
 * set-based stages (4/6) compute drop sets over the preceding stage's
 * survivors — sequential semantics, exactly how a curation run composes —
 * and come back as left joins keyed on the id. All shuffles are the
 * primitives' own (band buckets, df-capped n-gram buckets); nothing here
 * adds a driver collect or an all-pairs product, so the composition
 * inherits the 100 TB story of its parts.
 */
object Curate {

  case class Config(
      langs: Set[String] = Set("en"),
      minQuality: Double = 0.25,
      maxDupBigramFrac: Double = 0.5,
      minJaccard: Double = 0.6,
      evalPred: Column => Column = _ => lit(false),
      samplePermille: Column = lit(1000),
      /** Persist stage boundaries (gate survivors + the tiny drop sets) at
       *  MEMORY_AND_DISK. The dedup and contamination stages each consume
       *  the previous stage's output on several DAG branches; without a
       *  materialization barrier the gate projections re-evaluate per
       *  branch — the standard inter-stage persist every real curation run
       *  does. Disable for one-pass/constrained-storage runs; results are
       *  identical. Callers can `spark.catalog.clearCache()` afterwards. */
      cacheIntermediates: Boolean = true)

  private def maybeCache(df: DataFrame, on: Boolean): DataFrame =
    if (on) df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df

  /** Every input row + `drop_reason` (NULL = kept). */
  def tagged(df: DataFrame, textCol: String, idCol: String,
      cfg: Config): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val quality = TextOps.qualityColumns(col(textCol))
      .find(_._1 == "quality").get._2
    val rep = TextOps.repetitionColumns(col(textCol))
      .find(_._1 == "dup_bigram_frac").get._2
    val gated = df
      .withColumn("__gate_reason",
        when(!TextOps.langId(toks).isin(cfg.langs.toSeq: _*), "lang")
          .when(quality < cfg.minQuality, "quality")
          .when(rep > cfg.maxDupBigramFrac, "repetitive"))
    val pass1 = maybeCache(gated.where(col("__gate_reason").isNull)
      .select(col(idCol), col(textCol)), cfg.cacheIntermediates)
    // stage 4: near-dup drop set over gate survivors
    val ndDrop = maybeCache(TextOps.jaccardPairs(pass1, textCol, idCol,
        minJaccard = cfg.minJaccard)
      .select(col("id_b").as("__nd_id")).distinct(), cfg.cacheIntermediates)
    val pass2 = pass1.join(ndDrop, col(idCol) === col("__nd_id"), "left_anti")
    // stage 6: contaminated train ids over dedup survivors
    val contaminated = maybeCache(TextOps.contaminationCounts(pass2, textCol,
        idCol, cfg.evalPred)
      .select(col("id").as("__ct_id")), cfg.cacheIntermediates)
    gated
      .join(ndDrop.withColumn("__nd", lit(true)),
        col(idCol) === col("__nd_id"), "left_outer").drop("__nd_id")
      .join(contaminated.withColumn("__ct", lit(true)),
        col(idCol) === col("__ct_id"), "left_outer").drop("__ct_id")
      .withColumn("drop_reason", coalesce(col("__gate_reason"),
        when(col("__nd"), "near_dup")
          .when(cfg.evalPred(col(idCol).cast("long")), "eval_holdout")
          .when(col("__ct"), "contaminated")
          .when(!TextOps.sampleGate(col(idCol), cfg.samplePermille),
            "sampled_out")))
      .drop("__gate_reason", "__nd", "__ct")
  }

  /** The curated corpus from an already-[[tagged]] frame — when a run needs
   *  BOTH the corpus and the report, call `tagged` once (persist it) and
   *  derive both views, rather than paying the full pipeline twice. */
  def curateOf(taggedDf: DataFrame): DataFrame =
    taggedDf.where(col("drop_reason").isNull).drop("drop_reason")

  /** Audit report over an already-[[tagged]] frame. */
  def reportOf(taggedDf: DataFrame): DataFrame =
    taggedDf.groupBy(coalesce(col("drop_reason"), lit("kept")).as("reason"))
      .agg(count(lit(1)).as("n"))

  /** The curated training corpus (rows surviving every stage). */
  def curate(df: DataFrame, textCol: String, idCol: String,
      cfg: Config): DataFrame =
    curateOf(tagged(df, textCol, idCol, cfg))

  /** Audit report: rows per drop reason (`kept` for survivors). */
  def report(df: DataFrame, textCol: String, idCol: String,
      cfg: Config): DataFrame =
    reportOf(tagged(df, textCol, idCol, cfg))
}
