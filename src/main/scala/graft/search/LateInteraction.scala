package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{array_inner_product, floatVec, toFloatVec}

/**
 * ColBERT-style late-interaction scoring over multi-vector documents:
 * `score(doc) = Σ_q  max_{t ∈ doc tokens}  q · t` — every query vector
 * matches its best token vector independently, which preserves term-level
 * interaction that a single pooled embedding loses.
 *
 * Documents are modeled relationally — one row per (doc, token vector) —
 * rather than as nested array<array<float>> blobs: the scoring plan is
 * then ONE partial-aggregating groupBy (max per query vector fused into a
 * single pass over each row), fully whole-stage-codegen'd, and the doc's
 * token count never hits a per-row size limit. That is the 100 TB shape:
 * score = map-side max-combine, shuffle carries only (doc, nq doubles).
 *
 * All dot products accumulate in double with ascending-index order (the
 * shared `array_inner_product` expression), so scores are bit-reproducible
 * against a SQL oracle computing the same maxes and the same left-to-right
 * query-sum.
 */
object LateInteraction {

  /**
   * Per-document MaxSim scores for `queries` against token vectors in
   * `vecCol`, one input row per (document `groupCol`, token vector).
   * Output: groupCol, `maxsim` (double), one row per document.
   */
  def maxSimScores(df: DataFrame, vecCol: String, groupCol: String,
      queries: Seq[Array[Float]]): DataFrame = {
    require(queries.nonEmpty, "maxSim needs at least one query vector")
    val maxes: Seq[Column] = queries.zipWithIndex.map { case (q, i) =>
      max(array_inner_product(toFloatVec(col(vecCol)),
        floatVec(q.toSeq))).as(s"__m$i")
    }
    val total = queries.indices.map(i => col(s"__m$i"))
      .reduce(_ + _) // fixed left-to-right fold: bit-stable query sum
    df.groupBy(col(groupCol))
      .agg(maxes.head, maxes.tail: _*)
      .select(col(groupCol), total.as("maxsim"))
  }

  /** Top-k documents by MaxSim, deterministic tiebreak on the group id. */
  def maxSimTopK(df: DataFrame, vecCol: String, groupCol: String,
      queries: Seq[Array[Float]], k: Int): DataFrame =
    maxSimScores(df, vecCol, groupCol, queries)
      .orderBy(col("maxsim").desc, col(groupCol))
      .limit(k)
}
