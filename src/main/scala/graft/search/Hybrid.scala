package graft.search

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.text.TextOps
import graft.functions.{toFloatVec, floatVec, array_distance_sq}
import graft.index.Ann

/**
 * Hybrid BM25 + vector search with Reciprocal-Rank-Fusion — the Spark
 * re-expression of the reference's `hybrid_search`
 * (src/ann_search.cpp:903-1163): BM25 candidates (the reference shells out
 * to DuckDB's FTS extension; here a native DataFrame Okapi-BM25 pipeline),
 * vector candidates from the ANN index (or exact scan), then
 * `Σ wᵢ·1/(60+rankᵢ)` fusion (RRF_K=60, :1026), sort desc, top-k.
 *
 * Output: id, `_bm25_rank`, `_vector_rank` (0 = not in that candidate list),
 * `_rrf_score`. Ranks are integers and the fusion is rational arithmetic, so
 * results are engine-exact; only near-tied BM25 scores (double ln/idf) could
 * reorder, and ties break by id.
 *
 * Scale shape: the term-frequency projection is codegen over the token
 * array; doc-frequencies for the (few) query terms are one small aggregate;
 * ranking is a single top-N; fusion joins two ≤N-row sides — nothing
 * materializes on the driver except |queryTerms| doc-frequency counts.
 */
object Hybrid {

  val RrfK = 60
  // reference defaults: src/ann_search.cpp:911-915
  val DefaultBm25Weight = 0.3
  val DefaultVectorWeight = 0.7
  val K1 = 1.2
  val B = 0.75

  /** Lowercase word tokens of the query string (same regex as TextOps). */
  def queryTerms(qText: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(qText.toLowerCase).toSeq.distinct

  /** BM25-ranked top-N doc ids for a bag of query terms:
   *  (id, _bm25_rank 1..N). Okapi BM25, idf = ln((N-df+0.5)/(df+0.5)+1). */
  def bm25Ranks(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], topN: Int): DataFrame = {
    val spark = df.sparkSession
    if (terms.isEmpty) // empty LOCAL relation, so rrfFuse's local path applies
      return spark.createDataFrame(java.util.Collections.emptyList[Row](),
        StructType(Seq(StructField("id", LongType), StructField("_bm25_rank", IntegerType))))
    val toks = TextOps.tokens(col(textCol))
    val base = df.select(col(idCol).cast(LongType).as("id"), toks.as("toks"))
      .withColumn("dl", size(col("toks")))
    // corpus statistics — ONE aggregate pass: count, avgdl, and every
    // term's doc frequency together (per-term count() jobs would re-scan
    // and re-tokenize the corpus once per term)
    val statAggs = count(lit(1)).as("__n") +: avg(col("dl")).as("__avgdl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(array_contains(col("toks"), t).cast(LongType)).as(s"__df$i")
      }
    val statRow = base.agg(statAggs.head, statAggs.tail: _*).head()
    val nDocs = statRow.getLong(0)
    if (nDocs == 0)
      return spark.createDataFrame(java.util.Collections.emptyList[Row](),
        StructType(Seq(StructField("id", LongType), StructField("_bm25_rank", IntegerType))))
    val avgdl = statRow.getDouble(1)
    val dfCounts: Map[String, Long] =
      terms.zipWithIndex.map { case (t, i) => t -> statRow.getLong(2 + i) }.toMap
    val score: Column = terms.map { t =>
      val dft = dfCounts(t).toDouble
      val idf = math.log((nDocs - dft + 0.5) / (dft + 0.5) + 1.0)
      val tf = size(filter(col("toks"), x => x === t)).cast(DoubleType)
      (tf * lit(K1 + 1)) /
        (tf + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl").cast(DoubleType) / lit(avgdl))) *
        lit(idf)
    }.reduce(_ + _)
    // distributed top-N first (TakeOrderedAndProject — no global sort), then
    // rank the ≤topN ordered survivors by partition-local row index
    val top = base.withColumn("__score", score)
      .where(col("__score") > 0)
      .orderBy(col("__score").desc, col("id"))
      .limit(topN)
    rankOrdered(top, "_bm25_rank", topN)
  }

  /** Rank an ordered (orderBy.limit(topN)) result by global row position:
   *  collect the ≤ topN id rows (collect of a sorted plan preserves global
   *  order) and return a LOCAL relation of (id, rank). Bounded by the
   *  candidate budget (topN ≤ a few hundred) — the same boundedness as the
   *  ANN route's collectHits, never corpus-sized. The earlier
   *  rdd.zipWithIndex spelling executed the whole TakeOrdered scan TWICE
   *  per downstream action (zipWithIndex runs an eager partition-count job
   *  at construction, and the ExistingRDD re-runs the scan lineage when the
   *  fused result executes) and left the fusion join as a SortMergeJoin of
   *  two RDD-backed 100-row tables behind two exchanges; a LocalRelation
   *  evaluates the scan once and lets rrfFuse's local path skip the fusion
   *  join entirely. (An unpartitioned Window would log
   *  WindowExec's move-all-data warning on every serving query, and the
   *  optimizer folds away constant partition keys, so there is no quiet
   *  window spelling.) */
  private def rankOrdered(top: DataFrame, rankName: String, topN: Int): DataFrame = {
    val spark = top.sparkSession
    // defensive re-limit: correctness of the collect below relies on the
    // caller passing an orderBy.limit(topN) plan — a second limit over an
    // already-limited plan is a no-op, and it bounds the collect even if a
    // future caller forgets (the invariant was previously only documented)
    val rows = top.limit(topN).select(col("id")).collect()
    val ranked = java.util.Arrays.asList(rows.zipWithIndex.map {
      case (r, i) => Row(r.getLong(0), (i + 1).toInt) }: _*)
    spark.createDataFrame(ranked, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField(rankName, IntegerType, nullable = false))))
  }

  /** Exact vector ranks (squared-L2 over an embedding column):
   *  (id, _vector_rank 1..N). */
  def exactVectorRanks(df: DataFrame, vecCol: String, idCol: String,
      qVec: Array[Float], topN: Int): DataFrame = {
    val dd = array_distance_sq(toFloatVec(col(vecCol)), floatVec(qVec.toSeq))
    val top = df.select(col(idCol).cast(LongType).as("id"), dd.as("__dd"))
      .orderBy(col("__dd"), col("id"))
      .limit(topN)
    rankOrdered(top, "_vector_rank", topN)
  }

  /** ANN vector ranks via a named index. */
  def annVectorRanks(spark: SparkSession, indexName: String, qVec: Array[Float],
      topN: Int, searchComplexity: Int = 0): DataFrame = {
    import spark.implicits._
    Ann.collectHits(spark, indexName, qVec, topN, searchComplexity, 1)
      .toSeq.zipWithIndex.map { case ((id, _), i) => (id, i + 1) }
      .toDF("id", "_vector_rank")
  }

  /** (id, rank) pairs when `df` is a bounded, already-materialized LOCAL
   *  relation (the shape every rank-table builder above returns); None for
   *  plan-backed inputs. collect() of a LocalRelation launches no job. */
  private def localRanks(df: DataFrame): Option[Array[(Long, Int)]] =
    // optimizedPlan, not analyzed: a rank table built via toDF carries a
    // column-renaming Project that ConvertToLocalRelation folds away
    df.queryExecution.optimizedPlan match {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        Some(df.collect().map(r => (r.getLong(0), r.getInt(1))))
      case _ => None
    }

  /** RRF fusion of two rank tables → (id, _bm25_rank, _vector_rank,
   *  _rrf_score) desc, top-k. Missing ranks surface as 0 and contribute
   *  nothing (reference :1091-1106). */
  def rrfFuse(bm25: DataFrame, vector: DataFrame, k: Int,
      bm25Weight: Double = DefaultBm25Weight,
      vectorWeight: Double = DefaultVectorWeight): DataFrame = {
    // both rank tables local (the production shape: every builder above
    // returns a ≤candidate-budget LocalRelation) → fuse the ≤2·budget rows
    // at the driver and return a LocalRelation: the fused plan is a single
    // LocalTableScan, versus a full-outer SortMergeJoin of two ~100-row
    // tables behind TWO exchanges + a final TakeOrdered. Same double
    // arithmetic in the same order as the Column formulation below, so the
    // scores (and the oracle hash) are bit-identical.
    (localRanks(bm25), localRanks(vector)) match {
      case (Some(b), Some(v)) =>
        val bm = b.toMap; val vm = v.toMap
        val ids = (b.map(_._1) ++ v.map(_._1)).distinct
        val fused = ids.map { id =>
          val br = bm.get(id); val vr = vm.get(id)
          val s = br.map(r => bm25Weight / (RrfK.toDouble + r)).getOrElse(0.0) +
            vr.map(r => vectorWeight / (RrfK.toDouble + r)).getOrElse(0.0)
          (id, br.getOrElse(0).toLong, vr.getOrElse(0).toLong, s)
        }.sortBy { case (id, _, _, s) => (-s, id) }.take(k)
        val rows = java.util.Arrays.asList(fused.map(t =>
          Row(t._1, t._2, t._3, t._4)): _*)
        return bm25.sparkSession.createDataFrame(rows, StructType(Seq(
          StructField("id", LongType, nullable = true),
          StructField("_bm25_rank", LongType, nullable = false),
          StructField("_vector_rank", LongType, nullable = false),
          StructField("_rrf_score", DoubleType, nullable = false))))
      case _ => // at least one side is a distributed plan: fuse in-plan
    }
    val joined = bm25.join(vector, Seq("id"), "full_outer")
    val rrf =
      when(col("_bm25_rank").isNotNull,
        lit(bm25Weight) / (lit(RrfK).cast(DoubleType) + col("_bm25_rank")))
        .otherwise(lit(0.0)) +
      when(col("_vector_rank").isNotNull,
        lit(vectorWeight) / (lit(RrfK).cast(DoubleType) + col("_vector_rank")))
        .otherwise(lit(0.0))
    joined.withColumn("_rrf_score", rrf)
      .withColumn("_bm25_rank", coalesce(col("_bm25_rank"), lit(0)).cast(LongType))
      .withColumn("_vector_rank", coalesce(col("_vector_rank"), lit(0)).cast(LongType))
      .orderBy(col("_rrf_score").desc, col("id"))
      .limit(k)
  }

  /** Full hybrid search over a table carrying both a text and a vector
   *  column (reference hybrid_search signature). `indexName` empty = exact
   *  vector scan. */
  def hybridSearch(df: DataFrame, textCol: String, vecCol: String, idCol: String,
      qText: String, qVec: Array[Float], k: Int = 10,
      bm25Weight: Double = DefaultBm25Weight, vectorWeight: Double = DefaultVectorWeight,
      bm25Candidates: Int = 100, vectorCandidates: Int = 100,
      indexName: String = "", searchComplexity: Int = 0): DataFrame = {
    val terms = queryTerms(qText)
    val bm25 = bm25Ranks(df, textCol, idCol, terms, bm25Candidates)
    val vec =
      if (indexName.nonEmpty)
        annVectorRanks(df.sparkSession, indexName, qVec, vectorCandidates, searchComplexity)
      else exactVectorRanks(df, vecCol, idCol, qVec, vectorCandidates)
    rrfFuse(bm25, vec, k, bm25Weight, vectorWeight)
  }

  // --------------------------------------------------------- oracle SQL

  /** DuckDB oracle for the exact-vector hybrid search over
   *  documents ⋈ embeddings (same formulas, same literals). */
  def oracleSql(qText: String, qVecSql: String, k: Int,
      bm25Candidates: Int = 100, vectorCandidates: Int = 100): String = {
    val terms = queryTerms(qText)
    val tf = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(toks, x -> x = '$t'))::DOUBLE AS tf$i"
    }.mkString(",\n    ")
    val dfSel = terms.zipWithIndex.map { case (t, i) =>
      s"(SELECT count(*)::DOUBLE FROM tok WHERE list_contains(toks, '$t')) AS df$i"
    }.mkString(",\n    ")
    val score = terms.indices.map { i =>
      s"(tf$i * ($K1 + 1)) / (tf$i + $K1 * ((1.0 - $B) + $B * dl / avgdl)) * " +
      s"ln((n_docs - df$i + 0.5) / (df$i + 0.5) + 1.0)"
    }.mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id AS id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
       |  FROM documents
       |),
       |stats AS (
       |  SELECT count(*)::DOUBLE AS n_docs, avg(len(toks)) AS avgdl,
       |    $dfSel
       |  FROM tok
       |),
       |scored AS (
       |  SELECT id, $score AS s
       |  FROM (SELECT id, len(toks)::DOUBLE AS dl,
       |    $tf
       |    FROM tok), stats
       |),
       |bm25 AS (
       |  SELECT id, rnk AS bm25_rank FROM (
       |    SELECT id, row_number() OVER (ORDER BY s DESC, id) AS rnk
       |    FROM scored WHERE s > 0) WHERE rnk <= $bm25Candidates
       |),
       |vec AS (
       |  SELECT id, rnk AS vector_rank FROM (
       |    SELECT vec_id AS id, row_number() OVER (
       |      ORDER BY ${d2("embedding", qVecSql)}, vec_id) AS rnk
       |    FROM embeddings) WHERE rnk <= $vectorCandidates
       |)
       |SELECT coalesce(bm25.id, vec.id) AS id,
       |  coalesce(bm25_rank, 0)::BIGINT AS _bm25_rank,
       |  coalesce(vector_rank, 0)::BIGINT AS _vector_rank,
       |  (CASE WHEN bm25_rank IS NOT NULL THEN $DefaultBm25Weight / (${RrfK}::DOUBLE + bm25_rank) ELSE 0.0 END
       |   + CASE WHEN vector_rank IS NOT NULL THEN $DefaultVectorWeight / (${RrfK}::DOUBLE + vector_rank) ELSE 0.0 END)
       |   AS _rrf_score
       |FROM bm25 FULL OUTER JOIN vec ON bm25.id = vec.id
       |ORDER BY _rrf_score DESC, id LIMIT $k""".stripMargin
  }

  private def d2(vecExpr: String, qExpr: String): String =
    s"list_sum(list_transform($vecExpr::DOUBLE[], (x, i) -> (x - ($qExpr)[i]) * (x - ($qExpr)[i])))"
}
