package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.toFloatVec

/**
 * SemDeDup-style semantic deduplication over an embedding column
 * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
 * through semantic deduplication"): cluster the embedding space, then
 * deduplicate ONLY within clusters — the cluster partition bounds the
 * pairwise work at N²/k per cluster instead of N² overall, which is the
 * property that makes embedding-level dedup feasible at 100 TB (k grows
 * with N, holding per-cluster membership roughly constant).
 *
 * The reference engine has no semantic-dedup operator (it delegates all
 * non-ANN work to its host, and hosts have nothing like this); this is one
 * of the training-data-pipeline operators the Spark build adds beyond the
 * reference surface, sharing the ANN subsystem's vector kernels.
 *
 * Two centroid sources:
 *
 *  - [[seedCentroids]]: the k lowest-id vectors, verbatim — deterministic
 *    and expressible in plain SQL, so the whole operator is bit-oracle-able
 *    against DuckDB (`semdedup` correctness entry).
 *  - [[trainedCentroids]]: KMeansLite Lloyd training on a deterministic
 *    strided sample — the quality route for real corpora (same trainer the
 *    IVF index build uses). Same downstream semantics; spec-pinned to agree
 *    with the expression route given identical centroids.
 *
 * All cosine similarities are computed with the same double-accumulation
 * formula as [[TextOps.cosineExactPairs]] (`dot / (sqrt(aa)·sqrt(bb))`,
 * double math over float inputs), which DuckDB's
 * `list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])` reproduces bit-exactly.
 */
object SemDedup {

  /** Double-accumulated cosine over float vectors — bit-identical to the
   *  DuckDB oracle's DOUBLE[] cosine (same accumulation order). */
  @inline private[text] def cosineD(a: Array[Float], b: Array[Float]): Double = {
    var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
    val n = a.length
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      ab += x * y; aa += x * x; bb += y * y; i += 1
    }
    val den = math.sqrt(aa) * math.sqrt(bb)
    if (den == 0.0) 0.0 else ab / den
  }

  /** The k lowest-id vectors as (centroid_id 0..k-1, vector) — the
   *  SQL-expressible deterministic centroid choice. Driver-side k rows. */
  def seedCentroids(df: DataFrame, vecCol: String, idCol: String,
      k: Int): Array[(Int, Array[Float])] = {
    val rows = df.select(col(idCol).cast(LongType).as("id"),
        toFloatVec(col(vecCol)).as("v"))
      .orderBy("id").limit(k).collect()
    rows.iterator.zipWithIndex.map { case (r, i) =>
      i -> r.getSeq[Float](1).toArray
    }.toArray
  }

  /** KMeansLite-trained centroids (deterministic strided sample + Lloyd) —
   *  the quality route; shares the IVF build's trainer so cluster geometry
   *  matches what the ANN subsystem would build over the same corpus. */
  def trainedCentroids(df: DataFrame, vecCol: String, k: Int,
      iters: Int = 10, maxTrain: Int = 65536): Array[(Int, Array[Float])] = {
    val n = df.count()
    val stride = math.max(1L, n / maxTrain)
    val sample = df.select(toFloatVec(col(vecCol)).as("v"))
      .rdd.zipWithIndex()
      .filter { case (_, i) => i % stride == 0 }
      .map(_._1.getSeq[Float](0).toArray)
      .collect()
    graft.index.KMeansLite.train(sample, k, iters).zipWithIndex.map(_.swap)
  }

  /** Nearest-centroid assignment by max cosine (ties → lowest centroid id),
   *  one broadcast argmax pass per row — no shuffle, no k×N row blow-up.
   *  Output: (id, cluster, csim). Bit-equal to the SQL cross-join + window
   *  argmax the oracle runs, because the scan order over centroids IS the
   *  tie-break order and cosineD matches DuckDB's double cosine. */
  def assign(df: DataFrame, vecCol: String, idCol: String,
      centroids: Array[(Int, Array[Float])]): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(centroids.sortBy(_._1))
    val in = df.select(col(idCol).cast(LongType).as("id"),
      toFloatVec(col(vecCol)).as("v"))
    val outSchema = StructType(Seq(StructField("id", LongType),
      StructField("cluster", IntegerType), StructField("csim", DoubleType)))
    val rdd = in.rdd.mapPartitions { it =>
      val cents = bc.value
      it.map { r =>
        val v = r.getSeq[Float](1).toArray
        var best = -1; var bestSim = Double.NegativeInfinity
        var c = 0
        while (c < cents.length) {
          val s = cosineD(v, cents(c)._2)
          if (s > bestSim) { bestSim = s; best = cents(c)._1 }
          c += 1
        }
        Row(r.getLong(0), best, bestSim)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /**
   * SemDeDup: within each cluster, drop every id that has ANY lower-id
   * cluster-mate with cosine ≥ `threshold` (deterministic keep-lowest
   * exemplar rule — the paper keeps an arbitrary member per ε-ball; "any
   * lower id" makes the choice reproducible and exactly matches the EXISTS
   * subquery the DuckDB oracle runs, the same keep rule
   * `dedup_minhash_keep` pins).
   *
   * Output: (id, cluster, kept). One shuffle (repartition by cluster); the
   * per-cluster pairwise scan runs inside `mapPartitions` with early exit on
   * the first over-threshold lower-id neighbor. Per-task memory is one
   * cluster's vectors — the operator's documented contract is that k scales
   * with N (SemDeDup trains k ∝ N clusters), holding cluster size ~constant;
   * the assignment stage emits per-cluster counts to the caller via
   * [[clusterSizes]] so an oversized cluster is visible, not silent.
   */
  def semdedup(df: DataFrame, vecCol: String, idCol: String,
      centroids: Array[(Int, Array[Float])], threshold: Double): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(centroids.sortBy(_._1))
    val in = df.select(col(idCol).cast(LongType).as("id"),
      toFloatVec(col(vecCol)).as("v"))
    val outSchema = StructType(Seq(StructField("id", LongType),
      StructField("cluster", IntegerType), StructField("kept", BooleanType)))
    val shuffleN = spark.sparkContext.defaultParallelism
    // assignment fused into the shuffle-write pass: ONE shuffle total,
    // keyed by cluster, no join back to the source
    val rdd = in.rdd
      .map { r =>
        val v = r.getSeq[Float](1).toArray
        val cents = bc.value
        var best = -1; var bestSim = Double.NegativeInfinity
        var c = 0
        while (c < cents.length) {
          val s = cosineD(v, cents(c)._2)
          if (s > bestSim) { bestSim = s; best = cents(c)._1 }
          c += 1
        }
        (best, (r.getLong(0), v))
      }
      .partitionBy(new org.apache.spark.HashPartitioner(shuffleN))
      .mapPartitions { it =>
        // a partition holds whole clusters (hash-partitioned by cluster id);
        // group, sort each by id, mark kept by scanning lower-id mates
        it.toSeq.groupBy(_._1).iterator.flatMap { case (cl, members) =>
          val ms = members.map(_._2).sortBy(_._1).toArray
          val kept = new Array[Boolean](ms.length)
          var i = 0
          while (i < ms.length) {
            var dropped = false
            var j = 0
            while (j < i && !dropped) {
              if (cosineD(ms(j)._2, ms(i)._2) >= threshold) dropped = true
              j += 1
            }
            kept(i) = !dropped
            i += 1
          }
          ms.iterator.zipWithIndex.map { case ((id, _), ix) =>
            Row(id, cl, kept(ix))
          }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-cluster membership counts (skew audit companion). */
  def clusterSizes(assigned: DataFrame): DataFrame =
    assigned.groupBy("cluster").agg(count(lit(1)).as("n"))
      .orderBy("cluster")
}
