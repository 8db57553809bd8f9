package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Deterministic pseudo-random vectors with planted near-dup pairs. */
  private def fixture(n: Int, dim: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val base =
        if (i % 5 == 4) { // near-dup of i-1: tiny deterministic perturbation
          val prev = vec(i - 1, dim)
          prev.indices.map(d => prev(d) + (if (d == 0) 0.01f else 0f)).toArray
        } else vec(i, dim)
      (i.toLong, base)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def vec(seed: Int, dim: Int): Array[Float] = {
    var h = seed.toLong * 6364136223846793005L + 1442695040888963407L
    Array.tabulate(dim) { _ =>
      h = h * 6364136223846793005L + 1442695040888963407L
      ((h >>> 33).toInt % 1000) / 500.0f - 1.0f
    }
  }

  /** Brute-force local recompute of the operator's contract. */
  private def bruteForce(rows: Array[(Long, Array[Float])],
      cents: Array[(Int, Array[Float])], tau: Double): Map[Long, (Int, Boolean)] = {
    val sorted = cents.sortBy(_._1)
    val assign = rows.map { case (id, v) =>
      val best = sorted.map { case (c, cv) => (SemDedup.cosineD(v, cv), c) }
        .reduceLeft((a, b) => if (b._1 > a._1) b else a) // strict: first max wins
      (id, best._2, v)
    }
    assign.map { case (id, cl, v) =>
      val dropped = assign.exists { case (id2, cl2, v2) =>
        cl2 == cl && id2 < id && SemDedup.cosineD(v2, v) >= tau
      }
      id -> (cl, !dropped)
    }.toMap
  }

  test("semdedup seed mode == brute-force contract; planted near-dups drop") {
    val df = fixture(100, 16)
    val seeds = SemDedup.seedCentroids(df, "embedding", "vec_id", 4)
    assert(seeds.map(_._1).toSeq == Seq(0, 1, 2, 3))
    val got = SemDedup.semdedup(df, "embedding", "vec_id", seeds, 0.99)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    val rows = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val want = bruteForce(rows, seeds, 0.99)
    assert(got == want)
    // every planted near-dup pair is same-direction (cos ~ 1): i%5==4 rows
    // land in the same cluster as i-1 and must be dropped
    val planted = (0 until 100).filter(_ % 5 == 4)
    assert(planted.forall(i => !got(i.toLong)._2),
      s"planted dups kept: ${planted.filter(i => got(i.toLong)._2)}")
    // and the exemplar (i-1, lower id) stays kept unless it itself has a
    // lower-id near-dup — brute force already pinned exact equality above
    assert(got.values.count(_._2) > 0)
  }

  test("trained centroids: same downstream rule, KMeansLite geometry") {
    val df = fixture(80, 8)
    val cents = SemDedup.trainedCentroids(df, "embedding", k = 4, iters = 5)
    assert(cents.length == 4 && cents.map(_._1).toSeq == Seq(0, 1, 2, 3))
    val got = SemDedup.semdedup(df, "embedding", "vec_id", cents, 0.99)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    val rows = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(got == bruteForce(rows, cents, 0.99))
  }

  test("assign: argmax cosine, ties break to lowest centroid id") {
    import spark.implicits._
    val v = Array(1f, 0f)
    // two identical centroids: tie must resolve to centroid 0
    val cents = Array(0 -> v.clone(), 1 -> v.clone(), 2 -> Array(0f, 1f))
    val df = Seq((7L, v.toSeq)).toDF("vec_id", "embedding")
    val got = SemDedup.assign(df, "embedding", "vec_id", cents).collect()
    assert(got.length == 1 && got(0).getInt(1) == 0)
    assert(got(0).getDouble(2) == 1.0)
  }

  test("two-level assignment at saturating nprobe == linear, bit-for-bit") {
    val df = fixture(120, 8)
    val cents = SemDedup.trainedCentroids(df, "embedding", k = 9, iters = 5)
    // force the two-level route (k=9 is far below the auto gate) with
    // nprobe >= #coarse cells: every member centroid is scanned, so the
    // result must equal the linear argmax exactly — assignment AND dedup
    val lin = SemDedup.semdedup(df, "embedding", "vec_id", cents, 0.99,
      assignNprobe = -1).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    val sat = SemDedup.semdedup(df, "embedding", "vec_id", cents, 0.99,
      assignNprobe = 100).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(sat == lin)
    val linA = SemDedup.assign(df, "embedding", "vec_id", cents, -1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val satA = SemDedup.assign(df, "embedding", "vec_id", cents, 100).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(satA == linA)
  }

  test("two-level assignment at realistic nprobe: high agreement with linear") {
    val df = fixture(300, 8)
    val cents = SemDedup.trainedCentroids(df, "embedding", k = 25, iters = 5)
    val lin = SemDedup.assign(df, "embedding", "vec_id", cents, -1).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // k=25 ⇒ 5 coarse cells; probe 3 of 5
    val two = SemDedup.assign(df, "embedding", "vec_id", cents, 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val agree = lin.count { case (id, c) => two(id) == c }
    assert(agree >= (lin.size * 0.9).toInt,
      s"two-level agreement $agree/${lin.size} below 90%")
  }

  test("streamed reducer: whole clusters per partition, many clusters per task") {
    // more clusters than partitions AND a cluster spread over the input:
    // the sorted-stream reducer must still evaluate each cluster whole
    val df = fixture(200, 8).repartition(7)
    val seeds = SemDedup.seedCentroids(df, "embedding", "vec_id", 12)
    val got = SemDedup.semdedup(df, "embedding", "vec_id", seeds, 0.99)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    val rows = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(got == bruteForce(rows, seeds, 0.99))
  }

  test("clusterSizes audit sums to N") {
    val df = fixture(60, 8)
    val seeds = SemDedup.seedCentroids(df, "embedding", "vec_id", 4)
    val sizes = SemDedup.clusterSizes(
      SemDedup.assign(df, "embedding", "vec_id", seeds))
      .collect().map(_.getLong(1)).sum
    assert(sizes == 60L)
  }

  test("lptPack: quadratic-cost bins balance within the LPT bound") {
    // adversarial for the old modulo placement: the four max-cap clusters
    // all hash to bin 0 at parts=4 (ids 0,4,8,12), stacking 16x a mean
    // cluster's pair mass in one task
    val sizes = Array.tabulate(16)(c => (c, if (c % 4 == 0) 2000L else 500L))
    val partOf = SemDedup.lptPack(sizes, 4)
    assert(partOf.size == 16)
    val loads = (0 until 4).map(p =>
      sizes.collect { case (c, n) if partOf(c) == p => n * n }.sum)
    val ideal = sizes.map { case (_, n) => n * n }.sum / 4.0
    // LPT guarantees makespan <= 4/3 * OPT; with these sizes it lands far
    // closer — assert the bound, and that the big clusters spread out
    assert(loads.max <= ideal * 4 / 3, s"loads $loads vs ideal $ideal")
    val bigBins = sizes.collect { case (c, 2000L) => partOf(c) }
    assert(bigBins.distinct.length == 4, s"max-cap clusters stacked: $bigBins")
    // deterministic: same input -> same placement
    assert(SemDedup.lptPack(sizes, 4) == partOf)
  }

  test("semdedup results are invariant under the cost-aware placement") {
    // skewed fixture (one dominant cluster) — results must equal the brute
    // force regardless of which tasks the clusters land on
    val df = fixture(240, 8)
    val seeds = SemDedup.seedCentroids(df, "embedding", "vec_id", 6)
    val got = SemDedup.semdedup(df, "embedding", "vec_id", seeds, 0.95)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    val rows = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(got == bruteForce(rows, seeds, 0.95))
  }
}
