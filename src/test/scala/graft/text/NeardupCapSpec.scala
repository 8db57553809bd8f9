package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bucket-clique cap (TextOps.candidatePairs): buckets at or under
  * `spark.graft.neardup.bucketCliqueCap` must be BIT-IDENTICAL to the
  * uncapped clique join, and oversized buckets (the 100×-smoke duplicate
  * clusters that grew pair emission quadratically) must keep dedup
  * semantics — same survivors — while emitting only a linear number of
  * candidate pairs. */
class NeardupCapSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def withCap[T](cap: Int)(body: => T): T = {
    spark.conf.set("spark.graft.neardup.bucketCliqueCap", cap.toString)
    try body
    finally spark.conf.unset("spark.graft.neardup.bucketCliqueCap")
  }

  private def pairsOf(df: DataFrame): Set[(Long, Long, Long)] =
    TextOps.candidatePairs(TextOps.signatures(df, "text", "doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** The 100×-smoke replica shape: `nClusters` base texts, each replicated
    * `k` times with a tiny per-replica suffix, so every cluster is a
    * near-dup CLIQUE whose members land in the same band buckets. */
  private def replicaCorpus(nClusters: Int, k: Int): DataFrame = {
    import spark.implicits._
    val rows = for {
      c <- 0 until nClusters
      r <- 0 until k
    } yield {
      val base = (0 until 30)
        .map(i => s"tok${(c * 31 + i * 7) % 97}word$i").mkString(" ")
      val text = if (r == 0) base else s"$base replica$r"
      (c.toLong * 1000000L + r, text)
    }
    rows.toDF("doc_id", "text")
  }

  /** Distinct small docs (no near-dups): buckets far under any cap. */
  private def distinctCorpus(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong,
        (0 until 12).map(j => s"uniq${i}x${j}tok${(i * 13 + j * 17) % 1013}")
          .mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("buckets under the cap: capped output bit-identical to uncapped") {
    val df = distinctCorpus(60).unionByName(replicaCorpus(3, 4)
      .withColumn("doc_id", col("doc_id") + 500L))
    val uncapped = withCap(0)(pairsOf(df))
    val capped = withCap(64)(pairsOf(df))
    assert(capped == uncapped) // includes n_bands, not just the pair set
  }

  test("oversized clique buckets: same dedup survivors, linear pair count") {
    val k = 150 // > default cap 64, the 100×-replica cluster shape
    val df = replicaCorpus(2, k).unionByName(distinctCorpus(20)
      .withColumn("doc_id", col("doc_id") + 900000000L))
    val survUncapped = withCap(0) {
      TextOps.dedupByMinhash(df, "text", "doc_id", minJaccard = 0.6)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val survCapped =
      TextOps.dedupByMinhash(df, "text", "doc_id", minJaccard = 0.6)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survCapped == survUncapped)
    // every distinct doc survives; each clique keeps exactly its min id
    assert(survCapped.count(_ < 900000000L) == 2)

    // emission is linear in bucket size: k·(P+A) per band, not k²/2
    val nUncapped = withCap(0)(pairsOf(df)).size
    val nCapped = pairsOf(df).size
    assert(nCapped < nUncapped / 2,
      s"capped=$nCapped uncapped=$nUncapped — cap did not engage")
    val bound = 2L * k * (8 + 8) * TextOps.NumBands + 10000
    assert(nCapped <= bound, s"capped=$nCapped exceeds linear bound $bound")
  }

  test("converged dedup (connected components) unchanged on clique corpora") {
    val df = replicaCorpus(3, 100)
    val uncapped = withCap(0) {
      TextOps.dedupByMinhashConverged(df, "text", "doc_id", minJaccard = 0.6)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val capped =
      TextOps.dedupByMinhashConverged(df, "text", "doc_id", minJaccard = 0.6)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(capped == uncapped && capped.size == 3)
  }

  test("lshBucketStats: emitted mass matches the closed form on an over-cap clique") {
    import spark.implicits._
    // one giant exact-duplicate clique: every band bucket holds all n docs
    val n = 100
    val text = (0 until 30).map(i => s"capaudit${i}tok").mkString(" ")
    val df = (0 until n).map(i => (i.toLong, text)).toDF("doc_id", "text")
    val row = TextOps.lshBucketStats(df, "text", "doc_id").collect()(0)
    val get = (c: String) => row.getLong(row.fieldIndex(c))
    val nBands = get("buckets_total")
    assert(nBands > 0 && get("buckets_over_cap") == nBands,
      s"every bucket should exceed the cap: ${row.toString}")
    assert(get("max_bucket") == n.toLong)
    val clique = nBands * (n.toLong * (n - 1) / 2)
    // P=A=8: rank r<=16 pairs with all r-1 smaller ids (120 total), r>=17
    // with exactly 16 — the closed form the DuckDB oracle replays
    val emitted = nBands * (120L + 16L * (n - 16))
    assert(get("clique_pairs") == clique)
    assert(get("emitted_pairs") == emitted,
      s"emitted ${get("emitted_pairs")} != closed form $emitted")
    assert(get("capped_away_pairs") == clique - emitted)
    // and a no-dup corpus certifies bit-identity: zero over-cap, zero capped
    val rowD = TextOps.lshBucketStats(distinctCorpus(50), "text", "doc_id")
      .collect()(0)
    val getD = (c: String) => rowD.getLong(rowD.fieldIndex(c))
    assert(getD("buckets_over_cap") == 0L && getD("capped_away_pairs") == 0L)
    assert(getD("emitted_pairs") == getD("clique_pairs"))
  }
}
