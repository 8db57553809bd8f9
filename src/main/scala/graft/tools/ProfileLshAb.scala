package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.text.TextOps

/**
 * A/B harness for the two LSH-dedup stage rewrites that landed together:
 * window-explode candidate pairing (vs the band-bucket self-join it
 * replaced) and shuffle-hash-hinted verify join (vs the default
 * sort-merge). Run against a scale-smoke replica dir to see which variant
 * wins at which scale — the octave artifacts only show the composite.
 */
object ProfileLshAb {

  /** The PRE-rework candidate pairing (band-bucket self-join + rank-keyed
   *  chain join), verbatim semantics, for A/B against
   *  [[TextOps.candidatePairs]]. */
  private def candidatePairsJoin(sigs: DataFrame): DataFrame = {
    val spark = sigs.sparkSession
    val cap = spark.conf.getOption("spark.graft.neardup.bucketCliqueCap")
      .map(_.toInt).getOrElse(64)
    val chainP = spark.conf
      .getOption("spark.graft.neardup.bucketChainPredecessors")
      .map(_.toInt).getOrElse(8)
    val anchorA = spark.conf.getOption("spark.graft.neardup.bucketChainAnchors")
      .map(_.toInt).getOrElse(8)
    val bt = TextOps.bandTable(sigs)
    def cliqueJoin(t: DataFrame): DataFrame = {
      val a = t.as("a"); val b = t.as("b")
      a.join(b, col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band_idx", "band_hash")
    val ranked = bt
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__rn", row_number().over(w.orderBy(col("id"))))
    val small = ranked.where(col("__n") <= cap)
      .select("id", "band_idx", "band_hash")
    val large = ranked.where(col("__n") > cap)
    val partnerRanks = array_distinct(concat(
      array((1 to chainP).map(j => col("__rn") - lit(j)): _*),
      array((1 to anchorA).map(j => lit(j)): _*)))
    val targets = large.select(col("id"), col("band_idx"), col("band_hash"),
      explode(filter(partnerRanks,
        t => t >= lit(1) && t < col("__rn"))).as("__trn"))
    val partners = large.select(col("id").as("__pid"),
      col("band_idx"), col("band_hash"), col("__rn").as("__trn"))
    val chainPairs = targets
      .join(partners, Seq("band_idx", "band_hash", "__trn"))
      .select(col("__pid").as("id_a"), col("id").as("id_b"))
    cliqueJoin(small).unionByName(chainPairs)
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_bands"))
  }

  private def verify(sigs: DataFrame, cands: DataFrame, hinted: Boolean,
      minJaccard: Double): DataFrame = {
    val sa0 = sigs.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val sb0 = sigs.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    val (sa, sb) = if (hinted)
      (sa0.hint("shuffle_hash"), sb0.hint("shuffle_hash")) else (sa0, sb0)
    val inter = graft.functions.mkCol(graft.expressions.SortedIntersectCount(
      graft.functions.mkExpr(col("sh_a")), graft.functions.mkExpr(col("sh_b"))))
    cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("n_inter", inter)
      .withColumn("jaccard", col("n_inter").cast(DoubleType) /
        (size(col("sh_a")) + size(col("sh_b")) - col("n_inter")).cast(DoubleType))
      .where(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "n_bands", "jaccard")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/scale300")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    val sigs = TextOps.signatures(docs, "text", "doc_id").cache()
    sigs.count()
    for (round <- 1 to 2) {
      println(s"--- round $round")
      time("candidatePairs WINDOW (head)")(TextOps.candidatePairs(sigs).count())
      time("candidatePairs JOIN (pre)")(candidatePairsJoin(sigs).count())
      time("full verify, hinted (head)")(
        verify(sigs, TextOps.candidatePairs(sigs), hinted = true, 0.6).count())
      time("full verify, sort-merge (pre)")(
        verify(sigs, TextOps.candidatePairs(sigs), hinted = false, 0.6).count())
      time("join-cands + hinted verify")(
        verify(sigs, candidatePairsJoin(sigs), hinted = true, 0.6).count())
      time("join-cands + sort-merge verify")(
        verify(sigs, candidatePairsJoin(sigs), hinted = false, 0.6).count())
    }
    spark.stop()
  }
}
