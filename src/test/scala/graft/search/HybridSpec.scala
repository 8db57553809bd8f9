package graft.search

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HybridSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def docs(): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "spark shuffle join performance tuning guide", Array(1f, 0f, 0f)),
      (2L, "cats and dogs and other pets", Array(0f, 1f, 0f)),
      (3L, "spark spark spark streaming", Array(0f, 0f, 1f)),
      (4L, "join algorithms hash merge broadcast", Array(0.9f, 0.1f, 0f)),
      (5L, "unrelated document entirely", Array(0f, 0.9f, 0.4f))
    ).toDF("id", "text", "emb")
  }

  test("bm25: term-frequency and idf ranking behaves") {
    val r = Hybrid.bm25Ranks(docs(), "text", "id", Seq("spark", "join"), 10)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    // docs 1 (spark+join), 3 (spark x3), 4 (join) rank; 2/5 excluded
    assert(r.keySet == Set(1L, 3L, 4L))
    assert(r(1L) == 1, s"doc 1 has both terms → best, got $r")
  }

  test("rrf fusion: weights and missing-rank zero contribution") {
    import spark.implicits._
    val bm25 = Seq((1L, 1), (2L, 2)).toDF("id", "_bm25_rank")
    val vec = Seq((2L, 1), (3L, 2)).toDF("id", "_vector_rank")
    val out = Hybrid.rrfFuse(bm25, vec, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toList
    val byId = out.map(t => t._1 -> t).toMap
    // doc2: bm25 rank2 + vec rank1 → 0.3/62 + 0.7/61
    assert(math.abs(byId(2L)._4 - (0.3 / 62 + 0.7 / 61)) < 1e-15)
    // doc1: bm25 only
    assert(byId(1L)._4 == 0.3 / 61 && byId(1L)._3 == 0L)
    // doc3: vector only
    assert(byId(3L)._4 == 0.7 / 62 && byId(3L)._2 == 0L)
    // ordering: doc2 first (fused beats single-source)
    assert(out.head._1 == 2L)
  }

  test("hybrid end-to-end: fused ranking blends text and vector signals") {
    val q = Array(1f, 0f, 0f) // closest to doc 1, then 4
    val out = Hybrid.hybridSearch(docs(), "text", "emb", "id",
      "spark join", q, 5).collect()
    assert(out.length == 5)
    // doc 1 matches both modalities best overall
    assert(out.head.getLong(0) == 1L)
    val scores = out.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("empty query text → vector-only ranking") {
    val q = Array(0f, 1f, 0f)
    val out = Hybrid.hybridSearch(docs(), "text", "emb", "id", "", q, 3).collect()
    assert(out.head.getLong(0) == 2L) // nearest vector
    assert(out.forall(_.getLong(1) == 0L)) // no bm25 ranks
  }
}
