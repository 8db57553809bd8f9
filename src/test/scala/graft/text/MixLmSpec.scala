package graft.text

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TextOps.domainMix]] and [[TextOps.lmScore]] contracts. */
class MixLmSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def corpus(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  // ------------------------------------------------------------ domainMix

  private def mixFixture: DataFrame = corpus(
    (0L until 100L).map(i =>
      (i, if (i < 60) "web" else if (i < 90) "code" else "books",
        s"doc $i")): _*)

  test("domainMix: domains at/above target keep all rows; below-target " +
    "domains downsample to ~target") {
    val out = TextOps.domainMix(mixFixture, "source", "doc_id",
      targets = Map("web" -> 20L, "books" -> 100L), defaultTarget = 10L)
    val byDomain = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // books: target 100 >= n 10 -> rate 1.0, all kept
    assert(byDomain("books") == 10L)
    // web: rate 20/60 -> expected ~20 of 60; the hash gate is uniform but
    // not exact — allow a generous band, assert real downsampling happened
    assert(byDomain("web") > 5L && byDomain("web") < 40L)
    // code (default target 10 of 30): downsampled too
    assert(byDomain.getOrElse("code", 0L) < 30L)
    // kept rows are original rows
    assert(out.join(mixFixture, Seq("doc_id", "source"), "left_anti").count() == 0)
  }

  test("domainMix: deterministic, and smaller budgets select subsets of " +
    "larger budgets (growable mixes)") {
    def ids(target: Long): Set[Long] =
      TextOps.domainMix(mixFixture, "source", "doc_id",
          targets = Map("web" -> target), defaultTarget = 1000L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(20L) == ids(20L))
    val small = ids(10L); val mid = ids(30L); val all = ids(60L)
    assert(small.subsetOf(mid) && mid.subsetOf(all))
    assert(all.size == 100) // rate 1.0 everywhere
  }

  test("domainMixTokens: token-budgeted rates — over-budget domains keep " +
    "all; under-budget domains drop toward the token target") {
    // web: 60 docs x 4 tokens = 240 tokens; code: 30 x 4 = 120; books: 10 x 4
    val df = corpus((0L until 100L).map(i =>
      (i, if (i < 60) "web" else if (i < 90) "code" else "books",
        s"tok a b c")): _*)
    val out = TextOps.domainMixTokens(df, "source", "text", "doc_id",
      targets = Map("web" -> 80L, "books" -> 999L), defaultTarget = 60L)
    val byDomain = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain("books") == 10L) // budget 999 > 40 tokens -> keep all
    // web rate 80/240 = 1/3 -> ~20 of 60 docs; assert real downsampling
    assert(byDomain("web") > 5L && byDomain("web") < 40L)
    assert(byDomain.getOrElse("code", 0L) < 30L) // rate 60/120
    // same gate as domainMix: a domain at equal rate keeps identical ids
    val rows = TextOps.domainMix(df, "source", "doc_id",
        targets = Map("web" -> 20L), defaultTarget = 1000L)
      .where(col("source") === "web").select("doc_id").collect().map(_.getLong(0)).toSet
    val toks = TextOps.domainMixTokens(df, "source", "text", "doc_id",
        targets = Map("web" -> 80L), defaultTarget = 999999L)
      .where(col("source") === "web").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows == toks) // 20/60 rows == 80/240 tokens -> same rate, same ids
  }

  // -------------------------------------------------------- dedupVsCorpus

  test("dedupVsCorpus: new docs duplicating the corpus drop; within-batch " +
    "dups and novel docs survive") {
    import spark.implicits._
    val mk = (id: Long, t: String) => (id, t)
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = Seq(mk(100L, boiler),
      mk(101L, "completely different corpus text about databases and joins"))
      .toDF("doc_id", "text")
    val fresh = Seq(
      mk(1L, boiler),                                    // dup of corpus 100
      mk(2L, "a genuinely novel document about spark partitioning"),
      mk(3L, "another novel doc that matches nothing in the archive"),
      mk(4L, "another novel doc that matches nothing in the archive"))
      .toDF("doc_id", "text")                            // 3~4 in-batch dup
    val kept = TextOps.dedupVsCorpus(fresh, corpus, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L)) // 1 dropped; in-batch pair 3/4 BOTH kept
    // corpus rows are never returned, only filtered against
    assert(!kept.contains(100L) && !kept.contains(101L))
  }

  // -------------------------------------------------------------- lmScore

  test("lmScore: MLE conditional probs with minCount pruning, hand-checked") {
    val df = corpus(
      (1L, "s", "the cat sat"),
      (2L, "s", "the cat ran"),
      (3L, "s", "xyzzy plugh"))
    val got = TextOps.lmScore(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // bigram counts: "the cat" x2 (kept), "cat sat"/"cat ran"/"xyzzy plugh"
    // x1 (pruned at minCount=2). c(the)=2.
    // doc1: probs = [c(the cat)/c(the) = 1.0, 0.0] -> mean 0.5, 1 oov
    assert(got(1L) == ((2L, 1L, 0.5)))
    assert(got(2L) == ((2L, 1L, 0.5)))
    // doc3: its only bigram is pruned -> all-OOV, score 0
    assert(got(3L) == ((1L, 1L, 0.0)))
  }

  test("lmScore: docs with <2 tokens score 0 with 0 bigrams; every doc " +
    "appears exactly once; probs bounded in [0,1]") {
    val df = corpus(
      (1L, "s", "one"),
      (2L, "s", ""),
      (3L, "s", "a b a b a b"),
      (4L, "s", "a b c a b c"))
    val out = TextOps.lmScore(df, "text", "doc_id")
    val rows = out.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L))
    assert(rows(1L) == ((0L, 0L, 0.0)))
    assert(rows(2L) == ((0L, 0L, 0.0)))
    rows.values.foreach { case (nb, no, p) =>
      assert(no <= nb); assert(p >= 0.0 && p <= 1.0)
    }
    // repetitive doc 3 ("a b" x3, "b a" x2 over c(a)=5... within-corpus
    // fluent) scores strictly higher than nothing-shared doc 1
    assert(rows(3L)._3 > 0.5)
  }

  test("lmScore: score is scale-stable under corpus replication (counts " +
    "ratio-invariant)") {
    val base = Seq((1L, "s", "the cat sat on the mat"),
      (2L, "s", "the dog sat on the rug"))
    val once = corpus(base: _*)
    val twice = corpus((base ++ base.map { case (i, s, t) => (i + 10L, s, t) }): _*)
    val a = TextOps.lmScore(once, "text", "doc_id").where(col("doc_id") === 1L)
      .head().getDouble(3)
    val b = TextOps.lmScore(twice, "text", "doc_id").where(col("doc_id") === 1L)
      .head().getDouble(3)
    // doubling every count leaves each c(w1w2)/c(w1) unchanged, except
    // bigrams that cross the minCount threshold can only ADD probability
    assert(b >= a)
  }
}
