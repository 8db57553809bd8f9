package graft.plans

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{toFloatVec, floatVec, array_distance, array_inner_product,
  array_cosine_similarity}
import graft.index.Ann

class AnnTopKRuleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.ann.root", s"/tmp/graft-rule-indexes-${System.nanoTime()}")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Graft.init(s)
    s
  }

  private val sf = "/root/testdata/sf0.001"
  lazy val emb: DataFrame = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val q: Array[Float] = (0 until 64).map(i => (i % 8) / 8.0f).toArray

  private def builtOnce: Unit = {
    if (!rebuilt) {
      Ann.buildIndex(emb, "embedding", "vec_id", "rule_l2",
        Ann.BuildParams(engine = "diskann", numShards = 2))
      Ann.buildIndex(emb, "embedding", "vec_id", "rule_ip",
        Ann.BuildParams(engine = "diskann", metric = "ip", numShards = 1))
      rebuilt = true
    }
  }
  private var rebuilt = false

  private def isRewritten(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("ann_index_scan")

  test("ORDER BY array_distance ASC LIMIT k rewrites to index scan") {
    builtOnce
    val topk = emb.orderBy(array_distance(toFloatVec(col("embedding")), floatVec(q.toSeq)))
      .limit(10)
    assert(isRewritten(topk))
    // still returns exactly k rows, ordering intact, matches brute force w/o rule
    spark.conf.set("spark.graft.ann.rewriteEnabled", "false")
    val brute = emb.orderBy(array_distance(toFloatVec(col("embedding")), floatVec(q.toSeq)))
      .limit(10).collect().map(_.getLong(0))
    spark.conf.set("spark.graft.ann.rewriteEnabled", "true")
    val got = topk.collect().map(_.getLong(0))
    assert(got.length == 10)
    assert(got.count(brute.toSet) >= 9, s"rewrite recall ${got.count(brute.toSet)}/10")
  }

  test("pushes an In filter into the parquet scan") {
    builtOnce
    val topk = emb.orderBy(array_distance(toFloatVec(col("embedding")), floatVec(q.toSeq)))
      .limit(5)
    val physical = topk.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [In(vec_id"),
      s"expected pushed In filter, got:\n$physical")
  }

  test("lazy mode: EXPLAIN launches no search; execution still returns top-k") {
    builtOnce
    spark.conf.set("spark.graft.ann.rewriteMode", "lazy")
    AnnTopKRule.clearCache()
    try {
      // distinct query vector so no prior cache entry can mask a search
      val lq = q.map(_ + 0.125f)
      val topk = emb.orderBy(array_distance(toFloatVec(col("embedding")),
        floatVec(lq.toSeq))).limit(10)
      val before = Ann.searchCount.get()
      // full planning: logical rewrite + physical plan (what EXPLAIN shows)
      val physical = topk.queryExecution.executedPlan.toString
      assert(Ann.searchCount.get() == before,
        "planning/EXPLAIN must not launch the ANN search in lazy mode")
      assert(topk.queryExecution.optimizedPlan.exists(_.isInstanceOf[AnnHitsNode]),
        s"expected AnnHitsNode in lazy plan:\n${topk.queryExecution.optimizedPlan}")
      // execution runs the search exactly once and matches brute force
      val got = topk.collect().map(_.getLong(0))
      assert(Ann.searchCount.get() == before + 1,
        "execution must run the deferred search")
      spark.conf.set("spark.graft.ann.rewriteEnabled", "false")
      val brute = emb.orderBy(array_distance(toFloatVec(col("embedding")),
        floatVec(lq.toSeq))).limit(10).collect().map(_.getLong(0))
      spark.conf.set("spark.graft.ann.rewriteEnabled", "true")
      assert(got.length == 10)
      assert(got.count(brute.toSet) >= 9, s"lazy recall ${got.count(brute.toSet)}/10")
    } finally spark.conf.unset("spark.graft.ann.rewriteMode")
  }

  test("eager mode (default) searches at planning and pushes literal In") {
    builtOnce
    AnnTopKRule.clearCache()
    val eq = q.map(_ + 0.25f)
    val topk = emb.orderBy(array_distance(toFloatVec(col("embedding")),
      floatVec(eq.toSeq))).limit(5)
    val before = Ann.searchCount.get()
    val physical = topk.queryExecution.executedPlan.toString
    assert(Ann.searchCount.get() == before + 1, "eager mode searches at planning")
    assert(physical.contains("PushedFilters: [In(vec_id"),
      "eager mode must keep the scan pushdown")
  }

  test("DESC distance does NOT rewrite; ASC similarity does NOT rewrite") {
    builtOnce
    val d1 = emb.orderBy(array_distance(toFloatVec(col("embedding")),
      floatVec(q.toSeq)).desc).limit(10)
    assert(!isRewritten(d1))
    val d2 = emb.orderBy(array_inner_product(toFloatVec(col("embedding")),
      floatVec(q.toSeq)).asc).limit(10)
    assert(!isRewritten(d2))
  }

  test("inner_product DESC rewrites against the IP index") {
    builtOnce
    val d = emb.orderBy(array_inner_product(toFloatVec(col("embedding")),
      floatVec(q.toSeq)).desc).limit(10)
    assert(isRewritten(d))
    assert(d.queryExecution.optimizedPlan.toString.contains("rule_ip"))
    assert(d.count() == 10)
  }

  test("no compatible index (cosine) → no rewrite") {
    builtOnce
    val d = emb.orderBy(array_cosine_similarity(toFloatVec(col("embedding")),
      floatVec(q.toSeq)).desc).limit(10)
    assert(!isRewritten(d))
  }

  test("cost gate: k > 30% of rows → no rewrite") {
    builtOnce
    val d = emb.orderBy(array_distance(toFloatVec(col("embedding")),
      floatVec(q.toSeq))).limit(200) // 200 > 0.3*500
    assert(!isRewritten(d))
  }

  test("filter present → rewrite with overfetch, filter still applied") {
    builtOnce
    val d = emb.where(col("label") === 3)
      .orderBy(array_distance(toFloatVec(col("embedding")), floatVec(q.toSeq)))
      .limit(5)
    assert(isRewritten(d))
    val rows = d.collect()
    assert(rows.forall(_.getInt(2) == 3))
    // oracle without rewrite
    spark.conf.set("spark.graft.ann.rewriteEnabled", "false")
    val brute = emb.where(col("label") === 3)
      .orderBy(array_distance(toFloatVec(col("embedding")), floatVec(q.toSeq)))
      .limit(5).collect().map(_.getLong(0))
    spark.conf.set("spark.graft.ann.rewriteEnabled", "true")
    assert(rows.map(_.getLong(0)).count(brute.toSet) >= 4)
  }

  test("SQL surface: registered function + LIMIT rewrites") {
    builtOnce
    emb.createOrReplaceTempView("emb_sql")
    val qLit = q.map(v => s"${v}f").mkString("array(", ", ", ")")
    val d = spark.sql(
      s"SELECT vec_id FROM emb_sql ORDER BY array_distance(embedding, $qLit) LIMIT 7")
    assert(isRewritten(d))
    assert(d.count() == 7)
  }

  test("projection on top: SELECT id, dist ... ORDER BY alias LIMIT k rewrites") {
    builtOnce
    val d = emb.select(col("vec_id"),
        array_distance(toFloatVec(col("embedding")), floatVec(q.toSeq)).as("d"))
      .orderBy("d").limit(10)
    assert(isRewritten(d))
    val vals = d.collect().map(_.getDouble(1))
    assert(vals.toSeq == vals.sorted.toSeq)
  }

  test("driver entry ann_rewrite_topk goes through the rewrite and is exact") {
    builtOnce // diskann indexes on the same files exist — flat must still win
    val df = graft.SparkEntry.queries("ann_rewrite_topk")(spark, sf)
    // the entry itself require()s the marker; assert plan shape here too so a
    // silent fallback (or a lost marker) fails the suite, not just the driver
    assert(isRewritten(df))
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
    spark.conf.set("spark.graft.ann.rewriteEnabled", "false")
    val brute = emb.select(col("vec_id"),
        array_distance(toFloatVec(col("embedding")), floatVec(q.toSeq)).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    spark.conf.set("spark.graft.ann.rewriteEnabled", "true")
    // FLAT index behind the rewrite → bit-identical to brute force, in order
    assert(got.toSeq == brute.toSeq)
  }

  test("lsh indexes are never rewrite candidates (Hamming != metric distance)") {
    // a fresh catalog root where ONLY an lsh index covers the scan: the
    // metric-distance top-k must stay a plain sort, because the lsh serve
    // path returns Hamming VALUES — a rewrite would silently change the
    // query's _distance semantics, not just its ranking
    val oldRoot = spark.conf.get("spark.graft.ann.root")
    spark.conf.set("spark.graft.ann.root", s"/tmp/graft-rule-lsh-${System.nanoTime()}")
    try {
      Ann.buildIndexFactory(emb, "embedding", "vec_id", "rule_lsh", "LSH32")
      val topk = emb.orderBy(array_distance(toFloatVec(col("embedding")),
        floatVec(q.toSeq))).limit(10)
      assert(!isRewritten(topk),
        s"lsh index must not capture a metric top-k:\n${topk.queryExecution.optimizedPlan}")
    } finally spark.conf.set("spark.graft.ann.root", oldRoot)
  }

  test("index selection prefers the exact engine when several cover the scan") {
    builtOnce
    Ann.buildIndex(emb, "embedding", "vec_id", "a_flat_first",
      Ann.BuildParams(engine = "flat"))
    try {
      val d = emb.orderBy(array_distance(toFloatVec(col("embedding")),
        floatVec(q.toSeq))).limit(10)
      val plan = d.queryExecution.optimizedPlan.toString
      assert(plan.contains("ann_index_scan['a_flat_first']"),
        s"expected the flat index to be selected over diskann, got:\n$plan")
    } finally Ann.drop(spark, "a_flat_first")
  }
}
