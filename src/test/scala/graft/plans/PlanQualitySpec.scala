package graft.plans

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{toFloatVec, floatVec, array_distance}

/** Physical-plan assertions for the 100 TB contract: columns prune to the
 *  scan, filters push to parquet, small dimensions broadcast, aggregates
 *  partial-aggregate map-side, and exact top-k uses TakeOrderedAndProject
 *  (never a global sort). */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val sf = "/root/testdata/sf0.001"
  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("projection prunes the parquet scan to referenced columns") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val p = plan(df)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"expected 2-column ReadSchema:\n$p")
  }

  test("filters push down to the parquet scan") {
    val df = spark.read.parquet(s"$sf/orders.parquet")
      .where(col("o_custkey") === 42L).select("o_orderkey")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,42)]"),
      s"expected pushed EqualTo:\n$p")
  }

  test("exact top-k by distance is TakeOrderedAndProject, not a global sort") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = (0 until 64).map(i => (i % 8) / 8.0f)
    spark.conf.set("spark.graft.ann.rewriteEnabled", "false")
    val df = emb.orderBy(array_distance(toFloatVec(col("embedding")), floatVec(q)))
      .limit(10)
    val p = plan(df)
    spark.conf.set("spark.graft.ann.rewriteEnabled", "true")
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"global sort leaked:\n$p")
  }

  test("small dimension joins broadcast; aggregates partial-aggregate") {
    val c = spark.read.parquet(s"$sf/customer.parquet")
      .where(col("c_mktsegment") === "BUILDING")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val j = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderdate").agg(sum("o_totalprice").as("t"))
    val p = plan(j)
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(p.contains("partial_sum"), s"expected map-side partial aggregation:\n$p")
  }

  test("anti-join plans as BroadcastHashJoin LeftAnti, not a cartesian shape") {
    val p = plan(graft.SparkEntry.queries("q_antijoin")(spark, sf))
    assert(p.contains("LeftAnti"), s"expected anti join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product in anti join:\n$p")
  }

  test("multi-way dimension join broadcasts both dimensions") {
    val p = plan(graft.SparkEntry.queries("q_multijoin")(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"expected 2 broadcast joins (nation, region):\n$p")
    assert(p.contains("partial_count") || p.contains("partial_min"),
      s"expected map-side partial aggregation:\n$p")
  }

  test("ivfpq probe scan prunes unprobed cluster partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextFloat() * 10 - 5))
    val rows = (0L until 400L).map { i =>
      val c = centers((i % 8).toInt)
      (i, c.map(x => x + rnd.nextFloat() * 0.3f - 0.15f))
    }
    val df = rows.toDF("id", "vec")
    val root = s"/tmp/graft-pq-plan-${System.nanoTime()}"
    spark.conf.set("spark.graft.ann.root", root)
    try {
      graft.index.Ann.buildIndex(df, "vec", "id", "plan_ivfpq",
        graft.index.Ann.BuildParams(engine = "ivfpq", pqM = 4, nlist = 8,
          nprobe = 2, trainSample = 400))
      val scan = graft.index.Ann.indexScan(spark, "plan_ivfpq",
        rows.head._2, 10)
      val p = plan(scan)
      // nprobe=2 of nlist=8: the cluster partition filter must reach the scan
      assert(p.contains("PartitionFilters") && p.contains("cluster"),
        s"expected cluster partition pruning:\n$p")
    } finally spark.conf.unset("spark.graft.ann.root")
  }

  test("range search on ivfflat prunes cluster partitions; flat prunes columns") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextFloat() * 10 - 5))
    val rows = (0L until 400L).map { i =>
      val c = centers((i % 8).toInt)
      (i, c.map(x => x + rnd.nextFloat() * 0.3f - 0.15f))
    }
    val df = rows.toDF("id", "vec")
    val root = s"/tmp/graft-range-plan-${System.nanoTime()}"
    spark.conf.set("spark.graft.ann.root", root)
    try {
      graft.index.Ann.buildIndex(df, "vec", "id", "plan_range_ivf",
        graft.index.Ann.BuildParams(engine = "ivfflat", nlist = 8, nprobe = 2))
      val p1 = plan(graft.index.Ann.rangeSearch(df, "id", "plan_range_ivf",
        rows.head._2, 5f))
      // nprobe=2 of nlist=8: only probed clusters may be scanned
      assert(p1.contains("PartitionFilters") && p1.contains("cluster"),
        s"expected cluster partition pruning:\n$p1")

      graft.index.Ann.buildIndex(df, "vec", "id", "plan_range_flat",
        graft.index.Ann.BuildParams(engine = "flat"))
      val p2 = plan(graft.index.Ann.rangeSearch(df, "id", "plan_range_flat",
        rows.head._2, 5f))
      // the radius filter needs only (id, vec): no other index column may load
      assert(p2.contains("ReadSchema: struct<id:bigint,vec:array<float>>"),
        s"expected 2-column ReadSchema on the index scan:\n$p2")
    } finally spark.conf.unset("spark.graft.ann.root")
  }

  test("distance expressions stay inside whole-stage codegen") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = (0 until 64).map(i => (i % 8) / 8.0f)
    val df = emb.select(col("vec_id"),
      array_distance(toFloatVec(col("embedding")), floatVec(q)).as("d"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), s"expected WholeStageCodegen stage:\n$p")
  }

  test("round-11 operators: no cartesian products; domain mixing broadcasts " +
    "its counts and keeps the corpus shuffle-free") {
    import graft.text.TextOps
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    for ((name, df) <- Seq(
        "lm_score" -> TextOps.lmScore(docs, "text", "doc_id"),
        "domain_mix" -> TextOps.domainMix(docs, "source", "doc_id",
          Map("src0" -> 5L), 2L),
        "domain_mix_tokens" -> TextOps.domainMixTokens(docs, "source", "text",
          "doc_id", Map("src0" -> 100L), 50L),
        "dedup_vs_corpus" -> TextOps.dedupVsCorpus(
          docs.where(col("doc_id") % 10 === 0),
          docs.where(col("doc_id") % 10 =!= 0), "text", "doc_id"))) {
      val pl = plan(df)
      assert(!pl.contains("CartesianProduct"), s"$name went cartesian:\n$pl")
    }
    val mixPlan = plan(TextOps.domainMix(docs, "source", "doc_id",
      Map("src0" -> 5L), 2L))
    assert(mixPlan.contains("BroadcastHashJoin"),
      s"domain_mix did not broadcast its counts:\n$mixPlan")
  }

  test("round-7 operators: no cartesian products, packing keeps ONE exchange") {
    import graft.text.TextOps
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    for ((name, df) <- Seq(
        "dedup_lines" -> TextOps.dedupLines(docs, "text", "doc_id", 3),
        "pack_sequences" -> TextOps.packSequences(docs, "text", "doc_id", "lang", 256L),
        "hashed_tf" -> docs.select(explode(TextOps.hashedTf(col("text"), 64))),
        "rare_terms_dist" -> {
          spark.conf.set("spark.graft.text.localRareMaxBytes", "0")
          try TextOps.rareTerms(docs, "text", "doc_id", 3)
          finally spark.conf.unset("spark.graft.text.localRareMaxBytes")
        })) {
      val pl = plan(df)
      assert(!pl.contains("CartesianProduct"), s"$name went cartesian:\n$pl")
    }
    // the segmented packing engine's contract: exactly ONE shuffle (the
    // range repartition) in the whole lineage — its passes must reuse that
    // shuffle's output, never add exchanges. The result is an RDD-backed
    // frame, so count ShuffleDependency in the RDD lineage, not Exchange
    // nodes in the SQL plan. (The size gate would route this toy corpus
    // serial — force the segmented engine, the one under test.)
    spark.conf.set("spark.graft.pack.serialMaxBytes", "0")
    val packRdd =
      try TextOps.packSequences(docs, "text", "doc_id", "lang", 256L).rdd
      finally spark.conf.unset("spark.graft.pack.serialMaxBytes")
    def countShuffles(r: org.apache.spark.rdd.RDD[_],
        seen: scala.collection.mutable.Set[Int]): Int =
      if (!seen.add(r.id)) 0
      else r.dependencies.map {
        case s: org.apache.spark.ShuffleDependency[_, _, _] =>
          1 + countShuffles(s.rdd, seen)
        case d => countShuffles(d.rdd, seen)
      }.sum
    val shuffles = countShuffles(packRdd, scala.collection.mutable.Set.empty)
    assert(shuffles == 1, s"pack_sequences expected 1 shuffle in lineage, got $shuffles")
  }

  test("quantized table scoring stays inside whole-stage codegen (no UDF boundary)") {
    import graft.index.Ann
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    Ann.buildIndex(emb, "embedding", "vec_id", "planq_ivfpq",
      Ann.BuildParams(engine = "ivfpq", nlist = 8, nprobe = 2, pqM = 8))
    val queries = emb.limit(4)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val df = Ann.searchTable(queries, "qvec", emb, "vec_id", "planq_ivfpq", 5)
    df.collect() // finalize AQE so codegen `*(n)` markers appear
    val p = df.queryExecution.executedPlan.toString
    val scoreLines = p.linesIterator.filter(_.contains("pq_adc_score")).toSeq
    assert(scoreLines.nonEmpty, s"expected pq_adc_score in the plan:\n$p")
    // `*(n)` prefixes mark whole-stage-codegen spans; the scoring project
    // must carry one, or the whole probe-join stage falls back to
    // interpreted row processing (the regression that cost 30s vs 5.6s at
    // 1.5M x 512q)
    assert(scoreLines.exists(_.contains("*(")),
      s"pq_adc_score fell out of codegen:\n${scoreLines.mkString("\n")}\n$p")
  }

  test("quantized range distance stays inside whole-stage codegen") {
    import graft.index.Ann
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    Ann.buildIndexFactory(emb, "embedding", "vec_id", "planq_risq", "IVF4,SQ8",
      Ann.BuildParams(nprobe = 1))
    val q = emb.orderBy("vec_id").limit(1)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val df = Ann.rangeSearch(emb, "vec_id", "planq_risq", q, 16.5f)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val distLines = p.linesIterator.filter(_.contains("quant_range_dist")).toSeq
    assert(distLines.nonEmpty, s"expected quant_range_dist in the plan:\n$p")
    // the scan -> decode-distance -> radius-filter span must be one
    // generated loop, not an interpreted UDF boundary (PqAdcScore lesson)
    assert(distLines.exists(_.contains("*(")),
      s"quant_range_dist fell out of codegen:\n${distLines.mkString("\n")}\n$p")
  }
}
