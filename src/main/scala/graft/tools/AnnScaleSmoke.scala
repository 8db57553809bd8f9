package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.{Ann, IndexCatalog, ShardCache}

/**
 * ANN serving at REAL index size — the round-8 scale proof. Builds diskann
 * and ivfflat indexes over a ~1.5M-vector corpus at a shard size that
 * exceeds the ShardCache mmap threshold, so graph serving takes the
 * disk-resident `DiskannMmapIndex` route (the reference's whole reason to
 * exist: rust_lib/src/disk_provider.rs:182-279 serves shards that do not
 * fit heap) — then measures serve latency for every search surface and
 * MEASURED recall@10 vs exact brute force over the full corpus.
 *
 * Vectors are deterministic hash jitter (xxhash64 over (vec_id, dim) —
 * uniform in [0,1)^64), generated in parallel by Spark and persisted once:
 * no driver materialization, reproducible across runs.
 *
 * Emits SCALE_ANN_r{N}.json: build + serve seconds, max shard bytes vs the
 * mmap threshold (proving the route engaged), recall, task skew. Pass/fail
 * bars from VERDICT r7 item 1: recall >= 0.9, no OOM, skew < 4x.
 */
object AnnScaleSmoke {

  private val taskTimes = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
  private class SkewListener extends SparkListener {
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      if (te.taskInfo != null && te.taskInfo.successful)
        taskTimes.add((te.stageId, te.taskInfo.duration))
  }
  private def worstSkew(): Double = {
    import scala.jdk.CollectionConverters._
    val ratios = taskTimes.asScala.toSeq.groupBy(_._1).flatMap { case (_, ts) =>
      val ds = ts.map(_._2.toDouble).sorted
      if (ds.length < 8) None
      else { val med = ds(ds.length / 2); if (med < 200.0) None else Some(ds.last / med) }
    }
    if (ratios.isEmpty) 1.0 else ratios.max
  }

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("SCALE_ANN_r08.json")
    val nVecs = sys.env.getOrElse("SPARK_GRAFT_ANN_VECS", "1500000").toLong
    val dim = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val workDir = s"target/annscale$nVecs"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.graft.ann.root", s"$workDir/indexes")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SkewListener)
    // the smoke must take the DISTRIBUTED serving routes, not driver-local
    // fast paths sized for interactive small indexes
    spark.conf.set("spark.graft.ann.localExactMaxBytes", "0")

    // ---- corpus: deterministic, generated in parallel, persisted once ----
    val path = s"$workDir/embeddings.parquet"
    if (!new java.io.File(path).exists()) {
      spark.range(nVecs).toDF("vec_id")
        .select(col("vec_id"),
          transform(sequence(lit(0), lit(dim - 1)),
            d => (pmod(xxhash64(col("vec_id") * lit(dim) + d), lit(100000L))
              .cast("double") / lit(100000.0)).cast("float")).as("embedding"))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(path)
    }
    val emb = spark.read.parquet(path)
    val n = emb.count()
    System.err.println(s"[annscale] corpus: $n vectors x $dim dims")

    val ops = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Any]]
    def run(name: String)(body: => Long): Unit = {
      taskTimes.clear()
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val skew = worstSkew()
      ops(name) = Map("sec" -> sec, "rows" -> rows, "worst_task_skew" -> skew)
      System.err.println(f"[annscale] $name%-24s $sec%8.2fs rows=$rows skew=$skew%.2f")
    }

    // shard count chosen so ONE SHARD EXCEEDS the mmap threshold: the build
    // must produce files ShardCache will serve via DiskannMmapIndex
    // 8 shards: each ~85 MB (past the 64 MB mmap threshold), and the build
    // parallelizes across tasks. Degree/complexity sized for uniform-random
    // 64-d — the HARDEST neighborhood structure a graph index faces (real
    // embeddings cluster; this corpus has no manifold to exploit) — so the
    // recall bar is met on the adversarial case, not a friendly one.
    val shards = 8
    // SPARK_GRAFT_ANN_REUSE=1: dev-iteration switch — reuse indexes already
    // on disk from a prior run (serve ops only; build timings not recorded)
    val reuse = sys.env.get("SPARK_GRAFT_ANN_REUSE").contains("1") &&
      IndexCatalog.list(Ann.root(spark)).exists(_.name == "as_disk")
    if (!reuse) run("diskann_build") {
      Ann.buildIndex(emb, "embedding", "vec_id", "as_disk",
        Ann.BuildParams(engine = "diskann", numShards = shards,
          maxDegree = 48, buildComplexity = 96))
      n
    }
    val shardBytes = IndexCatalog.load(Ann.root(spark), "as_disk")
      .shards.map(s => new java.io.File(s.file).length()).max
    val mmapEngaged = shardBytes >= ShardCache.mmapThreshold
    System.err.println(s"[annscale] max shard $shardBytes bytes, " +
      s"mmap threshold ${ShardCache.mmapThreshold} -> mmap=$mmapEngaged")

    if (!reuse) run("ivfflat_build") {
      Ann.buildIndex(emb, "embedding", "vec_id", "as_ivf",
        Ann.BuildParams(engine = "ivfflat", nlist = 256, nprobe = 8))
      n
    }

    // ---- serve: every search surface against the mmap-resident shards ----
    val qRows = emb.where(col("vec_id") % (n / 512) === 0L).limit(512)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    qRows.write.mode("overwrite").parquet(s"$workDir/queries.parquet")
    val queries = spark.read.parquet(s"$workDir/queries.parquet")
    val q0 = queries.orderBy("qid").limit(1).collect()(0)
      .getSeq[Float](1).toArray

    run("search_single") {
      Ann.search(emb, "vec_id", "as_disk", q0, 10, searchComplexity = 256).count()
    }
    run("search_table_512q") {
      Ann.searchTable(queries, "qvec", emb, "vec_id", "as_disk", 10,
        searchComplexity = 256).count()
    }
    run("search_batch_512q") {
      val qs = queries.orderBy("qid").collect().map(_.getSeq[Float](1).toArray).toSeq
      Ann.searchBatch(emb, "vec_id", "as_disk", qs, 10,
        searchComplexity = 256).count()
    }
    run("ivf_search_table_512q") {
      Ann.searchTable(queries, "qvec", emb, "vec_id", "as_ivf", 10).count()
    }

    // ---- measured recall@10 vs exact brute force over the full corpus ----
    var recall = 0.0
    run("recall_at10_200q") {
      val r = Ann.measureRecall(emb, "embedding", "vec_id", "as_disk",
        k = 10, sampleN = 200, searchComplexity = 256).collect()(0)
      recall = r.getAs[Double]("recall")
      r.getAs[Long]("eff_n")
    }
    System.err.println(f"[annscale] recall@10 = $recall%.4f (bar 0.9)")

    val total = ops.values.map(_("sec").asInstanceOf[Double]).sum
    val worst = ops.values.map(_("worst_task_skew").asInstanceOf[Double]).max
    val opsJson = ops.map { case (k, v) =>
      s""""$k":{"sec":${v("sec")},"rows":${v("rows")},""" +
        s""""worst_task_skew":${v("worst_task_skew")}}"""
    }.mkString("{", ",", "}")
    val json = s"""{"metric":"ann_scale_total","value":$total,"unit":"sec",""" +
      s""""ops":$opsJson,"vectors":$n,"dim":$dim,"shards":$shards,""" +
      s""""max_shard_bytes":$shardBytes,"mmap_threshold":${ShardCache.mmapThreshold},""" +
      s""""mmap_engaged":$mmapEngaged,"recall_at10":$recall,""" +
      s""""worst_task_skew":$worst}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson), json.getBytes("UTF-8"))
    spark.stop()
  }
}
