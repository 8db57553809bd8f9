package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps

object ProfileBm25 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val toks = TextOps.tokens(col("text"))
    val base = docs.select(col("doc_id").cast("long").as("id"), toks.as("toks"))
      .withColumn("dl", size(col("toks")))
    val nDocs = base.count()
    val avgdl = base.agg(avg(col("dl"))).head().getDouble(0)
    println(s"nDocs=$nDocs avgdl=$avgdl")
    for (t <- Seq("spark", "join", "filter")) {
      val df = base.where(array_contains(col("toks"), t)).count()
      println(s"df($t)=$df idf=${math.log((nDocs - df.toDouble + 0.5)/(df.toDouble + 0.5) + 1.0)}")
    }
    // per-doc tf and dl for probe docs
    base.where(col("id").isin(13L, 292L, 2345L, 2171L))
      .select(col("id"), col("dl"),
        size(filter(col("toks"), x => x === "spark")).as("tf_spark"),
        size(filter(col("toks"), x => x === "join")).as("tf_join"),
        size(filter(col("toks"), x => x === "filter")).as("tf_filter"))
      .orderBy("id").collect().foreach(println)

    // the actual score expression as bm25Ranks builds it
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.types.DoubleType
    val terms = Seq("spark", "join", "filter")
    val dfCounts = terms.map(t => t -> base.where(array_contains(col("toks"), t)).count()).toMap
    val score: Column = terms.map { t =>
      val dft = dfCounts(t).toDouble
      val idf = math.log((nDocs - dft + 0.5) / (dft + 0.5) + 1.0)
      val tf = size(filter(col("toks"), x => x === t)).cast(DoubleType)
      (tf * lit(graft.search.Hybrid.K1 + 1)) /
        (tf + lit(graft.search.Hybrid.K1) * (lit(1.0 - graft.search.Hybrid.B) +
          lit(graft.search.Hybrid.B) * col("dl").cast(DoubleType) / lit(avgdl))) *
        lit(idf)
    }.reduce(_ + _)
    println("spark-side scores:")
    base.withColumn("s", score).where(col("id").isin(13L, 292L, 2345L, 2171L))
      .select("id", "s").orderBy("id").collect().foreach(println)
    println("spark-side top5 by (s desc, id):")
    base.withColumn("s", score).orderBy(col("s").desc, col("id")).limit(5)
      .select("id", "s").collect().foreach(println)
    println("spark-side bm25Ranks rows for probe ids:")
    graft.search.Hybrid.bm25Ranks(docs, "text", "doc_id", terms, 100)
      .where(col("id").isin(13L, 292L, 2345L, 2171L)).collect().foreach(println)

    println("bm25Ranks over the documents JOIN embeddings input (as the entry builds it):")
    val emb2 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val joined = docs.join(emb2, docs("doc_id") === emb2("vec_id"))
      .select(docs("doc_id"), docs("text"), emb2("embedding"))
    graft.search.Hybrid.bm25Ranks(joined, "text", "doc_id", terms, 100)
      .where(col("id").isin(13L, 292L, 2345L, 2171L, 3904L)).collect().foreach(println)
    println("full entry output:")
    graft.SparkEntry.queries("hybrid_search")(spark, "/root/testdata/sf0.1")
      .limit(3).collect().foreach(println)
    spark.stop()
  }
}
