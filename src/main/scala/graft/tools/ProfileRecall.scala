package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{toFloatVec, floatVec, array_distance_sq}
import graft.index.Ann

/** A/B: recall@10 of the diskann engine with and without pilot-seeded
 *  insert order, against exact brute force, over held-out query rows. */
object ProfileRecall {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.ann.root", s"/tmp/graft-profrecall-${System.nanoTime()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.orderBy("vec_id").limit(50).collect()
      .map(r => r.getSeq[Float](r.fieldIndex("embedding")).toArray)

    def truth(q: Array[Float]): Set[Long] =
      emb.select(col("vec_id"),
          array_distance_sq(toFloatVec(col("embedding")), floatVec(q.toSeq)).as("d"))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
    val truths = queries.map(truth)

    // one shard + narrow beams: recall must come from edge quality, not
    // shard fan-out or wide search
    // OPQ vs plain PQ at equal byte budget (recall@10 via full ADC scan)
    for ((label, factory) <- Seq("pq" -> "PQ8", "opq" -> "OPQ8,PQ8",
        "pq-rflat" -> "PQ8,RFlat", "opq-rflat" -> "OPQ8,PQ8,RFlat")) {
      Ann.buildIndexFactory(emb, "embedding", "vec_id", s"rq_$label", factory)
      val hits = queries.map(q =>
        Ann.collectHits(spark, s"rq_$label", q, 10, 0, 1).map(_._1).toSet)
      val recall = queries.indices.map(i => hits(i).intersect(truths(i)).size).sum
      println(f"$label%10s recall@10 = ${recall / (queries.length * 10.0)}%.4f")
    }

    for (pilot <- Seq(true, false)) {
      spark.conf.set("spark.graft.ann.pilotSeed", pilot.toString)
      Ann.buildIndex(emb, "embedding", "vec_id", s"r_$pilot",
        Ann.BuildParams(engine = "diskann", numShards = 1, maxDegree = 16,
          buildComplexity = 32))
      for (sc <- Seq(10, 12, 16, 24)) {
        val hits = queries.map(q =>
          Ann.collectHits(spark, s"r_$pilot", q, 10, sc, 1).map(_._1).toSet)
        val recall = queries.indices.map(i => hits(i).intersect(truths(i)).size).sum
        println(f"pilot=$pilot%5s sc=$sc%3d recall@10 = ${recall / (queries.length * 10.0)}%.4f")
      }
    }
    spark.stop()
  }
}
