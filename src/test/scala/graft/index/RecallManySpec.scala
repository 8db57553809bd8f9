package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins `measureRecallMany` ≡ per-name `measureRecall` bit-parity: the batch
 *  surface shares one exact ground-truth pass across indexes, so its recall
 *  numbers must equal the single-index surface's exactly — both sides score
 *  every comparison with the same codegen distance expression over the same
 *  column values, and any divergence (a changed tiebreak, a float reorder)
 *  must turn this spec red before it can skew a scale artifact. */
class RecallManySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.graft.ann.root", s"/tmp/graft-recallmany-${System.nanoTime()}")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val sf = "/root/testdata/sf0.001"
  lazy val emb: DataFrame = spark.read.parquet(s"$sf/embeddings.parquet")

  private def recallRow(df: DataFrame, name: String): (Double, Double, Long, Long) = {
    val r = df.where(col("name") === name).collect()(0)
    (r.getAs[Double]("recall"), r.getAs[Double]("recall_ids"),
      r.getAs[Long]("sample_n"), r.getAs[Long]("eff_n"))
  }

  test("measureRecallMany == measureRecall per name, mixed engines + metrics") {
    Ann.buildIndex(emb, "embedding", "vec_id", "rm_disk",
      Ann.BuildParams(engine = "diskann", numShards = 2,
        maxDegree = 16, buildComplexity = 32))
    Ann.buildIndex(emb, "embedding", "vec_id", "rm_ivf",
      Ann.BuildParams(engine = "ivfflat", nlist = 8, nprobe = 2))
    Ann.buildIndex(emb, "embedding", "vec_id", "rm_ip",
      Ann.BuildParams(engine = "flat", metric = "ip"))
    Ann.buildIndex(emb, "embedding", "vec_id", "rm_cos",
      Ann.BuildParams(engine = "flat", metric = "cosine"))

    val names = Seq("rm_disk", "rm_ivf", "rm_ip", "rm_cos")
    val many = Ann.measureRecallMany(emb, "embedding", "vec_id", names,
      k = 5, sampleN = 20, searchComplexity = 32).cache()
    assert(many.count() == names.length)
    names.foreach { nm =>
      val single = Ann.measureRecall(emb, "embedding", "vec_id", nm,
        k = 5, sampleN = 20, searchComplexity = 32)
      val (mr, mi, msn, men) = recallRow(many, nm)
      val (sr, si, ssn, sen) = recallRow(single, nm)
      assert(mr == sr, s"$nm recall: many=$mr single=$sr")
      assert(mi == si, s"$nm recall_ids: many=$mi single=$si")
      assert(msn == ssn && men == sen, s"$nm sample/eff counts differ")
    }
    // exact flat engines must be perfect under both surfaces — the absolute
    // anchor, so parity cannot be two-wrongs-equal
    val (ipR, ipI, _, _) = recallRow(many, "rm_ip")
    assert(ipR == 1.0 && ipI == 1.0, "flat/ip must have recall 1.0")
  }
}
