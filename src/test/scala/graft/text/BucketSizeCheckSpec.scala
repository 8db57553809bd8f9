package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Guards the bucket-clique cap's oracle contract: at the driver's
  * correctness scales the LSH band buckets must stay at or under the
  * default cap, so the capped code path is bit-identical to the uncapped
  * clique join the DuckDB oracle SQL models. If the testdata generator ever
  * ships a corpus with a >cap duplicate cluster, this fails loudly instead
  * of the oracle hash silently diverging. */
class BucketSizeCheckSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"$sf: max LSH band bucket <= default clique cap (64)") {
      val dir = s"/root/testdata/$sf"
      assume(new java.io.File(s"$dir/documents.parquet").exists())
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val bt = TextOps.bandTable(TextOps.signatures(docs, "text", "doc_id"))
      val maxBucket = bt.groupBy("band_idx", "band_hash").count()
        .agg(max("count")).head().getLong(0)
      assert(maxBucket <= 64,
        s"$sf max band bucket $maxBucket exceeds the clique cap: the capped " +
          "candidate pairs would diverge from the uncapped oracle SQL")
    }
  }
}
