package graft.tools
import org.apache.spark.sql.SparkSession
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries("neardup_cos_lsh")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = fn(spark, "/root/testdata/sf0.1").count()
      println(f"run $i: ${(System.nanoTime()-t0)/1e9}%.2f s, rows=$n")
    }
    spark.stop()
  }
}
