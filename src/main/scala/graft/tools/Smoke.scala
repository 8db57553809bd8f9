package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's smoke check: run SparkEntry.entry, expect rows>0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    df.show(5, truncate = 40)
    println(s"ENTRY_ROWS=${df.count()}")
    spark.stop()
  }
}
