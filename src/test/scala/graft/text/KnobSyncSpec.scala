package graft.text

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r14 advisory closures: (a) the `lsh_cap_audit` oracle is
 *  GENERATED from TextOps.capDefaults and the query entry fails loudly when
 *  the session runs different knobs (a silent desync previously
 *  hash-mismatched only at verify time); (b) SemDedup's two-level
 *  assignment gate is visible via assignRouteInfo instead of engaging
 *  silently. */
class KnobSyncSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val sf = "/root/testdata/sf0.001"

  test("capEmittedCaseSql derives the oracle CASE from the knobs") {
    assert(TextOps.capEmittedCaseSql(64, 8, 8) ==
      "CASE WHEN n <= 64 THEN n * (n - 1) // 2 ELSE 120 + 16 * (n - 16) END")
    // general form: C(p+a,2) + (p+a)·(n−(p+a)) above the cap
    assert(TextOps.capEmittedCaseSql(32, 4, 4) ==
      "CASE WHEN n <= 32 THEN n * (n - 1) // 2 ELSE 28 + 8 * (n - 8) END")
    intercept[IllegalArgumentException](TextOps.capEmittedCaseSql(8, 8, 8))
  }

  test("lsh_cap_audit oracle SQL embeds the default-knob thresholds") {
    val sql = graft.SparkEntry.oracleSql("lsh_cap_audit")
    val (cap, p, a) = TextOps.capDefaults
    assert(sql.contains(TextOps.capEmittedCaseSql(cap, p, a)))
    assert(sql.contains(s"n > $cap"))
  }

  test("lsh_cap_audit query fails loudly when session knobs differ from the oracle's") {
    spark.conf.set("spark.graft.neardup.bucketCliqueCap", "32")
    try {
      val e = intercept[IllegalArgumentException] {
        graft.SparkEntry.queries("lsh_cap_audit")(spark, sf).collect()
      }
      assert(e.getMessage.contains("spark.graft.neardup"),
        s"error does not name the knob namespace: ${e.getMessage}")
    } finally spark.conf.unset("spark.graft.neardup.bucketCliqueCap")
    // defaults restored: the entry runs
    assert(graft.SparkEntry.queries("lsh_cap_audit")(spark, sf).count() == 1L)
  }

  test("semdedup assignment route is reportable, not silent") {
    assert(SemDedup.assignRouteInfo(512) == ("linear", 0, 0))
    val (route, kc, np) = SemDedup.assignRouteInfo(513)
    assert(route == "two-level" && kc == math.ceil(math.sqrt(513.0)).toInt && np >= 4)
    // forced two-level below the gate; forced linear above it
    assert(SemDedup.assignRouteInfo(100, nprobe = 6)._1 == "two-level")
    assert(SemDedup.assignRouteInfo(100, nprobe = 6)._3 == 6)
    assert(SemDedup.assignRouteInfo(10000, nprobe = -1)._1 == "linear")
  }
}
