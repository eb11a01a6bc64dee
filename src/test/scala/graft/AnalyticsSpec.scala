package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

/** Percentile profiling: ordering invariants and the sketch-vs-exact
  * verdict (the oracle checks the exact values bit-for-bit). */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("value percentiles: one row per type, monotone p50<=p90<=p99, approx inside envelope") {
    val p = Analytics.valuePercentiles(spark, sf)
    val nTypes = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(p.count() == nTypes)
    assert(p.filter(col("p50") > col("p90") || col("p90") > col("p99")).isEmpty)
    assert(p.filter(!col("approx_ok")).isEmpty)
  }
}
