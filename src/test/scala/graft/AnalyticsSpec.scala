package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

/** Percentile profiling: ordering invariants and the sketch-vs-exact
  * verdict (the oracle checks the exact values bit-for-bit). */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("rolling trailing-hour aggregate matches a brute-force self-join recomputation") {
    val got = Analytics.rollingUserValue(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        col("value").cast("decimal(18,2)").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDecimal(3)))
    val byUser = evs.groupBy(_._2)
    val expected = evs.map { case (id, uid, us, _) =>
      val frame = byUser(uid).filter(e => e._3 >= us - 3600000000L && e._3 <= us)
      val sum = frame.map(_._4.asInstanceOf[java.math.BigDecimal])
        .reduce(_.add(_)).doubleValue()
      id -> (frame.length.toLong, sum)
    }.toMap
    assert(got.size == expected.size)
    expected.foreach { case (id, (n, s)) =>
      assert(got(id)._1 == n, s"event $id frame count")
      assert(math.abs(got(id)._2 - s) < 1e-6, s"event $id frame sum")
    }
  }

  test("semi join: one row per qualifying customer, plan uses LeftSemi") {
    val out = Analytics.customersWithOpenOrders(spark, sf)
    assert(out.count() == out.select("c_custkey").distinct().count())
    assert(out.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
  }

  test("pivot: one row per region, pivoted sums re-add to the region total") {
    val p = Analytics.revenuePivot(spark, sf)
    val regions = Tables.region(spark, sf).count()
    assert(p.count() == regions)
    // F+O+P re-aggregates to the plain region revenue
    val total = p.select(
      sum(coalesce(col("rev_f"), lit(0.0)) + coalesce(col("rev_o"), lit(0.0))
        + coalesce(col("rev_p"), lit(0.0))).as("t")).head().getDouble(0)
    val want = Analytics.revenueByRegion(spark, sf)
      .agg(sum("revenue")).head().getDouble(0)
    assert(math.abs(total - want) < 1e-4)
  }

  test("value percentiles: one row per type, monotone p50<=p90<=p99, approx inside envelope") {
    val p = Analytics.valuePercentiles(spark, sf)
    val nTypes = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(p.count() == nTypes)
    assert(p.filter(col("p50") > col("p90") || col("p90") > col("p99")).isEmpty)
    assert(p.filter(!col("approx_ok")).isEmpty)
  }

  test("user retention: day-0 cells are the cohort sizes and no cell exceeds them") {
    val r = Analytics.userRetention(spark, sf)
    assert(r.filter(col("day_k") < 0).isEmpty)
    // every user is active on their own cohort day, so day-0 cells
    // partition the user base exactly
    val day0 = r.filter(col("day_k") === 0)
      .select(col("cohort"), col("n_users").as("size0"))
    val totalUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(day0.agg(sum("size0")).head().getLong(0) == totalUsers)
    // a later cell can never retain more users than its cohort holds
    assert(day0.join(r, "cohort").filter(col("n_users") > col("size0")).isEmpty)
  }
}
