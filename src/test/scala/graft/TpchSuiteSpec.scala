package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TpchSuite

/** Plan-shape and invariant checks for the TPC-H-shaped suite. Values are
  * oracle-checked by the driver; these tests pin the SCALE properties —
  * pushdown, join strategy, limit fusion — that the numbers alone don't. */
class TpchSuiteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def finalPlan(df: org.apache.spark.sql.DataFrame) = {
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  test("forecast revenue: date/discount/quantity predicates all push to the parquet scan") {
    val df = TpchSuite.forecastRevenue(spark, sf)
    // pre-execution plan, AQE wrapper unwrapped: the scan node is still
    // visible (post-materialization it hides inside query stages)
    val inner = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = inner.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate") &&
      pushed.contains("LessThan(l_quantity") &&
      pushed.contains("GreaterThanOrEqual(l_discount"),
      s"scan must carry all residuals, got: $pushed")
    // and the scan reads only the four referenced columns
    val readSchema = scans.head.metadata.getOrElse("ReadSchema", "")
    assert(!readSchema.contains("l_orderkey"), s"pruning failed: $readSchema")
  }

  test("order-priority EXISTS compiles to a left-semi join, not a per-row probe") {
    val plan = finalPlan(TpchSuite.orderPriorityExists(spark, sf)).toString
    assert(plan.contains("LeftSemi"), plan.take(2000))
  }

  test("shipping priority: top-10 fuses into TakeOrderedAndProject (no global sort)") {
    val df = TpchSuite.shippingPriority(spark, sf)
    val plan = finalPlan(df).toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(df.count() <= 10)
  }

  test("local supplier volume: nation joins via broadcast; one row per active nation") {
    val df = TpchSuite.localSupplierVolume(spark, sf)
    val plan = finalPlan(df).toString
    assert(plan.contains("BroadcastHashJoin"), "25-row nation must broadcast")
    val n = df.count()
    assert(n > 0 && n <= 25)
  }

  test("dormant customers: no-recent-orders is a left-anti join") {
    val plan = finalPlan(TpchSuite.dormantCustomers(spark, sf)).toString
    assert(plan.contains("LeftAnti"), plan.take(2000))
  }

  test("market share: per-year shares sum to 1") {
    val sums = TpchSuite.marketShare(spark, sf)
      .groupBy("o_year").agg(sum("mkt_share").as("s"))
      .collect().map(_.getDouble(1))
    assert(sums.nonEmpty)
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-9, s"share sum $s"))
  }

  test("customer order distribution: histogram masses reconcile with both base tables") {
    val rows = TpchSuite.custOrderDistribution(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nCust = Tables.customer(spark, sf).count()
    val nOrd = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "1-URGENT").count()
    assert(rows.map(_._2).sum == nCust, "every customer lands in exactly one bucket")
    assert(rows.map { case (c, d) => c * d }.sum == nOrd,
      "bucket-weighted counts recover the filtered order count")
  }

  test("large-volume orders: every returned order's quantity sum clears the threshold") {
    val got = TpchSuite.largeVolumeCustomers(spark, sf).collect()
    assert(got.forall(_.getAs[Double]("sum_qty") > 250))
  }

  test("late priority: high+low partition the late lines; lateness rule recounted") {
    val rows = TpchSuite.latePriority(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")
        == r.getAs[Long]("n_late"), s"flag ${r.getString(0)}: counts must partition")
    }
    val expected = Tables.lineitem(spark, sf).join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
      .count()
    assert(rows.map(_.getAs[Long]("n_late")).sum == expected)
  }

  test("top supplier: returned supplier(s) hold the exact per-supplier revenue max") {
    val got = TpchSuite.topSupplier(spark, sf).collect()
    assert(got.nonEmpty)
    val rev = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
        * (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
        .as("r"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val mx = rev.values.max
    val winners = rev.filter(_._2 == mx).keys.toSeq.sorted
    assert(got.map(_.getLong(0)).toSeq == winners,
      s"got ${got.map(_.getLong(0)).toSeq} expected $winners")
    got.foreach(r => assert(math.abs(r.getAs[Double]("total_revenue") - mx.doubleValue) < 1e-6))
  }

  test("waiting suppliers: window rewrite equals the correlated-exists brute force") {
    val got = TpchSuite.waitingSuppliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("numwait")))
    // brute force from per-(order, supplier) max shipdates on the driver
    val sm = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(col("l_shipdate")).as("smax")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    val byOrder = sm.groupBy(_._1)
    val blame = sm.filter { case (o, s0, t) =>
      val others = byOrder(o).filter(_._2 != s0)
      others.nonEmpty && others.forall(_._3 < t)
    }.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expect = blame.toSeq.sortBy { case (s0, n) => (-n, s0) }.take(10)
    assert(got.toSeq == expect, s"got ${got.toSeq} expected $expect")
  }
}
