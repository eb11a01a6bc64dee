package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, Bucketing}

/** The bucketed co-located join must (a) agree with the shuffled join and
  * (b) actually eliminate the join-side Exchanges — only the final
  * aggregation may shuffle. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("bucketed join equals the plain join result") {
    val b = Bucketing.bucketedLineitemOrderJoin(spark, sf)
    val p = Analytics.lineitemOrderJoin(spark, sf)
    assert(b.exceptAll(p).isEmpty && p.exceptAll(b).isEmpty)
  }

  test("join inputs read co-located buckets: no Exchange below the join") {
    val df = Bucketing.bucketedLineitemOrderJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // one Exchange for the groupBy; none feeding the join
    val exchanges = "(?i)\\bExchange\\b".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected at most the aggregation Exchange, plan:\n$plan")
  }

  test("partitioned layout: the scan prunes to ONE partition at planning time") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val out = Bucketing.partitionPrunedEvents(spark, sf, keep = "click")
    // AQE hides the physical tree behind AdaptiveSparkPlanExec — unwrap it
    val plan = out.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec over the partitioned layout")
    val scan = scans.head
    // the event_type predicate must be a PARTITION filter (directory-level
    // pruning), not a per-row data filter
    assert(scan.partitionFilters.exists(_.toString.contains("event_type")),
      s"event_type must prune partitions, got: ${scan.partitionFilters}")
    assert(scan.relation.partitionSchema.fieldNames.contains("event_type"))
    assert(!scan.dataFilters.exists(_.toString.contains("event_type")),
      s"event_type must not survive as a data filter: ${scan.dataFilters}")
    // and the directory listing actually collapsed to the one matching value
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 selected partition, got ${scan.selectedPartitions.partitionCount}")
    // result equality with the unpartitioned source
    val direct = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_events"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("value").cast("decimal(18,2)"))
          .cast("double").as("total_value"))
    assert(out.exceptAll(direct).isEmpty && direct.exceptAll(out).isEmpty)
  }

  test("z-order: interleave is invertible and z-sorted buckets cluster both dims") {
    val z = Bucketing.zorderKey(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // invertibility: de-interleaving the Morton key recovers both dims
    z.foreach { case (ub, hb, zv) =>
      var u = 0L; var h = 0L
      for (i <- 0 until 10) {
        u |= ((zv >> (2 * i)) & 1) << i
        h |= ((zv >> (2 * i + 1)) & 1) << i
      }
      assert(u == ub && h == hb, s"zval $zv should invert to ($ub, $hb)")
    }
    // the layout claim: cutting the corpus into 32 contiguous "files" in
    // zval order bounds the USER span of each file, where a time-sorted
    // layout leaves it near the full user range (so min/max pruning on
    // user_id does nothing there). sf0.001 has only 15 distinct users —
    // every 31-row file saturates the span in ANY layout — so the
    // clustering half runs on sf0.01's 150-user corpus.
    val z01 = Bucketing.zorderKey(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    def meanUserSpan(sorted: Array[(Long, Long, Long)]) = {
      val per = math.max(1, sorted.length / 32)
      val spans = sorted.grouped(per).map(g => (g.map(_._1).max - g.map(_._1).min).toDouble)
      val arr = spans.toArray
      arr.sum / arr.length
    }
    val byZ = meanUserSpan(z01.sortBy(_._3))
    val byTime = meanUserSpan(z01.sortBy(_._2))
    assert(byZ < byTime * 0.8,
      s"z-layout mean user span $byZ should be well under time-layout $byTime")
  }
}
