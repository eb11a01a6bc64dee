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
}
