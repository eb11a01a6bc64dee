package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

/** X7 as-of join: the union+running-window implementation must agree with
  * the naive join-then-rank formulation (which is only viable at test
  * scale — that's the point of the merge-shaped implementation). */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("merge-asof equals naive join+rank on every event") {
    val got = AsofJoin.eventOrderAsof(spark, sf)
    val e = Tables.events(spark, sf).select("event_id", "user_id", "ts")
    val o = Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_orderdate")
    val naive = e.join(o, e("user_id") === o("o_custkey") && o("o_orderdate") <= e("ts"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_id")
          .orderBy(desc_nulls_last("o_orderdate"), desc_nulls_last("o_orderkey"))))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("o_orderkey").as("last_orderkey"))
    assert(got.count() == e.count())
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("temporal join: every fact event lands in exactly one version; version-0 arm correct") {
    val got = AsofJoin.temporalJoin(spark, sf).collect()
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_type", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getString(2), r.getLong(3)))
    val facts = ev.filter(_._3 != "purchase")
    // total preservation: disjoint intervals + LEFT join = |fact| rows out
    assert(got.map(_.getAs[Long]("n_events")).sum == facts.length)
    // brute-force version assignment per fact event
    val purchasesByUser: Map[Long, Seq[Long]] =
      ev.filter(_._3 == "purchase").groupBy(_._1)
        .view.mapValues(_.sortBy(p => (p._2, p._4)).map(_._2).toSeq).toMap
    val expect = facts.map { case (u, t, _, _) =>
      val vs = purchasesByUser.getOrElse(u, Seq.empty[Long])
      (u, vs.lastIndexWhere(_ <= t) + 1) // 0 = before first purchase
    }.groupBy(x => x).view.mapValues(_.length.toLong).toMap
    val gotMap = got.map(r => (r.getLong(0), r.getInt(1)) -> r.getAs[Long]("n_events")).toMap
    assert(gotMap == expect, s"version histogram drifted: ${gotMap.toSeq.sorted.take(5)}...")
  }
}
