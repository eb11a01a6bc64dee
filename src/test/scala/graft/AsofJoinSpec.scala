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
}
