package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** X7 — as-of (time-range) join: enrich each event with the most recent
  * order placed by the same user at or before the event timestamp — the
  * one join family absent from the reference (SURVEY.md §2.7).
  *
  * Implementation is the scalable MERGE shape, not a join-then-prune:
  * union the two sides as tagged rows, sort within each user partition by
  * time, and carry the last-seen order key forward with a running
  * `last(..., ignoreNulls)` window. Cost is one shuffle on user_id + a
  * per-partition sort — each row is touched once, versus the equi-join +
  * range-filter formulation that first materializes |events| × |orders per
  * user| rows. At 100 TB both sides shuffle-partition by user and the
  * window state is O(1) per row.
  *
  * Tie semantics (made explicit so the oracle can mirror them): an order
  * exactly at the event timestamp counts (orders sort before events at
  * equal t); among same-timestamp orders the highest o_orderkey wins.
  */
object AsofJoin {

  def eventOrderAsof(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      col("user_id"), col("ts").as("t"),
      lit(null).cast("long").as("o_orderkey"),
      col("event_id"), lit(1).as("is_event"))
    val o = Tables.orders(spark, dir).select(
      col("o_custkey").as("user_id"), col("o_orderdate").as("t"),
      col("o_orderkey"),
      lit(null).cast("long").as("event_id"), lit(0).as("is_event"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("t").asc, col("is_event").asc, col("o_orderkey").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.unionByName(e)
      .withColumn("last_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(col("event_id"), col("user_id"), col("last_orderkey"))
  }
}
