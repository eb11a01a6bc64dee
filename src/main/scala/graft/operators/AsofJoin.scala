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

  /** The versioned dimension for [[temporalJoin]]: each user's purchase
    * events become SCD-2-style validity intervals — version k runs from
    * purchase k's timestamp to purchase k+1's (the open interval carries
    * the 9999-12-31 high date). Ties at one timestamp break by event_id,
    * so both engines build identical intervals. Intervals are disjoint
    * and cover [first purchase, ∞) per user by construction. */
  private[graft] def temporalDim(spark: SparkSession, dir: String): DataFrame = {
    val wv = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("version", row_number().over(wv))
      .withColumn("valid_to",
        coalesce(lead(col("ts"), 1).over(wv),
          lit("9999-12-31 00:00:00").cast("timestamp")))
      .select(col("user_id").as("d_user"), col("version"),
        col("ts").as("valid_from"), col("valid_to"))
  }

  /** The fact-side join + aggregation of [[temporalJoin]], shared with
    * the streaming twin (`StreamingOps.streamTemporalJoinEndToEnd`) so
    * batch and stream cannot drift: LEFT join on user equality + validity
    * range, pre-first-version facts land in version 0, per-version event
    * count and exact-decimal value mass. */
  private[graft] def temporalJoinAgg(fact: DataFrame, dim: DataFrame): DataFrame =
    fact.join(dim,
        fact("user_id") === dim("d_user")
          && fact("ts") >= dim("valid_from") && fact("ts") < dim("valid_to"),
        "left")
      .groupBy(col("user_id"), coalesce(col("version"), lit(0)).as("version"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))

  /** Temporal (validity-interval) join — the point-in-time lookup every
    * SCD-2 warehouse dimension exists to serve, and the batch form of
    * Flink's temporal table join: each non-purchase event is enriched
    * with the dimension version VALID AT its event time (user equality +
    * `valid_from <= ts < valid_to`), not the current one. The versioned
    * dimension derives from the purchase timeline ([[temporalDim]]);
    * events before a user's first purchase keep LEFT-join semantics and
    * aggregate under version 0. Differs from [[eventOrderAsof]] in
    * contract, not just framing: the as-of join answers "most recent
    * order ≤ t" with a running merge; the temporal join answers "which
    * VERSION INTERVAL contains t" against a materialized SCD-2 dimension
    * — the shape that also serves the streaming twin, where the merge
    * formulation is unavailable (a stream cannot be union-sorted with a
    * static dimension).
    *
    * Scale shape: equi-join on user_id with the range condition as a
    * join residual — both sides hash-partition by user, and the per-user
    * fanout before the residual is bounded by that user's VERSION COUNT
    * (SCD-2 dims hold few versions per key), so matched output is
    * exactly |fact| (disjoint intervals, each event in ≤ 1). For an
    * unbounded-version dim the as-of merge shape above is the fallback.
    * The aggregation reuses the join's user_id partitioning — AQE plans
    * one shuffle for both. */
  def temporalJoin(spark: SparkSession, dir: String): DataFrame = {
    val fact = Tables.events(spark, dir)
      .filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    temporalJoinAgg(fact, temporalDim(spark, dir))
  }

  /** DuckDB oracle for [[temporalJoin]] — same interval construction,
    * tie-break, LEFT semantics, version-0 arm, and exact decimal sum. */
  val temporalJoinOracleSql: String =
    """WITH dim AS (
         SELECT user_id, ts AS valid_from,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
                coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                         TIMESTAMP '9999-12-31') AS valid_to
         FROM events WHERE event_type = 'purchase'),
       f AS (SELECT user_id, ts, value FROM events WHERE event_type <> 'purchase')
       SELECT f.user_id, coalesce(d.version, 0) AS version, count(*) AS n_events,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
       FROM f LEFT JOIN dim d ON f.user_id = d.user_id
            AND f.ts >= d.valid_from AND f.ts < d.valid_to
       GROUP BY f.user_id, coalesce(d.version, 0)
       ORDER BY f.user_id, version"""
}
