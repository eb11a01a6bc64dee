package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see SURVEY.md §7 + TESTDATA.md.
  *
  * Every implemented operator from SURVEY.md §2 registers a named query
  * here; each SQL-expressible one carries a DuckDB oracle in [[oracleSql]]
  * with IDENTICAL column names and deterministic values (exact decimal
  * arithmetic surfaced as double, total-order ORDER BY).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * The reference's one real query shape: DISTINCT over two chained LEFT
    * equi-joins (`dag-knlp.py:65-80`) on the testdata analog. */
  def entry(spark: SparkSession): DataFrame =
    Relational.dimensionTable(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — reference parity (SURVEY §2.4/§2.5/§2.3) —
    "q_dim_join_distinct" -> ((s, d) => Relational.dimensionTable(s, d)),
    "q_count"             -> ((s, d) => Relational.rowCount(s, d)),
    "q_count_check"       -> ((s, d) => Relational.countCheck(s, d)),
    "q_top1_by_length"    -> ((s, d) => Relational.top1ByLength(s, d)),
    "q_length_check"      -> ((s, d) => Relational.lengthCheck(s, d)),
    "q_distinct"          -> ((s, d) => Relational.distinctPairs(s, d)),
    "q_limit"             -> ((s, d) => Relational.limitRows(s, d)),
    "q_split_parse"       -> ((s, d) => Relational.splitParse(s, d)),
    // — headline analytics [EXT] —
    "q_pricing_summary"   -> ((s, d) => Analytics.pricingSummary(s, d)),
    "q_revenue_by_segment"-> ((s, d) => Analytics.revenueBySegment(s, d)),
    "q_revenue_by_region" -> ((s, d) => Analytics.revenueByRegion(s, d)),
    "q_lineitem_order_join" -> ((s, d) => Analytics.lineitemOrderJoin(s, d)),
    "q_top_order_per_customer" -> ((s, d) => Analytics.topOrderPerCustomer(s, d)),
    "q_hourly_events"     -> ((s, d) => Analytics.hourlyEvents(s, d)),
    "q_exact_distinct_count" -> ((s, d) => Analytics.exactDistinctCount(s, d)),
    "q_approx_distinct"   -> ((s, d) => Analytics.approxDistinct(s, d)),
  )

  /** DuckDB-runnable ANSI SQL oracles, same parquet tables, same column
    * names. Keys absent here get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q_dim_join_distinct" ->
      """SELECT DISTINCT o_orderkey, c_name, n_name, o_orderstatus
         FROM orders
         LEFT JOIN customer ON o_custkey = c_custkey
         LEFT JOIN nation ON c_nationkey = n_nationkey
         ORDER BY o_orderkey, c_name, n_name, o_orderstatus""",
    "q_count" ->
      "SELECT count(*) AS cnt FROM lineitem",
    "q_count_check" ->
      "SELECT count(*) AS cnt, count(*) >= 1 AS ok FROM customer",
    "q_top1_by_length" ->
      """SELECT c_mktsegment, length(c_mktsegment) AS len FROM customer
         ORDER BY len DESC, c_mktsegment ASC LIMIT 1""",
    "q_length_check" ->
      """SELECT max(length(o_orderpriority)) AS max_len,
                max(length(o_orderpriority)) <= 15 AS ok
         FROM orders""",
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "q_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_orderkey LIMIT 100""",
    "q_split_parse" ->
      """SELECT p_partkey,
                string_split(p_type, ' ')[1] AS head_field,
                array_to_string(string_split(p_type, ' ')[2:], ' ') AS tail_field,
                len(string_split(p_type, ' ')) AS arity
         FROM part ORDER BY p_partkey""",
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
                count(*) AS count_order
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_revenue_by_segment" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_revenue_by_region" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q_lineitem_order_join" ->
      """SELECT o_orderstatus, count(*) AS n_lines,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_top_order_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) t
         WHERE rn = 1 ORDER BY o_custkey""",
    "q_hourly_events" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
                count(*) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""",
    "q_exact_distinct_count" ->
      "SELECT count(DISTINCT l_partkey) AS n_parts FROM lineitem",
  )
}
