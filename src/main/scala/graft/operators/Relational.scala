package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Reference-parity relational operators (SURVEY.md §2.4/§2.5), expressed
  * over the driver testdata analogs per FIXTURES.md §B:
  * the dimension-query shape `korean ⟕ korean_japanese ⟕ korean_hanjya`
  * (reference `dag-knlp.py:65-80`) runs as `orders ⟕ customer ⟕ nation`.
  *
  * Scale notes (100 TB posture):
  *  - The two left joins key on a fact-table FK against small dimensions —
  *    Catalyst broadcasts them (AQE re-checks at runtime), so the only
  *    shuffle in the dimension query is the DISTINCT's hash aggregate.
  *  - Top-1-by-length (R7) uses orderBy+limit which Spark plans as
  *    `TakeOrderedAndProject` (per-partition top-k, no global sort).
  *  - Scalar checks (R5/D1/D2) are full or partial aggregates — map-side
  *    partial agg means one scalar per partition crosses the shuffle.
  */
object Relational {

  /** R1+R2+R3+R4 — SELECT DISTINCT over two chained LEFT equi-joins
    * (`dag-knlp.py:65-80`). One shuffle (the distinct's hash aggregate).
    *
    * Join strategy is left to Catalyst+AQE: `customer` is dimension-sized
    * here but fact-sized at 100× — a forced broadcast hint would OOM
    * executors at scale, while AQE picks broadcast when the runtime size
    * fits `autoBroadcastJoinThreshold` and sort-merge/shuffled-hash when it
    * doesn't. `nation` (25 rows, bounded by geography) keeps the hint.
    * No ORDER BY: determinism sorting lives in the Verify dump, not the
    * operator (a global sort of an unbounded result is a scale-killer).
    */
  def dimensionTable(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderstatus")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_name", "c_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    o.join(c, o("o_custkey") === c("c_custkey"), "left")
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .select(col("o_orderkey"), col("c_name"), col("n_name"), col("o_orderstatus"))
      .distinct()
  }

  /** O4/K3 — the same dimension query through the SQL surface: temp views
    * + `spark.sql`, mirroring the reference's PostgresOperator SQL task
    * (`dag-knlp.py:65-80,378-383`). Semantically byte-identical to
    * [[dimensionTable]]; Catalyst produces the same plan from either API. */
  def dimensionTableSql(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.nation(spark, dir).createOrReplaceTempView("nation")
    spark.sql(
      """SELECT DISTINCT o_orderkey, c_name, n_name, o_orderstatus
        |FROM orders
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |""".stripMargin)
  }

  /** R5 / D1 — COUNT(*) (`dag-knlp.py:252`, check at `:243-258`). */
  def rowCount(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(count(lit(1)).as("cnt"))

  /** Correlated subqueries through the SQL surface — the decorrelation
    * machinery a query engine must own: a correlated SCALAR subquery
    * (per-order lineitem count) and a correlated EXISTS, in one query.
    * Catalyst rewrites both into joins (scalar → aggregate + left outer,
    * EXISTS → left semi) — no per-row re-execution, which is the whole
    * point at scale. Integer-only comparisons keep it float-free. */
  def correlatedSubqueries(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT o_orderkey, o_custkey,
        |       (SELECT count(*) FROM lineitem l
        |        WHERE l.l_orderkey = o.o_orderkey) AS n_lines
        |FROM orders o
        |WHERE (SELECT count(*) FROM lineitem l
        |       WHERE l.l_orderkey = o.o_orderkey) >= 5
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_returnflag = 'R')
        |""".stripMargin)
  }

  val correlatedSubqueriesOracleSql: String =
    """SELECT o_orderkey, o_custkey,
              (SELECT count(*) FROM lineitem l
               WHERE l.l_orderkey = o.o_orderkey) AS n_lines
       FROM orders o
       WHERE (SELECT count(*) FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey) >= 5
         AND EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey
                       AND l.l_returnflag = 'R')
       ORDER BY o_orderkey"""

  /** ANTI join — the NOT-EXISTS workhorse (the semi join's complement;
    * decontamination and delete-propagation use the same physical shape):
    * customers with NO order above `threshold`, grouped by segment. The
    * filter is pushed below the join, so the anti side carries only the
    * few high-value order KEYS — at 100 TB the build side is the
    * selective slice, never the raw fact table, and Catalyst plans a
    * broadcast/shuffled-hash LeftAnti against it. Integer keys + DECIMAL
    * money keep the oracle exact. */
  def customersNoBigOrder(spark: SparkSession, dir: String,
                          threshold: Int = 400000): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val big = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > threshold).select("o_custkey")
    Tables.customer(spark, dir)
      .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double").as("total_acctbal"))
  }

  def customersNoBigOrderOracleSql(threshold: Int = 400000): String =
    s"""SELECT c_mktsegment, count(*) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > $threshold)
        GROUP BY 1 ORDER BY 1"""

  /** D1 as a result set: count + the >= 1 assertion verdict
    * (`dag-knlp.py:253-257`). */
  def countCheck(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("ok", col("cnt") >= 1)

  /** R6+R7 — max string length via ORDER BY length DESC LIMIT 1
    * (`dag-knlp.py:273`); planned as TakeOrderedAndProject (top-k).
    * Ties broken on the value itself for determinism. */
  def top1ByLength(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_mktsegment"), length(col("c_mktsegment")).as("len"))
      .orderBy(desc("len"), asc("c_mktsegment"))
      .limit(1)

  /** D2 — bounded-length data-quality check (`dag-knlp.py:260-279`):
    * max(length(field)) compared against a threshold (ref: word_id <= 13). */
  def lengthCheck(spark: SparkSession, dir: String, threshold: Int = 15): DataFrame =
    Tables.orders(spark, dir)
      .agg(max(length(col("o_orderpriority"))).as("max_len"))
      .withColumn("ok", col("max_len") <= threshold)

  /** R4 standalone — DISTINCT projection (`dag-knlp.py:72`). */
  def distinctPairs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_linestatus").distinct()

  /** P4 — deterministic row-limit (`dag-knlp.py:97,107`): ordered LIMIT so
    * the result is well-defined under any partitioning. */
  def limitRows(spark: SparkSession, dir: String, n: Int = 100): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
      .limit(n)

  /** REGEX field extraction — the parser family's pattern arm next to the
    * delimiter splits (P1/P3): pull the numeric rank and the first word
    * out of the priority code ('1-URGENT' → 1, 'URGENT') with
    * `regexp_extract`, then aggregate per extracted pair. Codegen'd
    * per-row regex, no shuffle beyond the final partial-agg; patterns
    * restricted to the \d+/\w+ subset that Java regex and RE2 evaluate
    * identically, so the DuckDB oracle matches bit-for-bit. */
  def regexParse(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        regexp_extract(col("o_orderpriority"), "^(\\d+)", 1).as("prio_num"),
        regexp_extract(col("o_orderpriority"), "-(\\w+)", 1).as("prio_word"))
      .groupBy("prio_num", "prio_word")
      .agg(count(lit(1)).as("n_orders"))

  /** DuckDB oracle for [[regexParse]] — same patterns, same groups. */
  val regexParseOracleSql: String =
    """SELECT regexp_extract(o_orderpriority, '^(\d+)', 1) AS prio_num,
              regexp_extract(o_orderpriority, '-(\w+)', 1) AS prio_word,
              count(*) AS n_orders
       FROM orders GROUP BY 1, 2 ORDER BY 1, 2"""

  /** EXPECTATIONS SUITE — the dbt-style declarative data-quality audit
    * that generalizes the reference's two hard checks (D1 count, D2
    * max-length — `dag-knlp.py:390-405`) into the battery a warehouse
    * runs on every load: primary-key uniqueness, referential integrity
    * (FK orphan counts via LEFT ANTI — never an IN-subquery per row),
    * value-domain membership, non-negativity, and event-time range.
    * One row per check, with the violation count (so a red check is
    * diagnosable, not just boolean) and the pass verdict.
    *
    * Scale shape: each check is one narrow scan + aggregate (conditional
    * sums push the predicate into the scan); the FK checks are key-keyed
    * anti-joins, AQE-broadcast when the parent is small. The checks
    * union as 1-row frames — plan fan-out is the number of CHECKS, a
    * constant. */
  def expectations(spark: SparkSession, dir: String): DataFrame = {
    def check(name: String, violations: DataFrame): DataFrame =
      violations.select(lit(name).as("check_name"), col("n").as("n_violations"),
        (col("n") === 0).as("pass"))
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val pkUnique = orders.agg(
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("n"))
    val fkLineOrders = check("lineitem_orderkey_in_orders",
      lineitem.select("l_orderkey")
        .join(orders.select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n")))
    val fkOrdersCust = check("orders_custkey_in_customer",
      orders.select("o_custkey")
        .join(Tables.customer(spark, dir).select("c_custkey"),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n")))
    // the two pure-aggregate lineitem checks share ONE scan (guide §2.3
    // "aggregate before you shuffle" / §1.2: don't pass over the data
    // twice for two independent sums); the 1-row result fans back out to
    // the two check rows
    val domNonneg = lineitem.agg(
        sum(when(!col("l_returnflag").isin("N", "A", "R"), 1L)
          .otherwise(0L)).as("dn"),
        sum(when(col("l_extendedprice") < 0, 1L).otherwise(0L)).as("nn"))
      .select(explode(array(
        struct(lit("lineitem_returnflag_domain").as("check_name"),
          col("dn").as("n")),
        struct(lit("lineitem_extendedprice_nonnegative").as("check_name"),
          col("nn").as("n")))).as("c"))
      .select(col("c.check_name"), col("c.n").as("n_violations"),
        (col("c.n") === 0).as("pass"))
    val tsRange = check("events_ts_in_range",
      Tables.events(spark, dir).agg(
        sum(when(col("ts") < lit("2020-01-01").cast("timestamp")
          || col("ts") >= lit("2030-01-01").cast("timestamp"), 1L)
          .otherwise(0L)).as("n")))
    check("orders_orderkey_unique", pkUnique)
      .unionAll(fkLineOrders).unionAll(fkOrdersCust)
      .unionAll(domNonneg).unionAll(tsRange)
  }

  /** DuckDB oracle for [[expectations]] — the same checks as plain SQL. */
  val expectationsOracleSql: String =
    """WITH checks AS (
         SELECT 'orders_orderkey_unique' AS check_name,
                count(*) - count(DISTINCT o_orderkey) AS n_violations
         FROM orders
         UNION ALL
         SELECT 'lineitem_orderkey_in_orders',
                (SELECT count(*) FROM lineitem
                 WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
         UNION ALL
         SELECT 'orders_custkey_in_customer',
                (SELECT count(*) FROM orders
                 WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
         UNION ALL
         SELECT 'lineitem_returnflag_domain',
                (SELECT count(*) FROM lineitem
                 WHERE l_returnflag NOT IN ('N', 'A', 'R'))
         UNION ALL
         SELECT 'lineitem_extendedprice_nonnegative',
                (SELECT count(*) FROM lineitem WHERE l_extendedprice < 0)
         UNION ALL
         SELECT 'events_ts_in_range',
                (SELECT count(*) FROM events
                 WHERE ts < TIMESTAMP '2020-01-01' OR ts >= TIMESTAMP '2030-01-01'))
       SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
              n_violations = 0 AS pass
       FROM checks ORDER BY check_name"""

  /** P1+P3 — delimiter split with overflow-tail rejoin (SURVEY Q1;
    * `dag-knlp.py:102,104-105`): first field + remainder-after-first-delim,
    * exactly the arity-coercion semantics rationalized to StringType. */
  def splitParse(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    p.select(
        col("p_partkey"),
        element_at(split(col("p_type"), " "), 1).as("head_field"),
        // overflow tail rejoined with the original delimiter (Q1 decision)
        array_join(slice(split(col("p_type"), " "), 2, 1000), " ").as("tail_field"),
        size(split(col("p_type"), " ")).as("arity"))
  }
}
