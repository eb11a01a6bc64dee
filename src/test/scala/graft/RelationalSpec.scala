package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, Relational}

/** Reference-parity operator semantics over the sf0.001 testdata. */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("D1 count check passes on non-empty table") {
    val r = Relational.countCheck(spark, sf).head()
    assert(r.getLong(0) >= 1 && r.getBoolean(1))
  }

  test("D2 length check verdict matches a manual max-length scan") {
    val r = Relational.lengthCheck(spark, sf).head()
    val manual = Tables.orders(spark, sf)
      .agg(max(length(col("o_orderpriority")))).head().getInt(0)
    assert(r.getInt(0) == manual)
    assert(r.getBoolean(1) == (manual <= 15))
  }

  test("dimension query: DataFrame and SQL surfaces agree row-for-row") {
    val a = Relational.dimensionTable(spark, sf)
    val b = Relational.dimensionTableSql(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("dimension query keeps unmatched left rows (LEFT join semantics)") {
    val n = Relational.dimensionTable(spark, sf).count()
    val orders = Tables.orders(spark, sf).select("o_orderkey").distinct().count()
    assert(n >= orders) // every order survives the left joins
  }

  test("distinct is idempotent") {
    val d = Relational.distinctPairs(spark, sf)
    assert(d.count() == d.distinct().count())
  }

  test("top-1 by length equals agg(max(length))") {
    val top = Relational.top1ByLength(spark, sf).head().getInt(1)
    val mx = Tables.customer(spark, sf)
      .agg(max(length(col("c_mktsegment")))).head().getInt(0)
    assert(top == mx)
  }

  test("approx distinct self-check verdicts are true") {
    val r = Analytics.approxDistinct(spark, sf).head()
    assert(r.getBoolean(2) && r.getBoolean(3))
  }

  test("correlated subqueries decorrelate to joins and match a manual join recomputation") {
    val got = Relational.correlatedSubqueries(spark, sf)
    // decorrelation happened: the optimized plan is joins, not per-row subplans
    val plan = got.queryExecution.optimizedPlan.toString
    assert(plan.contains("Join"), s"expected decorrelated joins, got:\n$plan")
    val counts = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_lines"))
    val hasR = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R").select("l_orderkey").distinct()
    val want = Tables.orders(spark, sf)
      .join(counts, col("o_orderkey") === counts("l_orderkey"))
      .join(hasR, col("o_orderkey") === hasR("l_orderkey"), "left_semi")
      .filter(col("n_lines") >= 5)
      .select("o_orderkey", "o_custkey", "n_lines")
    // set compare (exceptAll trips Spark's Union constraint rewrite on the
    // shared lineitem lineage here)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(got) == rows(want))
  }

  test("anti join complements the semi set and plans as LeftAnti") {
    val got = Relational.customersNoBigOrder(spark, sf)
    assert(got.queryExecution.optimizedPlan.toString.contains("LeftAnti"),
      "the NOT-EXISTS shape must plan as a LeftAnti join")
    // anti + semi on the same predicate partition the customer table
    val big = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 400000).select("o_custkey")
    val semiN = Tables.customer(spark, sf)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val antiN = got.agg(sum(col("n_customers"))).head().getLong(0)
    assert(antiN > 0, "the threshold must leave some customers without a big order")
    assert(antiN + semiN == Tables.customer(spark, sf).count(),
      "anti and semi sets must partition the customers exactly")
    // per-segment recomputation without a join operator at all
    val keys = big.collect().map(_.getLong(0)).toSet
    val want = Tables.customer(spark, sf).collect()
      .filterNot(r => keys.contains(r.getLong(0)))
      .groupBy(_.getString(4)).view.mapValues(_.length).toMap
    val gotMap = got.collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    assert(gotMap == want)
  }

  test("expectations: six checks, all green on the driver testdata, FK checks are anti-joins") {
    val df = graft.operators.Relational.expectations(spark, sf)
    val rows = df.collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_violations") == 0L, s"check ${r.getString(0)}")
      assert(r.getAs[Boolean]("pass"), s"check ${r.getString(0)}")
    }
    // violation counts are real counts, not booleans: recompute one
    // check by hand (orphaned lineitem order keys)
    val orphans = Tables.lineitem(spark, sf).select("l_orderkey")
      .join(Tables.orders(spark, sf).select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(orphans == 0)
    // plan: the FK checks compile to anti-joins, not per-row IN probes
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(2000))
  }
}
