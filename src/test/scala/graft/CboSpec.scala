package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bucketing

/** Cost-based-optimizer exercise (VERDICT r11 #5): prove the stats-
  * informed join reorder actually happens — and that it does NOT happen
  * without CBO/stats, so the reorder is attributable to the statistics
  * rather than to some other rule.
  *
  * The bait query ([[Bucketing.cboStarJoinSql]]) joins the fact table
  * first syntactically: (orders ⋈ customer) ⋈ nation. With ANALYZE'd row
  * counts (orders 1.5k, customer 150, nation 25 at sf0.001 — the same
  * 10x/600x ratios at every sf), JoinReorderDP should build the tiny
  * dimension chain first: (customer ⋈ nation) ⋈ orders.
  */
class CboSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Catalog-table names under the innermost join (the first join
    * executed in a left-deep tree): the join whose subtree contains no
    * other join. */
  private def innermostJoinTables(plan: LogicalPlan): Set[String] = {
    val joins = plan.collect { case j: Join => j }
    joins.filter(j => j.children.forall(c =>
      c.collect { case jj: Join => jj }.isEmpty))
      .flatMap(_.collect { case l: LogicalRelation =>
        l.catalogTable.map(_.identifier.table)
      }.flatten)
      .toSet
  }

  private def baitPlan(ss: SparkSession, tables: Map[String, String]): LogicalPlan =
    ss.sql(Bucketing.cboStarJoinSql(
      tables("cbo_orders"), tables("cbo_customer"), tables("cbo_nation")))
      .queryExecution.optimizedPlan

  test("ANALYZE TABLE stats reach the optimizer: rowCount visible only with CBO on") {
    // EXPLAIN COST renders the plan statistics from INSIDE query
    // execution, under the issuing session's conf — plan.stats accessed
    // from the test thread would consult the thread-ambient conf instead
    // and read CBO as off regardless of the session that built the plan.
    val tables = Bucketing.ensureCboTables(spark, sf)
    val q = s"EXPLAIN COST SELECT * FROM ${tables("cbo_orders")}"
    val on = Bucketing.cboSession(spark).sql(q).head().getString(0)
    // the explain renders counts in engineering notation (1.50E+3)
    val rowCount = "rowCount=([0-9.E+]+)".r.findFirstMatchIn(on)
      .map(_.group(1).toDouble)
    assert(rowCount.contains(1500.0),
      s"expected the ANALYZE'd orders rowCount (1500) under CBO, got:\n$on")
    // without CBO the planner works from sizeInBytes alone
    val off = spark.newSession()
    off.conf.set("spark.sql.cbo.enabled", "false")
    val offTxt = off.sql(q).head().getString(0)
    assert(!offTxt.contains("rowCount="),
      s"rowCount should not surface with CBO off, got:\n$offTxt")
  }

  test("join reorder: fact-first syntax, dimension-first plan — only under CBO") {
    val tables = Bucketing.ensureCboTables(spark, sf)
    val names = Set(tables("cbo_customer"), tables("cbo_nation"))

    // RED arm: CBO off — the optimizer keeps the syntactic left-deep
    // order, so the innermost join is orders ⋈ customer. If this arm ever
    // starts reordering, the green arm below no longer proves anything —
    // fail loudly.
    val off = spark.newSession()
    off.conf.set("spark.sql.cbo.enabled", "false")
    val offInner = innermostJoinTables(baitPlan(off, tables))
    assert(offInner == Set(tables("cbo_orders"), tables("cbo_customer")),
      s"without CBO the syntactic order must survive; innermost = $offInner")

    // GREEN arm: CBO + joinReorder + stats — the innermost join must be
    // the stats-informed small side, customer ⋈ nation.
    val on = Bucketing.cboSession(spark)
    val onInner = innermostJoinTables(baitPlan(on, tables))
    assert(onInner == names,
      s"CBO should reorder to build customer ⋈ nation first; innermost = $onInner")
  }

  test("reorder is semantics-preserving: both arms return identical rows") {
    val tables = Bucketing.ensureCboTables(spark, sf)
    val off = spark.newSession()
    off.conf.set("spark.sql.cbo.enabled", "false")
    val sql = Bucketing.cboStarJoinSql(
      tables("cbo_orders"), tables("cbo_customer"), tables("cbo_nation"))
    val a = off.sql(sql).orderBy("n_name").collect().toSeq
    val b = Bucketing.cboSession(spark).sql(sql).orderBy("n_name").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }
}
