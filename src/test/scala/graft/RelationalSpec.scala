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
}
