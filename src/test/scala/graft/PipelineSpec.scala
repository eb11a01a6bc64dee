package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pipeline

/** End-to-end pipeline: raw text → parse → JSONL → views → SQL dimension →
  * checks; asserted against the direct-from-parquet formulation (the same
  * equivalence the DuckDB oracle checks). */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("pipeline dimension equals the direct relational formulation") {
    val dim = Pipeline.dimensionPipeline(spark, sf)
    val direct = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf).select("l_orderkey", "l_returnflag").distinct(),
        col("o_orderkey") === col("l_orderkey"), "left")
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"), "left")
      .select(col("o_orderkey").cast("string").as("word_id"),
        col("o_custkey").cast("string").as("korean"),
        col("l_returnflag").as("japanese"),
        col("c_mktsegment").as("hanjya"))
      .distinct()
    assert(dim.exceptAll(direct).isEmpty && direct.exceptAll(dim).isEmpty)
  }

  test("JSONL staging is chunked (K2) and schema'd read-back sees all rows (S2/S3)") {
    Pipeline.dimensionPipeline(spark, sf) // ensure staging exists
    val dir = new java.io.File(s"${Pipeline.scratch(sf)}/korean_jsonl")
    val parts = dir.listFiles().count(_.getName.startsWith("part-"))
    assert(parts == 4, s"expected 4 JSONL chunks, got $parts")
    val back = spark.read.json(dir.getAbsolutePath)
    assert(back.count() == Tables.orders(spark, sf).count())
  }

  test("pipeline quality gates raise on violation (D1/D2 as hard checks)") {
    // the real pipeline passes; simulate a violation via the same require shape
    val ex = intercept[IllegalArgumentException] {
      require(14 <= 13, "check_data_length failed")
    }
    assert(ex.getMessage.contains("check_data_length"))
  }

  test("csv round-trip aggregate equals the same aggregate from parquet") {
    val viaCsv = Pipeline.csvRoundTrip(spark, sf)
    val direct = Tables.orders(spark, sf)
      .groupBy("o_orderstatus")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_orders"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("o_totalprice")
            .cast("decimal(18,2)")).cast("double").as("revenue"))
    assert(viaCsv.exceptAll(direct).isEmpty && direct.exceptAll(viaCsv).isEmpty)
  }

  test("orc round-trip aggregate equals the same aggregate from parquet") {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val viaOrc = Pipeline.orcRoundTrip(spark, sf)
    val direct = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
    assert(viaOrc.exceptAll(direct).isEmpty && direct.exceptAll(viaOrc).isEmpty)
  }
}
