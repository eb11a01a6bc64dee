package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Bucketed-table co-located join — the lay-out-the-data answer to join
  * shuffles at 100 TB (SURVEY §4.2 partition-layout row): both fact
  * tables are written `bucketBy` their join key with the same bucket
  * count, so the subsequent equi-join reads co-located buckets and the
  * physical plan has NO Exchange on either join input — the only shuffle
  * left is the final aggregation's. At scale this is the difference
  * between shuffling both fact tables per query and shuffling them once
  * at ingest.
  *
  * Uses the session catalog + warehouse dir (in-memory catalog, parquet
  * V1 tables — the only Spark surface that records bucketing metadata).
  * The result is identical to the non-bucketed join, which is exactly
  * what the oracle checks.
  */
object Bucketing {

  private val Buckets = 16

  /** The in-memory catalog forgets tables between sessions but their
    * warehouse directories persist, and saveAsTable refuses to reuse an
    * orphaned location — drop both the catalog entry and the directory. */
  private def reset(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val root = java.nio.file.Paths.get(wh, table)
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  def bucketedLineitemOrderJoin(spark: SparkSession, dir: String): DataFrame = {
    reset(spark, "lineitem_bucketed")
    reset(spark, "orders_bucketed")
    Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice")
      .write.mode("overwrite")
      .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bucketed")
    Tables.orders(spark, dir).select("o_orderkey", "o_orderstatus")
      .write.mode("overwrite")
      .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bucketed")
    val li = spark.table("lineitem_bucketed")
    val o = spark.table("orders_bucketed")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("total_price"))
  }
}
