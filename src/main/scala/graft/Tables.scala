package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loaders for the driver testdata star schema
  * (TESTDATA.md; scan op S5 in SURVEY.md §2.1).
  *
  * All reads go through `spark.read.parquet` so Catalyst's vectorized
  * Parquet reader, column pruning, and filter pushdown apply. Callers
  * select columns as early as possible so `ReadSchema` stays minimal.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts arrives as TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet,
    * read as plain TimestampType under the UTC session (Sessions disables
    * TIMESTAMP_NTZ inference). Earlier testdata generations stamped
    * TIMESTAMP(NANOS), which `spark.sql.legacy.parquet.nanosAsLong=true`
    * surfaces as a raw long — that arm normalizes via integer division
    * (`/` on longs would go through double and lose precision at 1e18 ns),
    * so either generation loads identically. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Fan a SMALL input out across the cores before a per-row-HEAVY stage
    * (optimization guide §2.5: an unsplittable input gets repartitioned
    * right after the read). The driver testdata tables are single-row-group
    * parquet files — parquet is row-group-atomic, so a scan yields ONE
    * non-empty task no matter how many byte-range splits the planner makes,
    * and every expensive map stage above it (shingle/bigram explodes,
    * 128-hash MinHash, md5 bucketing, Hadamard rotations) runs serial on
    * one of the cores.
    *
    * Scale-adaptive, derived from input size (never a local-only pin): the
    * round-robin fires only when the optimizer's size estimate says the
    * scan alone cannot saturate the cores (bytes < cores × maxPartitionBytes).
    * Below that cutoff the added exchange moves at most cores×128 MiB —
    * strictly cheaper than the serial stage it breaks up; above it (any
    * real 100 TB scan plans thousands of row groups) this is the identity,
    * so a corpus-sized shuffle can never be added. */
  def fanOut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    // Target width = the session's deliberate shuffle sizing, floored at
    // the scheduler's current slot count (ADVICE r16: under dynamic
    // allocation defaultParallelism reflects only currently-registered
    // executors at plan-build time, pinning too few partitions; the
    // shuffle-partition setting is the configured intent).
    val target = math.max(
      spark.sessionState.conf.numShufflePartitions,
      spark.sparkContext.defaultParallelism)
    val cutoff = BigInt(target.toLong) *
      spark.sessionState.conf.filesMaxPartitionBytes
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes >= cutoff) df
    else df.repartition(target)
  }
}
