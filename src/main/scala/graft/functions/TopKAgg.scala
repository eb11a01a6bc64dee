package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom AGGREGATOR: per-group top-k values as a bounded partial
  * state — the sixth custom function and the one extension mechanism the
  * library had not yet exercised (codegen'd `Expression`s cover scalars;
  * `Aggregator` covers custom AGGREGATION state).
  *
  * Why this shape at 100 TB: the window-function top-k
  * (`row_number() <= k`) must SORT every group's rows; the aggregator
  * keeps a k-element state per group on the MAP side, so only k values
  * per (partition, group) ever cross the shuffle and nothing is sorted
  * but k-vectors — the same reason `WindowGroupLimit` exists, expressed
  * as an algebra: `reduce` folds one value into a bounded state, `merge`
  * is associative/commutative on states, so Spark runs it as a partial +
  * final aggregate like any built-in.
  *
  * The state is a descending-sorted Vector of ≤ k doubles (k is tiny by
  * contract — top-3/top-10 — so the O(k) insert beats heap constant
  * factors and keeps the state trivially serializable). Output is the
  * descending value list: a deterministic multiset function of the
  * group, independent of row order and partitioning. */
class TopKDoubles(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
  require(k >= 1, s"k must be >= 1, got $k")
  def zero: Seq[Double] = Vector.empty
  def reduce(b: Seq[Double], a: Double): Seq[Double] =
    if (b.size < k) (b :+ a).sortBy(-_)
    else if (a > b.last) (b.init :+ a).sortBy(-_)
    else b
  def merge(b1: Seq[Double], b2: Seq[Double]): Seq[Double] =
    (b1 ++ b2).sortBy(-_).take(k)
  def finish(r: Seq[Double]): Seq[Double] = r
  def bufferEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** Bounded smallest-k LONGS — the ascending twin of [[TopKDoubles]],
  * built for posting-list heads (first k doc ids of an inverted-index
  * entry). Same 100 TB argument: the alternative
  * (`slice(sort_array(collect_set(id)), 1, k)`) materializes EVERY id of
  * the group before slicing — document-frequency-sized state for common
  * tokens — while this state never exceeds k longs per (partition,
  * group). Inputs are assumed distinct per group (the caller feeds
  * already-deduplicated pairs); the ascending-sorted ≤k Vector makes
  * `merge` associative/commutative, so partial aggregation is safe. */
class SmallestKLongs(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 1, s"k must be >= 1, got $k")
  def zero: Seq[Long] = Vector.empty
  def reduce(b: Seq[Long], a: Long): Seq[Long] =
    if (b.size < k) (b :+ a).sorted
    else if (a < b.last) (b.init :+ a).sorted
    else b
  def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    (b1 ++ b2).sorted.take(k)
  def finish(r: Seq[Long]): Seq[Long] = r
  def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKAgg {
  /** Register `top_k_3(value)` for SQL use (idempotent per session). */
  def register(spark: SparkSession, k: Int = 3): Unit =
    spark.udf.register(s"top_k_$k", udaf(new TopKDoubles(k), Encoders.scalaDouble))

  /** Register `smallest_k_5(id)` for SQL use (idempotent per session). */
  def registerSmallest(spark: SparkSession, k: Int = 5): Unit =
    spark.udf.register(s"smallest_k_$k", udaf(new SmallestKLongs(k), Encoders.scalaLong))
}
