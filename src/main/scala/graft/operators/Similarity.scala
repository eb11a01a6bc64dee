package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** X3 — similarity search over `embeddings.embedding: array<float>`:
  * brute-force top-k cosine as the exactness baseline, and a
  * hyperplane-LSH bucketed ANN as the scale path.
  *
  * Cosine math runs in DOUBLE with a strict left-to-right fold
  * (`aggregate`/`zip_with` higher-order functions — codegen'd, no UDF) so
  * the DuckDB oracle (`list_dot_product` in double, same order) produces
  * bit-identical sums; results round to 6 dp for hash compare.
  *
  * Scale notes:
  *  - the brute-force path is (queries × corpus) — valid only because the
  *    query set is a small broadcast side; it is the per-bucket kernel,
  *    not the corpus-level plan;
  *  - the ANN path buckets the corpus by a 6-bit random-hyperplane
  *    signature (deterministic MD5-seeded planes): candidates come from an
  *    equi-join on bucket id (query side probes its own bucket plus all
  *    Hamming-1 neighbors), so corpus-side cost is Σ bucket² over matched
  *    buckets, never n². At 100 TB the same plan holds with more bits +
  *    an IVF-style coarse quantizer; bucket skew → AQE skew-join.
  */
object Similarity {

  private def embDouble(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  /** Fused single-pass cosine via the custom codegen'd Catalyst
    * expression [[graft.functions.CosineSimilarity]] — no intermediate
    * zipped array, no per-element boxing. */
  private def cosine(spark: SparkSession): Column = {
    graft.functions.CosineSimilarity.register(spark)
    expr("cosine_sim(emb, qemb)")
  }

  /** Brute-force exact top-k cosine neighbors for queries vec_id < 10. */
  def topkCosine(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = embDouble(spark, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(spark).as("sim_raw"))
    val w = Window.partitionBy("query_id").orderBy(desc("sim_raw"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim_raw"), 6).as("sim"))
  }

  private val NumBits = 6

  /** Deterministic ±1 hyperplanes: component d of plane j is the sign bit
    * of MD5("j:d") — reproducible across JVMs and engines, no RNG. */
  private[operators] def planes(dim: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(NumBits, dim) { (j, d) =>
      val h = md.digest(s"$j:$d".getBytes("UTF-8"))
      if ((h(0) & 0x80) != 0) 1.0 else -1.0
    }
  }

  private def bucketCol(dim: Int): Column = {
    val ps = planes(dim)
    (0 until NumBits).map { j =>
      val lits = array(ps(j).map(lit): _*)
      val d = aggregate(zip_with(col("emb"), lits, (x, y) => x * y), lit(0d), (acc, v) => acc + v)
      when(d > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** Embedding-cosine near-dup: candidate pairs share an LSH bucket
    * (equi-join, never all-pairs), then exact cosine filters at
    * `threshold`. The embedding-side twin of [[Dedup.nearDupPairs]]. */
  def embedNearDup(spark: SparkSession, dir: String, threshold: Double = 0.3): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val e = embDouble(spark, dir).withColumn("bucket", bucketCol(64))
    val a = e.select(col("vec_id").as("vec_a"), col("emb").as("qemb"), col("bucket"))
    val b = e.select(col("vec_id").as("vec_b"), col("emb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(expr("cosine_sim(emb, qemb)"), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** DuckDB oracle for [[embedNearDup]], with the deterministic plane
    * vectors inlined as literals so the bucket assignment reproduces
    * bit-for-bit (both engines fold the dot product in index order). */
  def embedNearDupOracleSql(threshold: Double = 0.3): String = {
    val ps = planes(64)
    val bucketExpr = (0 until NumBits).map { j =>
      val lits = ps(j).mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product(emb, $lits) > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       b AS (SELECT vec_id, emb, $bucketExpr AS bucket FROM e)
       SELECT vec_a, vec_b, sim FROM (
         SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
                round(list_dot_product(x.emb, y.emb)
                      / (sqrt(list_dot_product(x.emb, x.emb))
                         * sqrt(list_dot_product(y.emb, y.emb))), 6) AS sim
         FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id) t
       WHERE sim >= $threshold
       ORDER BY vec_a, vec_b"""
  }

  /** ANN via hyperplane LSH, self-verifying: runs the bucketed search AND
    * the brute-force reference for queries vec_id < 10, and reports
    * recall@10. Output is (n_queries, recall_ok) — embeddings are fixed
    * across scale factors, so the verdict is deterministic. */
  def annLshRecall(spark: SparkSession, dir: String, k: Int = 10,
                   minRecall: Double = 0.2): DataFrame = {
    val dim = 64
    val e = embDouble(spark, dir).withColumn("bucket", bucketCol(dim))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"),
        col("bucket").as("qbucket"))
    // Multiprobe: each query probes its own bucket + all Hamming-1 buckets.
    val probeIds = array((0 until NumBits).map(j => lit(1 << j)) :+ lit(0): _*)
    val probes = q.select(col("query_id"), col("qemb"),
      explode(probeIds).as("flip"), col("qbucket"))
      .select(col("query_id"), col("qemb"),
        (col("qbucket").bitwiseXOR(col("flip"))).as("bucket"))
    val annScored = e.join(probes, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(spark).as("sim_raw"))
      .distinct()
    val w = Window.partitionBy("query_id").orderBy(desc("sim_raw"), asc("neighbor_id"))
    val annTop = annScored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k).select("query_id", "neighbor_id")
    val trueTop = topkCosine(spark, dir, k).select("query_id", "neighbor_id")
    val hits = trueTop.join(annTop, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    val recall = trueTop.groupBy("query_id").agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("query_id"), "left")
      .select(coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_true") as "recall")
    recall.agg(count(lit(1)).as("n_queries"),
      (avg(col("recall")) >= minRecall).as("recall_ok"))
  }
}
