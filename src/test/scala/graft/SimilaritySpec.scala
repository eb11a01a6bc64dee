package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** X3 similarity-search semantics. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("topk cosine: 10 queries x 5 ranked neighbors, sims in [-1,1], no self-match") {
    val t = Similarity.topkCosine(spark, sf)
    assert(t.count() == 50)
    assert(t.select(countDistinct("query_id")).head().getLong(0) == 10)
    assert(t.filter(col("sim") > 1.000001 || col("sim") < -1.000001).isEmpty)
    assert(t.filter(col("query_id") === col("neighbor_id")).isEmpty)
    // ranks are 1..5 within each query
    assert(t.groupBy("query_id").agg(sum("rank").as("s"))
      .filter(col("s") =!= 15).isEmpty)
  }

  test("rank 1 neighbor has the max similarity of its query group") {
    val t = Similarity.topkCosine(spark, sf)
    val r1 = t.filter(col("rank") === 1).select(col("query_id"), col("sim").as("top"))
    val mx = t.groupBy("query_id").agg(max("sim").as("mx"))
    assert(r1.join(mx, "query_id").filter(col("top") =!= col("mx")).isEmpty)
  }

  test("embedding near-dup: canonical pair order, sim at or above threshold") {
    val p = Similarity.embedNearDup(spark, sf, 0.3)
    assert(p.filter(col("vec_a") >= col("vec_b")).isEmpty)
    assert(p.filter(col("sim") < 0.3).isEmpty)
  }

  test("ANN LSH multiprobe recall clears the registered floor") {
    val r = Similarity.annLshRecall(spark, sf).head()
    assert(r.getLong(0) == 10)
    assert(r.getBoolean(1), "LSH recall@10 below floor")
  }
}
