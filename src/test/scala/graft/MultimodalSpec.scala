package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Multimodal plumbing: batched decode boundary and frame sampling. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("frame sampling: min(k, n_frames) frames per doc, in-range, strictly increasing") {
    val meta = Multimodal.mediaMeta(spark, sf).select("doc_id", "byte_len", "n_frames")
    val frames = Multimodal.sampleFrames(spark, sf, k = 3)
    val joined = frames.join(meta, "doc_id")
    // counts: exactly min(3, n_frames) rows per doc
    val counts = joined.groupBy("doc_id", "n_frames").count()
    assert(counts.filter(col("count") =!= least(lit(3L), col("n_frames"))).isEmpty)
    // every sampled frame exists and its offset is inside the payload
    assert(joined.filter(col("frame_idx") >= col("n_frames") || col("frame_idx") < 0).isEmpty)
    assert(joined.filter(col("byte_offset") >= col("byte_len") || col("byte_offset") < 0).isEmpty)
    // evenly-spaced sampling never repeats a frame (kk <= n_frames)
    assert(frames.groupBy("doc_id", "frame_idx").count().filter(col("count") > 1).isEmpty)
  }

  test("resize plan: fits the box, preserves aspect ratio, clamps degenerate dims") {
    val rows = Multimodal.resizePlan(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (w, h, tw, th) =>
      assert(tw >= 1 && th >= 1 && tw <= 224 && th <= 224, s"($w,$h)->($tw,$th)")
      // the longest side lands exactly on the box unless clamped
      if (w > 0 && h > 0) {
        assert(math.max(tw, th) == 224, s"($w,$h)->($tw,$th)")
        // aspect preserved within integer-floor error: tw/th ≈ w/h
        assert(math.abs(tw.toDouble / th - w.toDouble / h) <=
          (w.toDouble / h) / math.min(tw, th) + 1e-9, s"($w,$h)->($tw,$th)")
      }
    }
  }

  test("media embed: one summary per doc, components bounded, run-deterministic") {
    val e = Multimodal.mediaEmbed(spark, sf)
    val n = Tables.documents(spark, sf).count()
    assert(e.count() == n)
    // components live in [-1, 1): |e0| <= 1, |esum| <= 8, enorm <= sqrt(8)
    assert(e.filter(org.apache.spark.sql.functions.abs(col("e0")) > 1.0).isEmpty)
    assert(e.filter(org.apache.spark.sql.functions.abs(col("esum")) > 8.0).isEmpty)
    assert(e.filter(col("enorm") < 0 || col("enorm") > math.sqrt(8) + 1e-9).isEmpty)
    // the extraction is a pure function of the bytes — rerun-identical
    val again = Multimodal.mediaEmbed(spark, sf)
    assert(e.exceptAll(again).isEmpty && again.exceptAll(e).isEmpty)
    // only the summary leaves the stage; payload bytes never in the schema
    assert(!e.schema.fieldNames.contains("content"))
  }
}
