package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** One media object entering the decode stage: opaque bytes + id. */
case class MediaRow(doc_id: Long, content: Array[Byte])

/** Typed metadata out of the decode stage. */
case class MediaMeta(doc_id: Long, byte_len: Long, width: Long, height: Long, n_frames: Long)

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded in partition-sized batches.
  *
  * The Spark-side shape is the real deliverable: a `binary` content
  * column, a case-class schema on both sides of the decode boundary, and
  * `Dataset.mapPartitions` as the batch execution vehicle (the Scala
  * analog of Python's `mapInPandas` — one iterator per partition, so a
  * real codec would amortize init per batch, not per row). Decode itself
  * is STUBBED: the container has no image/audio libraries, so
  * [[Multimodal.StubCodec]] derives deterministic fake dimensions from the
  * byte length. Swapping in a real codec changes only that one function.
  *
  * Scale notes: decode is narrow (no shuffle) and embarrassingly parallel;
  * binary payloads never cross a shuffle here — only the small typed
  * metadata does if aggregated downstream.
  */
object Multimodal {

  /** Batch decode boundary. A real implementation would wrap e.g. a JPEG
    * or PCM decoder initialized once per partition. */
  trait MediaCodec extends Serializable {
    def decode(batch: Iterator[MediaRow]): Iterator[MediaMeta]
  }

  /** Deterministic stand-in for the absent codec libraries: metadata is a
    * pure function of the payload length, so the DuckDB oracle can
    * reproduce it (`octet_length(encode(text))`). */
  object StubCodec extends MediaCodec {
    def decode(batch: Iterator[MediaRow]): Iterator[MediaMeta] =
      batch.map { r =>
        val n = r.content.length.toLong
        MediaMeta(r.doc_id, n, n % 1024, (n * 7) % 768, 1 + n % 5)
      }
  }

  /** documents.text encoded to a binary content column → batched decode →
    * typed metadata. */
  def mediaMeta(spark: SparkSession, dir: String, codec: MediaCodec = StubCodec): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))
      .as[MediaRow]
      .mapPartitions(codec.decode)
      .toDF()
  }
}
