package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** One media object entering the decode stage: opaque bytes + id. */
case class MediaRow(doc_id: Long, content: Array[Byte])

/** Typed metadata out of the decode stage. */
case class MediaMeta(doc_id: Long, byte_len: Long, width: Long, height: Long, n_frames: Long)

/** Summary of one extracted feature vector (first component, component
  * sum, L2 norm — scalar columns keep the dump hash-comparable while
  * pinning every component). */
case class MediaEmbed(doc_id: Long, e0: Double, esum: Double, enorm: Double)

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

  /** The FEATURE-EXTRACTION stage after decode — media bytes → embedding
    * vector, the step a real pipeline runs with a vision/audio model.
    * Same batch boundary as [[MediaCodec]]: one extractor per partition
    * (the expensive model init amortizes per batch, never per row), and
    * only the extracted VECTOR SUMMARY leaves the stage — payload bytes
    * never cross a shuffle. */
  trait MediaEmbedder extends Serializable {
    def embed(batch: Iterator[MediaRow]): Iterator[MediaEmbed]
  }

  /** Deterministic stand-in for the absent model libraries: component j
    * of the 8-dim embedding is the 32-bit md5 prefix of content‖":"‖j
    * mapped affinely onto [-1, 1) — a pure function of the bytes, so the
    * DuckDB oracle reproduces every component (md5 of the same UTF-8
    * bytes). The per-partition MessageDigest is the stand-in for the
    * per-partition model handle. */
  object StubEmbedder extends MediaEmbedder {
    private def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def embed(batch: Iterator[MediaRow]): Iterator[MediaEmbed] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { r =>
        val comps = (0 until 8).map { j =>
          val d = md.digest(r.content ++ s":$j".getBytes("UTF-8"))
          val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          h.toDouble / 4294967296.0 * 2 - 1
        }
        MediaEmbed(r.doc_id, round6(comps.head), round6(comps.sum),
          round6(math.sqrt(comps.map(c => c * c).sum)))
      }
    }
  }

  /** binary content → batched feature extraction → embedding summary. */
  def mediaEmbed(spark: SparkSession, dir: String,
                 embedder: MediaEmbedder = StubEmbedder): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))
      .as[MediaRow]
      .mapPartitions(embedder.embed)
      .toDF()
  }

  /** DuckDB oracle for [[mediaEmbed]] — the same md5-derived components
    * over the same UTF-8 bytes, same op order, same HALF_UP rounding. */
  def mediaEmbedOracleSql: String = {
    def hex32(expr: String): String = (1 to 8)
      .map(i => s"(strpos('0123456789abcdef', substr($expr, $i, 1)) - 1) * ${1L << (4 * (8 - i))}")
      .mkString("(", " + ", ")")
    val comp = s"${hex32("md5(text || ':' || CAST(j AS VARCHAR))")} / 4294967296.0 * 2 - 1"
    s"""WITH c AS (SELECT doc_id, [$comp for j in range(0, 8)] AS comps
                   FROM documents)
       SELECT doc_id, round(comps[1], 6) AS e0,
              round(list_sum(comps), 6) AS esum,
              round(sqrt(list_sum([x * x for x in comps])), 6) AS enorm
       FROM c ORDER BY doc_id"""
  }

  /** The RESIZE stage between decode and feature extraction — the
    * standard vision-pipeline preprocessing step: fit each decoded
    * (width, height) into a `box`×`box` bounding box preserving aspect
    * ratio (longest side → `box`, never upscale-distort below 1 px).
    * Like decode, the pixel work itself would run inside the per-
    * partition codec batch; the RESIZE PLAN — the target geometry every
    * batch worker applies — is pure integer arithmetic over the decoded
    * metadata, so it is exactly oracle-checkable and shuffle-free (the
    * binary payload never leaves its partition). Degenerate stub dims
    * (width or height 0) clamp to 1 px, mirrored in the oracle. */
  def resizePlan(spark: SparkSession, dir: String, box: Int = 224): DataFrame =
    mediaMeta(spark, dir)
      .withColumn("m", greatest(col("width"), col("height"), lit(1L)))
      .select(col("doc_id"), col("width"), col("height"),
        greatest(lit(1L), expr(s"width * $box div m")).as("target_w"),
        greatest(lit(1L), expr(s"height * $box div m")).as("target_h"))

  /** DuckDB oracle for [[resizePlan]] — same stub dims, same integer
    * arithmetic, same clamps. */
  def resizePlanOracleSql(box: Int = 224): String =
    s"""WITH m AS (SELECT doc_id,
                          octet_length(encode(text)) % 1024 AS width,
                          (octet_length(encode(text)) * 7) % 768 AS height
                   FROM documents),
       g AS (SELECT doc_id, width, height,
                    greatest(width, height, 1) AS mx FROM m)
       SELECT doc_id, width, height,
              greatest(1, width * $box // mx) AS target_w,
              greatest(1, height * $box // mx) AS target_h
       FROM g ORDER BY doc_id"""

  /** Frame sampling over the decoded metadata — the explode-shaped
    * plumbing a video pipeline runs before per-frame feature extraction:
    * up to `k` evenly-spaced frames per media object, emitted as
    * (doc_id, frame_idx, byte_offset). One row per sampled frame, fanned
    * out with a Generator (no shuffle); a real pipeline would follow with
    * the per-frame decode batch stage. Integer arithmetic only
    * (frame_idx = ⌊i·n/kk⌋, kk = min(k, n)), so the oracle reproduces it
    * exactly. */
  def sampleFrames(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    mediaMeta(spark, dir)
      .withColumn("kk", least(lit(k.toLong), col("n_frames")))
      .select(col("doc_id"), col("byte_len"), col("n_frames"), col("kk"),
        explode(sequence(lit(0L), col("kk") - 1)).as("i"))
      .select(col("doc_id"),
        expr("(i * n_frames) div kk").as("frame_idx"),
        expr("((i * n_frames) div kk) * byte_len div n_frames").as("byte_offset"))

  /** DuckDB oracle for [[sampleFrames]] — same integer arithmetic over
    * the stub metadata. */
  def sampleFramesOracleSql(k: Int = 3): String =
    s"""WITH m AS (SELECT doc_id, octet_length(encode(text)) AS byte_len,
                          1 + octet_length(encode(text)) % 5 AS n_frames
                   FROM documents),
       f AS (SELECT doc_id, byte_len, n_frames,
                    CASE WHEN n_frames < $k THEN n_frames ELSE $k END AS kk
             FROM m),
       g AS (SELECT doc_id, byte_len, n_frames, kk,
                    unnest(range(0, kk)) AS i
             FROM f)
       SELECT doc_id, (i * n_frames) // kk AS frame_idx,
              ((i * n_frames) // kk) * byte_len // n_frames AS byte_offset
       FROM g ORDER BY doc_id, frame_idx"""
}
