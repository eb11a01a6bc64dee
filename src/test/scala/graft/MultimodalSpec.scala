package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Multimodal plumbing: real container build/parse round-trip, malformed
  * byte quarantine, batched decode boundary, frame sampling. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("BMP round-trip: built bytes parse back to the built geometry") {
    val text = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val n = text.length
    val bytes = Multimodal.buildBmp(docId = 1L, text) // 1 is uncorrupted
    val m = Multimodal.parseBmp(1L, bytes)
    assert(m.status == "ok")
    assert(m.width == 1 + n % 64 && m.height == 1 + (n * 7) % 48)
    assert(m.byte_len == bytes.length.toLong)
    // the parse is a pure byte read: editing the width header field
    // changes the parsed width (decrement — same 4-byte-aligned row size,
    // so the payload-extent check still passes)
    val w2 = bytes.clone(); w2(18) = (w2(18) - 1).toByte
    assert(Multimodal.parseBmp(1L, w2).width == m.width - 1)
  }

  test("WAV round-trip: sample rate, count, and data geometry parse back") {
    val text = "pack my box with five dozen liquor jugs!!".getBytes("UTF-8")
    val n = text.length
    val m = Multimodal.parseWav(1L, Multimodal.buildWav(1L, text))
    assert(m.status == "ok")
    assert(m.sample_rate == 8000 + (n % 3) * 4000)
    assert(m.n_samples == 1 + n % 1000)
    assert(m.data_offset == 44L && m.block_align == 2L)
  }

  test("corrupt bytes quarantine with byte-level reasons, never throw") {
    val text = ("x" * 100).getBytes("UTF-8")
    val okBmp = Multimodal.buildBmp(1L, text)
    val okWav = Multimodal.buildWav(1L, text)
    // wrong magic
    val xm = okBmp.clone(); xm(0) = 'X'.toByte
    assert(Multimodal.parseBmp(1L, xm).status == "bad_magic")
    val xw = okWav.clone(); xw(0) = 'X'.toByte
    assert(Multimodal.parseWav(1L, xw).status == "bad_magic")
    // truncated payload: declared size no longer matches the bytes
    assert(Multimodal.parseBmp(1L,
      java.util.Arrays.copyOf(okBmp, okBmp.length / 2)).status == "truncated")
    assert(Multimodal.parseWav(1L,
      java.util.Arrays.copyOf(okWav, okWav.length / 2)).status == "truncated")
    // shorter than any header
    assert(Multimodal.parseBmp(1L, Array[Byte](1, 2, 3)).status == "too_short")
    assert(Multimodal.parseWav(1L, Array[Byte](1, 2, 3)).status == "too_short")
    // header-field damage
    val bh = okBmp.clone(); bh(14) = 39
    assert(Multimodal.parseBmp(1L, bh).status == "bad_header")
    val wd = okBmp.clone(); wd(18) = 0; wd(19) = 0; wd(20) = 0; wd(21) = 0
    assert(Multimodal.parseBmp(1L, wd).status == "bad_dims")
    val wh = okWav.clone(); wh(20) = 3 // not PCM
    assert(Multimodal.parseWav(1L, wh).status == "bad_header")
  }

  test("quarantine query: exactly the corrupted doc_ids, both kinds, reasons match parse") {
    val q = Multimodal.mediaQuarantine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val corrupted = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).filter(id => id % 97 == 0 || id % 89 == 0).toSet
    assert(q.map(_._1) == corrupted)
    assert(q.groupBy(_._1).forall(_._2.map(_._2) == Set("bmp", "wav")))
    assert(q.forall { case (id, _, reason) =>
      if (id % 97 == 0) reason == "bad_magic"
      else Set("truncated", "too_short")(reason)
    })
    // ok set and quarantine set partition the corpus, per format
    val okIds = Multimodal.mediaMeta(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert((okIds & corrupted).isEmpty)
    assert(okIds.size + corrupted.size == Tables.documents(spark, sf).count())
  }

  test("frame sampling: min(k, n_samples) frames per doc, real offsets inside the data chunk") {
    val meta = Multimodal.audioMeta(spark, sf).select("doc_id", "byte_len", "n_samples")
    val frames = Multimodal.sampleFrames(spark, sf, k = 3)
    val joined = frames.join(meta, "doc_id")
    // counts: exactly min(3, n_samples) rows per doc
    val counts = joined.groupBy("doc_id", "n_samples").count()
    assert(counts.filter(col("count") =!= least(lit(3L), col("n_samples"))).isEmpty)
    // every sampled frame exists and its offset lands inside the payload
    assert(joined.filter(col("frame_idx") >= col("n_samples") || col("frame_idx") < 0).isEmpty)
    assert(joined.filter(col("byte_offset") < 44 ||
      col("byte_offset") >= col("byte_len")).isEmpty)
    // evenly-spaced sampling never repeats a frame (kk <= n_samples)
    assert(frames.groupBy("doc_id", "frame_idx").count().filter(col("count") > 1).isEmpty)
  }

  test("frame extraction reads the actual payload bytes at the planned offsets") {
    val rows = Multimodal.frameExtract(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    rows.foreach { case (id, idx, off, v) =>
      val t = texts(id); val n = t.length
      val d = (off - 44).toInt // data-chunk offset; builder cycles text bytes
      assert(d == idx * 2, s"doc $id: offset $off inconsistent with idx $idx")
      val lo = t(d % n) & 0xffL
      val hi = t((d + 1) % n).toLong
      assert(v == ((hi << 8) | lo), s"doc $id frame $idx: sample $v wrong")
      assert(v >= Short.MinValue && v <= Short.MaxValue)
    }
  }

  test("resize plan: fits the box, preserves aspect ratio over parsed dims") {
    val rows = Multimodal.resizePlan(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (w, h, tw, th) =>
      assert(w >= 1 && h >= 1, s"parsed dims must be positive: ($w,$h)")
      assert(tw >= 1 && th >= 1 && tw <= 224 && th <= 224, s"($w,$h)->($tw,$th)")
      // the longest side lands exactly on the box unless clamped
      assert(math.max(tw, th) == 224, s"($w,$h)->($tw,$th)")
      // aspect preserved within integer-floor error: tw/th ≈ w/h
      assert(math.abs(tw.toDouble / th - w.toDouble / h) <=
        (w.toDouble / h) / math.min(tw, th) + 1e-9, s"($w,$h)->($tw,$th)")
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

  test("dHash64: monotone gradients pin every bit; structure not content noise") {
    // hand-built 9×8 24-bpp payload, no builder involved: pixel (x,y)
    // bytes all = x*10 → gray strictly increasing in x → all 64 bits set
    def rawBmp(f: (Int, Int) => Int): Array[Byte] = {
      val w = 9; val h = 8; val row = ((w * 3 + 3) / 4) * 4
      val c = new Array[Byte](54 + row * h)
      for (y <- 0 until h; x <- 0 until w; k <- 0 until 3)
        c(54 + y * row + x * 3 + k) = f(x, y).toByte
      c
    }
    val inc = Multimodal.dHash64(rawBmp((x, _) => x * 10), 54, 9, 8)
    assert(inc == (0xffffffffL, 0xffffffffL))
    val dec = Multimodal.dHash64(rawBmp((x, _) => 90 - x * 10), 54, 9, 8)
    assert(dec == (0L, 0L))
    // flat image → no bit set (strict >)
    assert(Multimodal.dHash64(rawBmp((_, _) => 42), 54, 9, 8) == (0L, 0L))
    // halves are unsigned 32-bit
    assert(inc._1 >= 0 && inc._1 <= 0xffffffffL && inc._2 >= 0)
  }

  test("perceptual hash: one row per ok image, halves unsigned-32, rerun-identical") {
    val ph = Multimodal.perceptualHash(spark, sf)
    val okN = Multimodal.mediaMeta(spark, sf).count()
    assert(ph.count() == okN)
    assert(ph.filter(col("phash_hi") < 0 || col("phash_hi") > 0xffffffffL ||
      col("phash_lo") < 0 || col("phash_lo") > 0xffffffffL).isEmpty)
    val again = Multimodal.perceptualHash(spark, sf)
    assert(ph.exceptAll(again).isEmpty && again.exceptAll(ph).isEmpty)
  }

  test("image near-dup: banded join equals brute-force all-pairs at hamming <= 3") {
    val banded = Multimodal.imageNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // Spark-side brute force (independent of the band path)
    val ph = Multimodal.perceptualHash(spark, sf)
    val a = ph.select(col("doc_id").as("a"), col("phash_hi").as("ha"), col("phash_lo").as("la"))
    val b = ph.select(col("doc_id").as("b"), col("phash_hi").as("hb"), col("phash_lo").as("lb"))
    val brute = a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        (expr("bit_count(ha ^ hb)") + expr("bit_count(la ^ lb)")).cast("long").as("d"))
      .filter(col("d") <= 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute, "4×16-bit banding must be lossless at hamming <= 3")
    banded.foreach { case (x, y, d) => assert(x < y && d >= 0 && d <= 3) }
  }

  test("video container: build/parse round-trip, frame accounting, corruption quarantine") {
    val text = "sphinx of black quartz judge my vow".getBytes("UTF-8")
    val n = text.length
    val ok = Multimodal.buildVideo(1L, text)
    val m = Multimodal.parseVideo(1L, ok)
    assert(m.status == "ok")
    assert(m.n_frames == 1 + n % 3)
    assert(m.width == 1 + n % 64 && m.height == 1 + (n * 7) % 48)
    assert(m.byte_len == ok.length.toLong)
    // wrong magic, truncation, and a damaged inner frame all quarantine
    val xm = ok.clone(); xm(0) = 'X'.toByte
    assert(Multimodal.parseVideo(1L, xm).status == "bad_magic")
    assert(Multimodal.parseVideo(1L,
      java.util.Arrays.copyOf(ok, ok.length - 5)).status == "truncated")
    val fb = ok.clone(); fb(8 + 4) = 'X'.toByte // first frame's 'B'
    assert(Multimodal.parseVideo(1L, fb).status == "frame_bad_magic")
    assert(Multimodal.parseVideo(1L, Array[Byte](1, 2)).status == "too_short")
  }

  test("video frame 0 phash equals the single-image phash (zero rotation)") {
    val vf = Multimodal.videoFramePHash(spark, sf)
      .filter(col("frame_idx") === 0L)
      .select("doc_id", "phash_hi", "phash_lo")
    val img = Multimodal.perceptualHash(spark, sf)
    assert(vf.exceptAll(img).isEmpty && img.exceptAll(vf).isEmpty,
      "frame 0 is the unrotated payload, so its dHash must equal the image dHash")
    // consecutive frames are near-identical by construction: every
    // multi-frame video's adjacent frames sit within a small hamming
    val counts = Multimodal.videoFramePHash(spark, sf)
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(counts > 0, "fixture should contain multi-frame videos")
  }

  test("audio fingerprint: matches an independent recompute; banded near-dup equals brute force") {
    val rows = Multimodal.audioFingerprint(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    rows.foreach { case (id, hi, lo) =>
      val t = texts(id); val n = t.length; val ns = 1 + n % 1000
      val segs = new Array[Long](65)
      (0L until ns).foreach { i =>
        val l = t(((i * 2) % n).toInt) & 0xffL
        val h = t(((i * 2 + 1) % n).toInt).toLong
        segs(((i * 65) / ns).toInt) += math.abs((h << 8) | l)
      }
      var ehi = 0L; var elo = 0L
      (0 until 64).foreach { j =>
        if (segs(j + 1) > segs(j)) {
          if (j < 32) elo |= 1L << j else ehi |= 1L << (j - 32)
        }
      }
      assert((hi, lo) == (ehi, elo), s"doc $id fingerprint mismatch")
    }
    // banded near-dup equals brute force at hamming <= 3
    val banded = Multimodal.audioNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (a, ha, la) <- rows; (b, hb, lb) <- rows if a < b
      d = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(banded == brute, "audio banding must be lossless at hamming <= 3")
  }

  test("audio stats: exact Long sum-of-squares matches an independent per-doc recompute") {
    val rows = Multimodal.audioStats(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    rows.foreach { case (id, ns, rms, sil, peak) =>
      val t = texts(id); val n = t.length
      assert(ns == 1 + n % 1000)
      // independent recompute straight from the cycled-text payload rule
      val samples = (0L until ns).map { i =>
        val lo = t(((i * 2) % n).toInt) & 0xffL
        val hi = t(((i * 2 + 1) % n).toInt).toLong
        (hi << 8) | lo
      }
      val expRms = BigDecimal(math.sqrt(samples.map(s => s * s).sum.toDouble / ns))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rms == expRms, s"doc $id rms")
      assert(peak == samples.map(math.abs).max, s"doc $id peak")
      val expSil = BigDecimal(samples.count(s => math.abs(s) < 256).toDouble / ns)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(sil == expSil, s"doc $id silence")
    }
  }
}
