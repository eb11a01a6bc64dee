package graft

import org.apache.spark.sql.functions.{asc, col, desc, explode, split}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** X4 repetition scoring: the Spark result must equal a direct Scala
  * recomputation per document (same n-gram windows, same rounding). */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("doc log-prob: one row per doc, mean_logprob negative, matches direct recomputation") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val allTokens = docs.values.toSeq.flatMap(_.split(" ", -1))
    val freq = allTokens.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val total = allTokens.size.toLong
    val rows = TextAnalysis.docLogProb(spark, sf).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val toks = docs(r.getLong(0)).split(" ", -1).toSeq
      assert(r.getLong(1) == toks.size)
      val want = toks.map { t =>
        BigDecimal(math.log(freq(t).toDouble / total))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble / toks.size
      val wantRounded = BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(2) - wantRounded) < 1e-9, s"doc ${r.getLong(0)}")
      assert(r.getDouble(2) < 0.0)
    }
  }

  test("repetition score matches a direct recomputation and flags by threshold") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(text: String, k: Int): Seq[String] = {
      val toks = text.split(" ", -1).toSeq
      if (toks.length >= k) toks.sliding(k).map(_.mkString(" ")).toSeq else Seq.empty
    }
    def ratio(text: String, k: Int): Double = {
      val g = grams(text, k)
      if (g.isEmpty) 0.0
      else BigDecimal((g.size - g.distinct.size).toDouble / g.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val rows = TextAnalysis.repetitionScore(spark, sf).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val text = docs(r.getLong(0))
      assert(r.getInt(1) == grams(text, 2).size)
      assert(math.abs(r.getDouble(2) - ratio(text, 2)) < 1e-9)
      assert(r.getInt(3) == grams(text, 3).size)
      assert(math.abs(r.getDouble(4) - ratio(text, 3)) < 1e-9)
      assert(r.getBoolean(5) == (r.getDouble(4) > 0.2))
    }
  }

  test("bm25 matches a direct recomputation over the corpus") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size.toLong).sum.toDouble / n
    val k1 = 1.25; val b = 0.75
    val rows = TextAnalysis.bm25(spark, sf).collect()
    // every (doc, term) hit appears exactly once
    assert(rows.map(r => (r.getLong(0), r.getString(1))).distinct.length == rows.length)
    val hits = (for {
      (id, toks) <- docs.toSeq
      t <- TextAnalysis.Bm25Terms if toks.contains(t)
    } yield (id, t)).toSet
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSet == hits)
    val dfMap = hits.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    rows.foreach { r =>
      val (id, term, tf) = (r.getLong(0), r.getString(1), r.getLong(2).toDouble)
      val toks = docs(id)
      assert(tf == toks.count(_ == term))
      assert(r.getLong(3) == dfMap(term).toLong)
      val df = dfMap(term)
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
      val want = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * toks.size / avgdl))
      assert(math.abs(r.getDouble(4) - want) < 1e-6, s"doc $id term $term")
      assert(r.getDouble(4) > 0)
    }
  }

  test("bigram LM: log-probs respect the interpolation floor and track unigram closely") {
    val bi = TextAnalysis.bigramLogProb(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val uni = TextAnalysis.docLogProb(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // every doc with >= 2 tokens scores; log-probs are strictly negative
    assert(bi.nonEmpty)
    bi.values.foreach { case (n, lp) => assert(n >= 1 && lp < 0) }
    // interpolation floor: P >= (1-lambda) * min unigram prob, so no doc
    // mean can fall below ln of that floor — the no-log-0 guarantee the
    // Jelinek-Mercer mixture exists to provide
    val toks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ", -1)).as("t")).collect().map(_.getString(0))
    val counts = toks.groupBy(identity).view.mapValues(_.length).toMap
    val floor = math.log(0.25 * counts.values.min.toDouble / toks.length)
    bi.values.foreach { case (_, lp) => assert(lp >= floor, s"$lp under floor $floor") }
    // on this MEMORYLESS synthetic corpus (tokens ~ iid from a small
    // vocabulary) bigram context carries no information, so the two
    // models' corpus means must be close — the bigram estimate is just a
    // noisier unigram (it is slightly WORSE by Jensen, not better)
    val meanBi = bi.values.map(_._2).sum / bi.size
    val meanUni = bi.keys.map(uni).sum / bi.size
    assert(math.abs(meanBi - meanUni) < 0.2,
      s"bigram mean $meanBi should track unigram mean $meanUni on iid text")
  }

  test("cms heavy hitters: verdicts all true, probed set equals exact top-5") {
    val rows = TextAnalysis.cmsTokenCounts(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length == 5)
    assert(rows.forall(_._3), "a CMS estimate fell outside its guarantee")
    val want = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ", -1)).as("t"))
      .groupBy("t").count().orderBy(desc("count"), asc("t")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows.map(r => (r._1, r._2)).toSet == want)
  }

  test("source quality: sources partition the corpus, keep rates agree with docQuality") {
    val sq = TextAnalysis.sourceQuality(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(4), r.getBoolean(5))).toMap
    val total = Tables.documents(spark, sf).count()
    assert(sq.values.map(_._1).sum == total, "per-source doc counts partition the corpus")
    sq.values.foreach { case (_, kr, blocked) =>
      assert(kr >= 0 && kr <= 1)
      assert(blocked == (kr < 0.5))
    }
    // corpus-wide keep count re-derives from docQuality's verdicts
    val keepTotal = TextAnalysis.docQuality(spark, sf)
      .filter(org.apache.spark.sql.functions.col("keep")).count()
    val fromSources = sq.values.map { case (n, kr, _) => math.round(kr * n) }.sum
    assert(fromSources == keepTotal,
      s"source keep rates re-add to $fromSources, docQuality says $keepTotal")
  }
}
