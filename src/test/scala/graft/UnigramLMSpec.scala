package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.UnigramLM

/** Unigram-LM tokenizer step: segmentation validity, DP optimality vs an
  * independent exhaustive search, and EM-step accounting identities. */
class UnigramLMSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val segRows = UnigramLM.viterbiSegment(spark, sf).collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))

  test("every segmentation reassembles its word; piece lengths bounded") {
    assert(segRows.nonEmpty)
    segRows.foreach { case (word, _, _, nPieces, seg) =>
      val pieces = if (seg.isEmpty) Array.empty[String] else seg.split(' ')
      assert(pieces.mkString("") == word, s"'$seg' does not reassemble '$word'")
      assert(pieces.length.toLong == nPieces)
      pieces.foreach(p => assert(p.nonEmpty && p.length <= UnigramLM.MaxPieceLen))
    }
  }

  test("DP score is optimal: an independent exhaustive search finds nothing better") {
    // rebuild the model exactly as the operator does, then brute-force
    // every segmentation of each word (pieces <= 4 chars) in plain Scala
    import org.apache.spark.sql.functions._
    val words = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ", -1)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wfreq"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val subFreq = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      for (l <- 1 to math.min(UnigramLM.MaxPieceLen, w.length); i <- 0 to w.length - l)
        subFreq.updateWith(w.substring(i, i + l))(v => Some(v.getOrElse(0L) + f))
    }
    val singles = subFreq.filter(_._1.length == 1)
    val multis = subFreq.filter { case (p, f) => p.length > 1 && f >= 2 }
      .toSeq.sortBy { case (p, f) => (-f, p) }.take(500)
    val vocab = (singles.toSeq ++ multis).toMap
    val total = vocab.values.sum
    val logp = vocab.map { case (p, f) =>
      p -> math.round(math.log(f.toDouble / total) * 1e6)
    }
    def allScores(w: String): Seq[Long] = {
      def rec(pos: Int): Seq[Long] =
        if (pos == w.length) Seq(0L)
        else (1 to math.min(UnigramLM.MaxPieceLen, w.length - pos)).flatMap { l =>
          logp.get(w.substring(pos, pos + l)).toSeq.flatMap(lp => rec(pos + l).map(_ + lp))
        }
      rec(0)
    }
    segRows.filter(_._1.nonEmpty).foreach { case (word, _, score, _, _) =>
      val best = allScores(word).max
      assert(score == best, s"'$word': DP=$score but exhaustive best=$best")
    }
  }

  test("EM step: shares sum to 1, uses conserve total word-weighted piece count") {
    val em = UnigramLM.emStep(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(em.nonEmpty)
    assert(math.abs(em.map(_._3).sum - 1.0) < 1e-3, "em shares must sum to ~1")
    val totalUses = em.map(_._2).sum
    val expected = segRows.map { case (_, wfreq, _, nPieces, _) => wfreq * nPieces }.sum
    assert(totalUses == expected, s"uses $totalUses != wfreq-weighted pieces $expected")
  }

  test("the model prefers multi-char pieces where they pay: some segmentation shorter than chars") {
    val shorter = segRows.count { case (word, _, _, nPieces, _) =>
      word.length > 1 && nPieces < word.length
    }
    assert(shorter > 0, "no word segmented into fewer pieces than characters — vocab unused")
  }
}
