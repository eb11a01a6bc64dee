package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.UnicodeNormalize

/** The custom NFC-normalization expression: Unicode-standard composition
  * semantics (combining marks, Hangul jamo), the no-alloc fast path,
  * idempotence, and the registered SQL surface through codegen. All
  * non-ASCII is spelled as \\uXXXX escapes: an invisible combining
  * character in source is exactly the bug class this operator exists to
  * kill. */
class UnicodeNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Acute = "\u0301"   // combining acute accent
  private val EAcute = "\u00e9"  // precomposed e-acute
  // conjoining jamo vs precomposed syllables
  private val JamoGa = "\u1100\u1161"         // KIYEOK + A
  private val SylGa = "\uac00"                 // GA
  private val JamoHan = "\u1112\u1161\u11ab" // HIEUH + A + final NIEUN
  private val SylHan = "\ud55c"                // HAN

  private def nfc(s: String): String =
    UnicodeNormalize.nfc(UTF8String.fromString(s)).toString

  test("combining marks compose to precomposed forms") {
    assert(nfc("e" + Acute) == EAcute)
    assert(nfc("cafe" + Acute) == "caf" + EAcute)
    assert(nfc("e" + Acute).length == 1)
  }

  test("conjoining Hangul jamo compose to syllables (the reference script)") {
    assert(JamoGa.length == 2 && SylGa.length == 1) // really distinct inputs
    assert(nfc(JamoGa) == SylGa)
    assert(nfc(JamoHan) == SylHan)
  }

  test("already-normalized input returns the SAME UTF8String (no allocation)") {
    val in = UTF8String.fromString("plain ascii and " + SylHan + SylGa + " caf" + EAcute)
    assert(UnicodeNormalize.nfc(in) eq in)
  }

  test("idempotent: nfc(nfc(s)) == nfc(s)") {
    val cases = Seq("e" + Acute, JamoGa, "mixed e" + Acute + " and " + JamoHan, "")
    cases.foreach(s => assert(nfc(nfc(s)) == nfc(s)))
  }

  test("registered SQL surface composes under codegen") {
    import spark.implicits._
    val out = Seq("e" + Acute, JamoGa, "plain").toDF("s")
      .selectExpr("nfc_normalize(s) AS n", "length(nfc_normalize(s)) AS len")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(out.toSeq == Seq((EAcute, 1), (SylGa, 1), ("plain", 5)))
  }
}
