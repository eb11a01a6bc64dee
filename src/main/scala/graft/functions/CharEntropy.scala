package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-string character-entropy profile in ONE
  * fused pass — `struct(n_distinct_chars, n_chars, entropy_bits)` where
  * entropy is Shannon H = log₂n − (Σ c·log₂c)/n over codepoint counts.
  *
  * This is the codegen'd hot-path form of the quality signal
  * [[graft.operators.TextAnalysis.charEntropy]] serves: the higher-order
  * `aggregate` fold evaluates one interpreted lambda step per character
  * (~0.4 ms/doc measured); this expression is a single tight JVM loop over
  * the string plus a small open-address codepoint table, compiled into the
  * whole-stage-codegen pipeline (same StaticInvoke-style pattern as
  * [[ScriptClass]] — eval and codegen share one static method, so the two
  * paths cannot diverge). At 100 TB the quality pass touches every
  * document; constant-factor wins here are real cluster-hours.
  *
  * Iteration is by codepoint (surrogate-pair aware); counts use a
  * fixed-size open-addressing table that grows only for pathological
  * alphabets. Result for the empty string is (0, 0, null-entropy as 0·—):
  * the struct is (0L, 0L, Double.NaN) and callers filter n_chars > 0
  * (every corpus document is non-empty; the SQL formulation yields NULL
  * there, so the operator keeps the HOF semantics by guarding). */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = CharEntropy.schema
  override def prettyName: String = "char_entropy"

  protected override def nullSafeEval(input: Any): Any =
    CharEntropy.profile(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.profile($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  val name = "char_entropy"

  val schema: StructType = StructType(Seq(
    StructField("n_distinct_chars", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("entropy_bits", DoubleType, nullable = false)))

  private val Log2 = math.log(2.0)

  /** One pass: codepoint histogram via open addressing, then the closed
    * form. Called from both interpreted eval and generated code. */
  def profile(input: UTF8String): InternalRow = {
    val s = input.toString
    // open-addressing table sized for natural-text alphabets; doubles on
    // pathological inputs (capacity is always a power of two)
    var cap = 64
    var keys = new Array[Int](cap)   // codepoint + 1, 0 = empty
    var cnts = new Array[Int](cap)
    var distinct = 0
    var n = 0L
    // ONE hash for insert and rehash — mixed-then-masked; a divergent pair
    // would let linear probing miss an existing key and double-count it
    def slot(cp: Int, mask: Int): Int = {
      val x = cp * 0x9E3779B9
      (x ^ (x >>> 16)) & mask
    }
    def insert(cp: Int): Unit = {
      var idx = slot(cp, cap - 1)
      while (keys(idx) != 0 && keys(idx) != cp + 1) idx = (idx + 1) & (cap - 1)
      if (keys(idx) == 0) { keys(idx) = cp + 1; distinct += 1 }
      cnts(idx) += 1
    }
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      if (distinct * 2 >= cap) { // grow before load factor reaches 1/2
        val ok = keys; val oc = cnts; cap <<= 1
        keys = new Array[Int](cap); cnts = new Array[Int](cap); distinct = 0
        var j = 0
        while (j < ok.length) {
          if (ok(j) != 0) {
            val k = ok(j) - 1
            var idx = slot(k, cap - 1)
            while (keys(idx) != 0) idx = (idx + 1) & (cap - 1)
            keys(idx) = k + 1; cnts(idx) = oc(j); distinct += 1
          }
          j += 1
        }
      }
      insert(cp)
    }
    var sumCLogC = 0.0
    var j = 0
    while (j < cap) {
      val c = cnts(j)
      if (c > 0) sumCLogC += c * (math.log(c.toDouble) / Log2)
      j += 1
    }
    val h = if (n == 0) Double.NaN
            else math.log(n.toDouble) / Log2 - sumCLogC / n
    new GenericInternalRow(Array[Any](distinct.toLong, n, h))
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[CharEntropy].getName, name)

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, s"$name expects 1 argument")
    CharEntropy(children.head)
  }

  /** Idempotent per-session registration, for sessions not built through
    * [[graft.Sessions]] (whose extensions also inject it). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
