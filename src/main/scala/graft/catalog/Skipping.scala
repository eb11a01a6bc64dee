package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.Path

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Commit-time collection of per-file [[FileStats]] from parquet FOOTERS —
  * the metadata half of manifest-based data skipping ([[SkipEval]] is the
  * planning half). Reading a footer touches a few KB at the file tail, no
  * data pages, so the commit-time cost is ∝ files-in-commit: the same
  * budget Iceberg spends writing manifest entries, and the reason this
  * scales to 100 TB tables (stats for a commit's files are collected once
  * when the commit is small, never by rescanning the table).
  *
  * Encoding: one canonical string per (column, bound) decoded against the
  * TABLE schema at prune time — integral/date/timestamp as `Long.toString`
  * (days / micros), float/double as `Double.toString`, strings raw,
  * booleans `"true"/"false"`. A column is dropped from the maps the moment
  * any row group lacks a usable bound for it (absent stats never prune —
  * the conservative direction). Timestamp bounds are kept only when the
  * parquet logical annotation says MICROS — the unit Catalyst literals
  * compare in ([[graft.Sessions]] pins `outputTimestampType=
  * TIMESTAMP_MICROS`); MILLIS/NANOS/INT96 columns never produce bounds.
  */
private[graft] object FooterStats {

  /** A staged file lost its parquet field ids under an id-stamped table
    * schema — the commit must refuse (field-id reads would silently
    * null-fill), so this one escapes `collect`'s per-file swallow. */
  final class MissingFieldIds(msg: String) extends RuntimeException(msg)

  /** Collect stats for `files` (absolute paths) of a table rooted at
    * `tableDir`, keyed by path RELATIVE to the table dir (the manifest's
    * file key). Files that fail to parse yield no entry (never prune).
    * With `requireIdsAs = Some(tableName)` each footer is ALSO checked
    * for parquet field ids on every top-level column while it is in
    * hand (the commit-time net under column rename/drop — see FieldIds);
    * a missing id fails the whole collect, never silently. */
  def collect(tableDir: Path, files: Seq[Path], schema: StructType,
              conf: Configuration,
              requireIdsAs: Option[String] = None): Map[String, FileStats] =
    files.flatMap { f =>
      try Some(tableDir.relativize(f).toString -> collectOne(f, schema, conf, requireIdsAs))
      catch {
        case e: MissingFieldIds => throw e
        case _: Exception => None
      }
    }.toMap

  private def collectOne(file: Path, schema: StructType, conf: Configuration,
                         requireIdsAs: Option[String] = None): FileStats = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file.toUri), conf))
    try {
      requireIdsAs.foreach { tableName =>
        val missing = reader.getFooter.getFileMetaData.getSchema.getFields.asScala
          .filter(_.getId == null).map(_.getName)
        if (missing.nonEmpty) throw new MissingFieldIds(
          s"$tableName: staged file $file lacks parquet field ids on " +
            s"${missing.mkString(", ")} — a write path dropped the id metadata; " +
            "refusing the commit (field-id reads would silently null-fill)")
      }
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      // Per top-level column, classify each row group's statistics into
      // one of three states and fold across groups:
      //   Some(Some(bound)) — a usable (min, max);
      //   Some(None)        — PROVABLY all-null (numNulls == rowCount):
      //                       contributes no bound, poisons nothing;
      //   None              — POISON: stats absent or unusable for a
      //                       group that may hold values (parquet-mr also
      //                       omits min/max when binary values exceed its
      //                       ~4 KB stats size limit, so hasNonNullValue
      //                       == false does NOT mean all-null — ADVICE
      //                       r12), or a type/unit mismatch. One poisoned
      //                       group drops the column's bounds for the
      //                       whole file (the conservative direction).
      var mins = Map.empty[String, String]
      var maxs = Map.empty[String, String]
      var nulls = Map.empty[String, Long]
      schema.fields.foreach { field =>
        val chunksPerBlock = blocks.map(b => (b.getRowCount, b.getColumns.asScala.find { c =>
          val p = c.getPath.toArray
          p.length == 1 && p(0).equalsIgnoreCase(field.name)
        }))
        if (chunksPerBlock.forall(_._2.isDefined)) {
          val chunks = chunksPerBlock.map { case (rc, c) => (rc, c.get) }
          val stats = chunks.map(_._2.getStatistics)
          // null counts: sum if every row group knows its count
          nulls += FieldIds.statKey(field) -> (
            if (stats.forall(s => s != null && s.isNumNullsSet))
              stats.map(_.getNumNulls).sum
            else -1L)
          val perGroup: Seq[Option[Option[(String, String)]]] =
            chunks.map { case (rowCount, chunk) =>
              val s = chunk.getStatistics
              if (s == null) None
              else if (s.hasNonNullValue) {
                if (s.isEmpty) None
                else encode(field.dataType, chunk.getPrimitiveType,
                  s.genericGetMin.asInstanceOf[AnyRef],
                  s.genericGetMax.asInstanceOf[AnyRef]) match {
                  case Some(b) => Some(Some(b))
                  case None => None
                }
              }
              else if (s.isNumNullsSet && s.getNumNulls == rowCount) Some(None)
              else None
            }
          if (perGroup.forall(_.isDefined)) {
            val bounds = perGroup.flatten.flatten
            if (bounds.nonEmpty) {
              val los = bounds.map(_._1)
              val his = bounds.map(_._2)
              (minOf(field.dataType, los), maxOf(field.dataType, his)) match {
                case (Some(lo), Some(hi)) =>
                  mins += FieldIds.statKey(field) -> lo
                  maxs += FieldIds.statKey(field) -> hi
                case _ => ()
              }
            }
          }
        }
      }
      FileStats(rows, mins, maxs, nulls)
    } finally reader.close()
  }

  /** Canonical string encodings for (min, max); None = unusable. The
    * parquet [[org.apache.parquet.schema.PrimitiveType]] is consulted for
    * TIMESTAMP columns: Catalyst predicate literals are MICROSECONDS, so
    * footer stats in any other physical unit (MILLIS under
    * `outputTimestampType=TIMESTAMP_MILLIS`, NANOS, or annotation-less
    * INT96) must produce NO bound — a unit mismatch would shrink the
    * bounds ~1000x and prune files that contain matches (ADVICE r12). */
  private def encode(dt: DataType, primType: org.apache.parquet.schema.PrimitiveType,
                     mn: AnyRef, mx: AnyRef): Option[(String, String)] = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    (dt, mn, mx) match {
      case (TimestampType | TimestampNTZType, a: Number, b: Number) =>
        primType.getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
            if t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS =>
            Some((a.longValue.toString, b.longValue.toString))
          case _ => None
        }
      case (ByteType | ShortType | IntegerType | LongType | DateType, a: Number, b: Number) =>
        Some((a.longValue.toString, b.longValue.toString))
      case (FloatType | DoubleType, a: Number, b: Number) =>
        val (lo, hi) = (a.doubleValue, b.doubleValue)
        if (lo.isNaN || hi.isNaN) None else Some((lo.toString, hi.toString))
      case (StringType, a: org.apache.parquet.io.api.Binary, b: org.apache.parquet.io.api.Binary) =>
        Some((a.toStringUsingUTF8, b.toStringUsingUTF8))
      case (BooleanType, a: java.lang.Boolean, b: java.lang.Boolean) =>
        Some((a.toString, b.toString))
      case _ => None
    }
  }

  private def minOf(dt: DataType, vs: Seq[String]): Option[String] =
    SkipEval.domainOrdering(dt).map(ord => vs.minBy(s => SkipEval.decode(dt, s))(ord))
  private def maxOf(dt: DataType, vs: Seq[String]): Option[String] =
    SkipEval.domainOrdering(dt).map(ord => vs.maxBy(s => SkipEval.decode(dt, s))(ord))
}

/** The planning half of manifest data skipping: decide, per file, whether
  * its [[FileStats]] ADMIT a possible match for a pushed predicate. The
  * contract is strictly conservative — `mightMatch` may say `true` for a
  * file with no matching rows (wasted IO), never `false` for a file with
  * one (lost rows). Anything unrecognized — casts, UDFs, nested columns,
  * types without bounds — therefore evaluates to `true`.
  *
  * Supported shapes: `=`, `<`, `<=`, `>`, `>=` between a top-level
  * attribute and a literal (either side), `IN`, `IS NULL` / `IS NOT
  * NULL`, and `AND` / `OR` recursion. String comparison is UNSIGNED
  * UTF-8 BYTE order on both sides — the order parquet binary stats are
  * computed in AND the order Spark's `UTF8String.compareTo` sorts in, so
  * the three orderings (stats, predicate semantics, pruning) can never
  * disagree. The DuckDB-checked q_sql_skipping query plus CatalogSpec's
  * lossless assertion pin the conservative contract end-to-end.
  */
private[graft] object SkipEval {

  /** The comparison domain a column's bounds decode into. */
  sealed trait Dom extends Any
  private final case class LongD(v: Long) extends Dom
  private final case class DoubleD(v: Double) extends Dom
  private final case class BytesD(v: Array[Byte]) extends Dom

  private[catalog] def decode(dt: DataType, s: String): Dom = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType => LongD(s.toLong)
    case FloatType | DoubleType => DoubleD(s.toDouble)
    case StringType => BytesD(s.getBytes(StandardCharsets.UTF_8))
    case BooleanType => LongD(if (s.toBoolean) 1L else 0L)
    case other => throw new IllegalArgumentException(s"no skip domain for $other")
  }

  private[catalog] def domainOrdering(dt: DataType): Option[Ordering[Dom]] = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | FloatType | DoubleType |
         StringType | BooleanType => Some(domOrdering)
    case _ => None
  }

  /** unsigned lexicographic — parquet's binary order and UTF8String's */
  private def compareBytes(x: Array[Byte], y: Array[Byte]): Int = {
    var i = 0
    val n = math.min(x.length, y.length)
    var c = 0
    while (i < n && c == 0) {
      c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      i += 1
    }
    if (c != 0) c else java.lang.Integer.compare(x.length, y.length)
  }

  private val domOrdering: Ordering[Dom] = (a: Dom, b: Dom) => (a, b) match {
    case (LongD(x), LongD(y)) => java.lang.Long.compare(x, y)
    case (DoubleD(x), DoubleD(y)) => java.lang.Double.compare(x, y)
    case (BytesD(x), BytesD(y)) => compareBytes(x, y)
    case _ => throw new IllegalArgumentException(s"mixed skip domains: $a vs $b")
  }

  /** Literal runtime value → comparison domain (None = can't compare →
    * caller keeps the file). */
  private def literalDom(dt: DataType, value: Any): Option[Dom] = (dt, value) match {
    case (_, null) => None
    case (ByteType | ShortType | IntegerType | LongType | DateType |
          TimestampType | TimestampNTZType, n: Number) => Some(LongD(n.longValue))
    case (FloatType, f: java.lang.Float) =>
      if (f.isNaN) None else Some(DoubleD(f.doubleValue))
    case (DoubleType, d: java.lang.Double) =>
      if (d.isNaN) None else Some(DoubleD(d.doubleValue))
    case (StringType, s: UTF8String) => Some(BytesD(s.getBytes))
    case (BooleanType, b: java.lang.Boolean) => Some(LongD(if (b) 1L else 0L))
    case _ => None
  }

  /** Keep exactly the files whose stats admit a match for EVERY pushed
    * conjunct. Files without stats are always kept. */
  def prune(schema: StructType, files: Seq[String], stats: Map[String, FileStats],
            filters: Seq[Expression]): Seq[String] =
    if (filters.isEmpty) files
    else files.filter { f =>
      stats.get(f) match {
        case Some(st) => filters.forall(mightMatch(schema, st, _))
        case None => true
      }
    }

  def mightMatch(schema: StructType, st: FileStats, pred: Expression): Boolean = {
    // a zero-row file matches nothing, whatever the predicate
    if (st.rows == 0) return false

    def field(a: AttributeReference): Option[StructField] =
      schema.fields.find(_.name.equalsIgnoreCase(a.name))

    def colBounds(f: StructField): Option[(Dom, Dom)] =
      for { lo <- st.mins.get(FieldIds.statKey(f)); hi <- st.maxs.get(FieldIds.statKey(f)) }
        yield (decode(f.dataType, lo), decode(f.dataType, hi))

    def allNull(f: StructField): Boolean =
      st.nullCounts.get(FieldIds.statKey(f)).contains(st.rows)

    /** A comparison predicate on `a` vs literal `lit`: null comparisons
      * never match, so an all-null column prunes outright; otherwise test
      * the bound. */
    def cmp(a: AttributeReference, lit: Literal)(test: (Dom, Dom, Dom) => Boolean): Boolean =
      field(a) match {
        case Some(f) if allNull(f) => false
        case Some(f) =>
          (colBounds(f), literalDom(lit.dataType, lit.value)) match {
            case (Some((lo, hi)), Some(v)) => test(lo, hi, v)
            case _ => true
          }
        case None => true
      }

    def ge(x: Dom, y: Dom) = domOrdering.compare(x, y) >= 0
    def gt(x: Dom, y: Dom) = domOrdering.compare(x, y) > 0

    pred match {
      case And(l, r) => mightMatch(schema, st, l) && mightMatch(schema, st, r)
      case Or(l, r) => mightMatch(schema, st, l) || mightMatch(schema, st, r)
      case Not(IsNull(a: AttributeReference)) => mightMatch(schema, st, IsNotNull(a))
      case Not(IsNotNull(a: AttributeReference)) => mightMatch(schema, st, IsNull(a))
      case EqualTo(a: AttributeReference, l: Literal) =>
        cmp(a, l)((lo, hi, v) => ge(v, lo) && ge(hi, v))
      case EqualTo(l: Literal, a: AttributeReference) =>
        cmp(a, l)((lo, hi, v) => ge(v, lo) && ge(hi, v))
      case GreaterThan(a: AttributeReference, l: Literal) =>
        cmp(a, l)((_, hi, v) => gt(hi, v))
      case GreaterThan(l: Literal, a: AttributeReference) => // lit > col  ⇔  col < lit
        cmp(a, l)((lo, _, v) => gt(v, lo))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        cmp(a, l)((_, hi, v) => ge(hi, v))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        cmp(a, l)((lo, _, v) => ge(v, lo))
      case LessThan(a: AttributeReference, l: Literal) =>
        cmp(a, l)((lo, _, v) => gt(v, lo))
      case LessThan(l: Literal, a: AttributeReference) =>
        cmp(a, l)((_, hi, v) => gt(hi, v))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        cmp(a, l)((lo, _, v) => ge(v, lo))
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        cmp(a, l)((_, hi, v) => ge(hi, v))
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists(v => mightMatch(schema, st, EqualTo(a, v.asInstanceOf[Literal])))
      case InSet(a: AttributeReference, vs) =>
        // InSet holds INTERNAL values (UTF8String etc.) — wrap them
        // as-is, not via Literal.create's external-value conversion
        vs.exists(v => mightMatch(schema, st, EqualTo(a, Literal(v, a.dataType))))
      case IsNull(a: AttributeReference) =>
        field(a).forall(f => !st.nullCounts.get(FieldIds.statKey(f)).contains(0L))
      case IsNotNull(a: AttributeReference) =>
        field(a).forall(f => !allNull(f))
      case Literal(v, BooleanType) => v == true
      case _ => true
    }
  }

  /** The DUAL of [[mightMatch]], for METADATA-ONLY operations: does every
    * row of the file PROVABLY satisfy `pred`? The conservative direction
    * flips — `mustMatchAll` may say `false` for a file whose rows all
    * match (the verb falls back to a copy-on-write rewrite: slower, never
    * wrong), but `true` only on proof, because a `true` lets DELETE drop
    * the whole file from the manifest without reading it. Proof needs
    * three ingredients [[mightMatch]] doesn't: a KNOWN null count (a
    * comparison is never satisfied by a null row, so `nulls == 0` is part
    * of every `cmp` proof and `nulls == rows` IS the `IS NULL` proof),
    * usable bounds, and a bound test that covers the whole [lo, hi]
    * interval rather than intersecting it. `Or` is proved by either arm
    * covering every row (sufficient, not necessary — conservative).
    * A zero-row file vacuously satisfies anything. */
  def mustMatchAll(schema: StructType, st: FileStats, pred: Expression): Boolean = {
    if (st.rows == 0) return true

    def field(a: AttributeReference): Option[StructField] =
      schema.fields.find(_.name.equalsIgnoreCase(a.name))

    def colBounds(f: StructField): Option[(Dom, Dom)] =
      for { lo <- st.mins.get(FieldIds.statKey(f)); hi <- st.maxs.get(FieldIds.statKey(f)) }
        yield (decode(f.dataType, lo), decode(f.dataType, hi))

    def nullsOf(f: StructField): Option[Long] =
      st.nullCounts.get(FieldIds.statKey(f)).filter(_ >= 0L)

    /** Comparison proof: zero nulls AND the bound test holds over the
      * whole interval. Unknown anything → false. */
    def cmp(a: AttributeReference, lit: Literal)(test: (Dom, Dom, Dom) => Boolean): Boolean =
      field(a).exists { f =>
        nullsOf(f).contains(0L) &&
          ((colBounds(f), literalDom(lit.dataType, lit.value)) match {
            case (Some((lo, hi)), Some(v)) => test(lo, hi, v)
            case _ => false
          })
      }

    def ge(x: Dom, y: Dom) = domOrdering.compare(x, y) >= 0
    def gt(x: Dom, y: Dom) = domOrdering.compare(x, y) > 0
    def eq(x: Dom, y: Dom) = domOrdering.compare(x, y) == 0

    pred match {
      case And(l, r) => mustMatchAll(schema, st, l) && mustMatchAll(schema, st, r)
      case Or(l, r) => mustMatchAll(schema, st, l) || mustMatchAll(schema, st, r)
      case EqualTo(a: AttributeReference, l: Literal) =>
        cmp(a, l)((lo, hi, v) => eq(lo, v) && eq(hi, v))
      case EqualTo(l: Literal, a: AttributeReference) =>
        cmp(a, l)((lo, hi, v) => eq(lo, v) && eq(hi, v))
      case GreaterThan(a: AttributeReference, l: Literal) =>
        cmp(a, l)((lo, _, v) => gt(lo, v))
      case GreaterThan(l: Literal, a: AttributeReference) => // lit > col ⇔ col < lit
        cmp(a, l)((_, hi, v) => gt(v, hi))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        cmp(a, l)((lo, _, v) => ge(lo, v))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        cmp(a, l)((_, hi, v) => ge(v, hi))
      case LessThan(a: AttributeReference, l: Literal) =>
        cmp(a, l)((_, hi, v) => gt(v, hi))
      case LessThan(l: Literal, a: AttributeReference) =>
        cmp(a, l)((lo, _, v) => gt(lo, v))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        cmp(a, l)((_, hi, v) => ge(v, hi))
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        cmp(a, l)((lo, _, v) => ge(lo, v))
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        // provable only when the file is single-valued on the column and
        // that value is one of the list's
        vs.exists(v => mustMatchAll(schema, st, EqualTo(a, v.asInstanceOf[Literal])))
      case InSet(a: AttributeReference, vs) =>
        vs.exists(v => mustMatchAll(schema, st, EqualTo(a, Literal(v, a.dataType))))
      case IsNull(a: AttributeReference) =>
        field(a).exists(f => nullsOf(f).contains(st.rows))
      case IsNotNull(a: AttributeReference) =>
        field(a).exists(f => nullsOf(f).contains(0L))
      case Not(IsNull(a: AttributeReference)) => mustMatchAll(schema, st, IsNotNull(a))
      case Not(IsNotNull(a: AttributeReference)) => mustMatchAll(schema, st, IsNull(a))
      case Literal(v, BooleanType) => v == true
      case _ => false
    }
  }
}

/** Translate connector (v2) [[org.apache.spark.sql.connector.expressions
  * .filter.Predicate]]s — what [[org.apache.spark.sql.connector.catalog
  * .SupportsDeleteV2]] hands `canDeleteWhere` — back into the catalyst
  * shapes [[SkipEval]] evaluates. Only the shapes SkipEval understands
  * are translated (=, <, <=, >, >=, IN, IS_NULL, IS_NOT_NULL, NOT of
  * those, AND/OR, ALWAYS_TRUE/FALSE between a column and a literal);
  * anything else — nested fields, arithmetic like `doc_id % 7`, casts,
  * functions — yields None and the caller must refuse the metadata path
  * (the verb then runs as an ordinary copy-on-write rewrite). */
private[graft] object V2Preds {
  import org.apache.spark.sql.connector.expressions.{Expression => VExpr, Literal => VLit, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.{And => VAnd, Not => VNot, Or => VOr, Predicate => VPred}

  def toCatalyst(p: VPred, schema: StructType): Option[Expression] = {
    def ref(e: VExpr): Option[AttributeReference] = e match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        schema.fields.find(_.name.equalsIgnoreCase(r.fieldNames()(0)))
          .map(f => AttributeReference(f.name, f.dataType, f.nullable)())
      case _ => None
    }
    def lit(e: VExpr): Option[Literal] = e match {
      case l: VLit[_] => Some(Literal(l.value, l.dataType))
      case _ => None
    }
    def bin(mk: (Expression, Expression) => Expression,
            flip: (Expression, Expression) => Expression): Option[Expression] = {
      val Array(l, r) = p.children()
      (ref(l), lit(r), lit(l), ref(r)) match {
        case (Some(a), Some(v), _, _) => Some(mk(a, v))
        case (_, _, Some(v), Some(a)) => Some(flip(v, a))
        case _ => None
      }
    }
    p match {
      case a: VAnd =>
        for { l <- toCatalyst(a.left(), schema); r <- toCatalyst(a.right(), schema) }
          yield And(l, r)
      case o: VOr =>
        for { l <- toCatalyst(o.left(), schema); r <- toCatalyst(o.right(), schema) }
          yield Or(l, r)
      case n: VNot => toCatalyst(n.child(), schema).map(Not)
      case _ => p.name() match {
        case "ALWAYS_TRUE" => Some(Literal.TrueLiteral)
        case "ALWAYS_FALSE" => Some(Literal.FalseLiteral)
        case "=" if p.children().length == 2 => bin(EqualTo, EqualTo)
        case "<" if p.children().length == 2 => bin(LessThan, LessThan)
        case "<=" if p.children().length == 2 => bin(LessThanOrEqual, LessThanOrEqual)
        case ">" if p.children().length == 2 => bin(GreaterThan, GreaterThan)
        case ">=" if p.children().length == 2 => bin(GreaterThanOrEqual, GreaterThanOrEqual)
        case "IS_NULL" if p.children().length == 1 =>
          ref(p.children()(0)).map(IsNull)
        case "IS_NOT_NULL" if p.children().length == 1 =>
          ref(p.children()(0)).map(IsNotNull)
        case "IN" if p.children().nonEmpty =>
          ref(p.children()(0)).flatMap { a =>
            val vs = p.children().tail.toSeq.map(lit)
            if (vs.forall(_.isDefined)) Some(In(a, vs.map(_.get))) else None
          }
        case _ => None
      }
    }
  }
}

/** Observability hook: the last (kept, total) file-skipping decision per
  * table, recorded by the scan builder at filter-pushdown time — what the
  * spec's end-to-end assertion and a deployer's sanity check read, instead
  * of re-deriving the plan. */
object SkipRecorder {
  private val last = new java.util.concurrent.ConcurrentHashMap[String, (Int, Int)]()
  def record(table: String, kept: Int, total: Int): Unit = last.put(table, (kept, total))
  def lastFor(table: String): Option[(Int, Int)] = Option(last.get(table))
  def clear(table: String): Unit = last.remove(table)
}
