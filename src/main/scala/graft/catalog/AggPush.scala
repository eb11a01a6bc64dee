package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** AGGREGATE PUSHDOWN from manifest stats (VERDICT r15 #1): answer
  * `COUNT(*)` / `COUNT(col)` / `MIN(col)` / `MAX(col)` on a catalog table
  * from the per-file footer stats the manifest already holds — one
  * in-memory fold over the kept file list instead of a table scan. At
  * 100 TB this is the difference between a data-quality check costing a
  * manifest read and costing a full pass (the reference's own D1 check is
  * exactly this shape: `SELECT COUNT(*) FROM korean`,
  * dag-knlp.py:252).
  *
  * The contract is COMPLETE pushdown or nothing: `fold` returns the
  * final one-row result only when every aggregate in the list is
  * provable from stats, else None and the scan plans normally. Spark's
  * V2ScanRelationPushDown only attempts aggregate pushdown when NO
  * post-scan Filter remains — and this catalog (like every file source)
  * keeps every pushed predicate post-scan — so a predicated aggregate
  * falls back to the ordinary skipping scan by construction.
  *
  * Provability rules (conservative — refuse, never guess):
  *  - COUNT(*): every kept file has a stats entry; the result is
  *    Σ rows − Σ deletion-vector tombstones (dv.rows is exact manifest
  *    accounting, so MOR tables stay eligible).
  *  - COUNT(col): additionally needs a KNOWN null count (≥ 0) for the
  *    column in every file, and NO deletion vectors anywhere in scope —
  *    a vector may tombstone null or non-null rows and the manifest
  *    cannot tell which.
  *  - MIN/MAX(col): no deletion vectors (a vector may delete the extreme
  *    row); every kept file with rows > 0 either carries usable bounds
  *    for the column or is PROVABLY all-null on it (nulls == rows — SQL
  *    MIN/MAX ignore nulls, so such a file contributes nothing); and the
  *    column's type is one whose canonical stat encoding round-trips
  *    EXACTLY. Float/Double are excluded outright: parquet footer
  *    min/max ignore NaN, while Spark orders NaN greatest — a folded
  *    MAX would silently disagree with the scan on any NaN-bearing file.
  *  - DISTINCT, SUM, AVG, UDAFs, GROUP BY: never folded (GROUP BY keys
  *    aren't enumerable from bounds; SUM isn't derivable from them).
  */
private[graft] object AggPush {

  /** Types whose canonical stat string decodes back to the EXACT value
    * (see FooterStats.encode): integral, date/timestamp (micros), string
    * (parquet-mr binary stats are exact when present), boolean. */
  private def exactType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | StringType | BooleanType => true
    case _ => false
  }

  private def internal(dt: DataType, s: String): Any = dt match {
    case ByteType => s.toLong.toByte
    case ShortType => s.toLong.toShort
    case IntegerType => s.toLong.toInt
    case LongType => s.toLong
    case DateType => s.toLong.toInt // days, stored as Long.toString
    case TimestampType | TimestampNTZType => s.toLong // micros
    case StringType => UTF8String.fromString(s)
    case BooleanType => s.toBoolean
    case other => throw new IllegalStateException(s"unfoldable type $other")
  }

  private def singleCol(e: org.apache.spark.sql.connector.expressions.Expression,
                        schema: StructType): Option[StructField] = e match {
    case r: NamedReference if r.fieldNames().length == 1 =>
      schema.fields.find(_.name.equalsIgnoreCase(r.fieldNames()(0)))
    case _ => None
  }

  /** Fold `agg` over the manifest entries of `files`, or None if any
    * part is not provable from stats (the caller falls back to the
    * scan). On success: (scan output schema, the single result row). */
  def fold(agg: Aggregation, schema: StructType, files: Seq[String],
           stats: Map[String, FileStats], dvs: Map[String, DvRef])
      : Option[(StructType, InternalRow)] = {
    if (agg.groupByExpressions().nonEmpty) return None
    if (agg.aggregateExpressions().isEmpty) return None
    if (!files.forall(stats.contains)) return None
    val st = files.map(stats)
    val dvRows = files.flatMap(dvs.get).map(_.rows).sum
    val noDvs = files.forall(f => !dvs.contains(f))

    val folded: Array[Option[(StructField, Any)]] =
      agg.aggregateExpressions().zipWithIndex.map {
        case (_: CountStar, i) =>
          Some((StructField(s"agg_$i", LongType, nullable = false),
            st.map(_.rows).sum - dvRows))
        case (c: Count, i) if !c.isDistinct && noDvs =>
          singleCol(c.column(), schema).flatMap { f =>
            val nulls = st.map(_.nullCounts.getOrElse(FieldIds.statKey(f), -1L))
            if (nulls.exists(_ < 0)) None
            else Some((StructField(s"agg_$i", LongType, nullable = false),
              st.map(_.rows).sum - nulls.sum))
          }
        case (m: Min, i) if noDvs => foldBound(m.column(), schema, st, i, isMin = true)
        case (m: Max, i) if noDvs => foldBound(m.column(), schema, st, i, isMin = false)
        case _ => None
      }
    if (folded.exists(_.isEmpty)) None
    else {
      val fs = folded.map(_.get)
      Some((StructType(fs.map(_._1)), InternalRow.fromSeq(fs.toSeq.map(_._2))))
    }
  }

  private def foldBound(col: org.apache.spark.sql.connector.expressions.Expression,
                        schema: StructType, st: Seq[FileStats], i: Int,
                        isMin: Boolean): Option[(StructField, Any)] =
    singleCol(col, schema).filter(f => exactType(f.dataType)).flatMap { f =>
      // each file with rows > 0 must either carry bounds or be provably
      // all-null on the column; one unprovable file refuses the fold
      val contributions: Seq[Option[Option[String]]] = st.map { s =>
        if (s.rows == 0) Some(None)
        else if (s.nullCounts.get(FieldIds.statKey(f)).contains(s.rows)) Some(None) // all-null: skip
        else (if (isMin) s.mins.get(FieldIds.statKey(f)) else s.maxs.get(FieldIds.statKey(f))) match {
          case Some(b) => Some(Some(b))
          case None => None // values present but no usable bound: refuse
        }
      }
      if (contributions.exists(_.isEmpty)) None
      else {
        val bounds = contributions.flatten.flatten
        val value: Any =
          if (bounds.isEmpty) null // every row null (or zero rows): SQL MIN/MAX = NULL
          else SkipEval.domainOrdering(f.dataType) match {
            case Some(ord) =>
              val pick =
                if (isMin) bounds.minBy(b => SkipEval.decode(f.dataType, b))(ord)
                else bounds.maxBy(b => SkipEval.decode(f.dataType, b))(ord)
              internal(f.dataType, pick)
            case None => return None
          }
        Some((StructField(s"agg_$i", f.dataType, nullable = true), value))
      }
    }
}
