package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.catalog.MetadataColumn
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

/** The `_file` METADATA COLUMN (Iceberg's name and semantics): the
  * manifest-relative path of the data file each row came from. Declared
  * via [[org.apache.spark.sql.connector.catalog.SupportsMetadataColumns]]
  * on [[GraftTable]], it serves two consumers:
  *
  *  - users: `SELECT _file, … FROM cat.ns.t` for debugging/lineage;
  *  - Spark's RUNTIME GROUP FILTERING for row-level operations: the
  *    row-level scan declares `_file` as its filter attribute, Spark
  *    plans a subquery that computes the `_file` values of rows MATCHING
  *    the verb's condition (for MERGE: the join with the source — the
  *    case footer stats can never bound), and the scan narrows its file
  *    list to exactly those groups at execution time. Combined with the
  *    file-granular commit, this makes MERGE rewrite cost ∝ matched
  *    files.
  *
  * Production mechanics: the tagged scan plans partitions PER FILE (the
  * delegate parquet scan is built per file, its partitions wrapped with
  * the file's tag), and the reader factory appends the constant — a
  * [[JoinedRow]] on the row path, a ConstantColumnVector appended to the
  * delegate's batches on the columnar path, so vectorized reads survive.
  * A scan that doesn't request `_file` takes none of this (bin-packed
  * multi-file partitions, untouched delegate factory). */
object FileTag {
  val Col = "_file"

  val column: MetadataColumn = new MetadataColumn {
    override def name(): String = Col
    override def dataType(): DataType = StringType
    override def isNullable: Boolean = false
    override def comment(): String = "manifest-relative data file path of the row"
  }

  /** Drop `_file` out of a pruned schema → (data schema, wasRequested). */
  def splitSchema(required: StructType): (StructType, Boolean) =
    if (required.fieldNames.contains(Col))
      (StructType(required.fields.filterNot(_.name == Col)), true)
    else (required, false)

  /** Parse a runtime predicate set into an allow-list of `_file` values;
    * None = nothing parseable (caller keeps its current set — the
    * conservative direction). Shapes: `IN(_file, v…)`, `=(_file, v)`,
    * AND of those. */
  def allowedFiles(predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Option[Set[String]] = {
    import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
    import org.apache.spark.sql.connector.expressions.filter.{And, Predicate}
    def valuesOf(p: Predicate): Option[Set[String]] = p match {
      case a: And =>
        (valuesOf(a.left()), valuesOf(a.right())) match {
          case (Some(l), Some(r)) => Some(l intersect r)
          case (l, r) => l.orElse(r)
        }
      case p if (p.name() == "IN" || p.name() == "=") && p.children().nonEmpty =>
        p.children().head match {
          case r: NamedReference if r.fieldNames().toSeq == Seq(Col) =>
            val vs = p.children().tail.flatMap {
              case l: Literal[_] if l.value() != null => Some(l.value().toString)
              case _ => None
            }
            // a literal child that didn't parse would silently shrink the
            // allow-list — only trust a fully parsed value list
            if (vs.length == p.children().length - 1) Some(vs.toSet) else None
          case _ => None
        }
      case _ => None
    }
    predicates.flatMap(valuesOf(_)).reduceOption(_ intersect _)
  }
}

/** One delegate partition + the manifest-relative path of the single
  * file it reads. */
case class FileTagPartition(inner: InputPartition, file: String)
    extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Appends the partition's constant `_file` as the LAST column, on both
  * the row path (JoinedRow, zero-copy view) and the columnar path
  * (ConstantColumnVector appended to the delegate's batch — vectorized
  * parquet reads survive the tagging). */
case class FileTagReaderFactory(inner: PartitionReaderFactory)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FileTagPartition]
    val d = inner.createReader(p.inner)
    val suffix = new GenericInternalRow(Array[Any](UTF8String.fromString(p.file)))
    val joined = new JoinedRow
    new PartitionReader[InternalRow] {
      override def next(): Boolean = d.next()
      override def get(): InternalRow = joined(d.get(), suffix)
      override def close(): Unit = d.close()
    }
  }

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val p = partition.asInstanceOf[FileTagPartition]
    val d = inner.createColumnarReader(p.inner)
    val const = new org.apache.spark.sql.execution.vectorized.ConstantColumnVector(1, StringType)
    const.setUtf8String(UTF8String.fromString(p.file))
    new PartitionReader[ColumnarBatch] {
      override def next(): Boolean = d.next()
      override def get(): ColumnarBatch = {
        val b = d.get()
        val cols = Array.tabulate[ColumnVector](b.numCols())(b.column) :+ (const: ColumnVector)
        new ColumnarBatch(cols, b.numRows())
      }
      override def close(): Unit = d.close()
    }
  }

  override def supportColumnarReads(partition: InputPartition): Boolean =
    inner.supportColumnarReads(partition.asInstanceOf[FileTagPartition].inner)
}

/** A Scan producing (data columns, `_file`): partitions planned per file
  * through `mkScanFor` so every partition carries its tag; `files` is
  * read at plan time, so a subclass narrowing it (runtime group
  * filtering) re-plans against the narrowed set. */
class FileTaggedScan(files: () => Seq[String],
                                      mkScanFor: Seq[String] => Scan,
                                      dataSchema: StructType) extends Scan {
  override def readSchema(): StructType =
    dataSchema.add(FileTag.Col, StringType, nullable = false)
  override def description(): String =
    s"graft file-tagged scan (+${FileTag.Col})"
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      files().flatMap { f =>
        mkScanFor(Seq(f)).toBatch.planInputPartitions().map(p => FileTagPartition(p, f))
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      FileTagReaderFactory(mkScanFor(files()).toBatch.createReaderFactory())
  }
  // per-partition: the factory forwards the delegate's columnar verdict
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    Scan.ColumnarSupportMode.PARTITION_DEFINED
}
