package graft.catalog

import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.types.StructType

/** RUNTIME file skipping for catalog scans (dynamic partition pruning,
  * DSv2 form): the scan declares its CLUSTER columns as runtime-filter
  * attributes, Spark's partition-pruning rule plants a subquery that
  * computes the join keys actually present on the selective (dimension)
  * side, and `filter()` re-prunes the manifest's file list with those
  * VALUES through the same footer-stats evaluation static predicates
  * use — before a single fact byte is read.
  *
  * The 100 TB shape this exists for is the star probe with no literal
  * predicate on the fact table: `fact JOIN dim ON k WHERE dim.attr = x`
  * has nothing to push statically, so static skipping keeps every fact
  * file; at runtime the dim side reduces to a handful of k values and a
  * fact table clustered by k prunes to the files whose ranges cover
  * them — partition-pruning strength, zero scheme awareness in the
  * query. Conservative everywhere: untranslatable runtime predicates
  * leave the list untouched, value sets the stats can't bound keep
  * every file, and Spark re-applies the join itself above the scan.
  *
  * Partitions are planned LAZILY (at toBatch access, which Spark defers
  * until after runtime filters ran), the same pattern as the COW group
  * scan's runtime narrowing; the reader factory is the delegate parquet
  * factory, so vectorized reads and pushed static filters survive. */
class RuntimeSkippingScan(
    files0: Seq[String],
    mkScanFor: Seq[String] => Scan,
    filterCols: Seq[String],
    runtimePrune: (Seq[String], Array[Predicate]) => Seq[String],
    mkStream: String => org.apache.spark.sql.connector.read.streaming.MicroBatchStream,
    manifestRows: Option[Long],
    manifestColStats: java.util.Map[NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics])
    extends Scan with SupportsRuntimeV2Filtering with SupportsReportStatistics {

  @volatile private var kept: Seq[String] = files0

  // built once: every delegate construction lists files driver-side, and
  // Spark calls readSchema/description repeatedly during planning
  private lazy val whole = mkScanFor(files0)

  // one delegate per DISTINCT kept list: toBatch's partition planning and
  // factory creation both need it, and the common case (no runtime
  // narrowing) reuses `whole` outright
  private var keptScan: (Seq[String], Scan) = null
  private def scanForKept(): Scan = synchronized {
    val k = kept
    if (k eq files0) whole
    else {
      if (keptScan == null || !(keptScan._1 eq k)) keptScan = (k, mkScanFor(k))
      keptScan._2
    }
  }

  override def readSchema(): StructType = whole.readSchema()
  override def description(): String =
    s"graft runtime-skipping scan (cols: ${filterCols.mkString(", ")}) " +
      whole.description()

  override def filterAttributes(): Array[NamedReference] =
    filterCols.map(org.apache.spark.sql.connector.expressions.Expressions.column).toArray

  override def filter(predicates: Array[Predicate]): Unit =
    kept = runtimePrune(kept, predicates)

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      scanForKept().toBatch.planInputPartitions()
    override def createReaderFactory(): PartitionReaderFactory =
      scanForKept().toBatch.createReaderFactory()
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    mkStream(checkpointLocation)

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    val fwd = whole match {
      case s: SupportsReportStatistics => Some(s.estimateStatistics())
      case _ => None
    }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        fwd.map(_.sizeInBytes()).getOrElse(java.util.OptionalLong.empty())
      override def numRows(): java.util.OptionalLong = manifestRows match {
        case Some(n) => java.util.OptionalLong.of(n)
        case None => fwd.map(_.numRows()).getOrElse(java.util.OptionalLong.empty())
      }
      override def columnStats(): java.util.Map[NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = manifestColStats
    }
  }

  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    Scan.ColumnarSupportMode.PARTITION_DEFINED
}
