package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.functions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch

/** STORAGE-PARTITIONED JOINS for catalog tables (VERDICT r13 #1): the
  * `bucket(n, col)` partition transform as a WRITE contract plus
  * [[SupportsReportPartitioning]] on the scan, so two co-bucketed
  * catalog tables join with ZERO Exchange — Spark's storage-partitioned
  * join (SPARK-37375), the same machinery Iceberg uses. At 100 TB the
  * fact⋈fact join (corpus⋈corpus, corpus⋈index) is the single largest
  * shuffle in the system; co-bucketing both sides at write time makes
  * it disappear from every subsequent query.
  *
  * == The contract, end to end ==
  *
  *  - DDL: `PARTITIONED BY (bucket(16, doc_id))` records the spec in the
  *    manifest's clusterBy. Bucket stays EXCLUDED from footer-stats
  *    pruning (a hash has no contiguous range — the r12/r13 refusal
  *    stands); the transform is justified by the JOIN, not the scan.
  *  - WRITE: every write clusters on the bucket id (the catalog's
  *    [[GraftBucketFunction]] served through its FunctionCatalog side,
  *    same resolution path as days/hours) and fans rows out through
  *    [[BucketFanoutFactory]], so every produced data file holds rows of
  *    EXACTLY ONE bucket. The file's bucket id is encoded in its task
  *    split number (`part-<pid*n+b>-…`) and recorded per file in the
  *    manifest at commit — [[FileStats.bucket]].
  *  - SCAN: when every file in the pruned set carries a bucket id (and
  *    no deletion vectors or metadata columns are in scope), the scan is
  *    a [[BucketGroupedScan]]: partitions planned per bucket group, each
  *    implementing [[HasPartitionKey]], the scan reporting
  *    [[KeyGroupedPartitioning]] over `bucket(n, col)`. Spark then plans
  *    a co-bucketed equi-join with no Exchange on either side
  *    (`spark.sql.sources.v2.bucketing.enabled`). Any file without a
  *    bucket id falls back to the ordinary scan — slower, never wrong.
  *
  * Merge-on-read composes with the layout (since r15, VERDICT r14 #3):
  * MOR's delta-insert writer rides the same [[BucketFanoutFactory]], so
  * reinsert files stay bucket-pure, and the scan serves deletion-
  * vectored members masked INSIDE their bucket groups — the
  * continuous-upsert corpus keeps the shuffle-free join.
  */
private[graft] object GraftBucket {
  val FnName = "bucket"

  /** Types a bucket column may have: exact integers, strings, dates.
    * (Floating point and timestamps make poor bucket keys — Iceberg
    * restricts similarly.) */
  def supported(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | StringType | DateType => true
    case _ => false
  }

  /** Murmur3 64-bit finalizer — a full-avalanche mixer, so sequential
    * ids spread uniformly (raw `id % n` would let arithmetic patterns
    * in the data empty half the buckets). */
  private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL; k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L; k ^= k >>> 33
    k
  }

  def bucketOfLong(v: Long, n: Int): Int = (((fmix64(v) % n) + n) % n).toInt

  def bucketOfString(s: org.apache.spark.unsafe.types.UTF8String, n: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.bytesHash(s.getBytes, 42)
    ((h % n) + n) % n
  }

  /** Row-side bucket id (the fanout writer's routing). NULL keys land in
    * bucket 0 on every path — consistently placed on both join sides,
    * and a null join key never matches anything anyway. */
  def bucketOf(row: InternalRow, ordinal: Int, dt: DataType, n: Int): Int =
    if (row.isNullAt(ordinal)) 0
    else dt match {
      case LongType => bucketOfLong(row.getLong(ordinal), n)
      case IntegerType | DateType => bucketOfLong(row.getInt(ordinal).toLong, n)
      case StringType => bucketOfString(row.getUTF8String(ordinal), n)
      case other => throw new UnsupportedOperationException(
        s"bucket() does not support $other")
    }

  /** Max buckets accepted at DDL: keeps the synthetic split-id encoding
    * (pid*n+b) far from Int overflow and the per-task writer array
    * small. */
  val MaxBuckets = 10000

  /** Largest write-task partition id whose synthetic split ids
    * (pid*n .. pid*n + n-1) all stay non-negative Ints — the overflow
    * guard of the fanout writer (ADVICE r14). */
  def maxSafePartition(n: Int): Int = (Int.MaxValue - (n - 1)) / n

  /** Parse a staged file's bucket id back out of its name. The delegate
    * parquet writer names files `part-<split>-<uuid>…`; the fanout
    * factory set split = realPartition * n + bucket, so bucket =
    * split % n. None (→ no SPJ for this file) when the name doesn't
    * match — conservative, never wrong. */
  def bucketFromFileName(name: String, n: Int): Option[Int] = {
    val m = "^part-(\\d+)-".r.findFirstMatchIn(name)
    m.map(_.group(1).toLong).map(s => (s % n).toInt)
  }

  /** Bucket of one bare literal value (a runtime IN-value from the
    * selective join side). The connector layer hands longs/ints boxed
    * and strings as UTF8String. */
  def bucketOfValue(v: Any, dt: DataType, n: Int): Int = (dt, v) match {
    case (LongType | IntegerType | DateType, x: java.lang.Number) =>
      bucketOfLong(x.longValue(), n)
    case (StringType, s: org.apache.spark.unsafe.types.UTF8String) => bucketOfString(s, n)
    case (StringType, s: String) =>
      bucketOfString(org.apache.spark.unsafe.types.UTF8String.fromString(s), n)
    case (other, _) => throw new UnsupportedOperationException(
      s"bucket() does not support $other")
  }

  /** STATIC bucket pruning (r15): the set of buckets the pushed catalyst
    * conjuncts allow on the bucket column. Footer min/max are useless on
    * a hash-scattered key — for the 100 TB point lookup
    * (`WHERE doc_id = x` / `IN (...)`) THIS is the pruning: hash the
    * literals with the write side's own mixer and only files recorded in
    * those buckets can hold a match. NULL keys land in bucket 0 by the
    * fanout contract, so `IS NULL` prunes to bucket 0; null literals in
    * an IN list match nothing and drop from the set. None = the
    * conjuncts say nothing provable (conservative: keep every file). */
  def staticAllowedBuckets(conjuncts: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                           bl: BucketLayout,
                           schema: StructType): Option[Set[Int]] = {
    import org.apache.spark.sql.catalyst.expressions._
    val dtOpt = schema.fields.find(_.name.equalsIgnoreCase(bl.column))
      .map(_.dataType).filter(supported)
    def of(e: Expression): Option[Set[Int]] = e match {
      case EqualTo(a: AttributeReference, Literal(v, _))
          if a.name.equalsIgnoreCase(bl.column) =>
        if (v == null) Some(Set.empty) // = null matches nothing
        else scala.util.Try(Set(bucketOfValue(v, dtOpt.get, bl.numBuckets))).toOption
      case EqualTo(Literal(v, _), a: AttributeReference)
          if a.name.equalsIgnoreCase(bl.column) =>
        if (v == null) Some(Set.empty)
        else scala.util.Try(Set(bucketOfValue(v, dtOpt.get, bl.numBuckets))).toOption
      case In(a: AttributeReference, vs)
          if a.name.equalsIgnoreCase(bl.column) && vs.forall(_.isInstanceOf[Literal]) =>
        scala.util.Try(vs.collect { case Literal(v, _) if v != null => v }
          .map(bucketOfValue(_, dtOpt.get, bl.numBuckets)).toSet).toOption
      case InSet(a: AttributeReference, hset)
          if a.name.equalsIgnoreCase(bl.column) =>
        scala.util.Try(hset.filter(_ != null)
          .map(bucketOfValue(_, dtOpt.get, bl.numBuckets))).toOption
      case IsNull(a: AttributeReference) if a.name.equalsIgnoreCase(bl.column) =>
        Some(Set(0)) // the fanout routes null keys to bucket 0
      case And(l, r) =>
        (of(l), of(r)) match {
          case (Some(a), Some(b)) => Some(a intersect b)
          case (a, b) => a.orElse(b)
        }
      case Or(l, r) =>
        for { a <- of(l); b <- of(r) } yield a union b
      case _ => None
    }
    dtOpt.flatMap { _ =>
      val sets = conjuncts.flatMap(of)
      if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
    }
  }

  /** The set of buckets a runtime predicate on `col` can possibly match —
    * hash the IN/= values through the SAME mixer the write side used, so
    * whole bucket GROUPS the values can't land in are droppable (this is
    * how Iceberg prunes bucket partitions; footer stats can never bound
    * a hash). None = the predicate says nothing provable about `col`
    * (conservative: keep every group). */
  def bucketsOf(p: org.apache.spark.sql.connector.expressions.filter.Predicate,
                col: String, dt: DataType, n: Int): Option[Set[Int]] = {
    import org.apache.spark.sql.connector.expressions.{Literal => VLit, NamedReference}
    import org.apache.spark.sql.connector.expressions.filter.{And => VAnd}
    p match {
      case a: VAnd =>
        (bucketsOf(a.left(), col, dt, n), bucketsOf(a.right(), col, dt, n)) match {
          case (Some(l), Some(r)) => Some(l intersect r)
          case (l, r) => l.orElse(r)
        }
      case _ if (p.name() == "IN" || p.name() == "=") && p.children().nonEmpty =>
        p.children().head match {
          case r: NamedReference if r.fieldNames().length == 1 &&
              r.fieldNames()(0).equalsIgnoreCase(col) =>
            val vs = p.children().tail.flatMap {
              case l: VLit[_] if l.value() != null => Some(l.value())
              case _ => None
            }
            // a partially-parsed value list (or a null, which matches no
            // join key anyway) must not shrink the allowed set — only
            // trust a fully parsed one
            if (vs.length == p.children().length - 1)
              scala.util.Try(vs.map(bucketOfValue(_, dt, n)).toSet).toOption
            else None
          case _ => None
        }
      case _ => None
    }
  }
}

/** A table's declared bucket layout, parsed from the manifest clusterBy.
  * (Public like FileTaggedScan: SkippingScanBuilder lives in an
  * org.apache.spark.sql subpackage and needs the type.) */
final case class BucketLayout(numBuckets: Int, column: String)

/** The `bucket` partition-transform function (FunctionCatalog-served,
  * like days/hours): binds over (numBuckets literal, column) — the
  * argument shape `V2ExpressionUtils` hands a BucketTransform — and is
  * what makes `PARTITIONED BY (bucket(n, col))` resolvable in write
  * distributions AND comparable across tables for storage-partitioned
  * join compatibility (both sides bind to the same `canonicalName`). */
private[catalog] class GraftBucketFunction extends functions.UnboundFunction {
  override def name(): String = GraftBucket.FnName
  override def description(): String =
    "bucket(n, col): partition transform — murmur-mixed hash bucket in [0, n)"

  override def bind(inputType: StructType): functions.BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, col), got ${inputType.fields.length} arguments")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket's first argument is the bucket count (int), got ${inputType.fields(0).dataType}")
    val dt = inputType.fields(1).dataType
    require(GraftBucket.supported(dt),
      s"bucket() supports int, bigint, string, and date columns; got $dt")
    // one bound class per key type so each carries the UNBOXED `invoke`
    // magic method — Catalyst codegens a direct call instead of boxing
    // an Integer per row on the bucketed write's sort/distribution (the
    // hot write path of every bucketed fact table). The classes are
    // PUBLIC top-level: the magic-method lookup goes through
    // commons-lang's accessible-method resolution, which refuses a
    // method declared only on a non-public (e.g. anonymous) class.
    dt match {
      case LongType => new GraftBucketLongFn
      case IntegerType | DateType => new GraftBucketIntFn(dt)
      case StringType => new GraftBucketStringFn
      case other => throw new UnsupportedOperationException(s"bucket() on $other")
    }
  }
}

/** Base of the per-type bound bucket functions: the interpreted
  * `produceResult` fallback plus the shared identity (`canonicalName` is
  * what storage-partitioned join compatibility compares). */
abstract class GraftBucketBound(dt: DataType)
    extends functions.ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = IntegerType
  override def name(): String = GraftBucket.FnName
  override def canonicalName(): String = s"graft.${GraftBucket.FnName}"
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    if (input.isNullAt(1)) null
    else Integer.valueOf(GraftBucket.bucketOf(input, 1, dt, n))
  }
}

class GraftBucketLongFn extends GraftBucketBound(LongType) {
  def invoke(n: Int, v: Long): Int = GraftBucket.bucketOfLong(v, n)
}

class GraftBucketIntFn(dt: DataType) extends GraftBucketBound(dt) {
  def invoke(n: Int, v: Int): Int = GraftBucket.bucketOfLong(v.toLong, n)
}

class GraftBucketStringFn extends GraftBucketBound(StringType) {
  def invoke(n: Int, s: org.apache.spark.unsafe.types.UTF8String): Int =
    GraftBucket.bucketOfString(s, n)
}

/** Fans each task's rows out into ONE DELEGATE WRITER PER BUCKET, so
  * every produced parquet file is bucket-pure — the property
  * [[KeyGroupedPartitioning]] needs from every file and a shuffle can
  * never provide (hash partitioning maps several bucket ids to one
  * task). Each bucket's writer is created lazily from the inner parquet
  * factory under a SYNTHETIC split id `realPartition * n + bucket`:
  * the hadoop commit protocol treats each as an independent task
  * (own attempt context, own atomic task-commit), and the split id —
  * which the delegate embeds in the file NAME — carries the bucket to
  * the manifest commit. With the write's clustered distribution most
  * tasks see one bucket, so the common case is exactly one writer. */
private[catalog] case class BucketFanoutFactory(inner: DataWriterFactory, n: Int,
                                                ordinal: Int, dt: DataType)
    extends DataWriterFactory {
  require(ordinal >= 0, "bucket column missing from the write schema")

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    // the synthetic split id is Int arithmetic AND the file-name channel
    // that carries the bucket to the manifest — an overflowed (wrapped or
    // negative) id could collide two tasks' file names within one job
    // (silent overwrite) and mis-decode the bucket, so fail loudly long
    // before it can (ADVICE r14)
    require(partitionId >= 0 && partitionId <= GraftBucket.maxSafePartition(n),
      s"bucket fanout split id would overflow Int (partition $partitionId x $n buckets); " +
        "repartition the bucketed write to fewer tasks or lower the bucket count")
    new DataWriter[InternalRow] {
      private val writers = new Array[DataWriter[InternalRow]](n)
      private def writerFor(b: Int): DataWriter[InternalRow] = {
        if (writers(b) == null)
          writers(b) = inner.createWriter(partitionId * n + b, taskId)
        writers(b)
      }
      override def write(row: InternalRow): Unit =
        writerFor(GraftBucket.bucketOf(row, ordinal, dt, n)).write(row)
      override def commit(): WriterCommitMessage = {
        // an empty partition still owes the protocol one message — commit
        // a rowless bucket-0 writer, mirroring the unfanned path's
        // empty-file behavior. A multi-bucket task MERGES its delegates'
        // messages so output metrics (numOutputRows/files/bytes) count
        // every bucket, not just the first (ADVICE r14)
        val msgs = writers.filter(_ != null).map(_.commit())
        if (msgs.isEmpty) writerFor(0).commit()
        else org.apache.spark.sql.graft.FanoutMessages.merge(msgs.toSeq)
      }
      override def abort(): Unit = writers.filter(_ != null).foreach(_.abort())
      override def close(): Unit = writers.filter(_ != null).foreach(_.close())
    }
  }
}

/** One delegate split + the bucket key of the file it reads — the
  * [[HasPartitionKey]] unit storage-partitioned joins group by. */
private[catalog] case class BucketKeyPartition(inner: InputPartition, bucket: Int)
    extends InputPartition with HasPartitionKey {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

/** Unwraps [[BucketKeyPartition]] for the delegate parquet factory —
  * both read paths forward, so vectorized reads survive grouping. */
private[catalog] case class BucketKeyReaderFactory(inner: PartitionReaderFactory)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    inner.createReader(p.asInstanceOf[BucketKeyPartition].inner)
  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    inner.createColumnarReader(p.asInstanceOf[BucketKeyPartition].inner)
  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(p.asInstanceOf[BucketKeyPartition].inner)
}

/** Deletion-vector support for bucket groups (r15, VERDICT r14 #3): the
  * manifest's address support plus a filter-free per-file scan
  * constructor (position stability — see [[Dv]]). */
case class BucketDv(addr: AddrSupport, bareScanFor: Seq[String] => Scan)

/** The SPJ scan: the pruned file set grouped by recorded bucket id, one
  * delegate scan per group (filters still pushed — this is a READ path,
  * row-group pruning inside kept files survives), every partition
  * keyed, the whole scan reporting [[KeyGroupedPartitioning]] over the
  * table's bucket transform. Statistics forward from the manifest like
  * every other catalog scan, so CBO sizing is unchanged.
  *
  * Files carrying DELETION VECTORS (`dv` set and the manifest marks
  * members vectored — the MOR×SPJ composition) stay inside their bucket
  * group: masking removes rows, never moves them, so each group plans
  * its clean members through the filter-pushed delegate and its
  * vectored members through the addressed/masked path ([[AddrPartition]]
  * under a [[SplitPartition]] route), all still keyed by the group's
  * bucket. The continuous-upsert corpus keeps its shuffle-free join
  * with vectors in scope.
  *
  * RUNTIME BUCKET-GROUP PRUNING (r15, VERDICT r14 #4): the scan also
  * declares the bucket column as a runtime-filter attribute. A
  * `bucketed_fact JOIN small_dim` probe needs no footer stats — the
  * dim side's surviving join keys hash through [[GraftBucket]]'s mixer
  * and whole bucket GROUPS the values can't land in drop before any
  * fact byte is read (Iceberg prunes bucket partitions the same way).
  * Dropping groups under [[KeyGroupedPartitioning]] is legal: Spark
  * only requires post-filter partition values to be a SUBSET of the
  * originals. `keyType` is the bucket column's type in the reading
  * era's schema; None disables runtime pruning (conservative). */
class BucketGroupedScan(
    groups: Seq[(Int, Seq[String])],
    layout: BucketLayout,
    mkScanFor: Seq[String] => Scan,
    allFiles: Seq[String],
    mkStream: String => org.apache.spark.sql.connector.read.streaming.MicroBatchStream,
    manifestRows: Option[Long],
    manifestColStats: java.util.Map[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics],
    dv: Option[BucketDv] = None,
    keyType: Option[org.apache.spark.sql.types.DataType] = None,
    onRuntimePrune: (Int, Int) => Unit = (_, _) => (),
    isVectored: String => Boolean = _ => false)
    extends Scan with SupportsReportPartitioning with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  // Fail-fast invariant (ADVICE r15): a caller that declares vectored
  // files (via `isVectored`) but supplies no address support would be
  // served UNMASKED reads — deleted rows would resurrect silently. Refuse
  // at construction, mirroring SkippingScanBuilder's unbucketed branch.
  if (dv.isEmpty && allFiles.exists(isVectored))
    throw new IllegalStateException(
      "deletion vectors in scope but this bucket-grouped scan has no address support")

  @volatile private var keptGroups: Seq[(Int, Seq[String])] = groups

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    keyType match {
      case Some(_) => Array(
        org.apache.spark.sql.connector.expressions.Expressions.column(layout.column))
      case None => Array.empty
    }

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit =
    keyType.foreach { dt =>
      val sets = predicates.toSeq.flatMap(p =>
        GraftBucket.bucketsOf(p, layout.column, dt, layout.numBuckets))
      if (sets.nonEmpty) {
        val allowed = sets.reduce(_ intersect _)
        keptGroups = groups.filter { case (b, _) => allowed(b) }
        onRuntimePrune(keptGroups.size, groups.size)
      }
    }

  private lazy val whole = mkScanFor(allFiles)

  /** Whether ANY in-scope file is vectored — decided ONCE from the
    * immutable file set, so partition shape and reader-factory routing
    * can never disagree. */
  private val anyVectored: Boolean = dv.exists(d => allFiles.exists(d.addr.isVectored))

  override def readSchema(): StructType = whole.readSchema()
  override def description(): String =
    s"graft bucket-grouped scan (bucket(${layout.numBuckets}, ${layout.column}), " +
      s"${groups.size} groups${if (anyVectored) ", dv-masked members" else ""})"

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(org.apache.spark.sql.connector.expressions.Expressions.bucket(
        layout.numBuckets, layout.column)),
      groups.size)

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
      override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = manifestColStats
    }
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      keptGroups.flatMap { case (bucket, files) =>
        val parts: Seq[InputPartition] =
          if (!anyVectored) mkScanFor(files).toBatch.planInputPartitions().toSeq
          else {
            // masked members plan per file, filter-free (position
            // stability); clean members keep the fast filter-pushed
            // delegate — both under the SplitPartition route so one
            // reader factory serves the whole scan
            val d = dv.get
            val (vec, clean) = files.partition(d.addr.isVectored)
            val cleanParts =
              if (clean.isEmpty) Seq.empty[InputPartition]
              else mkScanFor(clean).toBatch.planInputPartitions().toSeq
                .map(p => SplitPartition(p, addressed = false): InputPartition)
            val vecParts = vec.flatMap { f =>
              val (abs, blob) = d.addr.addrOf(f)
              d.bareScanFor(Seq(f)).toBatch.planInputPartitions().toSeq
                .map(p => SplitPartition(AddrPartition(p, f, abs, blob),
                  addressed = true): InputPartition)
            }
            cleanParts ++ vecParts
          }
        parts.map(p => BucketKeyPartition(p, bucket): InputPartition)
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      if (!anyVectored) BucketKeyReaderFactory(whole.toBatch.createReaderFactory())
      else {
        val d = dv.get
        val clean = allFiles.filterNot(d.addr.isVectored)
        val vec = allFiles.filter(d.addr.isVectored)
        BucketKeyReaderFactory(SplitReaderFactory(
          // factories are file-agnostic (schema + pushdown only) — an
          // empty clean side still builds one safely over the full set
          mkScanFor(if (clean.isEmpty) allFiles else clean)
            .toBatch.createReaderFactory(),
          AddrReaderFactory(d.bareScanFor(vec).toBatch.createReaderFactory(),
            d.addr.conf, wantFile = false, wantPos = false)))
      }
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    mkStream(checkpointLocation)

  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    Scan.ColumnarSupportMode.PARTITION_DEFINED
}
