// Same org.apache.spark.sql subpackage convention as
// SkippingScanBuilder.scala: this class subclasses Spark's SQL commit
// protocol (public bytecode, internal by package convention) and must be
// instantiable by name through spark.sql.sources.commitProtocolClass.
package org.apache.spark.sql.graft

import org.apache.hadoop.mapreduce.TaskAttemptContext
import org.apache.spark.internal.io.FileCommitProtocol
import org.apache.spark.sql.execution.datasources.SQLHadoopMapReduceCommitProtocol

/** The commit protocol for BUCKET-FANOUT writes (see
  * [[graft.catalog.BucketFanoutFactory]]): identical to Spark's default
  * SQL protocol except that task commit does NOT consult the driver's
  * OutputCommitCoordinator.
  *
  * Why: the fanout writer commits one hadoop "task" PER BUCKET under a
  * synthetic split id (`realPartition * n + bucket` — the id is also the
  * file-name channel that carries the bucket to the manifest), and the
  * coordinator's per-stage state is sized to the stage's REAL partition
  * count, so a synthetic id overflows it (ArrayIndexOutOfBounds at
  * handleAskPermissionToCommit). The coordinator exists to arbitrate
  * SPECULATIVE/zombie duplicate attempts of one partition; the hadoop
  * FileOutputCommitter's own needsTaskCommit/commitTask (atomic rename
  * of the attempt dir) still runs and owns task atomicity here, and the
  * graft manifest commit on top is what makes the write visible at all —
  * an uncommitted manifest means staged files are simply never
  * referenced. The protocol is scoped to bucketed-table writes only
  * (set around the delegate's toBatch and restored immediately); on a
  * cluster, leave speculation off for bucketed-table write jobs — the
  * same operational rule every direct-commit (S3A magic/v2) pipeline
  * already follows. */
class GraftFanoutCommitProtocol(jobId: String, path: String,
                                dynamicPartitionOverwrite: Boolean = false)
    extends SQLHadoopMapReduceCommitProtocol(jobId, path, dynamicPartitionOverwrite) {

  override def commitTask(taskContext: TaskAttemptContext): FileCommitProtocol.TaskCommitMessage = {
    // an equivalent committer instance for this attempt (the base class's
    // own is private; FileOutputCommitter state is derived from the
    // attempt context, so a re-setup committer commits the same dir)
    val committer = setupCommitter(taskContext)
    if (committer.needsTaskCommit(taskContext)) committer.commitTask(taskContext)
    // single-directory writes track no absolute-path files and no dynamic
    // partitions — the same empty payload the base protocol would report
    new FileCommitProtocol.TaskCommitMessage(
      (Map.empty[String, String], Set.empty[String]))
  }
}

/** Merges the per-bucket delegate writers' task-commit messages into ONE
  * (ADVICE r14: returning only the first bucket's message under-reported
  * numOutputRows/files/bytes on multi-bucket tasks). Same-package shim
  * rationale as the protocol above: WriteTaskResult and its stats types
  * are public bytecode, `private[sql]` by package convention. */
object FanoutMessages {
  import org.apache.spark.sql.connector.write.WriterCommitMessage
  import org.apache.spark.sql.execution.datasources.{BasicWriteTaskStats, ExecutedWriteSummary, WriteTaskResult}

  def merge(msgs: Seq[WriterCommitMessage]): WriterCommitMessage = {
    val results = msgs.collect { case r: WriteTaskResult => r }
    // unknown message shapes can't be merged generically — report the
    // first, the pre-r15 behavior (metrics-only downgrade, never wrong)
    if (results.length != msgs.length || results.isEmpty) return msgs.head
    // ADVICE r15: zip would silently truncate/misalign if delegates ever
    // reported differently-shaped WriteTaskStats seqs (custom write
    // trackers) — take the same metrics-only downgrade instead of a
    // corrupted merge
    val shapes = results.map(_.summary.stats.map(_.getClass))
    if (shapes.exists(_ != shapes.head)) return msgs.head
    val mergedStats = results.map(_.summary.stats).reduce { (a, b) =>
      a.zip(b).map {
        case (x: BasicWriteTaskStats, y: BasicWriteTaskStats) =>
          BasicWriteTaskStats(x.partitions ++ y.partitions, x.numFiles + y.numFiles,
            x.numBytes + y.numBytes, x.numRows + y.numRows)
        case (x, _) => x // custom trackers: keep the first bucket's entry
      }
    }
    // the fanout protocol's per-task payloads are empty (no abs-path
    // files, no dynamic partitions) and identical — the head's suffices
    WriteTaskResult(results.head.commitMsg, ExecutedWriteSummary(
      results.flatMap(_.summary.updatedPartitions).toSet, mergedStats))
  }
}
