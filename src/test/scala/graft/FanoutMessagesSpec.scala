// Lives in the same org.apache.spark.sql subpackage as the class under
// test: WriteTaskResult and its stats types are `private[sql]` by package
// convention, so the merge can only be exercised from inside it.
package org.apache.spark.sql.graft

import org.apache.spark.internal.io.FileCommitProtocol.TaskCommitMessage
import org.apache.spark.sql.execution.datasources.{BasicWriteTaskStats, ExecutedWriteSummary, WriteTaskResult}
import org.scalatest.funsuite.AnyFunSuite

/** [[FanoutMessages.merge]] (ADVICE r14): a multi-bucket fanout task must
  * report the SUM of its per-bucket delegate writers' output stats, not
  * just the first bucket's — numOutputRows/files/bytes feed the write
  * metrics the UI and listeners see. */
class FanoutMessagesSpec extends AnyFunSuite {

  private def result(files: Int, bytes: Long, rows: Long,
                     parts: Set[String] = Set.empty): WriteTaskResult =
    WriteTaskResult(
      new TaskCommitMessage((Map.empty[String, String], Set.empty[String])),
      ExecutedWriteSummary(parts, Seq(BasicWriteTaskStats(Nil, files, bytes, rows))))

  test("merge sums files/bytes/rows across buckets and unions partitions") {
    val merged = FanoutMessages.merge(Seq(
      result(1, 100L, 10L, Set("p=1")),
      result(2, 250L, 30L, Set("p=2")),
      result(1, 50L, 5L))).asInstanceOf[WriteTaskResult]
    val stats = merged.summary.stats.head.asInstanceOf[BasicWriteTaskStats]
    assert(stats.numFiles == 4)
    assert(stats.numBytes == 400L)
    assert(stats.numRows == 45L)
    assert(merged.summary.updatedPartitions == Set("p=1", "p=2"))
  }

  test("a single message passes through; unknown shapes fall back to head") {
    val one = result(3, 7L, 9L)
    assert(FanoutMessages.merge(Seq(one)).asInstanceOf[WriteTaskResult]
      .summary.stats.head.asInstanceOf[BasicWriteTaskStats].numFiles == 3)
    object Alien extends org.apache.spark.sql.connector.write.WriterCommitMessage
    assert(FanoutMessages.merge(Seq(Alien, one)) eq Alien)
  }

  test("differently-shaped stats seqs downgrade to head instead of misaligning (ADVICE r15)") {
    // a custom write tracker could report a different-length stats seq on
    // one bucket; zip would silently truncate — merge must fall back
    case class AlienStats(tag: String)
      extends org.apache.spark.sql.execution.datasources.WriteTaskStats
    val plain = result(1, 100L, 10L)
    val withTracker = WriteTaskResult(
      new TaskCommitMessage((Map.empty[String, String], Set.empty[String])),
      ExecutedWriteSummary(Set.empty,
        Seq(BasicWriteTaskStats(Nil, 2, 200L, 20L), AlienStats("t"))))
    val merged = FanoutMessages.merge(Seq(plain, withTracker))
    assert(merged eq plain) // metrics-only downgrade, never a corrupted merge
  }
}
