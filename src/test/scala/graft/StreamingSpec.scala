package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{StreamEvent, StreamingOps}

/** Structured Streaming surface: windowed aggregation and stateful
  * sessionization driven through MemoryStream micro-batches. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("watermarked hourly window counts aggregate a micro-batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    input.addData(
      StreamEvent(1L, ts(5), 1L, "click", 1.0),
      StreamEvent(2L, ts(25), 1L, "click", 2.0),
      StreamEvent(3L, ts(45), 2L, "view", 3.0))
    val q = StreamingOps.hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // append mode emits only watermark-closed windows; push the watermark
      input.addData(StreamEvent(4L, Timestamp.valueOf("2026-01-01 14:00:00"), 1L, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_test").collect()
      val byType = rows.map(r => (r.getString(1), r.getLong(2))).toMap
      assert(byType == Map("click" -> 2L, "view" -> 1L))
    } finally q.stop()
  }

  test("gap sessionization closes sessions across the gap and keeps state for open ones") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    // user 1: two events 10 min apart (one session), then 90 min silence,
    // then another event -> first session closes when the gap is exceeded.
    input.addData(
      StreamEvent(1L, ts(0), 1L, "click", 1.0),
      StreamEvent(2L, ts(10), 1L, "click", 2.0))
    val q = StreamingOps.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      input.addData(StreamEvent(3L, Timestamp.valueOf("2026-01-01 11:40:00"), 1L, "click", 3.0))
      q.processAllAvailable()
      input.addData(StreamEvent(4L, Timestamp.valueOf("2026-01-01 15:00:00"), 2L, "view", 0.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions_test").as[graft.streaming.UserSession].collect()
      val closed = sessions.find(s => s.user_id == 1L && s.n_events == 2L)
      assert(closed.isDefined, s"expected the 2-event session to close, got ${sessions.mkString(";")}")
      assert(closed.get.session_start == ts(0) && closed.get.session_end == ts(10))
      assert(closed.get.total_value == 3.0)
    } finally q.stop()
  }
}
