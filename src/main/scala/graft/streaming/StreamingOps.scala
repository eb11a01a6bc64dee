package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Event for typed streaming ops (mirrors the `events` table schema). */
case class StreamEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                       event_type: String, value: Double)

/** One closed user session emitted by [[StreamingOps.sessionize]]. */
case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
                       session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

/** Structured Streaming surface (the brief's stream path; the reference is
  * batch-only, SURVEY.md §1.6, so this is [EXT]): file-source readStream →
  * watermarked tumbling-window aggregates → custom session state via
  * `flatMapGroupsWithState`.
  *
  * The same aggregate shapes run in batch (`Analytics.hourlyEvents`) —
  * Structured Streaming's contract is exactly that reuse: the logical plan
  * is identical, the engine adds incremental state + watermark GC.
  *
  * Scale notes: state is keyed by (window, event_type) / user_id, both
  * high-cardinality-partitionable; the 2h watermark bounds state size —
  * without it a 100 TB/day stream would accumulate state forever.
  */
object StreamingOps {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** S-stream source: directory of parquet event files consumed
    * incrementally (`readStream` needs an explicit schema). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Watermarked hourly tumbling-window counts — the streaming twin of
    * `Analytics.hourlyEvents`. Late data beyond 2h is dropped. Whether the
    * watermark also BOUNDS STATE depends on the sink's output mode:
    * `update`/`append` GC window state once the watermark passes
    * (see [[hourlyCountsUpdate]]); `complete` mode must re-emit every
    * window each batch and therefore keeps all state forever. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Update-mode runner for [[hourlyCounts]] — the output mode a 100 TB/day
    * stream actually runs in: each micro-batch emits only the windows that
    * changed, and once the watermark passes a window's end its rows are
    * DROPPED from the state store (state GC is asserted via
    * `numRowsRemoved` in StreamingSpec). This is what makes the 2 h
    * watermark a real state bound at scale. */
  def hourlyCountsUpdate(events: DataFrame, checkpointDir: String)(
      onBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    hourlyCounts(events).writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(onBatch)
      .start()

  /** The driver testdata's events.parquet under
    * `spark.sql.legacy.parquet.nanosAsLong` (see [[graft.Tables.events]]):
    * the TIMESTAMP(NANOS) column arrives as a raw long. */
  private val rawEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** End-to-end oracle-checkable streaming run (VERDICT r3 item 8): the
    * events table consumed as a file-source STREAM → [[hourlyCounts]] →
    * foreachBatch parquet sink, then the materialized result read back.
    * `Trigger.AvailableNow` drains all available input and stops, so the
    * run is deterministic and batch-comparable; `complete` output mode
    * emits the full aggregate in the final batch — which ALSO means the
    * watermark does NOT bound state here (complete mode keeps every
    * window forever). That is acceptable for this bounded oracle replay
    * only; the production posture is [[hourlyCountsUpdate]], where
    * watermark-expired windows are GC'd from the store. The value column
    * is summed as DECIMAL(18,2) (cast back to double at the end) so the
    * result is bit-identical to the q_hourly_events oracle regardless of
    * per-partition accumulation order. */
  def hourlyCountsEndToEnd(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft-stream-hourly").toString
    // The file stream source watches a DIRECTORY (its basePath); the
    // events table is a single parquet file, so link it into a temp watch
    // dir — the same shape as a real ingest drop-directory.
    val watchDir = java.nio.file.Paths.get(out, "in")
    java.nio.file.Files.createDirectories(watchDir)
    java.nio.file.Files.createSymbolicLink(
      watchDir.resolve("events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val stream = spark.readStream.schema(rawEventSchema)
      .parquet(watchDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withColumn("value", col("value").cast("decimal(18,2)"))
    val q = hourlyCounts(stream).writeStream
      .outputMode("complete")
      .option("checkpointLocation", s"$out/_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(s"$out/result")
      }
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$out/result")
      .select(col("hour_start"), col("event_type"), col("n_events"),
        col("total_value").cast("double").as("total_value"))
  }

  /** Epoch MICROseconds of a Timestamp — `getTime` alone is millisecond-
    * truncated, which can misorder same-millisecond events and (at a gap
    * boundary) disagree with the microsecond arithmetic of the DuckDB
    * oracle. */
  private def microsOf(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Gap-based sessionization with explicit state: events for a user more
    * than `gap` apart start a new session; closed sessions are emitted.
    * `flatMapGroupsWithState` is the Spark primitive for custom streaming
    * state (KeyValueGroupedDataset, per-key state, event-time timeout).
    * All ordering/gap arithmetic runs in epoch micros — full event-time
    * precision. `watermarkDelay` is the lateness bound; the batch-replay
    * oracle harness passes an effectively-infinite delay so no event-time
    * timeout fires mid-replay and the output is exactly the gap-closed
    * sessions. */
  def sessionize(events: Dataset[StreamEvent], gapMinutes: Int = 30,
                 watermarkDelay: String = "2 hours"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[StreamEvent], UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, newEvents, state: GroupState[List[StreamEvent]]) =>
          val buffered = state.getOption.getOrElse(Nil) ++ newEvents
          val sorted = buffered.sortBy(e => microsOf(e.ts))
          // split into gap-separated runs; emit all but the last (still-open)
          val runs = sorted.foldLeft(List.empty[List[StreamEvent]]) {
            case (Nil, e) => List(List(e))
            case (cur :: done, e) =>
              if (microsOf(e.ts) - microsOf(cur.head.ts) > gapUs) List(e) :: cur :: done
              else (e :: cur) :: done
          }.map(_.reverse).reverse
          val (open, closed) =
            if (state.hasTimedOut) (Nil, runs) else (runs.takeRight(1), runs.dropRight(1))
          if (open.nonEmpty) {
            state.update(open.head)
            state.setTimeoutTimestamp(microsOf(open.head.last.ts) / 1000L + gapUs / 1000L)
          } else state.remove()
          closed.iterator.map { run =>
            UserSession(userId, run.head.ts, run.last.ts, run.size.toLong,
              run.map(_.value).sum)
          }
      }
  }

  /** End-to-end oracle-checkable sessionization (VERDICT r4 #5): the
    * events table replayed as a file stream through [[sessionize]] →
    * foreachBatch parquet sink → read back. The watermark delay is set
    * far beyond the data's time range so NO event-time timeout fires:
    * every emitted session was closed by the gap rule, making the result
    * exactly "all sessions except each user's last one" — a pure
    * window-gap query the DuckDB oracle mirrors deterministically
    * (timeout-emitted sessions would depend on micro-batch boundaries).
    *
    * Values are quantized to the 2-decimal grid BEFORE summation so the
    * Scala double sum and the oracle's DECIMAL(18,2) sum round to the
    * same 2 dp total; session bounds are emitted as epoch-micros BIGINTs
    * (both engines truncate the source's nanos identically). */
  def sessionizeEndToEnd(spark: SparkSession, dir: String,
                         gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-stream-sessions").toString
    val watchDir = java.nio.file.Paths.get(out, "in")
    java.nio.file.Files.createDirectories(watchDir)
    java.nio.file.Files.createSymbolicLink(
      watchDir.resolve("events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val stream = spark.readStream.schema(rawEventSchema)
      .parquet(watchDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withColumn("value", col("value").cast("decimal(18,2)").cast("double"))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[StreamEvent]
    val q = sessionize(stream, gapMinutes, watermarkDelay = "3650 days")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$out/_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[UserSession], _: Long) =>
        batch.write.mode("append").parquet(s"$out/result")
      }
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$out/result")
      .select(col("user_id"),
        unix_micros(col("session_start")).as("session_start_us"),
        unix_micros(col("session_end")).as("session_end_us"),
        col("n_events"),
        round(col("total_value"), 2).as("total_value"))
  }

  private val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** X1's streaming twin — stateful exact dedup on a document STREAM:
    * `dropDuplicates` on the content digest keeps the first-seen row per
    * fingerprint in the state store, so re-crawled/re-ingested content is
    * dropped as it arrives instead of in a nightly batch. Emitting ONLY
    * the fingerprint keeps the replay deterministic (WHICH doc of a
    * duplicate group arrives first within a batch is partition-order
    * luck; the SET of distinct fingerprints is not) — the DuckDB oracle
    * is a plain DISTINCT.
    *
    * State grows with distinct content here (fine for a bounded replay);
    * an unbounded production stream uses `dropDuplicatesWithinWatermark`
    * so the store only holds the re-ingest window (e.g. 24 h of crawl),
    * trading global for windowed dedup. */
  def streamDedupEndToEnd(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft-stream-dedup").toString
    val watchDir = java.nio.file.Paths.get(out, "in")
    java.nio.file.Files.createDirectories(watchDir)
    java.nio.file.Files.createSymbolicLink(
      watchDir.resolve("documents.parquet"),
      java.nio.file.Paths.get(dir, "documents.parquet"))
    val distinctFps = spark.readStream.schema(docSchema)
      .parquet(watchDir.toString)
      .select(md5(col("text")).as("fp"))
      .dropDuplicates("fp")
    val q = distinctFps.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$out/_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(s"$out/result")
      }
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$out/result")
  }

  /** DuckDB oracle for [[sessionizeEndToEnd]], generated from the SAME gap
    * constant: classic window-gap sessionization (break where the gap to
    * the previous event exceeds the threshold, session id = running break
    * count), keeping every session but each user's last — the exact set
    * the gap rule closes during the replay. Micros arithmetic matches the
    * operator's (both engines truncate the parquet nanos). */
  def sessionizeOracleSql(gapMinutes: Int = 30): String = {
    val gapUs = gapMinutes * 60L * 1000000L
    s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us,
                        CAST(value AS DECIMAL(18,2)) AS value FROM events),
       g AS (SELECT user_id, us, value,
               CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > $gapUs
                    THEN 1 ELSE 0 END AS brk
             FROM e),
       s AS (SELECT user_id, us, value,
               sum(brk) OVER (PARTITION BY user_id ORDER BY us
                              ROWS UNBOUNDED PRECEDING) AS sid
             FROM g),
       sess AS (SELECT user_id, sid, min(us) AS session_start_us,
                       max(us) AS session_end_us, count(*) AS n_events,
                       round(CAST(sum(value) AS DOUBLE), 2) AS total_value
                FROM s GROUP BY user_id, sid)
       SELECT user_id, session_start_us, session_end_us, n_events, total_value
       FROM (SELECT sess.*, max(sid) OVER (PARTITION BY user_id) AS last_sid
             FROM sess) t
       WHERE sid < last_sid
       ORDER BY user_id, session_start_us"""
  }
}
