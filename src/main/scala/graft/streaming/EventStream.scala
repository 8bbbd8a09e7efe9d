package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table (SURVEY.md §2.11: the
  * reference is batch-only — its incremental behavior comes from idempotent
  * MERGE re-runs; this module expresses the same pipeline as a stream, the
  * natural Spark form at 100 TB/day ingest).
  *
  * The parquet source's `ts` has shipped as both TIMESTAMP(NANOS)-as-long
  * and timestamp[µs]; [[readEvents]] sniffs the footer schema (a stream
  * source needs a declared schema) and normalizes to the long-ns contract
  * the rest of the engine uses. `ts DIV 1000` conversions are integer
  * division so no precision is lost to a double round-trip.
  */
object EventStream {

  /** Fallback schema (current timestamp[µs] vintage) for declaring the
    * stream BEFORE any file has landed — the normal ingest pattern; footer
    * sniffing would otherwise fail the declaration on an empty source.
    */
  private val DefaultEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-stream source over the testdata events parquet, `ts` normalized
    * to long ns-since-epoch regardless of the file vintage
    * ([[graft.io.Tables.normalizeTs]] — single-sourced with the batch
    * reader). The one batch read is footer-only (schema inference); if no
    * file exists yet the current-vintage default schema declares the
    * stream.
    */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame =
    graft.io.Tables.normalizeTs(
      graft.io.Tables.readStreamTable(spark, sfDir, "events",
        DefaultEventSchema))
      .withColumn("event_time", expr("timestamp_micros(ts DIV 1000)"))

  /** Watermarked tumbling-window aggregation — the streaming form of
    * q18_events_hourly. Append-mode-safe: results finalize once the
    * watermark passes the window end.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("events"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("events"), col("value_cents"))

  /** Streaming medallion ingest: each micro-batch lands in the bronze table
    * through the same insert-only merge the batch pipeline uses
    * (foreachBatch + MergeOps.insertIfAbsent) — exactly-once by content key,
    * replay-safe, mirroring the reference's idempotent re-run semantics in
    * streaming form.
    */
  def incrementalIngest(events: DataFrame, table: graft.io.ParquetTable,
      keys: Seq[String]): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        table.writeMerged(batch.sparkSession, batch.toDF())(
          graft.merge.MergeOps.insertIfAbsent(_, _, keys))
        ()
      }
      .start()

  /** Streaming exact dedup bounded by the watermark: duplicate keys within
    * the lateness window are dropped; state for a key is evictable once the
    * watermark passes it. Plain `dropDuplicates` on a stream keeps EVERY
    * key forever — at 100 TB/day ingest that state never stops growing;
    * within-watermark dedup is the shape that survives.
    */
  def dedupEvents(events: DataFrame, keys: Seq[String] = Seq("event_id"),
      lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  final case class SessionEvent(user_id: Long, event_time: java.sql.Timestamp,
      value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)
  final case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Custom stateful operator (KeyValueGroupedDataset +
    * flatMapGroupsWithState): sessionization with a gap timeout — emits a
    * session row once `gapMinutes` pass with no event from the user. State
    * per user is O(1); the shuffle is on user_id only.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def update(userId: Long, rows: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[UserSession] = {
      val sorted = rows.toSeq.sortBy(_.event_time.getTime)
      var closed = List.empty[UserSession]
      var cur = state.getOption
      // Same-batch stragglers (older than the open session by more than the
      // gap) accumulate here so CONSECUTIVE in-batch stragglers within gapMs
      // of each other merge into one session, exactly as the batch mirror
      // (q32) would — events are sorted, so no extra persisted state is
      // needed. Only the CROSS-batch case (a later arrival in a future
      // batch that would have merged with this straggler) remains the
      // documented bounded-state approximation.
      var strag: Option[SessionState] = None
      def closeStrag(): Unit = strag.foreach { g =>
        closed ::= UserSession(userId, new java.sql.Timestamp(g.start),
          new java.sql.Timestamp(g.last), g.n, g.total)
        strag = None
      }
      sorted.foreach { e =>
        val t = e.event_time.getTime
        cur match {
          case Some(s) if t - s.last <= gapMs && t >= s.start - gapMs =>
            // a cross-batch out-of-order event (t < s.last, still above the
            // watermark) must not shrink the session bounds or its timeout —
            // but it only BELONGS to this session if it falls within gapMs
            // of the session's span; the batch mirror (q32) would otherwise
            // put it in its own earlier session
            cur = Some(s.copy(start = math.min(s.start, t),
              last = math.max(s.last, t), n = s.n + 1, total = s.total + e.value))
          case Some(s) if t < s.start - gapMs =>
            strag match {
              case Some(g) if t - g.last <= gapMs =>
                // sorted order guarantees t >= g.last here
                strag = Some(g.copy(last = t, n = g.n + 1,
                  total = g.total + e.value))
              case _ =>
                closeStrag()
                strag = Some(SessionState(t, t, 1, e.value))
            }
          case Some(s) =>
            closed ::= UserSession(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n, s.total)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      // a later in-batch event may have merged into the open session and
      // LOWERED its start to within gapMs of the straggler chain — the batch
      // mirror (q32) would then produce one session, so fold the chain into
      // the open session instead of closing it separately
      (strag, cur) match {
        case (Some(g), Some(s)) if s.start - g.last <= gapMs =>
          cur = Some(s.copy(start = math.min(g.start, s.start),
            n = s.n + g.n, total = s.total + g.total))
          strag = None
        case _ => ()
      }
      closeStrag()
      if (state.hasTimedOut) {
        val out = cur.map(s => UserSession(userId, new java.sql.Timestamp(s.start),
          new java.sql.Timestamp(s.last), s.n, s.total))
        state.remove()
        return (closed.reverse ++ out).iterator
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + gapMs)
      }
      closed.reverse.iterator
    }

    events
      .withWatermark("event_time", "1 hour")
      .select(col("user_id"), col("event_time"), col("value"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
