package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Structured Streaming: the streaming hourly aggregation must converge to
  * the batch answer (q18), and sessionization must emit plausible sessions.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming hourly counts converge to the batch q18 result") {
    val q = EventStream.hourlyCounts(EventStream.readEvents(spark, dir))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = TestSpark.rows(spark.table("hourly"))
    val batch = TestSpark.rows(
      SparkEntry.queries("q18_events_hourly")(spark, dir))
    assert(streamed == batch)
  }

  test("incremental ingest lands events exactly once, replay-safe") {
    val table = new graft.io.ParquetTable(
      java.nio.file.Files.createTempDirectory("graft_stream").toString + "/bronze_events")
    val expected = graft.io.Tables.read(spark, dir, "events").count()

    def runOnce(): Unit = {
      val q = EventStream.incrementalIngest(
        EventStream.readEvents(spark, dir), table, Seq("event_id"))
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    assert(table.read(spark).count() == expected)
    // replaying the same source (fresh stream, no checkpoint) must not duplicate
    runOnce()
    assert(table.read(spark).count() == expected)
  }

  test("watermark-bounded streaming dedup drops replayed events") {
    // two independent reads of the events table unioned = every event twice
    val doubled = EventStream.readEvents(spark, dir)
      .union(EventStream.readEvents(spark, dir))
    val q = EventStream.dedupEvents(doubled)
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("deduped").count()
    val distinctIds = graft.io.Tables.read(spark, dir, "events")
      .select("event_id").distinct().count()
    assert(got == distinctIds)
  }

  test("streaming corpus intake equals the batch transform exactly") {
    import graft.streaming.CorpusStream
    val q = CorpusStream.intake(CorpusStream.readDocuments(spark, dir))
      .writeStream.format("memory").queryName("intake")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = TestSpark.rows(spark.table("intake"))
    val batch = TestSpark.rows(
      CorpusStream.intake(graft.io.Tables.read(spark, dir, "documents")))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming corpus intake lands in the warehouse exactly once, replay-safe") {
    import graft.streaming.{CorpusStream, EventStream}
    val table = new graft.io.ParquetTable(
      java.nio.file.Files.createTempDirectory("graft_corpus").toString + "/bronze_docs")
    val expected = CorpusStream
      .intake(graft.io.Tables.read(spark, dir, "documents")).count()
    def runOnce(): Unit = {
      val q = EventStream.incrementalIngest(
        CorpusStream.intake(CorpusStream.readDocuments(spark, dir)),
        table, Seq("doc_id"))
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    assert(table.read(spark).count() == expected)
    runOnce() // replay must not duplicate (content-keyed insert-if-absent)
    assert(table.read(spark).count() == expected)
  }

  test("sessionize emits gap-separated sessions per user") {
    val q = EventStream.sessionize(EventStream.readEvents(spark, dir), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val sessions = spark.table("sessions").collect()
    // with event-time timeouts, sessions only close once the watermark
    // passes; a single static batch closes sessions via the final watermark
    assert(sessions.nonEmpty)
    assert(sessions.forall(r =>
      !r.getTimestamp(1).after(r.getTimestamp(2)) && r.getLong(3) >= 1))
  }
}
