package graft

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.ParquetTable

/** The graft table as a streaming source
  * ([[graft.streaming.GraftTableSource]]): initial snapshot + exact
  * span deltas fold to the live table (stream ≡ batch CDF), offsets
  * are versions so a checkpointed restart resumes without replaying or
  * skipping a version, `maxVersionsPerTrigger` paces the catch-up, and
  * `startingVersion` skips the snapshot.
  */
class TableSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): ParquetTable = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tsrc")
    val t = new ParquetTable(s"$dir/t", partitionColumns = Seq("status"))
    t.overwrite(Seq((1L, "O", 10L), (2L, "O", 20L), (3L, "F", 30L))
      .toDF("id", "status", "cents"))
    t
  }

  private def upsert(t: ParquetTable, rows: Seq[(Long, String, Long)],
      dels: Seq[Long] = Nil): Unit = {
    val ups = rows.toDF("id", "status", "cents")
    val delKeys = dels.toDF("id")
    graft.merge.MergeOps.applyCdc(spark, t, ups, Some(delKeys), Seq("id"),
      skipEmptyFeed = false)
    ()
  }

  /** Collected (batchId-ordered) change batches; rows as (id, status,
    * cents, _change_type).
    */
  private final class Collector {
    val batches = ListBuffer.empty[Seq[(Long, String, Long, String)]]
    def sink(b: Dataset[Row], id: Long): Unit = {
      val rows = b.collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getString(3))).toSeq
      synchronized { if (rows.nonEmpty) { batches += rows; () } }
    }
  }

  private def readSource(t: ParquetTable,
      options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(spark.readStream.format("graft-table")
      .option("path", t.path))((r, kv) => r.option(kv._1, kv._2))
      .load().select(col("id"), col("status"), col("cents"),
        col("_change_type"))

  private def run(df: DataFrame, c: Collector, checkpoint: String): Unit = {
    val q = df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(c.sink _)
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Fold the collected batches over the snapshot-carrying first batch:
    * state := (state \ deletes) ∪ inserts, per batch in order.
    */
  private def fold(batches: Seq[Seq[(Long, String, Long, String)]])
      : Seq[(Long, String, Long)] = {
    def multiset(rows: Seq[(Long, String, Long)]) =
      rows.groupBy(identity).view.mapValues(_.size).toMap
    var state = Map.empty[(Long, String, Long), Int]
    for (b <- batches) {
      val dels = multiset(b.filter(_._4 == "delete").map(r => (r._1, r._2, r._3)))
      val ins = multiset(b.filter(_._4 == "insert").map(r => (r._1, r._2, r._3)))
      dels.foreach { case (k, n) =>
        val left = state.getOrElse(k, 0) - n
        assert(left >= 0, s"delete of $k not present in folded state")
        state = if (left == 0) state - k else state + (k -> left)
      }
      ins.foreach { case (k, n) => state = state + (k -> (state.getOrElse(k, 0) + n)) }
    }
    state.toSeq.flatMap { case (k, n) => Seq.fill(n)(k) }
  }

  private def tableRows(t: ParquetTable): Seq[(Long, String, Long)] =
    t.read(spark).select(col("id"), col("status"), col("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq

  test("initial snapshot + exact span deltas fold to the live table " +
      "across upserts, deletes and a cross-partition move; a trigger " +
      "with no new versions emits nothing") {
    val t = freshTable()
    upsert(t, Seq((2L, "O", 25L), (4L, "P", 40L))) // v2: update + insert
    val c = new Collector
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_tsrc_ck").toString
    val src = readSource(t)
    run(src, c, ckpt)
    // first batch IS the v2 snapshot as inserts
    assert(c.batches.nonEmpty &&
      c.batches.head.forall(_._4 == "insert") &&
      c.batches.head.size == 4)
    assert(fold(c.batches.toSeq).sorted == tableRows(t).sorted)
    val nAfterSnapshot = c.batches.size

    // replay with nothing new: zero batches
    run(src, c, ckpt)
    assert(c.batches.size == nAfterSnapshot,
      "a restart with no new versions must emit nothing")

    // v3: delete + cross-partition move (2 O->P) + insert, then v4
    upsert(t, Seq((2L, "P", 26L), (5L, "F", 50L)), dels = Seq(1L))
    upsert(t, Seq((5L, "F", 55L)))
    run(src, c, ckpt)
    assert(fold(c.batches.toSeq).sorted == tableRows(t).sorted)
    // the post-snapshot stream equals the batch CDF span 2 -> 4
    val streamed = c.batches.drop(nAfterSnapshot).flatten
    val cdf = t.changesBetween(spark, 2, 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("status"),
        r.getAs[Long]("cents"), r.getAs[String]("_change_type"))).toSeq
    assert(streamed.sorted == cdf.sorted,
      "streamed deltas must equal the batch CDF for the same span")
  }

  test("offsets are versions: a checkpointed restart resumes exactly " +
      "where it stopped — versions committed while the stream was down " +
      "arrive once, nothing replays") {
    val t = freshTable()
    val c = new Collector
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_tsrc_ck").toString
    run(readSource(t), c, ckpt) // snapshot of v1
    val nSnap = c.batches.size
    assert(fold(c.batches.toSeq).sorted == tableRows(t).sorted)

    // while the stream is DOWN: two commits
    upsert(t, Seq((1L, "O", 11L)))
    upsert(t, Seq((9L, "P", 90L)), dels = Seq(3L))

    run(readSource(t), c, ckpt) // fresh source instance, same checkpoint
    assert(fold(c.batches.toSeq).sorted == tableRows(t).sorted)
    val streamed = c.batches.drop(nSnap).flatten
    val cdf = t.changesBetween(spark, 1, 3)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("status"),
        r.getAs[Long]("cents"), r.getAs[String]("_change_type"))).toSeq
    assert(streamed.sorted == cdf.sorted,
      "the catch-up after restart must be exactly the missed span")
  }

  test("maxVersionsPerTrigger paces catch-up one version per batch; " +
      "startingVersion skips the snapshot and serves changes strictly " +
      "after it") {
    val t = freshTable() // v1
    upsert(t, Seq((4L, "P", 40L))) // v2
    upsert(t, Seq((4L, "P", 41L))) // v3
    upsert(t, Seq((6L, "O", 60L)), dels = Seq(3L)) // v4

    // paced: snapshot (1 trigger) + one batch per remaining version
    val c = new Collector
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_tsrc_ck").toString
    run(readSource(t, Map("maxVersionsPerTrigger" -> "1")), c, ckpt)
    assert(fold(c.batches.toSeq).sorted == tableRows(t).sorted)
    // NOTE: the snapshot pins the LIVE version at source creation (v4
    // here), so pacing shows on versions committed after start
    upsert(t, Seq((7L, "F", 70L))) // v5
    upsert(t, Seq((8L, "F", 80L))) // v6
    val before = c.batches.size
    run(readSource(t, Map("maxVersionsPerTrigger" -> "1")), c, ckpt)
    assert(c.batches.size == before + 2,
      s"two versions at one per trigger must arrive as two batches, " +
        s"got ${c.batches.size - before}")
    assert(fold(c.batches.toSeq).sorted == tableRows(t).sorted)

    // startingVersion: no snapshot, exactly the 2 -> 4 span
    val c2 = new Collector
    val ckpt2 = java.nio.file.Files
      .createTempDirectory("graft_tsrc_ck").toString
    run(readSource(t, Map("startingVersion" -> "2")), c2, ckpt2)
    val streamed = c2.batches.flatten
    val cdf = t.changesBetween(spark, 2, 6)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("status"),
        r.getAs[Long]("cents"), r.getAs[String]("_change_type"))).toSeq
    assert(streamed.sorted == cdf.sorted,
      "startingVersion must serve exactly the changes after it, no snapshot")
  }

  test("a silver -> mirror chain maintained FROM the table source " +
      "equals the silver table (the streaming IVM consumer shape)") {
    val t = freshTable()
    upsert(t, Seq((2L, "P", 21L), (5L, "F", 50L)), dels = Seq(1L))
    val mirrorDir = java.nio.file.Files.createTempDirectory("graft_tsrc_m")
    val mirror = new ParquetTable(s"$mirrorDir/m",
      partitionColumns = Seq("status"))
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_tsrc_ck").toString
    val q = readSource(t).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        val ups = b.filter(col("_change_type") === "insert")
          .drop("_change_type")
        val dels = b.filter(col("_change_type") === "delete").select("id")
        if (!mirror.exists) mirror.createIfNotExists(ups.limit(0))
        graft.merge.MergeOps.applyCdc(b.sparkSession, mirror, ups,
          Some(dels), Seq("id"), skipEmptyFeed = true)
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(tableRows(mirror).sorted == tableRows(t).sorted)
    } finally q.stop()
    // more history while down, restart, still equal
    upsert(t, Seq((7L, "O", 70L)), dels = Seq(5L))
    val q2 = readSource(t).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        val ups = b.filter(col("_change_type") === "insert")
          .drop("_change_type")
        val dels = b.filter(col("_change_type") === "delete").select("id")
        graft.merge.MergeOps.applyCdc(b.sparkSession, mirror, ups,
          Some(dels), Seq("id"), skipEmptyFeed = true)
        ()
      }.start()
    try {
      q2.processAllAvailable()
      assert(tableRows(mirror).sorted == tableRows(t).sorted)
    } finally q2.stop()
  }
}
