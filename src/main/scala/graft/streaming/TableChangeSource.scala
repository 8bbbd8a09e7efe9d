package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.io.ParquetTable

/** A graft versioned table as a STRUCTURED STREAMING SOURCE — Delta's
  * `spark.readStream.format("delta")` capability on the graft layout,
  * the seam that lets silver → gold chain as streams instead of
  * polling batch jobs:
  *
  * {{{
  *   spark.readStream.format("graft-table")
  *     .option("path", silver.path)
  *     [.option("startingVersion", "3")]
  *     [.option("maxVersionsPerTrigger", "10")]
  *     .load()
  * }}}
  *
  * Output rows are the table's columns plus `_change_type`
  * (`insert` | `delete` — an update is its delete+insert pair), i.e.
  * the write-side CDF shape [[graft.io.ParquetTable.changesBetween]]
  * serves.
  *
  * **Offsets ARE committed versions.** Offset `v` means "every change
  * up to and including version `v` has been emitted", so the
  * checkpoint's offset log gives exactly-once version delivery across
  * restarts for free — resuming a stream replays no version and skips
  * none (the restart-resume law in StreamingSpec). Trigger planning is
  * two pointer reads (`_current` + the offset), no data IO.
  *
  * **First batch.** By default the stream starts from the table's LIVE
  * version: the first batch is that version's full snapshot rendered
  * as `insert` rows (Delta's initial-snapshot semantics), and every
  * later batch is the exact span delta. With `startingVersion = N` the
  * snapshot is skipped and the stream serves changes STRICTLY AFTER
  * version N — the "I already have a copy as of N" consumer; `N` must
  * still be CDF-resolvable (retention horizon), refusals are
  * [[graft.io.ParquetTable.changesBetween]]'s own, loud at batch time.
  *
  * **Rate limiting.** `maxVersionsPerTrigger` caps how many versions
  * one micro-batch may cover (the initial snapshot always counts as
  * one trigger). Each span still resolves through the commit log's
  * grouped feed/append scans (O(changes), hybrid across the
  * retention horizon) — never a per-version loop of jobs.
  *
  * Scale: per trigger this is O(changes in span) — the same cost the
  * batch IVM consumers pay, now with the engine driving cadence. At
  * 100 TB the initial snapshot is the one heavy batch (unavoidable —
  * it IS the state handoff); production starts with
  * `startingVersion` anchored to a cloned/restored snapshot instead.
  */
final class GraftTableSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-table source: option 'path' (the table root) is required"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "graft-table source: the schema is the table's committed schema " +
        "plus _change_type — do not supply one")
    (shortName(), GraftTableSource.changeSchema(
      sqlContext.sparkSession, pathOf(parameters)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new GraftTableSource(sqlContext.sparkSession, pathOf(parameters),
      parameters.get("startingVersion").map { v =>
        val n = v.toIntOption.getOrElse(throw new IllegalArgumentException(
          s"graft-table source: startingVersion '$v' is not an integer"))
        require(n >= 1, s"graft-table source: startingVersion $n — graft " +
          "versions are 1-based; omit the option to start from the " +
          "initial snapshot instead")
        n
      },
      parameters.get("maxVersionsPerTrigger").map { v =>
        val n = v.toIntOption.getOrElse(0)
        require(n > 0, s"graft-table source: maxVersionsPerTrigger " +
          s"'$v' must be a positive integer")
        n
      })
}

private[streaming] object GraftTableSource {

  /** The table's committed schema + `_change_type` — the CDF shape. */
  def changeSchema(spark: SparkSession, path: String): StructType = {
    val table = new ParquetTable(path)
    require(table.exists, s"graft-table source: no graft table at $path")
    val base = table.liveSchema.getOrElse(
      // legacy tables without a schema sidecar: one read for the schema
      table.read(spark).schema)
    StructType(base.fields :+
      StructField("_change_type", StringType, nullable = false))
  }
}

/** See [[GraftTableSourceProvider]]. `startingVersion = None` → initial
  * snapshot of the live version, then deltas; `Some(n)` → deltas
  * strictly after version n.
  */
final class GraftTableSource(spark: SparkSession, path: String,
    startingVersion: Option[Int], maxVersionsPerTrigger: Option[Int])
    extends Source {

  private val table = new ParquetTable(path)
  override val schema: StructType =
    GraftTableSource.changeSchema(spark, path)
  private val dataCols = schema.fields.map(_.name).filter(_ != "_change_type")

  // the version the initial snapshot covers (pinned ONCE at source
  // creation so a mid-stream commit cannot move the snapshot boundary);
  // with startingVersion the consumer declared it already holds N
  private val baseVersion: Int = startingVersion.getOrElse(table.version)
  private val snapshotFirst = startingVersion.isEmpty

  private def versionOf(o: V1Offset): Int = o match {
    case l: LongOffset => l.offset.toInt
    // restart replay hands back the checkpoint's SerializedOffset —
    // a LongOffset's json is just the number
    case other => other.json.trim.toInt
  }

  /** Latest offset this trigger may cover: the live version, clamped
    * by the rate limit. Two pointer reads, no data IO.
    */
  override def getOffset: Option[V1Offset] = {
    val current = table.version
    if (current == 0) return None // table vanished / not yet created
    val floor = committed.getOrElse(
      if (snapshotFirst) baseVersion - 1 else baseVersion)
    val target = maxVersionsPerTrigger match {
      case Some(k) =>
        // the initial snapshot is ONE trigger regardless of k (it is a
        // single version read, not a span of deltas)
        if (snapshotFirst && committed.isEmpty) math.min(current, baseVersion)
        else math.min(current, floor + k)
      case None => current
    }
    if (target <= floor) None else Some(LongOffset(target.toLong))
  }

  // highest version this source has HANDED OUT as a batch end (offset
  // progression state; the checkpoint's offset log owns durability)
  @volatile private var committed: Option[Int] = None

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endV = versionOf(end)
    committed = Some(math.max(endV, committed.getOrElse(endV)))
    val fromV = start.map(versionOf).getOrElse(
      if (snapshotFirst) -1 else baseVersion)
    val batch: DataFrame =
      if (fromV == -1) {
        // initial snapshot: the pinned base version as insert rows,
        // plus the deltas of any versions the clamp let past it
        val snap = table.readVersion(spark, math.min(baseVersion, endV))
          .select(dataCols.map(col).toIndexedSeq: _*)
          .withColumn("_change_type", lit("insert"))
        if (endV > baseVersion)
          snap.unionByName(table.changesBetween(spark, baseVersion, endV))
        else snap
      } else if (endV <= fromV) {
        // restart replay of an already-committed range / no new data
        org.apache.spark.sql.GraftStreamBridge
          .emptyStreamingBatch(spark, schema)
      } else table.changesBetween(spark, fromV, endV)
    batch match {
      case b if b.isStreaming => b
      case b => org.apache.spark.sql.GraftStreamBridge.asStreamingBatch(
        b.select(schema.fields.map(f => col(f.name)).toIndexedSeq: _*))
    }
  }

  override def commit(end: V1Offset): Unit = ()
  override def stop(): Unit = ()
}
