package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.LongType

/** The SQL maintenance verbs on graft-registered tables — the
  * statements Delta adds to the grammar with its own parser extension,
  * matched here BEFORE delegation (they are not in Spark's stock
  * grammar at all, so an unmatched/unregistered statement falls through
  * to the delegate's standard parse error):
  *
  *  - `VACUUM db.t` → [[graft.io.ParquetTable.vacuum]] (drop all
  *    version dirs but the live one; the `_log` survives, so DESCRIBE
  *    HISTORY and CDF feeds outlive the reclaim). `RETAIN n HOURS` is
  *    refused loudly — graft's retention knobs are
  *    `vacuumKeepingFeeds`' explicit horizon, not a wall-clock window;
  *  - `OPTIMIZE db.t [ZORDER BY (c1, c2, …)]` →
  *    [[graft.io.ParquetTable.compact]] /
  *    [[graft.io.ParquetTable.compactZOrder]] — target file count from
  *    `-Dgraft.optimize.targetPartitions` (default: the session's
  *    shuffle partitions);
  *  - `DESCRIBE HISTORY db.t` → [[graft.io.ParquetTable.history]] as a
  *    plain query plan (version / kind / monotonic commit timestamp /
  *    file footprint).
  *
  * Matching is deliberately STRICT (anchored keyword + identifier
  * grammar): a statement that merely starts with a keyword but does
  * not fully match falls through to the delegate rather than being
  * half-parsed.
  */
object GraftMaintenanceSql {

  // identifiers: bare or backtick-quoted, 1 or 2 parts
  private val Id = "(?:`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)"
  private val Tbl = s"($Id(?:\\.$Id)?)"
  private val VacuumRe =
    s"(?is)^\\s*VACUUM\\s+$Tbl\\s*;?\\s*$$".r
  private val VacuumRetainRe =
    s"(?is)^\\s*VACUUM\\s+$Tbl\\s+RETAIN\\b.*$$".r
  private val OptimizeRe =
    s"(?is)^\\s*OPTIMIZE\\s+$Tbl\\s*;?\\s*$$".r
  private val OptimizeZRe =
    s"(?is)^\\s*OPTIMIZE\\s+$Tbl\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\)\\s*;?\\s*$$".r
  private val HistoryRe =
    s"(?is)^\\s*DESCRIBE\\s+HISTORY\\s+$Tbl\\s*;?\\s*$$".r
  private val RestoreVRe =
    s"(?is)^\\s*RESTORE\\s+TABLE\\s+$Tbl\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$$".r
  private val RestoreTRe =
    s"(?is)^\\s*RESTORE\\s+TABLE\\s+$Tbl\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*$$".r
  private val CloneRe =
    (s"(?is)^\\s*CREATE\\s+TABLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?$Tbl\\s+" +
      s"SHALLOW\\s+CLONE\\s+$Tbl(?:\\s+LOCATION\\s+'([^']+)')?\\s*;?\\s*$$").r
  private val DeepCloneRe =
    (s"(?is)^\\s*CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?$Tbl\\s+" +
      s"DEEP\\s+CLONE\\s+$Tbl\\b.*$$").r

  // Tokenize per SEGMENT (backtick-quoted or bare), never split on raw
  // '.': a dot INSIDE backticks (VACUUM `a.b`) is part of the name, and
  // a naive split would miss the registry and surface the delegate's
  // generic parse error instead of running on the registered table.
  private val Segment = "`([^`]+)`|([A-Za-z_][A-Za-z0-9_]*)".r
  private def parts(ident: String): Seq[String] =
    Segment.findAllMatchIn(ident)
      .map(m => Option(m.group(1)).getOrElse(m.group(2))).toSeq

  private def registered(spark: SparkSession, ident: String): Boolean =
    GraftMergeInto.lookup(spark, parts(ident)).nonEmpty

  /** Try to parse `sqlText` as a maintenance statement on a REGISTERED
    * table; None falls through to the delegate parser untouched.
    */
  def tryParse(spark: SparkSession, sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case VacuumRetainRe(ident) if registered(spark, ident) =>
        throw new UnsupportedOperationException(
          s"VACUUM $ident RETAIN …: graft vacuum reclaims all non-live " +
            "version dirs; feed/time-travel retention is the explicit " +
            "vacuumKeepingFeeds horizon, not a wall-clock window")
      case VacuumRe(ident) if registered(spark, ident) =>
        Some(GraftVacuumCommand(parts(ident)))
      case OptimizeZRe(ident, cols) if registered(spark, ident) =>
        Some(GraftOptimizeCommand(parts(ident),
          cols.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
            .map(c => parts(c).last)))
      case OptimizeRe(ident) if registered(spark, ident) =>
        Some(GraftOptimizeCommand(parts(ident), Nil))
      case HistoryRe(ident) if registered(spark, ident) =>
        val entry = GraftSqlDml.lookupOrFail(spark, parts(ident))
        Some(entry.table.history(
          spark.asInstanceOf[classic.SparkSession]).queryExecution.analyzed)
      // RESTORE TABLE … TO VERSION/TIMESTAMP AS OF — Delta's rollback
      // verb; the restore is ONE MORE COMMIT (history intact), served by
      // ParquetTable.restoreVersion/restoreToTimestamp
      case RestoreVRe(ident, v) if registered(spark, ident) =>
        Some(GraftRestoreCommand(parts(ident), Some(v.toInt), None))
      case RestoreTRe(ident, ts) if registered(spark, ident) =>
        Some(GraftRestoreCommand(parts(ident), None, Some(parseTs(ts))))
      // CREATE TABLE dst SHALLOW CLONE src — zero-copy hard-link clone
      // (ParquetTable.cloneTo); DEEP CLONE refuses loudly: the shallow
      // clone here is already vacuum-durable (shared inodes), so the
      // copy would buy nothing but the write
      case CloneRe(ine, dst, src, loc) if registered(spark, src) =>
        Some(GraftCloneCommand(parts(src), parts(dst), Option(loc),
          ifNotExists = ine != null))
      case DeepCloneRe(_, src) if registered(spark, src) =>
        throw new UnsupportedOperationException(
          s"CREATE TABLE … DEEP CLONE $src: graft clones are hard-link " +
            "snapshots, durable against source vacuum (shared inodes) — " +
            "use SHALLOW CLONE; a deep copy would buy nothing but the " +
            "write")
      case _ => None
    }

  /** RESTORE's timestamp operand, interpreted in UTC (the engine's
    * session timezone contract): `yyyy-MM-dd HH:mm:ss[.SSS]` or an
    * ISO-8601 instant; anything else refuses loudly.
    */
  private def parseTs(s: String): Long = {
    val local = try {
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss[.SSS]")
      Some(java.time.LocalDateTime.parse(s.trim, fmt)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    } catch { case _: java.time.format.DateTimeParseException => None }
    local.orElse {
      try Some(java.time.Instant.parse(s.trim).toEpochMilli)
      catch { case _: java.time.format.DateTimeParseException => None }
    }.getOrElse(throw new IllegalArgumentException(
      s"RESTORE TABLE … TO TIMESTAMP AS OF: cannot parse '$s' — use " +
        "'yyyy-MM-dd HH:mm:ss[.SSS]' (UTC) or an ISO-8601 instant"))
  }

  private[sql] def targetPartitions(spark: SparkSession): Int =
    sys.props.get("graft.optimize.targetPartitions").flatMap(_.toIntOption)
      .getOrElse(spark.asInstanceOf[classic.SparkSession]
        .sessionState.conf.numShufflePartitions)
}

/** `VACUUM t`: reclaim all non-live version dirs (the `_log` survives —
  * history and retained feeds outlive the reclaim).
  */
final case class GraftVacuumCommand(targetIdent: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val entry = GraftSqlDml.lookupOrFail(spark, targetIdent)
    entry.table.vacuum()
    Seq(Row(entry.table.version.toLong))
  }
}

/** `OPTIMIZE t [ZORDER BY (...)]`: compaction commit (plain or
  * Morton-clustered), then the catalog entry repoints at the new
  * version.
  */
final case class GraftOptimizeCommand(targetIdent: Seq[String],
    zCols: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val entry = GraftSqlDml.lookupOrFail(spark, targetIdent)
    val n = GraftMaintenanceSql.targetPartitions(spark)
    if (zCols.isEmpty) entry.table.compact(spark, n)
    else entry.table.compactZOrder(spark, n, zCols)
    graft.io.Catalog.registerTable(spark, entry.database, entry.name,
      entry.table)
    Seq(Row(entry.table.version.toLong))
  }
}

/** `RESTORE TABLE t TO VERSION/TIMESTAMP AS OF …`: rollback as ONE MORE
  * COMMIT (hard links to the target snapshot, history intact — Delta's
  * RESTORE semantics via [[graft.io.ParquetTable.restoreVersion]] /
  * `restoreToTimestamp`); refusals (vacuumed snapshot, below-horizon
  * timestamp) are the table API's own, loud. The catalog entry repoints
  * at the restored version.
  */
final case class GraftRestoreCommand(targetIdent: Seq[String],
    version: Option[Int], tsMillis: Option[Long])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val entry = GraftSqlDml.lookupOrFail(spark, targetIdent)
    (version, tsMillis) match {
      case (Some(v), _) => entry.table.restoreVersion(v)
      case (_, Some(ms)) => entry.table.restoreToTimestamp(ms)
      case _ => throw new IllegalStateException(
        "RESTORE needs a version or a timestamp")
    }
    graft.io.Catalog.registerTable(spark, entry.database, entry.name,
      entry.table)
    Seq(Row(entry.table.version.toLong))
  }
}

/** `CREATE TABLE dst SHALLOW CLONE src [LOCATION '…']`: zero-copy
  * hard-link clone ([[graft.io.ParquetTable.cloneTo]] — O(#files) at
  * any data size, own commit history seeded with the source's per-file
  * stats, durable against source vacuum). Default location = the
  * session catalog's standard path for `dst`; `IF NOT EXISTS` over an
  * existing graft layout just registers it.
  */
final case class GraftCloneCommand(srcIdent: Seq[String],
    dstIdent: Seq[String], location: Option[String],
    ifNotExists: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val s = spark.asInstanceOf[classic.SparkSession]
    val src = GraftSqlDml.lookupOrFail(spark, srcIdent)
    val (db, name) = GraftSqlDdl.resolveIdent(spark, dstIdent)
    require(spark.catalog.databaseExists(db),
      s"CREATE TABLE ${dstIdent.mkString(".")} SHALLOW CLONE: database " +
        s"'$db' does not exist — CREATE DATABASE it first")
    val loc = location.getOrElse(java.nio.file.Paths.get(
      s.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(name, Some(db))))
      .toString)
    val existing = new graft.io.ParquetTable(loc,
      src.table.partitionColumns)
    val cloned =
      if (existing.exists) {
        if (!ifNotExists) throw new IllegalStateException(
          s"CREATE TABLE ${dstIdent.mkString(".")} SHALLOW CLONE: a " +
            s"graft table already exists at $loc — use IF NOT EXISTS " +
            "to adopt it or DROP it first")
        existing
      } else src.table.cloneTo(loc)
    graft.io.Catalog.registerTable(spark, db, name, cloned)
    Seq(Row(cloned.version.toLong))
  }
}
