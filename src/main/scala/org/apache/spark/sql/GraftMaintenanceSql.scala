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
      case _ => None
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
