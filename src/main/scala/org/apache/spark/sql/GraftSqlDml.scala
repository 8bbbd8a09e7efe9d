package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, LogicalPlan}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** SQL `UPDATE` / `DELETE FROM` / `INSERT INTO` for graft-registered
  * tables — the rest of the warehouse DML surface next to
  * [[GraftMergeInto]]'s MERGE. Spark parses all three; stock analysis
  * accepts UPDATE/DELETE only for DataSourceV2 tables, and INSERT INTO
  * an external parquet table would write RAW FILES into the registered
  * location — which for a graft table is the live VERSION DIR, an
  * unversioned mutation that bypasses the commit protocol (no record,
  * no stats, no feed; a later commit's link walk would silently absorb
  * the stragglers). The injected parser therefore rewrites all three
  * statements for registered targets into commands that run through
  * the versioned write path:
  *
  *  - `UPDATE t SET c = expr, … [WHERE cond]` — matched rows become new
  *    images (assignments cast to the column type, evaluated per row),
  *    the commit is COPY-ON-WRITE on partitioned tables (touched
  *    partitions = changed rows' OLD ∪ NEW partition values — a SET on
  *    a partition column moves rows, the origin leaf is rewritten or
  *    dropped) and carries the EXACT feed (only rows whose assigned
  *    values actually changed — an UPDATE that rewrites a value onto
  *    itself is a semantic no-op and commits NOTHING);
  *  - `DELETE FROM t [WHERE cond]` — same COW discipline, delete feed;
  *    a delete touching EVERY live partition (incl. the unconditional
  *    truncate) falls back to the full-snapshot commit path, whose
  *    empty-write schema fallback keeps a fully-emptied table readable;
  *  - `INSERT INTO t [(cols)] SELECT …` → an `appendVersion` commit
  *    (positional, `(cols)`-projected with NULL fill, or BY NAME);
  *    `INSERT OVERWRITE` → a snapshot `overwrite` commit. Static
  *    `PARTITION (p=v)` specs and IF NOT EXISTS are refused loudly.
  *
  * After each commit the catalog entry is re-registered so subsequent
  * `spark.sql` reads see the new version. Unregistered targets pass
  * through to stock Spark untouched.
  */
object GraftSqlDml {

  /** Opaque non-Product holders (the [[GraftMergeSpec]] rationale: the
    * analyzer must never try to resolve the raw condition/assignment
    * trees against these leaf commands).
    */
  final class UpdateSpec(val assignments: Seq[Assignment],
      val condition: Option[Expression]) extends Serializable
  final class DeleteSpec(val condition: Expression) extends Serializable
  final class InsertSpec(val query: LogicalPlan,
      val partitionSpec: Map[String, Option[String]],
      val userSpecifiedCols: Seq[String], val overwrite: Boolean,
      val ifPartitionNotExists: Boolean,
      val byName: Boolean) extends Serializable

  private[sql] def lookupOrFail(spark: SparkSession,
      ident: Seq[String]): GraftMergeInto.Entry =
    GraftMergeInto.lookup(spark, ident).getOrElse(
      throw new IllegalStateException(
        s"${ident.mkString(".")} is not (or no longer) graft-registered " +
          "in this session — register it via graft.io.Catalog." +
          "registerTable first"))

  private[sql] def targetCols(ident: Seq[String],
      table: graft.io.ParquetTable): Seq[String] =
    table.liveSchema.map(_.fieldNames.toSeq).getOrElse(
      throw new IllegalStateException(
        s"${ident.mkString(".")}: target carries no committed schema"))
}

/** `UPDATE t SET … [WHERE …]` on a registered table. */
final case class GraftUpdateCommand(targetIdent: Seq[String],
    spec: GraftSqlDml.UpdateSpec) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val entry = GraftSqlDml.lookupOrFail(spark, targetIdent)
    val table = entry.table
    val tgtCols = GraftSqlDml.targetCols(targetIdent, table)
    val amap = GraftMergeInto.assignMap(targetIdent, spec.assignments,
      tgtCols)
    require(amap.nonEmpty, "UPDATE needs at least one assignment")
    val current = table.read(spark)
    val tSchema = current.schema
    def castTo(c: Column, n: String): Column =
      c.cast(tSchema(tSchema.fieldIndex(n)).dataType)
    // NULL-condition rows are NOT matched (SQL three-valued WHERE)
    val hit = coalesce(
      spec.condition.map(GraftBridge.toColumn).getOrElse(lit(true)),
      lit(false))
    // old image + the would-be new values, to keep the feed EXACT:
    // rows whose assigned values do not actually change are no-ops
    val withNew = current.filter(hit).select(
      tgtCols.map(col) ++
        amap.toSeq.map { case (c, e) => castTo(e, c).as(s"__new_$c") }: _*)
    val changed = withNew.filter(
      amap.keys.map(c => !(col(c) <=> col(s"__new_$c"))).reduce(_ || _))
      .persist()
    try {
      val oldImg = changed.select(tgtCols.map(col): _*)
      val newImg = changed.select(tgtCols.map(c =>
        (if (amap.contains(c)) col(s"__new_$c") else col(c)).as(c)): _*)
      val feed = oldImg.withColumn("_change_type", lit("delete"))
        .unionByName(newImg.withColumn("_change_type", lit("insert")))
      def transform(df: DataFrame): DataFrame = df.select(tgtCols.map { c =>
        amap.get(c)
          .map(e => when(hit, castTo(e, c)).otherwise(col(c)))
          .getOrElse(col(c)).as(c)
      }: _*)
      val pCols = table.partitionColumns
      if (pCols.nonEmpty) {
        val touched = oldImg.select(pCols.map(col): _*)
          .unionByName(newImg.select(pCols.map(col): _*)).distinct()
        val vals = touched.collect()
        if (vals.isEmpty) () // semantic no-op: zero version churn
        else {
          val scope = current.filter(
            graft.merge.MergeOps.touchedPredicate(pCols, vals))
          // vals covers the written frame by construction (old ∪ new
          // image partition values) — hand the collected rows down
          // instead of two more distinct().collect() jobs in the commit
          table.replacePartitionsWithChangesCovering(transform(scope),
            feed, vals)
          ()
        }
      } else if (!changed.isEmpty) {
        table.overwriteWithChanges(transform(current), feed)
        ()
      }
    } finally { changed.unpersist(); () }
    graft.io.Catalog.registerTable(spark, entry.database, entry.name, table)
    Seq(Row(table.version.toLong))
  }
}

/** `DELETE FROM t WHERE …` on a registered table. */
final case class GraftDeleteCommand(targetIdent: Seq[String],
    spec: GraftSqlDml.DeleteSpec) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val entry = GraftSqlDml.lookupOrFail(spark, targetIdent)
    val table = entry.table
    val current = table.read(spark)
    val tgtCols = GraftSqlDml.targetCols(targetIdent, table)
    val hit = coalesce(GraftBridge.toColumn(spec.condition), lit(false))
    val matched = current.filter(hit).persist()
    try {
      val feed = matched.select(tgtCols.map(col): _*)
        .withColumn("_change_type", lit("delete"))
      val pCols = table.partitionColumns
      if (pCols.nonEmpty) {
        val touched = matched.select(pCols.map(col): _*).distinct()
        val vals = touched.collect()
        // live leaf count from the hive layout (metadata walk) — the
        // Spark-job fallback only for layouts without hive dirs
        def liveLeaves: Long = table.livePartitionLeafCount.map(_.toLong)
          .getOrElse(current.select(pCols.map(col): _*).distinct().count())
        if (vals.isEmpty) () // nothing matched: zero version churn
        else if (vals.length >= liveLeaves) {
          // every live partition is touched (incl. the unconditional
          // truncate): the replace path would stage an all-empty
          // partitioned write — commit the snapshot form instead, whose
          // empty-write schema fallback keeps the table readable
          table.overwriteWithChanges(current.filter(!hit), feed)
          ()
        } else {
          val scope = current.filter(
            graft.merge.MergeOps.touchedPredicate(pCols, vals))
          // survivors' partition values ⊆ the matched rows' (vals) —
          // covering form skips the commit's re-collection
          table.replacePartitionsWithChangesCovering(scope.filter(!hit),
            feed, vals)
          ()
        }
      } else if (!matched.isEmpty) {
        table.overwriteWithChanges(current.filter(!hit), feed)
        ()
      }
    } finally { matched.unpersist(); () }
    graft.io.Catalog.registerTable(spark, entry.database, entry.name, table)
    Seq(Row(table.version.toLong))
  }
}

/** `INSERT INTO / OVERWRITE t [(cols)] query` on a registered table —
  * routed through the versioned commit protocol instead of raw file
  * writes into the live version dir.
  */
final case class GraftInsertCommand(targetIdent: Seq[String],
    spec: GraftSqlDml.InsertSpec) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table_version", LongType, nullable = false)())

  private def fail(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"INSERT INTO ${targetIdent.mkString(".")}: $what is not " +
        "supported on graft-registered tables")

  override def run(spark: SparkSession): Seq[Row] = {
    if (spec.partitionSpec.nonEmpty) fail("a static PARTITION (...) spec")
    if (spec.ifPartitionNotExists) fail("IF NOT EXISTS")
    val entry = GraftSqlDml.lookupOrFail(spark, targetIdent)
    val table = entry.table
    val tgtCols = GraftSqlDml.targetCols(targetIdent, table)
    val df = classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], spec.query)
    val tSchema = table.liveSchema.get
    def castTo(c: Column, n: String): Column =
      c.cast(tSchema(tSchema.fieldIndex(n)).dataType)
    val out: DataFrame =
      if (spec.byName) {
        val missing = tgtCols.filterNot(c =>
          df.columns.exists(_.equalsIgnoreCase(c)))
        require(missing.isEmpty, s"INSERT BY NAME must supply every " +
          s"target column — missing ${missing.mkString(", ")}")
        df.select(tgtCols.map(c => castTo(col(c), c).as(c)): _*)
      } else if (spec.userSpecifiedCols.nonEmpty) {
        val specified = spec.userSpecifiedCols.map { n =>
          tgtCols.find(_.equalsIgnoreCase(n)).getOrElse(
            fail(s"unknown column '$n' in the insert column list"))
        }
        // a duplicated name would pass the arity check but collapse in
        // the byPos map — one query column silently dropped, another
        // NULL-filled; reject like Spark/Delta do
        require(specified.distinct.size == specified.size,
          s"INSERT INTO ${targetIdent.mkString(".")}: duplicate column " +
            s"in the insert column list (${spec.userSpecifiedCols
              .mkString(", ")})")
        require(df.columns.length == specified.length,
          s"INSERT (cols) arity mismatch: ${specified.length} columns " +
            s"listed, query produces ${df.columns.length}")
        val byPos = specified.zip(df.columns).toMap
        df.select(tgtCols.map { c =>
          byPos.get(c).map(q => castTo(col(q), c))
            .getOrElse(lit(null).cast(
              tSchema(tSchema.fieldIndex(c)).dataType)).as(c)
        }: _*)
      } else {
        require(df.columns.length == tgtCols.length,
          s"INSERT arity mismatch: target has ${tgtCols.length} columns, " +
            s"query produces ${df.columns.length}")
        df.toDF(tgtCols: _*)
          .select(tgtCols.map(c => castTo(col(c), c).as(c)): _*)
      }
    if (spec.overwrite) table.overwrite(out)
    else table.appendVersion(out)
    graft.io.Catalog.registerTable(spark, entry.database, entry.name, table)
    Seq(Row(table.version.toLong))
  }
}
