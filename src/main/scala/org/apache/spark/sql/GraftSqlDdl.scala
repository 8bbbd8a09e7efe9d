package org.apache.spark.sql

import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{ColumnDefinition, LogicalPlan, TableSpecBase, UnresolvedTableSpec}
import org.apache.spark.sql.connector.expressions.{IdentityTransform, Transform}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StructType}

/** SQL DDL for graft tables — the statements that close the SQL-only
  * deployment loop (the reference's own pipeline creates its tables
  * declaratively; until now a graft table had to be created and
  * registered from Scala via `graft.io.Catalog`):
  *
  *  - `CREATE TABLE [IF NOT EXISTS] db.t (cols) USING graft
  *    [PARTITIONED BY (c, …)] [LOCATION '…']` — initializes the
  *    versioned layout at the location (default: the session catalog's
  *    standard table path) with an EMPTY version of the declared
  *    schema, then registers it (catalog entry + commit-metadata stats
  *    + MERGE/DML/maintenance-verb registry). `IF NOT EXISTS` ADOPTS an
  *    existing versioned layout at the location after a loud
  *    schema-compatibility check — the create-if-absent idempotence the
  *    reference's notebooks rely on (S2);
  *  - `CREATE TABLE … USING graft [PARTITIONED BY (…)] AS SELECT …`
  *    (CTAS) — first version IS the query result;
  *  - `[CREATE OR] REPLACE TABLE … USING graft …` — an `overwrite`
  *    commit of the declared empty schema / the CTAS result; the
  *    version history SURVIVES (replace is one more commit, Delta's
  *    REPLACE semantics), time travel reaches pre-replace versions;
  *  - `DROP TABLE [IF EXISTS] db.t [PURGE]` on a REGISTERED graft
  *    table — drops the catalog entry and the bridge registration;
  *    the versioned data survives on disk (external-location
  *    semantics) unless `PURGE`, which deletes the table root
  *    loudly (a log line naming the path).
  *
  * Matching: the stock grammar parses all of these; the injected
  * parser rewrites `CreateTable`/`CreateTableAsSelect`/`ReplaceTable`/
  * `ReplaceTableAsSelect` whose `tableSpec.provider` is `graft`, and
  * `DropTable` whose target names a registered graft table. Everything
  * else (other providers, unregistered names) passes through to stock
  * Spark untouched. Anything the versioned layout cannot honor exactly
  * — non-identity partition transforms, bucketing, TBLPROPERTIES,
  * OPTIONS, SerDe, column DEFAULT / GENERATED / IDENTITY, NOT NULL,
  * table constraints — refuses loudly naming the construct, never a
  * silent approximation.
  *
  * Scale note: CREATE writes one empty version (metadata-sized); CTAS
  * writes the query result through the standard commit (stats census +
  * log record); DROP touches no data files unless PURGE. Nothing here
  * scans a table.
  */
object GraftSqlDdl {

  /** Opaque non-Product carrier (the [[GraftMergeSpec]] rationale): the
    * parsed column definitions and CTAS query must not be exposed to
    * the analyzer through a command's product elements.
    */
  final class CreateSpec(val columns: Seq[ColumnDefinition],
      val partitioning: Seq[Transform], val tableSpec: TableSpecBase,
      val query: Option[LogicalPlan], val ignoreIfExists: Boolean,
      val replace: Boolean, val orCreate: Boolean) extends Serializable

  private[sql] def identOf(name: LogicalPlan): Option[Seq[String]] =
    name match {
      case UnresolvedIdentifier(parts, _) => Some(parts)
      // ALTER TABLE / TRUNCATE parse their target as UnresolvedTable
      case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
        Some(t.multipartIdentifier)
      case _ => None
    }

  /** Opaque carrier for ALTER TABLE ADD COLUMNS' parsed column list
    * (QualifiedColType holds a default-value expression tree — same
    * non-Product rationale as [[CreateSpec]]).
    */
  final class AddColumnsSpec(
      val columns: Seq[org.apache.spark.sql.catalyst.plans.logical.QualifiedColType])
    extends Serializable

  private[sql] def isGraftProvider(spec: TableSpecBase): Boolean =
    spec match {
      case u: UnresolvedTableSpec =>
        u.provider.exists(_.equalsIgnoreCase("graft"))
      case _ => false
    }

  /** (database, table) for a 1- or 2-part identifier; longer paths
    * (catalog namespaces) are not a graft address.
    */
  private[sql] def resolveIdent(spark: SparkSession,
      ident: Seq[String]): (String, String) = ident match {
    case Seq(db, n) => (db, n)
    case Seq(n) => (spark.catalog.currentDatabase, n)
    case _ => throw new UnsupportedOperationException(
      s"graft DDL: '${ident.mkString(".")}' — only db.table or bare " +
        "table names are supported")
  }

  /** Identity partition column names; any other transform (bucket,
    * days/hours, custom) refuses loudly.
    */
  private[sql] def partitionCols(ident: Seq[String],
      transforms: Seq[Transform]): Seq[String] = transforms.map {
    case id: IdentityTransform => id.ref.fieldNames match {
      case Array(one) => one
      case parts => throw new UnsupportedOperationException(
        s"CREATE TABLE ${ident.mkString(".")}: nested partition " +
          s"column '${parts.mkString(".")}' is not supported")
    }
    case other => throw new UnsupportedOperationException(
      s"CREATE TABLE ${ident.mkString(".")}: partition transform " +
        s"'$other' is not supported — graft tables partition by " +
        "identity columns only")
  }
}

/** The executable CREATE / CTAS / REPLACE — see [[GraftSqlDdl]]. */
final case class GraftCreateTableCommand(targetIdent: Seq[String],
    spec: GraftSqlDdl.CreateSpec) extends LeafRunnableCommand
    with org.apache.spark.internal.Logging {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("table_version", LongType, nullable = false)())

  private def verb =
    if (spec.replace) { if (spec.orCreate) "CREATE OR REPLACE TABLE" else "REPLACE TABLE" }
    else "CREATE TABLE"

  private def fail(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"$verb ${targetIdent.mkString(".")}: $what is not supported on " +
        "graft tables")

  /** The declared schema as version metadata. Everything the layout
    * cannot honor exactly refuses here, before any I/O.
    */
  private def declaredSchema(): StructType = StructType(spec.columns.map {
    cd =>
      if (cd.defaultValue.isDefined) fail(s"a DEFAULT on column '${cd.name}'")
      if (cd.generationExpression.isDefined)
        fail(s"GENERATED ALWAYS AS on column '${cd.name}'")
      if (cd.identityColumnSpec.isDefined)
        fail(s"GENERATED … AS IDENTITY on column '${cd.name}'")
      if (!cd.nullable) fail(s"NOT NULL on column '${cd.name}' (the " +
        "versioned parquet layout does not enforce nullability)")
      cd.toV1Column
  })

  private def refuseSpecExtras(): Unit = spec.tableSpec match {
    case u: UnresolvedTableSpec =>
      if (u.properties.nonEmpty) fail("TBLPROPERTIES")
      if (u.optionExpression.options.nonEmpty) fail("OPTIONS")
      if (u.serde.isDefined) fail("a row-format/SerDe clause")
      if (u.collation.isDefined) fail("DEFAULT COLLATION")
      if (u.constraints.nonEmpty) fail("table constraints")
    case other => fail(s"table spec ${other.getClass.getSimpleName}")
  }

  private def location(spark: classic.SparkSession, db: String,
      name: String): String = spec.tableSpec match {
    case u: UnresolvedTableSpec if u.location.isDefined =>
      u.location.get
    case _ =>
      // the session catalog's standard path for this identifier — the
      // same place `CREATE TABLE … USING parquet` (no LOCATION) writes
      java.nio.file.Paths.get(spark.sessionState.catalog
        .defaultTablePath(TableIdentifier(name, Some(db)))).toString
  }

  /** Same field names and types (case-insensitive, order-insensitive,
    * nullability ignored — parquet-sourced columns are nullable on
    * read) — the adopt-if-exists contract.
    */
  private def requireCompatible(declared: StructType,
      live: StructType): Unit = {
    def render(st: StructType) = st.fields
      .map(f => f.name.toLowerCase + ": " + f.dataType.simpleString)
      .sorted.mkString(", ")
    val ok = declared.fields.length == live.fields.length &&
      declared.fields.forall(d => live.fields.exists(l =>
        l.name.equalsIgnoreCase(d.name) &&
          GraftBridge.sameType(l.dataType, d.dataType)))
    require(ok, s"$verb ${targetIdent.mkString(".")} IF NOT EXISTS: " +
      s"the existing table's schema (${render(live)}) is incompatible " +
      s"with the declared columns (${render(declared)})")
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val s = spark.asInstanceOf[classic.SparkSession]
    val (db, name) = GraftSqlDdl.resolveIdent(spark, targetIdent)
    require(spark.catalog.databaseExists(db),
      s"$verb ${targetIdent.mkString(".")}: database '$db' does not " +
        "exist — CREATE DATABASE it first")
    refuseSpecExtras()
    val data: DataFrame = spec.query match {
      case Some(q) => classic.Dataset.ofRows(s, q)
      case None =>
        val schema = declaredSchema()
        require(schema.nonEmpty,
          s"$verb ${targetIdent.mkString(".")} needs a column list or " +
            "an AS SELECT query")
        s.createDataFrame(new java.util.ArrayList[Row](), schema)
    }
    val pCols = GraftSqlDdl.partitionCols(targetIdent, spec.partitioning)
    pCols.foreach { c =>
      require(data.columns.exists(_.equalsIgnoreCase(c)),
        s"$verb ${targetIdent.mkString(".")}: partition column '$c' is " +
          s"not among the table's columns (${data.columns.mkString(", ")})")
    }
    val loc = location(s, db, name)
    val table = new graft.io.ParquetTable(loc, partitionColumns = pCols)
    if (table.exists) {
      if (spec.replace) table.overwrite(data)
      else if (spec.ignoreIfExists)
        // adopt: IF NOT EXISTS over an existing versioned layout is the
        // reference's idempotent create — verify the declared columns
        // actually describe it, then just (re-)register
        table.liveSchema.foreach(live =>
          if (spec.query.isEmpty) requireCompatible(declaredSchema(), live))
      else throw new IllegalStateException(
        s"$verb ${targetIdent.mkString(".")}: a graft table already " +
          s"exists at $loc — use IF NOT EXISTS to adopt it, OR REPLACE " +
          "to overwrite, or DROP it first")
    } else {
      if (spec.replace && !spec.orCreate) throw new IllegalStateException(
        s"REPLACE TABLE ${targetIdent.mkString(".")}: no graft table " +
          s"exists at $loc — use CREATE OR REPLACE")
      table.overwrite(data)
    }
    graft.io.Catalog.registerTable(spark, db, name, table)
    Seq(Row(table.version.toLong))
  }
}

/** `ALTER TABLE t ADD COLUMNS (c TYPE [COMMENT …], …)` on a registered
  * graft table — schema evolution as ONE zero-row hard-link commit (the
  * append path's widening: every base file rides as a link, the
  * `_schema.json` sidecar gains the columns, existing versions and CDF
  * read NULL for them — the `WITH SCHEMA EVOLUTION` machinery, now
  * SQL-addressable without a MERGE). Nested paths, column POSITIONs
  * (FIRST/AFTER — the sidecar appends), DEFAULTs and NOT NULL refuse
  * loudly; name collisions with existing columns refuse before any IO.
  */
final case class GraftAddColumnsCommand(targetIdent: Seq[String],
    spec: GraftSqlDdl.AddColumnsSpec) extends LeafRunnableCommand {
  import org.apache.spark.sql.functions.{col, lit}

  override val output: Seq[Attribute] = Seq(
    AttributeReference("table_version", LongType, nullable = false)())

  private def fail(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"ALTER TABLE ${targetIdent.mkString(".")} ADD COLUMNS: $what is " +
        "not supported on graft tables")

  override def run(spark: SparkSession): Seq[Row] = {
    val entry = GraftSqlDml.lookupOrFail(spark, targetIdent)
    val table = entry.table
    val existing = GraftSqlDml.targetCols(targetIdent, table)
    val added = spec.columns.map { qc =>
      if (qc.path.isDefined)
        fail(s"a nested column path '${qc.path.get.name.mkString(".")}'")
      if (qc.position.isDefined)
        fail(s"a column POSITION on '${qc.colName}' (new columns append)")
      if (qc.default.isDefined) fail(s"a DEFAULT on '${qc.colName}'")
      if (!qc.nullable) fail(s"NOT NULL on '${qc.colName}'")
      if (existing.exists(_.equalsIgnoreCase(qc.colName)))
        throw new IllegalArgumentException(
          s"ALTER TABLE ${targetIdent.mkString(".")} ADD COLUMNS: " +
            s"column '${qc.colName}' already exists")
      (qc.colName, qc.dataType)
    }
    require(added.map(_._1.toLowerCase).distinct.size == added.size,
      s"ALTER TABLE ${targetIdent.mkString(".")} ADD COLUMNS: duplicate " +
        "column names in the add list")
    val widened = table.read(spark).limit(0).select(
      existing.map(col) ++
        added.map { case (n, dt) => lit(null).cast(dt).as(n) }: _*)
    table.appendVersion(widened)
    graft.io.Catalog.registerTable(spark, entry.database, entry.name, table)
    Seq(Row(table.version.toLong))
  }
}

/** The executable DROP TABLE on a registered graft table. */
final case class GraftDropTableCommand(targetIdent: Seq[String],
    ifExists: Boolean, purge: Boolean) extends LeafRunnableCommand
    with org.apache.spark.internal.Logging {

  override val output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    val s = spark.asInstanceOf[classic.SparkSession]
    GraftMergeInto.lookup(spark, targetIdent) match {
      case None =>
        // rewritten while registered but unregistered by the time it
        // runs (re-executed plan) — honor IF EXISTS, refuse otherwise
        if (!ifExists) throw new IllegalStateException(
          s"DROP TABLE ${targetIdent.mkString(".")}: not (or no longer) " +
            "graft-registered in this session")
      case Some(entry) =>
        s.sessionState.catalog.dropTable(
          TableIdentifier(entry.name, Some(entry.database)),
          ignoreIfNotExists = true, purge = false)
        GraftMergeInto.unregister(spark, entry.database, entry.name)
        if (purge) {
          // loud: PURGE is the one DDL verb that destroys versioned
          // data (every version, the commit log, the feeds)
          logWarning(s"DROP TABLE ${entry.database}.${entry.name} " +
            s"PURGE: deleting the versioned table root ${entry.table.path}")
          val root = java.nio.file.Paths.get(entry.table.path)
          if (java.nio.file.Files.exists(root)) {
            val walk = java.nio.file.Files.walk(root)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(p => java.nio.file.Files.delete(p))
            finally walk.close()
          }
        }
    }
    Seq.empty
  }
}
