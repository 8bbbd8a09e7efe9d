package org.apache.spark.sql

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** SQL `MERGE INTO` for graft-registered tables — the warehouse's
  * defining write verb on the engine's SQL deployment surface
  * (round-15 verdict item 5). The reference drives every write through
  * Delta's MERGE (reference: src/ETL/Bronze-Ingestion-Orders.py:51-58);
  * the API-side semantics live in [[graft.merge.MergeOps]], and this
  * bridge exposes them to `spark.sql(...)`:
  *
  * {{{
  *   MERGE INTO wh.silver_orders t USING updates s
  *   ON t.id = s.id
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * Wiring: Spark's own parser already parses MERGE INTO (into the v2
  * [[MergeIntoTable]] plan) but its analyzer then requires a
  * DataSourceV2 table and rejects everything else — so
  * [[graft.GraftExtensions]] injects a DELEGATING parser that lets the
  * stock grammar do the parsing and only REWRITES the parsed plan when
  * the target names a graft-registered table ([[GraftMergeInto.lookup]];
  * registration happens in `graft.io.Catalog.registerTable`). Unknown
  * targets pass through untouched — stock Spark behavior, stock error.
  *
  * Supported surface (anything outside it refuses loudly at execution
  * with the exact unsupported clause named — never a silent semantic
  * approximation):
  *
  *  - the four canonical unconditional star shapes keep their direct
  *    MergeOps fast paths: `UPDATE SET * + INSERT *` → keyed upsert
  *    (S9, copy-on-write on partitioned tables); … + `NOT MATCHED BY
  *    SOURCE DELETE` → full-sync upsert; `INSERT *` alone →
  *    insert-if-absent (S6/S7 — the one shape where duplicate source
  *    keys stay legal); `MATCHED DELETE` alone → keyed COW delete;
  *  - EVERYTHING else — clause conditions (`WHEN MATCHED AND cond THEN
  *    …`), multiple ordered clauses (first-true wins), column
  *    assignments (`UPDATE SET c = expr`, `INSERT (cols) VALUES`,
  *    unassigned columns typed NULL — SQL MERGE's fill rule), `WHEN
  *    NOT MATCHED BY SOURCE THEN UPDATE SET …/DELETE`, and `WITH
  *    SCHEMA EVOLUTION` (source-only columns appended through one
  *    zero-row hard-link append commit; old versions read NULL) —
  *    lowers through [[GraftMergeCommand]]'s general image builder
  *    into ONE CDC batch ([[graft.merge.MergeOps.applyCdc]]):
  *    update/insert images + delete keys, copy-on-write touched-leaf
  *    commit on partitioned tables, exact feed either way.
  *
  * The ON condition must be a conjunction of same-named column
  * equalities (`t.k = s.k` / `<=>`, one operand per side) — MergeOps'
  * key model. A source with several rows per ON key refuses loudly
  * whenever a clause can touch existing target rows (SQL MERGE's
  * multiple-matches error; a silent dedup would commit an arbitrary
  * image). After the commit the catalog entry is re-registered so
  * subsequent `spark.sql` reads see the new version.
  */
object GraftMergeInto {

  final case class Entry(database: String, name: String,
      table: graft.io.ParquetTable)

  // sessionUUID → lowercased "db.name" → entry; sessions are never
  // removed explicitly (entries are a handful of catalog registrations,
  // and a session's UUID dies with it)
  private val registry =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, Entry]]()

  private def key(db: String, name: String): String =
    db.toLowerCase + "." + name.toLowerCase

  private def uuid(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID

  /** Called by `graft.io.Catalog.registerTable`: make `db.name` (and
    * bare `name` under the session's current database) MERGE-able.
    */
  def register(spark: SparkSession, database: String, name: String,
      table: graft.io.ParquetTable): Unit =
    registry
      .computeIfAbsent(uuid(spark),
        _ => new ConcurrentHashMap[String, Entry]())
      .put(key(database, name), Entry(database, name, table))

  /** Called by [[GraftDropTableCommand]]: retire a registration. */
  private[sql] def unregister(spark: SparkSession, database: String,
      name: String): Unit =
    Option(registry.get(uuid(spark)))
      .foreach { m => m.remove(key(database, name)); () }

  private[sql] def lookup(spark: SparkSession,
      ident: Seq[String]): Option[Entry] = {
    val m = registry.get(uuid(spark))
    if (m == null) return None
    val k = ident match {
      case Seq(db, n) => key(db, n)
      case Seq(n) => key(spark.catalog.currentDatabase, n)
      case _ => return None
    }
    Option(m.get(k))
  }

  /** assignment-LHS → Column map of an UPDATE SET / INSERT VALUES list
    * (shared by MERGE and the DML commands): LHS must name a target
    * column (last name part), RHS is bridged verbatim and resolved by
    * the ANALYZER against the frame it is selected from — qualified
    * refs resolve through the statement's own aliases, ambiguous bare
    * names fail loudly with Spark's standard error.
    */
  private[sql] def assignMap(ident: Seq[String], assigns: Seq[Assignment],
      tgtCols: Seq[String]): Map[String, Column] = {
    def bad(what: String): Nothing = throw new UnsupportedOperationException(
      s"${ident.mkString(".")}: $what")
    val pairs = assigns.map { a =>
      val name = a.key match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          u.nameParts.last
        case other => bad(s"assignment target '${other.sql}' is not a column")
      }
      val c = tgtCols.find(_.equalsIgnoreCase(name)).getOrElse(
        bad(s"assignment to unknown target column '$name'"))
      c -> GraftBridge.toColumn(a.value)
    }
    require(pairs.map(_._1).distinct.size == pairs.size,
      s"${ident.mkString(".")}: duplicate assignment targets in " +
        pairs.map(_._1).mkString(", "))
    pairs.toMap
  }

  /** Strip a target/source alias down to the named relation, if any. */
  private[sql] def identOf(plan: LogicalPlan): Option[Seq[String]] = plan match {
    case SubqueryAlias(_, child) => identOf(child)
    case r: UnresolvedRelation => Some(r.multipartIdentifier)
    case _ => None
  }

  /** Rewrite a parsed [[MergeIntoTable]] into the runnable graft command
    * when its target is registered, and resolve `VERSION AS OF` /
    * `TIMESTAMP AS OF` table suffixes (Spark's own time-travel grammar,
    * parsed into [[org.apache.spark.sql.catalyst.analysis
    * .RelationTimeTravel]] — which stock analysis then only accepts for
    * v2 tables) against the graft versioned layout: the node is
    * replaced by the analyzed plan of `readVersion`/`readAsOf`, so
    * Delta's SQL time-travel surface works verbatim on registered
    * tables. Everything unregistered passes through untouched.
    */
  def rewrite(spark: SparkSession, plan: LogicalPlan): LogicalPlan = {
    val merged = plan match {
      case m: MergeIntoTable =>
        identOf(m.targetTable) match {
          case Some(ident) if lookup(spark, ident).nonEmpty =>
            val tAlias = m.targetTable match {
              case SubqueryAlias(id, _) => Some(id.name)
              case _ => None
            }
            val sAlias = m.sourceTable match {
              case SubqueryAlias(id, _) => Some(id.name)
              case _ => None
            }
            GraftMergeCommand(ident, new GraftMergeSpec(m.sourceTable,
              m.mergeCondition, m.matchedActions, m.notMatchedActions,
              m.notMatchedBySourceActions, m.withSchemaEvolution, tAlias,
              sAlias))
          case _ => m
        }
      // the rest of the DML surface (see GraftSqlDml): UPDATE/DELETE are
      // v2-only in stock analysis; INSERT INTO the registered location
      // would bypass the commit protocol entirely
      case u: UpdateTable =>
        identOf(u.table) match {
          case Some(ident) if lookup(spark, ident).nonEmpty =>
            GraftUpdateCommand(ident,
              new GraftSqlDml.UpdateSpec(u.assignments, u.condition))
          case _ => u
        }
      case d: DeleteFromTable =>
        identOf(d.table) match {
          case Some(ident) if lookup(spark, ident).nonEmpty =>
            GraftDeleteCommand(ident,
              new GraftSqlDml.DeleteSpec(d.condition))
          case _ => d
        }
      case i: InsertIntoStatement =>
        identOf(i.table) match {
          case Some(ident) if lookup(spark, ident).nonEmpty =>
            GraftInsertCommand(ident, new GraftSqlDml.InsertSpec(i.query,
              i.partitionSpec, i.userSpecifiedCols, i.overwrite,
              i.ifPartitionNotExists, i.byName))
          case _ => i
        }
      // SQL DDL for graft tables (see GraftSqlDdl): CREATE / CTAS /
      // [CREATE OR] REPLACE whose USING provider is `graft`, and DROP
      // on a registered name; other providers/names pass through
      case ct: CreateTable if GraftSqlDdl.isGraftProvider(ct.tableSpec) =>
        GraftSqlDdl.identOf(ct.name) match {
          case Some(ident) => GraftCreateTableCommand(ident,
            new GraftSqlDdl.CreateSpec(ct.columns, ct.partitioning,
              ct.tableSpec, None, ct.ignoreIfExists, replace = false,
              orCreate = false))
          case None => ct
        }
      case ct: CreateTableAsSelect
          if GraftSqlDdl.isGraftProvider(ct.tableSpec) =>
        GraftSqlDdl.identOf(ct.name) match {
          case Some(ident) =>
            if (ct.writeOptions.nonEmpty) throw new
                UnsupportedOperationException(s"CREATE TABLE " +
                  s"${ident.mkString(".")} … AS SELECT: write OPTIONS " +
                  "are not supported on graft tables")
            GraftCreateTableCommand(ident,
              new GraftSqlDdl.CreateSpec(Nil, ct.partitioning,
                ct.tableSpec, Some(ct.query), ct.ignoreIfExists,
                replace = false, orCreate = false))
          case None => ct
        }
      case rt: ReplaceTable if GraftSqlDdl.isGraftProvider(rt.tableSpec) =>
        GraftSqlDdl.identOf(rt.name) match {
          case Some(ident) => GraftCreateTableCommand(ident,
            new GraftSqlDdl.CreateSpec(rt.columns, rt.partitioning,
              rt.tableSpec, None, ignoreIfExists = false, replace = true,
              orCreate = rt.orCreate))
          case None => rt
        }
      case rt: ReplaceTableAsSelect
          if GraftSqlDdl.isGraftProvider(rt.tableSpec) =>
        GraftSqlDdl.identOf(rt.name) match {
          case Some(ident) =>
            if (rt.writeOptions.nonEmpty) throw new
                UnsupportedOperationException(s"REPLACE TABLE " +
                  s"${ident.mkString(".")} … AS SELECT: write OPTIONS " +
                  "are not supported on graft tables")
            GraftCreateTableCommand(ident,
              new GraftSqlDdl.CreateSpec(Nil, rt.partitioning,
                rt.tableSpec, Some(rt.query), ignoreIfExists = false,
                replace = true, orCreate = rt.orCreate))
          case None => rt
        }
      case dt: DropTable =>
        GraftSqlDdl.identOf(dt.child) match {
          case Some(ident) if lookup(spark, ident).nonEmpty =>
            GraftDropTableCommand(ident, dt.ifExists, dt.purge)
          case _ => dt
        }
      // ALTER TABLE ADD COLUMNS → one zero-row widening commit;
      // TRUNCATE → the unconditional DELETE (stock truncate would
      // delete raw files INSIDE the live version dir — the INSERT
      // rationale again); any other ALTER on a registered table
      // refuses loudly rather than half-applying through stock v2
      // analysis
      case ac: AddColumns =>
        GraftSqlDdl.identOf(ac.table) match {
          case Some(ident) if lookup(spark, ident).nonEmpty =>
            GraftAddColumnsCommand(ident,
              new GraftSqlDdl.AddColumnsSpec(ac.columnsToAdd))
          case _ => ac
        }
      case tt: TruncateTable =>
        GraftSqlDdl.identOf(tt.table) match {
          case Some(ident) if lookup(spark, ident).nonEmpty =>
            GraftDeleteCommand(ident, new GraftSqlDml.DeleteSpec(
              org.apache.spark.sql.catalyst.expressions.Literal
                .TrueLiteral))
          case _ => tt
        }
      case tp: TruncatePartition =>
        GraftSqlDdl.identOf(tp.table) match {
          case Some(ident) if lookup(spark, ident).nonEmpty =>
            throw new UnsupportedOperationException(
              s"TRUNCATE TABLE ${ident.mkString(".")} PARTITION (…): " +
                "use DELETE FROM with a partition-column predicate — " +
                "it commits copy-on-write with an exact feed")
          case _ => tp
        }
      case al: AlterTableCommand =>
        GraftSqlDdl.identOf(al.table) match {
          case Some(ident) if lookup(spark, ident).nonEmpty =>
            throw new UnsupportedOperationException(
              s"${al.getClass.getSimpleName} on graft table " +
                s"${ident.mkString(".")} is not supported — supported " +
                "ALTERs: ADD COLUMNS (one zero-row widening commit)")
          case _ => al
        }
      case other => other
    }
    import org.apache.spark.sql.catalyst.analysis.RelationTimeTravel
    merged.transformUp {
      case tt: RelationTimeTravel =>
        identOf(tt.relation).flatMap(lookup(spark, _)) match {
          case Some(entry) =>
            timeTravelPlan(spark, entry, tt.timestamp, tt.version)
          case None => tt
        }
    }
  }

  /** The analyzed snapshot plan a time-travel suffix resolves to. The
    * timestamp operand must be a FOLDABLE expression (a literal or a
    * constant expression — Delta's own restriction); refusals
    * (non-constant operand, non-integer version, below-horizon
    * timestamps from `versionAt`) are loud, never a silent live read.
    */
  private def timeTravelPlan(spark: SparkSession, entry: Entry,
      ts: Option[Expression], version: Option[String]): LogicalPlan = {
    val s = spark.asInstanceOf[classic.SparkSession]
    val df = (ts, version) match {
      case (None, Some(v)) =>
        val vn = v.toIntOption.getOrElse(throw new IllegalArgumentException(
          s"VERSION AS OF on ${entry.database}.${entry.name}: version " +
            s"'$v' is not an integer — graft versions are 1-based ints"))
        entry.table.readVersion(s, vn)
      case (Some(e), None) =>
        if (!e.foldable) throw new IllegalArgumentException(
          s"TIMESTAMP AS OF on ${entry.database}.${entry.name}: the " +
            s"operand '${e.sql}' is not a constant expression")
        val zone = s.sessionState.conf.sessionLocalTimeZone
        val micros = org.apache.spark.sql.catalyst.expressions.Cast(
          e, types.TimestampType, Option(zone)).eval()
        if (micros == null) throw new IllegalArgumentException(
          s"TIMESTAMP AS OF on ${entry.database}.${entry.name}: '${e.sql}'" +
            " did not evaluate to a timestamp")
        entry.table.readAsOf(s, micros.asInstanceOf[Long] / 1000L)
      case _ => throw new IllegalArgumentException(
        s"time travel on ${entry.database}.${entry.name} needs exactly " +
          "one of VERSION AS OF / TIMESTAMP AS OF")
    }
    df.queryExecution.analyzed
  }
}

/** The executable MERGE: resolves the registered table, classifies the
  * clause shape, runs the matching [[graft.merge.MergeOps]] call, and
  * re-registers the catalog entry at the new version. Output is one
  * row of commit facts (Delta's MERGE metrics shape, reduced to what a
  * versioned commit states exactly).
  */
/** Opaque carrier for the parsed-but-unresolved MERGE pieces: a PLAIN
  * class, deliberately NOT a Product — a leaf command's product
  * elements are scanned by QueryPlan for expressions/plans at RUNTIME
  * type, and the analyzer would then try (and fail) to resolve the raw
  * `t.id = s.id` condition against the command's empty child list. The
  * command resolves everything itself in run().
  */
final class GraftMergeSpec(val source: LogicalPlan,
    val condition: Expression, val matchedActions: Seq[MergeAction],
    val notMatchedActions: Seq[MergeAction],
    val notMatchedBySourceActions: Seq[MergeAction],
    val withSchemaEvolution: Boolean,
    val targetAlias: Option[String],
    val sourceAlias: Option[String]) extends Serializable

/** Classified MERGE clause actions — the shared shape the fast-path
  * dispatch and the general conditional lowering both consume. `cond`
  * is the clause's `WHEN … AND <cond>` condition (None =
  * unconditional); `star` marks `UPDATE SET *` / `INSERT *`.
  */
private[sql] sealed trait GraftMergeAct { def cond: Option[Expression] }
private[sql] final case class GraftUpdAct(cond: Option[Expression],
    star: Boolean, assigns: Seq[Assignment]) extends GraftMergeAct
private[sql] final case class GraftDelAct(cond: Option[Expression])
    extends GraftMergeAct
private[sql] final case class GraftInsAct(cond: Option[Expression],
    star: Boolean, assigns: Seq[Assignment]) extends GraftMergeAct

final case class GraftMergeCommand(targetIdent: Seq[String],
    spec: GraftMergeSpec) extends LeafRunnableCommand {
  private def source = spec.source
  private def condition = spec.condition
  private def withSchemaEvolution = spec.withSchemaEvolution

  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.LongType

  override val output: Seq[Attribute] = Seq(
    AttributeReference("table_version", LongType, nullable = false)())

  private def fail(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"MERGE INTO ${targetIdent.mkString(".")}: $what is not supported " +
        "by the graft MERGE bridge — supported: ordered [conditional] " +
        "WHEN MATCHED THEN UPDATE SET * | SET c = expr, ... | DELETE, " +
        "WHEN NOT MATCHED THEN INSERT * | INSERT (cols) VALUES (exprs), " +
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET c = expr, ... | " +
        "DELETE, WITH SCHEMA EVOLUTION. ON must be a conjunction of " +
        "same-named key equalities (t.k = s.k)")

  /** The ON conjunction as MergeOps key names: every conjunct must be a
    * (null-safe) equality between two attributes whose LAST name part
    * agrees — the same-named business-key model every MergeOps shape
    * uses — with one operand on the TARGET side and one on the SOURCE
    * side (a qualified operand must name a known alias/relation;
    * `t.id = t.id` is not a merge key). Anything else refuses.
    */
  private def keyColumns(e: Expression, tN: Seq[String],
      sN: Seq[String]): Seq[String] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      keyColumns(l, tN, sN) ++ keyColumns(r, tN, sN)
    case EqualTo(l, r) => Seq(keyOf(l, r, tN, sN))
    case EqualNullSafe(l, r) => Seq(keyOf(l, r, tN, sN))
    case other => fail(s"ON clause term '${other.sql}'")
  }

  private def keyOf(l: Expression, r: Expression, tN: Seq[String],
      sN: Seq[String]): String = (l, r) match {
    case (a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute,
          b: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute) =>
      val (ka, kb) = (a.nameParts.last, b.nameParts.last)
      if (!ka.equalsIgnoreCase(kb))
        fail(s"key equality between differently-named columns " +
          s"'${a.name}' and '${b.name}'")
      // side validation: a qualified operand must belong to the target
      // or the source, and the two operands must sit on DIFFERENT
      // sides — 'ON t.id = t.id' silently running as a keyed upsert
      // would diverge from SQL MERGE semantics
      def side(u: org.apache.spark.sql.catalyst.analysis
          .UnresolvedAttribute): Option[String] =
        if (u.nameParts.length < 2) None // bare name: side unknowable
        else {
          val q = u.nameParts(u.nameParts.length - 2)
          val isT = tN.exists(_.equalsIgnoreCase(q))
          val isS = sN.exists(_.equalsIgnoreCase(q))
          if (isT && isS) None // alias collision: indistinguishable
          else if (isT) Some("target")
          else if (isS) Some("source")
          else fail(s"ON operand '${u.name}': qualifier '$q' names " +
            s"neither the target (${tN.mkString("/")}) nor the source " +
            s"(${sN.mkString("/")})")
        }
      (side(a), side(b)) match {
        case (Some(x), Some(y)) if x == y =>
          fail(s"ON equality '${a.name} = ${b.name}' with both operands " +
            s"on the $x side — pair one target column with one source " +
            "column")
        case _ => ()
      }
      ka
    case _ => fail(s"non-column ON operand in '${l.sql} = ${r.sql}'")
  }

  private def assignMap(assigns: Seq[Assignment],
      tgtCols: Seq[String]): Map[String, Column] =
    GraftMergeInto.assignMap(targetIdent, assigns, tgtCols)

  private def classify(a: MergeAction, allowed: String): GraftMergeAct =
    a match {
      case UpdateStarAction(c) => GraftUpdAct(c, star = true, Nil)
      case UpdateAction(c, as, _) => GraftUpdAct(c, star = false, as)
      case DeleteAction(c) => GraftDelAct(c)
      case InsertStarAction(c) => GraftInsAct(c, star = true, Nil)
      case InsertAction(c, as) => GraftInsAct(c, star = false, as)
      case other => fail(s"'${other.sql}' as a $allowed action")
    }

  /** SQL MERGE forbids several source rows modifying one target row
    * (Delta raises DELTA_MULTIPLE_SOURCE_ROW_MATCHING...); a silent
    * dedup would commit an ARBITRARY image. Checked whenever a clause
    * can touch existing target rows — one bounded aggregation over the
    * (batch-sized) source. Stricter than Delta on keys that happen not
    * to match: deliberate, so the refusal does not depend on target
    * state.
    */
  private def requireUniqueSourceKeys(src: DataFrame,
      keys: Seq[String]): Unit = {
    val dup = src.groupBy(keys.map(functions.col): _*)
      .agg(functions.count(functions.lit(1)).as("__n"))
      .filter(functions.col("__n") > 1).limit(1).collect()
    if (dup.nonEmpty) {
      val ex = keys.zipWithIndex
        .map { case (k, i) => s"$k=${dup.head.get(i)}" }.mkString(", ")
      throw new IllegalArgumentException(
        s"MERGE INTO ${targetIdent.mkString(".")}: the source has " +
          s"multiple rows per ON key (e.g. $ex) — SQL MERGE forbids a " +
          "target row matching several source rows; collapse to one " +
          "image per key upstream (latest-by-sequence, greatest-tuple)")
    }
  }

  /** `WITH SCHEMA EVOLUTION`: source-only columns are APPENDED to the
    * committed schema through one zero-row [[graft.io.ParquetTable
    * .appendVersion]] commit (every base file rides as a hard link, the
    * sidecar schema widens — existing versions read NULL for the new
    * columns, the CDF-across-evolution contract). The merge itself then
    * runs against the widened schema, copy-on-write as usual — schema
    * evolution costs one metadata-sized commit, never a table rewrite.
    */
  private def evolveSchema(spark: SparkSession,
      table: graft.io.ParquetTable, src: classic.DataFrame,
      tgtCols: Seq[String]): Unit = {
    import functions.{col, lit}
    val extra = src.schema.fields
      .filterNot(f => tgtCols.exists(_.equalsIgnoreCase(f.name)))
      .toIndexedSeq
    if (extra.isEmpty) return
    val widened = table.read(spark).limit(0).select(
      tgtCols.map(col) ++
        extra.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    table.appendVersion(widened)
    ()
  }

  /** The general conditional lowering — SQL MERGE's full clause algebra
    * as one CDC batch ([[graft.merge.MergeOps.applyCdc]]: deletes +
    * update/insert images, copy-on-write on partitioned tables, exact
    * feed):
    *
    *  - matched clauses evaluate on the target ⋈ source inner join;
    *    the FIRST clause whose condition holds wins (ordered-clause
    *    semantics via one chained `when` selector), UPDATE builds the
    *    row image (SET columns replaced; star = source values, target
    *    fallback under evolution), DELETE contributes the key; rows
    *    matching no clause pass through untouched (absent from the
    *    batch);
    *  - NOT MATCHED clauses evaluate on the anti-joined source —
    *    INSERT images with unassigned columns typed NULL (SQL MERGE's
    *    fill rule; star = source values, NULL for evolved columns the
    *    source lacks);
    *  - NOT MATCHED BY SOURCE clauses evaluate on the anti-joined
    *    TARGET — UPDATE images read target columns only, DELETE
    *    contributes the key.
    *
    * A key can never land in both the update and delete sets (each row
    * takes at most one clause), so applyCdc's delete-first netting is
    * vacuous here.
    */
  private def generalMerge(spark: SparkSession,
      table: graft.io.ParquetTable, src: classic.DataFrame,
      keys: Seq[String], tgtCols: Seq[String], mActs: Seq[GraftMergeAct],
      nActs: Seq[GraftMergeAct], bActs: Seq[GraftMergeAct]): Unit = {
    import functions.{coalesce, col, lit, when}
    val tA = spec.targetAlias.getOrElse(targetIdent.last)
    val current = table.read(spark).alias(tA)
    val tSchema = table.liveSchema.get
    def typeOf(name: String) = tSchema(tSchema.fieldIndex(name)).dataType
    def cast(c: Column, name: String): Column = c.cast(typeOf(name))
    def nullOf(name: String): Column = lit(null).cast(typeOf(name))
    def hasSrc(c: String): Boolean =
      src.columns.exists(_.equalsIgnoreCase(c))
    def srcCol(c: String): Column =
      src(src.columns.find(_.equalsIgnoreCase(c)).getOrElse(c))
    // NULL conditions are NOT matched (SQL three-valued WHEN ... AND)
    def condCol(a: GraftMergeAct): Column =
      a.cond.map(e => coalesce(GraftBridge.toColumn(e), lit(false)))
        .getOrElse(lit(true))
    // first-matching-clause selector: a chained `when` realizes SQL
    // MERGE's ordered-clause rule in one codegen'd expression
    def selector(acts: Seq[GraftMergeAct]): Column =
      acts.zipWithIndex.foldLeft(Option.empty[Column]) {
        case (acc, (a, i)) => Some(acc match {
          case None => when(condCol(a), lit(i))
          case Some(c) => c.when(condCol(a), lit(i))
        })
      }.map(_.otherwise(lit(-1))).getOrElse(lit(-1))
    def requireStarCols(which: String): Unit =
      if (!withSchemaEvolution) {
        val missing = tgtCols.filterNot(hasSrc)
        require(missing.isEmpty, s"$which needs the source to carry " +
          s"every target column — missing ${missing.mkString(", ")} " +
          "(or request WITH SCHEMA EVOLUTION semantics)")
      }
    // one row image per target column, first-true clause wins; the
    // frame is pre-filtered to rows some listed clause claimed
    def firstImage(frame: DataFrame,
        clauses: Seq[(Int, String => Column)]): DataFrame =
      frame.filter(col("__act").isin(clauses.map(_._1): _*))
        .select(tgtCols.map { c =>
          clauses.tail.foldLeft(
            when(col("__act") === clauses.head._1, clauses.head._2(c))) {
            case (acc, (i, img)) => acc.when(col("__act") === i, img(c))
          }.as(c)
        }: _*)

    // ---- WHEN MATCHED: target ⋈ source inner join
    val (mUpd, mDel) = if (mActs.isEmpty) (None, None) else {
      val joinCond =
        keys.map(k => col(s"$tA.$k") <=> srcCol(k)).reduce(_ && _)
      val joined = current.join(src, joinCond, "inner")
        .withColumn("__act", selector(mActs))
      val updClauses = mActs.zipWithIndex.collect {
        case (GraftUpdAct(_, true, _), i) =>
          requireStarCols("WHEN MATCHED THEN UPDATE SET *")
          (i, (c: String) =>
            if (hasSrc(c)) cast(srcCol(c), c) else col(s"$tA.$c"))
        case (GraftUpdAct(_, false, assigns), i) =>
          val amap = assignMap(assigns, tgtCols)
          (i, (c: String) =>
            amap.get(c).map(cast(_, c)).getOrElse(col(s"$tA.$c")))
      }
      val delIdx = mActs.zipWithIndex.collect {
        case (GraftDelAct(_), i) => i
      }
      (if (updClauses.isEmpty) None
       else Some(firstImage(joined, updClauses)),
       if (delIdx.isEmpty) None
       else Some(joined.filter(col("__act").isin(delIdx: _*))
         .select(keys.map(k => col(s"$tA.$k").as(k)): _*)))
    }

    // ---- WHEN NOT MATCHED: the anti-joined source
    val ins = if (nActs.isEmpty) None else {
      val curKeys = keys.foldLeft(
        table.read(spark).select(keys.map(col): _*).distinct()) {
        (d, k) => d.withColumnRenamed(k, s"__gk_$k")
      }
      val antiCond =
        keys.map(k => srcCol(k) <=> col(s"__gk_$k")).reduce(_ && _)
      val anti = src.join(curKeys, antiCond, "left_anti")
        .withColumn("__act", selector(nActs))
      val insClauses = nActs.zipWithIndex.map {
        case (GraftInsAct(_, true, _), i) =>
          requireStarCols("WHEN NOT MATCHED THEN INSERT *")
          (i, (c: String) =>
            if (hasSrc(c)) cast(srcCol(c), c) else nullOf(c))
        case (GraftInsAct(_, false, assigns), i) =>
          val amap = assignMap(assigns, tgtCols)
          (i, (c: String) => amap.get(c).map(cast(_, c)).getOrElse(nullOf(c)))
        case (other, _) =>
          fail(s"'${other.getClass.getSimpleName}' as a NOT MATCHED action")
      }
      Some(firstImage(anti, insClauses))
    }

    // ---- WHEN NOT MATCHED BY SOURCE: the anti-joined target
    val (bUpd, bDel) = if (bActs.isEmpty) (None, None) else {
      val srcKeys = keys.foldLeft(
        src.select(keys.map(k => srcCol(k).as(k)): _*).distinct()) {
        (d, k) => d.withColumnRenamed(k, s"__sk_$k")
      }
      val antiCond =
        keys.map(k => col(s"$tA.$k") <=> col(s"__sk_$k")).reduce(_ && _)
      val anti = current.join(srcKeys, antiCond, "left_anti")
        .withColumn("__act", selector(bActs))
      val updClauses = bActs.zipWithIndex.collect {
        case (GraftUpdAct(_, true, _), _) =>
          fail("WHEN NOT MATCHED BY SOURCE THEN UPDATE SET * (there is " +
            "no source row to read)")
        case (GraftUpdAct(_, false, assigns), i) =>
          val amap = assignMap(assigns, tgtCols)
          (i, (c: String) =>
            amap.get(c).map(cast(_, c)).getOrElse(col(s"$tA.$c")))
      }
      val delIdx = bActs.zipWithIndex.collect {
        case (GraftDelAct(_), i) => i
      }
      (if (updClauses.isEmpty) None
       else Some(firstImage(anti, updClauses)),
       if (delIdx.isEmpty) None
       else Some(anti.filter(col("__act").isin(delIdx: _*))
         .select(keys.map(k => col(s"$tA.$k").as(k)): _*)))
    }

    val updates = (mUpd.toSeq ++ ins.toSeq ++ bUpd.toSeq)
      .reduceOption(_ unionByName _)
      .getOrElse(table.read(spark).limit(0)
        .select(tgtCols.map(col): _*))
    val delKeys = (mDel.toSeq ++ bDel.toSeq).reduceOption(_ unionByName _)
    // the image/key frames derive from up to three joins re-consumed by
    // applyCdc's touched-partition planning — persist the (batch-sized)
    // results once instead of re-running the joins per job
    val upsP = updates.persist()
    val dkP = delKeys.map(_.persist())
    try {
      graft.merge.MergeOps.applyCdc(spark, table, upsP, dkP, keys,
        skipEmptyFeed = false)
      ()
    } finally { upsP.unpersist(); dkP.foreach(_.unpersist()); () }
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val entry = GraftMergeInto.lookup(spark, targetIdent).getOrElse(
      throw new IllegalStateException(
        s"MERGE INTO ${targetIdent.mkString(".")}: table is not (or no " +
          "longer) graft-registered in this session — register it via " +
          "graft.io.Catalog.registerTable first"))
    val table = entry.table
    val tNames =
      (spec.targetAlias.toSeq ++ targetIdent.takeRight(1)).distinct
    val sNames = (spec.sourceAlias.toSeq ++
      GraftMergeInto.identOf(source).map(_.last).toSeq).distinct
    val keys = keyColumns(condition, tNames, sNames).distinct
    require(keys.nonEmpty, "MERGE needs at least one ON key equality")
    val src = classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], source)
    val mActs = spec.matchedActions
      .map(classify(_, "WHEN MATCHED (UPDATE/DELETE)"))
    val nActs = spec.notMatchedActions
      .map(classify(_, "WHEN NOT MATCHED (INSERT)"))
    val bActs = spec.notMatchedBySourceActions
      .map(classify(_, "WHEN NOT MATCHED BY SOURCE (UPDATE/DELETE)"))
    nActs.foreach {
      case _: GraftInsAct => ()
      case other => fail(s"'$other' as a NOT MATCHED action")
    }
    (mActs ++ bActs).foreach {
      case _: GraftInsAct => fail("INSERT outside WHEN NOT MATCHED")
      case _ => ()
    }
    // evolve the committed schema FIRST so the lowering below reads the
    // final column set (and existing versions serve NULL for new cols)
    if (withSchemaEvolution) {
      val tgtCols0 = table.liveSchema.map(_.fieldNames.toSeq).getOrElse(
        throw new IllegalStateException(
          s"MERGE INTO ${targetIdent.mkString(".")}: target carries no " +
            "committed schema"))
      evolveSchema(spark, table, src, tgtCols0)
    }
    val tgtCols = table.liveSchema.map(_.fieldNames.toSeq).getOrElse(
      throw new IllegalStateException(
        s"MERGE INTO ${targetIdent.mkString(".")}: target carries no " +
          "committed schema"))
    keys.foreach { k =>
      require(tgtCols.exists(_.equalsIgnoreCase(k)) &&
          src.columns.exists(_.equalsIgnoreCase(k)),
        s"MERGE key '$k' must exist on both sides — target has " +
          s"${tgtCols.mkString(", ")}; source has " +
          s"${src.columns.mkString(", ")}")
    }
    if (mActs.nonEmpty || bActs.nonEmpty) requireUniqueSourceKeys(src, keys)

    val uncond = (mActs ++ nActs ++ bActs).forall(_.cond.isEmpty)
    (mActs, nActs, bActs) match {
      // upsert (S9) — COW on partitioned tables
      case (Seq(GraftUpdAct(None, true, _)), Seq(GraftInsAct(None, true, _)),
          Seq()) if uncond && !withSchemaEvolution =>
        val missing = tgtCols.filterNot(c =>
          src.columns.exists(_.equalsIgnoreCase(c)))
        require(missing.isEmpty, s"UPDATE SET * / INSERT * needs the " +
          s"source to carry every target column — missing " +
          s"${missing.mkString(", ")}")
        if (table.partitionColumns.nonEmpty)
          graft.merge.MergeOps.upsertIntoPartitioned(spark, table, src, keys)
        else graft.merge.MergeOps.upsertInto(spark, table, src, keys)
      // full-sync upsert: target grains absent from source are dropped
      case (Seq(GraftUpdAct(None, true, _)), Seq(GraftInsAct(None, true, _)),
          Seq(GraftDelAct(None))) if uncond && !withSchemaEvolution =>
        graft.merge.MergeOps.upsertInto(spark, table, src, keys,
          deleteUnmatched = true)
      // insert-if-absent (S6/S7) — the reference's idempotent intake;
      // the ONE shape where duplicate source keys stay legal (Delta
      // inserts them all; no target row is ever touched)
      case (Seq(), Seq(GraftInsAct(None, true, _)), Seq())
          if uncond && !withSchemaEvolution =>
        table.writeMerged(spark, src)(
          graft.merge.MergeOps.insertIfAbsent(_, _, keys))
      // keyed delete — COW on partitioned tables, exact delete feed
      case (Seq(GraftDelAct(None)), Seq(), Seq()) if uncond =>
        val delKeys = src.select(keys.map(functions.col): _*).distinct()
        graft.merge.MergeOps.applyCdc(spark, table,
          table.read(spark).limit(0), Some(delKeys), keys,
          skipEmptyFeed = false)
      // everything else — conditional clauses, multiple ordered
      // clauses, assignment shapes, NOT MATCHED BY SOURCE UPDATE,
      // schema evolution — lowers through the general image builder
      case _ =>
        generalMerge(spark, table, src, keys, tgtCols, mActs, nActs, bActs)
    }
    // repoint the catalog entry at the committed version so subsequent
    // spark.sql reads of the registered name see the merge
    graft.io.Catalog.registerTable(spark, entry.database, entry.name, table)
    Seq(Row(table.version.toLong))
  }
}

/** The injected parser: stock grammar (full delegation), one plan
  * rewrite on the way out — see [[GraftMergeInto.rewrite]].
  */
final class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  // maintenance verbs first (VACUUM / OPTIMIZE / DESCRIBE HISTORY are
  // not in the stock grammar at all): a non-match or an unregistered
  // table falls through to the delegate's standard behavior. Both
  // plan entry points hook identically — spark.sql() arrives through
  // parsePlanWithParameters, direct parser use through parsePlan.
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftMaintenanceSql.tryParse(spark, sqlText).getOrElse(
      GraftMergeInto.rewrite(spark, delegate.parsePlan(sqlText)))
  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    GraftMaintenanceSql.tryParse(spark, sqlText).getOrElse(
      GraftMergeInto.rewrite(spark,
        delegate.parsePlanWithParameters(sqlText, ctx)))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
