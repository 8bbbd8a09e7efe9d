package org.apache.spark.sql

import org.apache.hadoop.fs.{Path => HadoopPath}

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{
  FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** SQL-path commit-metadata data skipping: the optimizer rule that
  * gives catalog-registered graft tables (`spark.table(...)`,
  * `spark.sql(...)`) the same planner-automatic file skipping
  * [[graft.io.ParquetTable.read]] already has.
  *
  * `graft.io.Catalog.registerTable` deliberately keeps the reference's
  * literal S4 semantics — `CREATE TABLE ... USING parquet LOCATION
  * <live version dir>` — so Catalyst resolves the table to an ordinary
  * [[HadoopFsRelation]] over a directory listing and never consults the
  * commit log. This rule closes that seam AFTER resolution instead of
  * replacing the DDL: any file-source relation whose single root path
  * is a committed graft version dir (`.../table/v_NNNNN` with a
  * resolvable commit log) gets its [[FileIndex]] wrapped so the
  * PUSHED-DOWN data filters are handed to the commit-log stats at
  * listing time ([[graft.io.StatsPruning]]) — files provably disjoint
  * from the predicate never become scan splits.
  *
  * Installed per-session via [[GraftSqlSkipping.install]] (idempotent;
  * `Catalog.registerTable` calls it), running in the optimizer's
  * user-provided batch — by then partition pruning has already rewritten
  * partitioned catalog relations, so the wrapper only narrows WITHIN
  * surviving partitions, exactly like the read-path index. Everything
  * is delegation: schema, partitioning, sizeInBytes and the output
  * attributes of the relation are untouched, so the rewrite can never
  * change results — a location that fails to resolve, a filter shape
  * the stats can't serve, or `graft.read.skipping=off` all degrade to
  * the unwrapped listing.
  */
object GraftSqlSkipping extends Rule[LogicalPlan] {

  /** A [[FileIndex]] decorator that additionally drops files the
    * commit-log stats prove irrelevant — the catalog-path twin of
    * [[GraftScanBridge.StatsPrunedFileIndex]], as a wrapper because the
    * catalog relation's index is built by Spark (InMemoryFileIndex, or
    * the partition-pruned index `PruneFileSourcePartitions` substitutes)
    * and must keep its partition discovery untouched.
    */
  final class PrunedFileIndex(val delegate: FileIndex,
      pruner: Seq[Expression] => (String => Boolean)) extends FileIndex {
    override def rootPaths: Seq[HadoopPath] = delegate.rootPaths
    override def listFiles(partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
      val base = delegate.listFiles(partitionFilters, dataFilters)
      val keep = pruner(dataFilters)
      base.map(pd => PartitionDirectory(pd.values,
          pd.files.filter(f => keep(f.getPath.toString))))
        .filter(_.files.nonEmpty)
    }
    override def inputFiles: Array[String] = delegate.inputFiles
    override def refresh(): Unit = delegate.refresh()
    override def sizeInBytes: Long = delegate.sizeInBytes
    override def partitionSchema: StructType = delegate.partitionSchema
    override def metadataOpsTimeNs: Option[Long] =
      delegate.metadataOpsTimeNs
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (sys.props.get("graft.read.skipping").contains("off")) plan
    else plan transform {
      case lr: LogicalRelation if eligible(lr) =>
        val fs = lr.relation.asInstanceOf[HadoopFsRelation]
        versionDirOf(fs).flatMap(d =>
            graft.io.ParquetTable.statsPrunerFor(d.toString)) match {
          case Some(pruner) =>
            val wrapped = new PrunedFileIndex(fs.location, pruner)
            lr.copy(relation =
              fs.copy(location = wrapped)(fs.sparkSession))
          case None => lr
        }
    }

  /** The committed version dir the relation's listing lives under, if
    * every root path agrees on one. The roots are the version dir
    * itself for a flat registration, but `PruneFileSourcePartitions`
    * rewrites a partitioned catalog relation's index to the SURVIVING
    * PARTITION SUBDIRECTORIES (`.../v_NNNNN/status=O`) before this rule
    * runs — so climb each root to its `v_NNNNN` ancestor. The pruner
    * relativizes listed files against the version dir, so it serves
    * either root shape unchanged.
    */
  private def versionDirOf(fs: HadoopFsRelation): Option[HadoopPath] = {
    def ancestor(p: HadoopPath): Option[HadoopPath] =
      if (p == null) None
      else if (p.getName.matches("v_\\d+")) Some(p)
      else ancestor(p.getParent)
    val dirs = fs.location.rootPaths.map(ancestor).distinct
    if (dirs.length == 1) dirs.head else None
  }

  /** Only file relations not already pruned (the rule runs in a
    * fixed-point batch, and `ParquetTable.read`'s relations arrive
    * pre-pruned); the cheap path test gates the commit-log resolution.
    */
  private def eligible(lr: LogicalRelation): Boolean = lr.relation match {
    case fs: HadoopFsRelation =>
      !fs.location.isInstanceOf[PrunedFileIndex] &&
        !fs.location.isInstanceOf[GraftScanBridge.StatsPrunedFileIndex] &&
        fs.location.rootPaths.nonEmpty && versionDirOf(fs).nonEmpty
    case _ => false
  }

  /** Append this rule to `spark`'s user-provided optimizer batch once
    * (idempotent per session — the experimental-methods list is
    * session-scoped state). The contains-check-and-append is a
    * read-modify-write of shared session state, so it synchronizes on
    * the session's experimental-methods holder: two concurrent
    * `registerTable` calls (or one racing a user's own rule
    * registration through the same lock) must not double-append this
    * rule or drop the other party's appended optimization.
    */
  def install(spark0: SparkSession): Unit = {
    val spark = spark0.asInstanceOf[classic.SparkSession]
    spark.experimental.synchronized {
      val cur = spark.experimental.extraOptimizations
      if (!cur.contains(GraftSqlSkipping))
        spark.experimental.extraOptimizations = cur :+ GraftSqlSkipping
    }
  }
}
