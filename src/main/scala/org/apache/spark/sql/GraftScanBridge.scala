package org.apache.spark.sql

import org.apache.hadoop.fs.{Path => HadoopPath}

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.types.StructType

/** Bridge into Spark's file-source internals for graft's
  * commit-metadata data skipping ([[graft.io.ParquetTable]]): a
  * [[org.apache.spark.sql.execution.datasources.FileIndex]] that prunes
  * the file list with per-file stats BEFORE Catalyst enumerates scan
  * splits — Delta's data-skipping architecture on plain parquet. Lives
  * in the `org.apache.spark.sql` package because the file-source
  * machinery (`HadoopFsRelation`, `InMemoryFileIndex`,
  * `PartitionDirectory`) is `private[sql]`-adjacent extension surface;
  * nothing here knows about graft's log format — the pruning policy
  * arrives as a function.
  */
object GraftScanBridge {

  /** An [[InMemoryFileIndex]] whose [[listFiles]] additionally drops
    * files a stats predicate proves irrelevant. `pruner` receives the
    * PUSHED-DOWN data filters once per listing and returns a keep
    * predicate over absolute file-path strings — returning `_ => true`
    * (e.g. for an empty filter set) keeps the listing untouched.
    * Partition-directory pruning is inherited unchanged from the base
    * class; this only narrows WITHIN surviving partitions.
    */
  final class StatsPrunedFileIndex(
      spark: SparkSession,
      root: HadoopPath,
      userSchema: Option[StructType],
      pruner: Seq[Expression] => (String => Boolean))
    extends InMemoryFileIndex(
      spark, Seq(root), Map("basePath" -> root.toString), userSchema) {

    override def listFiles(partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
      val base = super.listFiles(partitionFilters, dataFilters)
      val keep = pruner(dataFilters)
      base.map(pd => PartitionDirectory(pd.values,
          pd.files.filter(f => keep(f.getPath.toString))))
        .filter(_.files.nonEmpty)
    }
  }

  /** Build the data-skipping DataFrame: a parquet [[HadoopFsRelation]]
    * over a [[StatsPrunedFileIndex]], schema split into data vs
    * partition columns exactly as `DataSource.resolveRelation` would.
    * `fullSchema` must be the table's committed schema INCLUDING
    * partition columns (partition value parsing takes its types from
    * it, matching `spark.read.schema(st).parquet(dir)` semantics).
    */
  def statsPrunedParquet(spark0: SparkSession, root: String,
      fullSchema: StructType,
      pruner: Seq[Expression] => (String => Boolean)): DataFrame = {
    val spark = spark0.asInstanceOf[classic.SparkSession]
    val index = new StatsPrunedFileIndex(spark, new HadoopPath(root),
      Some(fullSchema), pruner)
    val partitionSchema = index.partitionSchema
    val partNames = partitionSchema.fieldNames.toSet
    // asNullable mirrors DataSource.resolveRelation: a schema-evolved
    // version dir legitimately holds files MISSING a later column, and
    // the vectorized reader refuses an absent REQUIRED column — under
    // the plain read every parquet-sourced column is nullable, so the
    // pruned relation must declare the same
    val dataSchema = StructType(
      fullSchema.fields.filterNot(f => partNames(f.name))).asNullable
    val relation = HadoopFsRelation(index, partitionSchema, dataSchema,
      bucketSpec = None, new ParquetFileFormat, Map.empty[String, String]
    )(spark)
    // output order is dataSchema ++ partitionSchema — exactly what
    // `spark.read.schema(full).parquet(dir)` yields for the same layout
    // (file sources always emit partition columns last), so the pruned
    // relation is column-order-identical to the plain read it replaces
    spark.baseRelationToDataFrame(relation)
  }

  /** The number of files the executed plan's file scans actually
    * selected — the data-skipping IO proof for specs. Call AFTER an
    * action so AQE has finalized the plan.
    */
  def scannedFileCount(df: Dataset[_]): Long = {
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      // AQE query stages (shuffle/broadcast/result) are LEAF wrappers —
      // children is Nil and the real subtree hangs off `plan`; without
      // this case any scan below an exchange is invisible to the census
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other =>
        other.children.flatMap(scans) ++
          other.subqueries.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan)
      .map(_.selectedPartitions.totalNumberOfFiles).sum
  }
}
