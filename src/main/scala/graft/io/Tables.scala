package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1–S4 (SURVEY.md §2.1): sources and table storage.
  *
  * The reference reads raw parquet directories and registers Delta tables
  * (reference: src/ETL/Bronze-Ingestion-Orders.py:26,40-45). No Delta jars
  * exist on this classpath, so a "table" here is a parquet directory with a
  * tiny version pointer: every write lands in a fresh `v_NNNNN` subdirectory
  * and `_current` is atomically repointed afterwards. That preserves the two
  * Delta properties the reference actually relies on — readers never observe
  * a half-written table, and a failed write never corrupts the previous
  * version — while staying plain Spark + parquet (partition pruning and
  * predicate pushdown work unchanged on the partitioned layout).
  */
object Tables {

  /** S1: raw parquet scan of a driver testdata table. */
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Bucketed catalog table write: co-locates join keys so repeated joins
    * and aggregations on `bucketCols` run shuffle-free (the plan shows a
    * SortMergeJoin with NO Exchange on either side). The 100 TB pattern for
    * fact-fact joins that recur across a pipeline — pay the shuffle once at
    * write time, never again.
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCols: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
}

/** A versioned parquet table (Delta-semantics emulation, SURVEY.md §7.1).
  *
  * Layout: `<path>/v_00001/...parquet` + `<path>/_current` (text file holding
  * the live version name). Writes are copy-on-write: new version dir, then
  * pointer swap — safe to read the table while rewriting it (the reference
  * needs this for its read-merge-write loops, e.g.
  * src/ETL/Bronze-Ingestion-Orders.py:49-58).
  */
final class ParquetTable(val path: String, val partitionColumns: Seq[String] = Nil) {
  import java.nio.file.{Files, Paths, StandardCopyOption}

  private def pointer = Paths.get(path, "_current")

  def exists: Boolean = Files.exists(pointer)

  private def currentVersion: Option[String] =
    if (exists) Some(Files.readString(pointer).trim) else None

  def read(spark: SparkSession): DataFrame = {
    val v = currentVersion.getOrElse(
      throw new IllegalStateException(s"table at $path does not exist"))
    spark.read.parquet(s"$path/$v")
  }

  /** S2: create the table from `df` if absent; no-op when it exists. */
  def createIfNotExists(df: DataFrame): ParquetTable = {
    if (!exists) overwrite(df)
    this
  }

  /** S6–S9 write pattern: first write initializes the table with `updates`,
    * later writes store `merge(current, updates)`. (An empty partitioned
    * parquet dir is unreadable, so "create empty then merge" is not an
    * option — initialize directly instead.)
    */
  def writeMerged(spark: SparkSession, updates: DataFrame)(
      merge: (DataFrame, DataFrame) => DataFrame): ParquetTable =
    overwrite(if (exists) merge(read(spark), updates) else updates)

  /** Full rewrite as a new version + atomic pointer swap. */
  def overwrite(df: DataFrame): ParquetTable = {
    val next = f"v_${currentVersion.map(_.drop(2).toInt).getOrElse(0) + 1}%05d"
    val w = df.write.mode("overwrite")
    (if (partitionColumns.nonEmpty) w.partitionBy(partitionColumns: _*) else w)
      .parquet(s"$path/$next")
    val tmp = Paths.get(path, "_current.tmp")
    Files.writeString(tmp, next)
    Files.move(tmp, pointer, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    this
  }

  /** Live version number (1-based). */
  def version: Int = currentVersion
    .getOrElse(throw new IllegalStateException(s"table at $path does not exist"))
    .drop(2).toInt

  /** Time travel: read a specific retained version (`VERSION AS OF` in
    * Delta terms) — every version dir is kept until [[vacuum]], so audits
    * and reproducible re-reads of training inputs are free.
    */
  def readVersion(spark: SparkSession, v: Int): DataFrame = {
    val dir = Paths.get(path, f"v_$v%05d")
    require(Files.exists(dir), s"version $v of $path does not exist (vacuumed?)")
    spark.read.parquet(dir.toString)
  }

  /** Change-data-feed emulation between two retained versions: full-row
    * anti-joins in both directions. `_change_type` ∈ insert|delete; an
    * updated row appears as delete(old)+insert(new), exactly like Delta CDF
    * without update tracking. At 100 TB this is 2 shuffles on the full row
    * hash — a real CDF log records changes at write time instead; this is
    * the after-the-fact form the versioned layout gives for free.
    */
  def changesBetween(spark: SparkSession, fromV: Int, toV: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val from = readVersion(spark, fromV)
    val to = readVersion(spark, toV)
    val cols = from.columns.toIndexedSeq
    // null-safe (<=>) anti-joins — plain equality would report every
    // NULL-bearing row as changed on both sides
    def minus(a: DataFrame, b: DataFrame): DataFrame = {
      val renamed = cols.foldLeft(b.dropDuplicates()) {
        (d, c) => d.withColumnRenamed(c, s"__o_$c")
      }
      a.join(renamed, cols.map(c => col(c) <=> col(s"__o_$c")).reduce(_ && _),
        "left_anti")
    }
    minus(to, from).withColumn("_change_type", lit("insert"))
      .unionByName(minus(from, to).withColumn("_change_type", lit("delete")))
  }

  /** Small-file compaction (Delta OPTIMIZE): rewrite the live version into
    * `targetPartitions` files, optionally clustered by `sortCols`
    * (Z-order-lite — sorted row groups give parquet min/max skipping on
    * those columns). At 100 TB the streaming/merge write paths produce many
    * small files per partition; periodic compaction keeps scan task counts
    * and footer overhead bounded.
    */
  def compact(spark: SparkSession, targetPartitions: Int,
      sortCols: Seq[String] = Nil): ParquetTable = {
    import org.apache.spark.sql.functions.col
    val df0 = read(spark).repartition(targetPartitions)
    val df = if (sortCols.nonEmpty)
      df0.sortWithinPartitions(sortCols.map(col).toIndexedSeq: _*)
    else df0
    overwrite(df)
  }

  /** Drop all version dirs except the live one (Delta VACUUM). */
  def vacuum(): ParquetTable = {
    val keep = currentVersion.toSet
    val dir = Paths.get(path)
    if (Files.exists(dir)) {
      Files.list(dir).forEach { p =>
        val name = p.getFileName.toString
        if (name.startsWith("v_") && !keep.contains(name)) {
          Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .forEach(f => Files.delete(f))
        }
      }
    }
    this
  }
}
