package org.apache.spark.sql

import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.CatalogStatistics

/** Commit-metadata statistics for the session catalog — the seam that
  * makes a graft-registered table's logical-plan `sizeInBytes` REAL
  * before AQE runs.
  *
  * Why it exists: a PARTITIONED datasource table registered in the
  * catalog resolves through a lazy `CatalogFileIndex` (partitions are
  * listed at partition-pruning time, not at resolution), so without
  * catalog statistics `LogicalRelation.computeStats` reports
  * `spark.sql.defaultSizeInBytes` = Long.MaxValue. Every join-side /
  * shuffle estimate above that leaf is then garbage: broadcast
  * selection degrades to AQE-only, and the plan audit has to censor the
  * query (`unreliable_stats`, PLANAUDIT r16 flagged exactly the
  * SQL-path queries q124–q128 for this). The versioned commit protocol
  * already knows the live version's exact file footprint at
  * registration time — one `alterTableStats` call feeds it to Catalyst,
  * the same contract Delta's commit stats serve. `alterTableStats` also
  * invalidates the cached relation, so the next resolution sees the new
  * stats.
  *
  * At 100 TB this is load-bearing: the pre-AQE broadcast decision on a
  * dimension-table join happens at PLANNING time from exactly this
  * number; Long.MaxValue there means every catalog-path join starts as
  * a sort-merge join until AQE's runtime sizes rescue it (an extra
  * shuffle of the dimension side that never needed to happen).
  */
object GraftCatalogStats {

  /** Attach `sizeInBytes` (exact live-version data bytes) and an
    * optional row count to the registered table's catalog entry.
    */
  def set(spark: SparkSession, database: String, name: String,
      sizeInBytes: Long, rowCount: Option[Long] = None): Unit = {
    val s = spark.asInstanceOf[classic.SparkSession]
    s.sessionState.catalog.alterTableStats(
      TableIdentifier(name, Some(database)),
      Some(CatalogStatistics(BigInt(sizeInBytes), rowCount.map(BigInt(_)))))
  }
}
