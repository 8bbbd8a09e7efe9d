package graft.merge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S6–S11 (SURVEY.md §2.1): Delta-MERGE semantics as plain DataFrame algebra.
  *
  * The reference drives every table write through Delta `MERGE`
  * (reference: src/ETL/Bronze-Ingestion-Orders.py:51-58,
  * src/ETL/Silver-DLQ-Customers.py:73-101,
  * src/ETL/Gold-Customer-Breakdown.py:55-62). With no Delta on the
  * classpath we re-express each MERGE shape as joins, which is also the
  * scale-friendly form: Catalyst is free to broadcast the small side or
  * shuffle on the keys, and AQE handles skew — none of which a row-by-row
  * merge loop would get.
  *
  * Null semantics deliberately mirror SQL MERGE: an equality condition never
  * matches on NULL keys, so NULL-keyed update rows always insert
  * (`insertIfAbsent`) and never update (`updateMatched`/`upsert`).
  */
object MergeOps {

  /** S10 (reference: src/ETL/CommonFunctions.py:39-59): the columns that
    * participate in a full-row merge condition — every column except
    * ingestion-time stamps.
    */
  def mergeKeyColumns(columns: Seq[String]): Seq[String] =
    columns.filterNot(_.contains("ingestion_time"))

  private def aligned(target: DataFrame, updates: DataFrame): DataFrame =
    updates.select(target.columns.map(col).toIndexedSeq: _*)

  /** S6/S7: `whenNotMatchedInsert` — append update rows whose key tuple is
    * absent from the target (idempotent re-ingestion). Returns the new table
    * content.
    */
  def insertIfAbsent(target: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame = {
    val missing = aligned(target, updates)
      .join(target.select(keys.map(col).toIndexedSeq: _*).distinct(),
        keys, "left_anti")
    target.unionByName(missing)
  }

  /** S8: `whenMatchedUpdate` only — rewrite `setCols` of matched target rows
    * from the update side; unmatched target rows pass through, unmatched
    * update rows are dropped. Delta MERGE errors on multiple update matches
    * per target row; we resolve it deterministically by `dropDuplicates` on
    * the keys (documented divergence — the reference never feeds duplicate
    * update keys).
    */
  def updateMatched(target: DataFrame, updates: DataFrame, keys: Seq[String],
      setCols: Seq[String]): DataFrame = {
    val u0 = updates.dropDuplicates(keys)
      .select((keys ++ setCols).map(col).toIndexedSeq: _*)
    val u = setCols.foldLeft(u0)((d, c) => d.withColumnRenamed(c, s"__u_$c"))
      .withColumn("__matched", lit(true))
    target.join(u, keys, "left")
      .select(target.columns.toIndexedSeq.map {
        case c if setCols.contains(c) =>
          when(col("__matched"), col(s"__u_$c")).otherwise(col(c)).as(c)
        case c => col(c)
      }: _*)
  }

  /** S9: full upsert — matched target rows are replaced by their update row,
    * unmatched update rows are inserted (the gold refresh pattern).
    */
  def upsert(target: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame = {
    val u = aligned(target, updates).dropDuplicates(keys)
    target.join(u.select(keys.map(col).toIndexedSeq: _*).distinct(),
        keys, "left_anti")
      .unionByName(u)
  }
}
