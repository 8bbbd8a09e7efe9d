package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{NorthStarQueries, Oracles, ReferenceQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Top-5 nations by BUILDING-segment customers (SURVEY.md §7.5 minimum
    * slice: scan → joins → agg → top-k).
    */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.q02TopSegmentNations(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.all ++ NorthStarQueries.all

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Oracles.all ++ NorthStarQueries.oracles
}
