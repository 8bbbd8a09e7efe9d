package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Expression conversions for
  * graft's native Catalyst expressions (Spark 4 removed the public
  * `Column.expr` / `new Column(expr)` surface; this is the supported
  * extension-library pattern).
  */
object GraftBridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** EAGER Column → Expression conversion, for FUNCTION-REGISTRY
    * builders: [[toExpression]] wraps the Column's node tree in a lazy
    * `ColumnNodeExpression` that only the Dataset API boundary converts —
    * inside a registered SQL function the wrapper survives analysis
    * un-converted and codegen rejects it. Converting through the
    * session's ColumnNode converter up front yields a plain (possibly
    * unresolved) expression tree the analyzer handles like any parsed
    * SQL.
    */
  def toExpressionEager(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Deterministically drop the storage blocks behind a `localCheckpoint`ed
    * Dataset. `Dataset.unpersist` only talks to the CacheManager, which does
    * not track checkpoint RDDs — without this, every superseded iteration of
    * an iterative algorithm (connected components) pins its MEMORY_AND_DISK
    * blocks until the RDD happens to be GC'd. Only call on a checkpoint that
    * nothing downstream will read again: the truncated lineage cannot
    * recompute freed blocks.
    */
  def freeLocalCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** True when the session's CacheManager tracks no cached relations —
    * the cache-ownership specs assert library operators leave nothing
    * behind once the caller releases the one documented surviving
    * relation. (Checkpoint RDD blocks are outside the CacheManager; see
    * [[freeLocalCheckpoint]].)
    */
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty

  /** Type equality modulo nullability (`DataType.sameType` is
    * `private[sql]`): a join or parquet read-back flips `nullable` /
    * `containsNull` freely while the storage representation is identical,
    * so schema-agreement checks must not treat the flip as a retype.
    */
  def sameType(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean = a.sameType(b)

  /** Drain the listener bus so SparkListener counters observed after a job
    * reflect every stage of that job (the bus is async; without the drain
    * a fast query's tail stages get attributed to the NEXT measurement
    * window). `listenerBus` is `private[spark]` — measurement harnesses
    * (graft.Bench) need this one call.
    */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
