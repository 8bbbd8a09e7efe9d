package org.apache.spark.sql

import org.apache.spark.sql.types.StructType

/** `private[sql]` seams the graft table streaming source needs
  * ([[graft.streaming.GraftTableSource]]): a V1 micro-batch
  * [[org.apache.spark.sql.execution.streaming.Source]]'s `getBatch`
  * must return a DataFrame whose logical plan is tagged
  * `isStreaming = true` (MicroBatchExecution splices it in place of the
  * streaming relation and asserts the tag), and the only public-ish
  * constructor for that is `SparkSession.internalCreateDataFrame` —
  * `package sql`-private, hence this bridge. `toRdd` materializes the
  * batch's (fully optimized) physical plan lazily; the batch-local plan
  * still runs with codegen/AQE, only the plan-fusion boundary with the
  * downstream streaming operators is cut — exactly how
  * FileStreamSource serves its batches.
  */
object GraftStreamBridge {

  /** `df` re-tagged as a streaming batch frame (same rows, schema). */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    val s = cdf.sparkSession
    s.internalCreateDataFrame(cdf.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }

  /** An EMPTY streaming-tagged frame of `schema` (a no-new-data batch,
    * a restart replay of an already-committed range).
    */
  def emptyStreamingBatch(spark: SparkSession, schema: StructType): DataFrame = {
    val s = spark.asInstanceOf[classic.SparkSession]
    s.internalCreateDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
      schema, isStreaming = true)
  }
}
