package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.northstar.{CorpusClean, TextAnalysis}

/** Streaming corpus intake — the continuous-crawl form of the batch corpus
  * pipeline. Documents arrive as files; the intake transform is the SAME
  * stateless Column algebra the batch path uses (PII scrub, then quality
  * gate), so micro-batch output is identical to a batch run by
  * construction — StreamingSpec proves the equivalence. Stateful stages
  * (dedup, decontamination) stay downstream in the batch layer, where the
  * full-corpus state lives; at 100 TB/day the intake runs per-file with
  * zero state and zero shuffles.
  */
object CorpusStream {

  /** documents.parquet schema (explicit — a streaming source cannot infer). */
  val DocumentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-stream source over the testdata documents parquet. */
  def readDocuments(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream.schema(DocumentSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)

  /** PII scrub then quality gate, in that order — nothing downstream ever
    * sees unredacted text, and the gate scores the text that will actually
    * be trained on. Pure map-side predicates/projections: works identically
    * on a stream or a batch DataFrame.
    */
  def intake(docs: DataFrame,
      cfg: CorpusClean.Config = CorpusClean.Config()): DataFrame =
    CorpusClean.qualityFilter(
      docs.withColumn("text", TextAnalysis.redactPii(col("text"))),
      "text", cfg)
}
