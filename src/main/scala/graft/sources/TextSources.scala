package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema-enforced CSV / JSON-lines ingestion with corrupt-record routing —
  * the source-side mirror of the silver validators' DLQ split.
  *
  * Reads run PERMISSIVE with an explicit schema plus a corrupt-record
  * column: a malformed line lands with its raw text in [[CorruptCol]] and
  * NULLs in the typed columns, and [[split]] routes it to a dead-letter
  * frame. The alternatives both fail at 100 TB: FAILFAST kills a
  * thousand-executor job on byte one-in-a-trillion, DROPMALFORMED loses
  * data silently. Explicit schemas also skip the inference pass — Spark
  * otherwise reads the whole input once just to guess types.
  */
object TextSources {

  val CorruptCol = "__corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(CorruptCol, StringType, nullable = true))

  /** CSV read: explicit schema, header expected, malformed rows captured. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** JSON-lines read: explicit schema, malformed lines captured. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** DLQ split: (clean rows without the corrupt column, corrupt rows).
    * The input is cached first — Spark refuses a filter that references
    * ONLY the internal corrupt-record column on a lazy scan (the raw text
    * would have to be re-parsed), and the two branches here read the scan
    * twice anyway.
    */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    df.cache()
    val clean = df.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val corrupt = df.filter(col(CorruptCol).isNotNull)
    (clean, corrupt)
  }
}
