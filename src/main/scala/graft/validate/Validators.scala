package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, TimestampType}

/** V2–V6 (SURVEY.md §2.4): the reference's validation operators.
  *
  * Semantics replicate reference src/ETL/CommonFunctions.py:123-313 and its
  * goldens (src/ETL/TestCommonFunctions.py) exactly, including the
  * `invalid_columns` wrap quirk: each new invalid column name is joined with
  * the *previous* array content into a single comma-separated element
  * (CommonFunctions.py:167 — `["name, id"]`, not `["name","id"]`).
  *
  * The two collect-to-driver operators of the reference
  * (`validate_relationship` CommonFunctions.py:187, `check_ingestion_status`
  * CommonFunctions.py:228-234) are re-expressed as joins: at 100 TB a
  * collected id list would OOM the driver, while an anti/semi join shuffles
  * or broadcasts as Catalyst sees fit.
  */
object Validators {

  val StatusCol = "validation_status"
  val InvalidColsCol = "invalid_columns"
  val InvalidRelCol = "invalid_relationship"

  /** Seed the diagnostic columns the validators update. */
  def initDiagnostics(df: DataFrame, withRelationship: Boolean = false): DataFrame = {
    val d = df.withColumn(StatusCol, lit(""))
      .withColumn(InvalidColsCol, typedLit(Seq.empty[String]))
    if (withRelationship) d.withColumn(InvalidRelCol, typedLit(Seq.empty[String]))
    else d
  }

  private def flagInvalid(df: DataFrame, invalid: Column, columnName: String): DataFrame =
    df.withColumn(StatusCol, when(invalid, lit("invalid")).otherwise(col(StatusCol)))
      .withColumn(InvalidColsCol,
        when(invalid, array(concat_ws(", ", lit(columnName), col(InvalidColsCol))))
          .otherwise(col(InvalidColsCol)))

  /** V2 (reference CommonFunctions.py:123-169): mark rows invalid when the
    * column fails its type/domain check. Cast checks use `try_cast` so they
    * keep the reference's permissive cast-to-null semantics under Spark 4's
    * default ANSI mode.
    */
  def validateColumn(df: DataFrame, column: String, datatype: String,
      comparisonColumn: Option[String] = None,
      acceptedValues: Seq[Any] = Nil): DataFrame = {
    val c = col(column)
    val invalid: Column = datatype match {
      case "string" =>
        (comparisonColumn, acceptedValues) match {
          case (Some(cmp), _)            => (c === "") || (c =!= col(cmp))
          case (None, vs) if vs.nonEmpty => !c.isin(vs: _*)
          case _ => throw new IllegalArgumentException(
            "For strings, pass either a comparison column or accepted values")
        }
      // The reference's legacy-mode LongType cast parses any decimal string
      // ("9.99" → 9), so null-ness must be probed via a double cast —
      // try_cast(LongType) would reject decimal strings the reference accepts.
      case "numeric"   => c.try_cast(DoubleType).isNull
      case "timestamp" => c.try_cast(TimestampType).isNull
      case other => throw new IllegalArgumentException(
        s"datatype '$other' not allowed; use 'string', 'numeric' or 'timestamp'")
    }
    flagInvalid(df, invalid, column)
  }

  /** V3 / J6 (reference CommonFunctions.py:174-198): FK existence check.
    * Reference collects parent ids and uses `~isin`; we left-join against the
    * distinct parent keys. NULL child FKs stay valid in both forms (`isin` on
    * NULL is NULL → `otherwise` branch).
    */
  def validateRelationship(child: DataFrame, childIdCol: String,
      parent: DataFrame, parentIdCol: String): DataFrame = {
    val parentKeys = parent.select(col(parentIdCol).as("__parent_key")).distinct()
    val invalid = col("__parent_key").isNull && col(childIdCol).isNotNull
    // Compare on string form: a dirty (uncastable) child FK must simply miss,
    // not blow up the ANSI implicit cast the typed equality would insert.
    child.join(parentKeys,
        col(childIdCol).cast("string") === col("__parent_key").cast("string"), "left")
      .withColumn(StatusCol, when(invalid, lit("invalid")).otherwise(col(StatusCol)))
      // deliberately OVERWRITES (not wraps) any previous invalid_relationship
      // content — replicating the reference verbatim (CommonFunctions.py:
      // 194-196 builds array(concat_ws(', ', lit(id_col_1))) with no
      // reference to the prior value), unlike validate_column's wrap quirk
      .withColumn(InvalidRelCol,
        when(invalid, array(concat_ws(", ", lit(childIdCol))))
          .otherwise(col(InvalidRelCol)))
      .drop("__parent_key")
  }

  /** V4 / J7 (reference CommonFunctions.py:203-241): label rows "ingested" /
    * "not_ingested" by (composite-)key membership in `ingested`. Reference
    * collects + broadcasts the id list into a UDF; we use a null-safe left
    * join (null-safe to mirror the reference's string-concat membership where
    * NULL keys on both sides compare equal after `concat_ws` drops them).
    */
  def checkIngestionStatus(validation: DataFrame, ingested: DataFrame,
      idColumns: Seq[String],
      statusCol: String = "silver_ingestion_status"): DataFrame = {
    val keys0 = ingested.select(idColumns.map(col).toIndexedSeq: _*).distinct()
    val keys = idColumns.foldLeft(keys0)((d, c) => d.withColumnRenamed(c, s"__k_$c"))
      .withColumn("__ingested", lit(true))
    // String-form comparison (like validateRelationship): a raw bronze key
    // may be a dirty string while silver is already cast — a typed `<=>`
    // would make ANSI insert a crashing numeric cast on the dirty rows, the
    // very rows validation exists to route to the DLQ. Also faithful to the
    // reference, which compares concat_ws string forms.
    val cond = idColumns.map(c =>
      col(c).cast("string") <=> col(s"__k_$c").cast("string")).reduce(_ && _)
    validation.join(keys, cond, "left")
      .withColumn(statusCol,
        when(col("__ingested"), "ingested").otherwise("not_ingested"))
      .drop("__ingested")
      .drop(idColumns.map(c => s"__k_$c").toIndexedSeq: _*)
  }

  /** V5 (reference CommonFunctions.py:249-313): duplicate policy over the
    * id key(s), ordered by ingestion timestamp:
    *   - not-ingested key seen >1 time  → every copy invalid;
    *   - ingested key seen >1 time      → every copy but the earliest invalid;
    *   - `is_duplicate` boolean set accordingly, `invalid_columns` replaced
    *     by the comma-joined id list (reference overwrites, does not wrap).
    */
  def identifyDuplicates(df: DataFrame, idColumns: Seq[String],
      ingestionTimestamp: String,
      statusCol: String = "silver_ingestion_status",
      tieBreakers: Seq[String] = Nil): DataFrame = {
    val idStr = idColumns.mkString(", ")
    val byId = Window.partitionBy(idColumns.map(col).toIndexedSeq: _*)
    // tieBreakers make the surviving copy deterministic when ingestion
    // timestamps tie (one batch stamps every row with the same clock) —
    // the reference leaves this nondeterministic; the pipeline passes
    // window_id.
    val ordering = (ingestionTimestamp +: tieBreakers).map(col)
    val counted = df
      .withColumn("__rn", row_number().over(byId.orderBy(ordering.toIndexedSeq: _*)))
      .withColumn("__cnt", count(lit(1)).over(byId))
    val dup = (col(statusCol) === "not_ingested" && col("__cnt") > 1) ||
      (col(statusCol) === "ingested" && col("__cnt") > 1 && col("__rn") > 1)
    counted
      .withColumn(StatusCol, when(dup, lit("invalid")).otherwise(col(StatusCol)))
      .withColumn(InvalidColsCol,
        when(dup, array(lit(idStr))).otherwise(col(InvalidColsCol)))
      .withColumn("is_duplicate", when(dup, lit(true)).otherwise(lit(false)))
      .drop("__rn", "__cnt")
  }

  /** V6 (reference Silver-Validation-Customers.py:78): finalize untouched
    * rows as "valid".
    */
  def finalizeValid(df: DataFrame): DataFrame =
    df.withColumn(StatusCol,
      when(col(StatusCol) === "", "valid").otherwise(col(StatusCol)))
}
