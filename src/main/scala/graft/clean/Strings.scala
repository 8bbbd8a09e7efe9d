package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** V1 (SURVEY.md §2.4): string standardization.
  *
  * Behavior matches reference src/ETL/CommonFunctions.py:77-117 exactly
  * (goldens in src/ETL/TestCommonFunctions.py:36-61): tabs → space;
  * non-address mode replaces every char outside `[a-zA-Z ]` with a space;
  * address mode keeps alphanumerics and `/` between digits; then initcap,
  * collapse runs of whitespace, trim.
  *
  * Implemented as a pure `Column => Column` chain of Catalyst built-ins so it
  * stays inside whole-stage codegen — no UDF.
  */
object Strings {

  def cleanString(c: Column, isAddress: Boolean = false): Column = {
    val noTabs = regexp_replace(c, "\t", " ")
    val despecialed =
      if (isAddress) {
        val alnum = regexp_replace(noTabs, "[^a-zA-Z0-9 /]", " ")
        // a '/' survives only between two digits (e.g. "1/2")
        regexp_replace(alnum, "(?<![0-9])/(?![0-9])", " ")
      } else {
        regexp_replace(noTabs, "[^a-zA-Z ]", " ")
      }
    trim(regexp_replace(initcap(despecialed), graft.northstar.TextAnalysis.WsClass + "+", " "))
  }

  /** DataFrame form mirroring the reference signature: clean
    * `columnToClean` into `newColumn` (defaults to in-place).
    */
  def cleanStringInDf(df: DataFrame, columnToClean: String,
      newColumn: Option[String] = None, isAddress: Boolean = false): DataFrame =
    df.withColumn(newColumn.getOrElse(columnToClean),
      cleanString(col(columnToClean), isAddress))
}
