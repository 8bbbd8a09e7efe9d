package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the most recent right row (by time)
  * with the same key and `rightTime <= leftTime`. Spark has no native ASOF
  * operator; composing built-ins (preference (a) in the extension ladder)
  * beats a custom SparkPlan here:
  *
  * union the two sides tagged, window per key ordered by (time, tag with
  * right-before-left on ties), carry the latest right payload forward with
  * `last(ignoreNulls)`, keep the left rows. ONE shuffle on the key —
  * exactly the cost of an equi-join — instead of the inequality join Spark
  * would otherwise plan as a broadcast-nested-loop.
  *
  * Right rows must be unique per (key, time) for a deterministic result —
  * pre-aggregate the right side if needed (ties would otherwise resolve
  * arbitrarily, as they do in engines' native ASOF too). `payloadCols`
  * must not collide with left column names.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: Column, rightTime: Column,
      payloadCols: Seq[String]): DataFrame = {
    val payloadType = right.select(payloadCols.map(col).toIndexedSeq: _*)
      .schema.catalogString
    val leftCols = left.columns.toSeq

    val lSide = left
      .withColumn("__t", leftTime)
      .withColumn("__tag", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType))
    val rSide0 = right
      // equi-join semantics: a NULL key never matches — drop NULL-keyed
      // right rows so NULL-keyed left rows get a NULL payload instead of
      // silently pairing inside the NULL window partition
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(keys.map(col).toIndexedSeq ++ Seq(rightTime.as("__t"),
        struct(payloadCols.map(col).toIndexedSeq: _*).as("__payload")): _*)
      .withColumn("__tag", lit(0))
    val rSide = leftCols.filterNot(keys.contains).foldLeft(rSide0) { (d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val shape = (leftCols ++ Seq("__t", "__tag", "__payload")).map(col)
    val unioned = lSide.select(shape.toIndexedSeq: _*)
      .unionByName(rSide.select(shape.toIndexedSeq: _*))

    // right rows sort before left rows at equal time → "<=" semantics
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(col).toIndexedSeq ++
        payloadCols.map(p => col(s"__match.`$p`").as(p)): _*)
  }
}
