package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: the percentile-bin rank of a value against a
  * sorted array of cut points — `count(boundaries <= value)` by binary
  * search, O(log B) comparisons per row inside whole-stage codegen.
  *
  * This is the rank-normalization primitive for Z-ordering
  * ([[graft.scale.ZOrder]]): cut points come from a one-pass
  * `percentile_approx` sketch and ride a broadcast 1-row frame, so ranking
  * is map-side at any corpus size. A higher-order `size(filter(...))`
  * would scan all B boundaries per row per column (65k comparisons where
  * 16 suffice) AND interpret its lambda outside codegen.
  *
  * NULL value or NULL boundary array → NULL (callers coalesce to rank 0);
  * NaN values rank 0 (every `boundary <= NaN` comparison is false).
  */
case class RankBin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"rank_bin expects (double, array<double>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "rank_bin"

  override def nullSafeEval(value: Any, bounds: Any): Any = {
    val v = value.asInstanceOf[Double]
    val b = bounds.asInstanceOf[ArrayData]
    var lo = 0
    var hi = b.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b.getDouble(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $b.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($b.getDouble($mid) <= $v) $lo = $mid + 1; else $hi = $mid;
         |}
         |${ev.value} = (long) $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object RankBinFunctions {

  /** `rank_bin(value, boundaries)` as a codegen'd binary-search lookup. */
  def rank_bin(value: Column, boundaries: Column): Column =
    GraftBridge.toColumn(RankBin(
      GraftBridge.toExpression(value.cast("double")),
      GraftBridge.toExpression(boundaries)))
}
