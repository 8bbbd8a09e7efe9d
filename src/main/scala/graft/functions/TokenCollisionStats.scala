package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: token-multiset collision statistics
  * `struct(s2 = Σ cᵢ², d = distinct tokens)` of a text column in ONE
  * compiled pass per row — the engine side of the Rényi-2 diversity gate
  * (q74).
  *
  * Replaces the `aggregate(array_sort(tokens), ...)` fold, whose lambda
  * runs through the expression interpreter per token and allocates a
  * struct accumulator per step (higher-order functions do not participate
  * in whole-stage codegen — the same motivation as [[ShingleHashes]]).
  * Here each token is hashed once straight off the UTF8String bytes, the
  * hash array is sorted, and run lengths fall out of one linear scan:
  * O(tokens log tokens), zero per-token allocation.
  *
  * Tokenization matches `TextAnalysis.tokens` exactly (maximal runs of
  * non-`\s` bytes — see [[ShingleHashUtil]]). Counting runs of 64-bit
  * token hashes instead of token strings carries the same
  * negligible-collision assumption as the whole shingle-dedup family;
  * NorthStarSpec pins bit-parity with the string-comparing HOF fold.
  */
case class TokenCollisionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_collision_stats expects a string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("s2", LongType, nullable = false),
    StructField("d", LongType, nullable = false)))

  override def prettyName: String = "token_collision_stats"

  override def nullSafeEval(input: Any): Any =
    TokenCollisionUtil.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenCollisionUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helper the generated code calls (object methods get Java static
  * forwarders, so janino sees a plain static call).
  */
object TokenCollisionUtil {

  def compute(text: UTF8String): InternalRow = {
    // tokenization shared with the shingle expression
    // ([[ShingleHashUtil.tokenHashes]]) so the two can never drift
    val (tokHashes, n) = ShingleHashUtil.tokenHashes(text)

    java.util.Arrays.sort(tokHashes, 0, n)
    var s2 = 0L
    var d = 0L
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && tokHashes(j) == tokHashes(i)) j += 1
      val run = (j - i).toLong
      s2 += run * run
      d += 1
      i = j
    }
    new GenericInternalRow(Array[Any](s2, d))
  }
}

object TokenCollisionFunctions {
  /** Column-API entry point for the native collision-stats pass. */
  def token_collision_stats(text: Column): Column =
    GraftBridge.toColumn(TokenCollisionStats(GraftBridge.toExpression(text)))
}
