package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the 64-bit SimHash of a token array in ONE
  * compiled pass per row — the map-side formulation of what
  * `Dedup.simhashSignatures` previously computed as explode + a 64-column
  * vote aggregate + a join-back for token-less documents.
  *
  * Why this exists: the explode streams |tokens| rows per document into a
  * hash aggregate carrying 64 partial sums per group, and the join-back
  * adds another exchange. Per-row, the signature needs no shuffle at all —
  * the SimHash pipeline becomes scan → project(sig) → band join, the same
  * shape [[MinHashSignature]] gave MinHash.
  *
  * Bit-parity contract (pinned by NorthStarSpec's "simhashSignatures
  * equals simhash64" tests): per non-empty token t,
  *   h = xxhash64(t)  (Spark's seed-42 XXH64 over the UTF-8 bytes);
  * bit i of h votes +1 if set else −1, and signature bit i is set where
  * the vote sum is positive — exactly the Column-level
  * [[graft.northstar.Dedup.simhash64]] HOF fold. Zero-length tokens are
  * skipped, mirroring the `length(tok) > 0` / `filter` guards of both
  * prior formulations, so the caller can pass a raw whitespace `split`
  * (which yields "" for leading whitespace) without a filter pass.
  *
  * A token-less document (empty array or all-empty tokens) yields
  * signature 0L — the empty vote fold, matching simhash64. NULL input
  * yields NULL via the usual null-intolerant contract.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHashUtil.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helper the generated code calls. */
object SimHashUtil {

  /** Same default seed as Spark's `xxhash64`. */
  private final val Seed = 42L

  /** One pass over the tokens: O(|tokens| × 64) bit tests, no allocation
    * beyond the vote array. Null array elements and zero-length tokens are
    * skipped (they are whitespace-split artifacts, never content).
    */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j)) {
        val t = tokens.getUTF8String(j)
        if (t.numBytes() > 0) {
          val h = XXH64.hashUnsafeBytes(
            t.getBaseObject, t.getBaseOffset, t.numBytes(), Seed)
          var i = 0
          while (i < 64) {
            if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
            i += 1
          }
        }
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

object SimHashFunctions {
  /** Column-API entry point for the native signature. */
  def simhash64(tokens: Column): Column =
    GraftBridge.toColumn(SimHash64(GraftBridge.toExpression(tokens)))
}
