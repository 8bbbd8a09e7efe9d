package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: word k-gram shingle hashes of a text column
  * in ONE compiled pass per row.
  *
  * Replaces the HOF formulation `transform(sequence(...), i =>
  * xxhash64(concat_ws(" ", slice(tokens, i+1, k))))`, whose lambda runs
  * through the expression interpreter per shingle and allocates a sliced
  * array + joined string per shingle — measured ~3.4 s for a 5k-doc corpus
  * (the dominant cost of every shingle-based dedup query). Here each token
  * is hashed once straight off the UTF8String bytes (no copies), then each
  * k-window combines the token hashes with an xxhash64 chain: O(tokens × k)
  * long-mixes, zero allocations beyond the output array.
  *
  * Tokenization matches `TextAnalysis.tokens` exactly: maximal runs of
  * non-`\s` bytes (Java `\s` = ASCII `[ \t\n\x0B\f\r]`, all single-byte in
  * UTF-8, so the byte-level scan can never split a multi-byte character).
  * Fewer than k tokens (including zero) yields ONE shingle over all tokens,
  * like the HOF version's whole-text fallback.
  *
  * Hash VALUES differ from the old string-concat scheme — deliberately
  * fine: every consumer (minhash signatures, LSH bands, Jaccard over
  * distinct sets) depends only on shingle-set identity, not on which
  * 64-bit name a shingle gets. DuckDB oracles compare Jaccard/pair sets,
  * never raw hashes.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects (string, k >= 1), got ${child.dataType.simpleString}, k=$k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashUtil.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashUtil.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helper the generated code calls (top-level Scala object methods
  * get Java static forwarders, so janino sees a plain static call).
  */
object ShingleHashUtil {

  /** Same default seed as Spark's `xxhash64`. */
  private[functions] final val Seed = 42L

  private def isSpace(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Pass-1 tokenizer: xxhash64 of every whitespace-delimited token, into
    * a grow-by-doubling scratch array (may be longer than the count —
    * callers use the returned count). SINGLE-SOURCED: this is the
    * tokenization that must match [[graft.northstar.TextAnalysis.tokens]]
    * byte-for-byte, and both the shingle and collision-stats expressions
    * call it — a whitespace-set change in one place moves both.
    */
  private[functions] def tokenHashes(text: UTF8String): (Array[Long], Int) = {
    val base = text.getBaseObject
    val offset = text.getBaseOffset
    val nBytes = text.numBytes()
    var tokHashes = new Array[Long](math.max(8, nBytes / 6))
    var n = 0
    var i = 0
    while (i < nBytes) {
      while (i < nBytes && isSpace(Platform.getByte(base, offset + i))) i += 1
      val start = i
      while (i < nBytes && !isSpace(Platform.getByte(base, offset + i))) i += 1
      if (i > start) {
        if (n == tokHashes.length) {
          tokHashes = java.util.Arrays.copyOf(tokHashes, n * 2)
        }
        tokHashes(n) = XXH64.hashUnsafeBytes(base, offset + start, i - start, Seed)
        n += 1
      }
    }
    (tokHashes, n)
  }

  def compute(text: UTF8String, k: Int): ArrayData = {
    val (tokHashes, n) = tokenHashes(text)

    // pass 2: xxhash64-chain each k-window (all tokens when fewer than k)
    if (n < k) {
      var h = Seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(tokHashes(j), h); j += 1 }
      UnsafeArrayData.fromPrimitiveArray(Array(h))
    } else {
      val out = new Array[Long](n - k + 1)
      var s = 0
      while (s <= n - k) {
        var h = Seed
        var j = 0
        while (j < k) { h = XXH64.hashLong(tokHashes(s + j), h); j += 1 }
        out(s) = h
        s += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }
}

object ShingleFunctions {
  /** Column-API entry point for the native shingle hasher. */
  def shingle_hashes(text: Column, k: Int): Column =
    GraftBridge.toColumn(ShingleHashes(GraftBridge.toExpression(text), k))
}
