package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the full k-permutation MinHash signature of
  * a shingle-hash array in ONE compiled pass per row — the map-side
  * formulation of what `Dedup.signaturesFromShingles` previously computed
  * as explode + groupBy with k partial-min aggregates.
  *
  * Why this exists: the explode streams |shingles| rows per document into
  * an aggregate exchange. Partial aggregation keeps the shuffle payload
  * small, but the explode itself (row expansion + hash-aggregate probe per
  * shingle) is the dominant cost of signature building, and at corpus
  * scale it is the single biggest shuffle of the whole MinHash pipeline.
  * Computed per-row instead, the signature needs no shuffle at all: the
  * pipeline becomes scan → project(sig) → LSH band join, and the only
  * exchange left is the band-bucket join itself.
  *
  * Bit-parity contract (MinhashParitySpec pins it): per permutation i,
  *   seed_i    = i * toInt(2654435761) + 1                 (Int wrap)
  *   effSeed_i = XXH64.hashInt(seed_i, 42)
  *   sig_i     = min over g of XXH64.hashLong(g, effSeed_i)
  * — exactly `min(xxhash64(lit(seed_i), col(g)))`, Spark's xxhash64 fold
  * (seed 42, then one mix per argument). Min over a multiset is invariant
  * under array_distinct, so signatures agree whether or not the caller
  * deduplicated the shingle array first.
  *
  * An EMPTY shingle array yields NULL (the exploded formulation dropped
  * such documents — no rows to aggregate); callers filter null signatures.
  * NULL input yields NULL via the usual null-intolerant contract.
  */
case class MinHashSignature(child: Expression, numPerm: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numPerm >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects (array<bigint>, numPerm >= 1), got " +
        s"${other.simpleString}, numPerm=$numPerm")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  // empty input arrays produce NULL even when the child is non-nullable
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.compute(input.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashUtil.compute($c, $numPerm);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helper the generated code calls. */
object MinHashUtil {

  /** Same default seed as Spark's `xxhash64`. */
  private final val Seed = 42L

  /** Per-permutation effective seeds, cached per distinct numPerm (in
    * practice one value per session). Values replicate
    * `xxhash64(lit(i * 2654435761L.toInt + 1), g)`'s first fold step.
    */
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  private def effSeeds(numPerm: Int): Array[Long] =
    seedCache.computeIfAbsent(numPerm, { n =>
      Array.tabulate[Long](n)(i => XXH64.hashInt(i * 2654435761L.toInt + 1, Seed))
    })

  /** All-permutation min in one pass: O(|shingles| × numPerm) long mixes,
    * one output allocation. Returns null for an empty input array.
    */
  def compute(shingles: ArrayData, numPerm: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val seeds = effSeeds(numPerm)
    val out = new Array[Long](numPerm)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    while (j < n) {
      // skip null slots: getLong on a null element returns the raw storage
      // word (0L), which would fold a phantom shingle into every minimum
      // and create false LSH collisions among all null-carrying inputs
      if (!shingles.isNullAt(j)) {
        val g = shingles.getLong(j)
        var i = 0
        while (i < numPerm) {
          val h = XXH64.hashLong(g, seeds(i))
          if (h < out(i)) out(i) = h
          i += 1
        }
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object MinHashFunctions {
  /** Column-API entry point for the native signature. */
  def minhash_signature(shingleHashes: Column, numPerm: Int): Column =
    GraftBridge.toColumn(MinHashSignature(
      GraftBridge.toExpression(shingleHashes), numPerm))
}
