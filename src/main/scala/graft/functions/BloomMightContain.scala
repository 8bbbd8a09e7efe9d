package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership test of a 64-bit hash against a
  * pre-built Bloom filter, evaluated INSIDE the scan stage.
  *
  * This is the same architecture Spark itself uses for runtime row-level
  * filtering (`BloomFilterMightContain` over a `bloom_filter_agg` subquery,
  * `InjectRuntimeFilter`) — but that surface is `private[sql]` and only
  * planner-injected, so graft carries its own expression over the PUBLIC
  * `org.apache.spark.util.sketch.BloomFilter` sketch.
  *
  * The filter rides along as its serialized bytes (the expression tree must
  * be serializable to ship to executors; `writeTo`'s framing is Spark's
  * stable cross-version format) and is deserialized at most once per
  * executor via a transient lazy val. Codegen references the expression
  * instance itself, so the compiled predicate calls straight into the
  * sketch's `mightContainLong` — one xxhash-chain probe per row, zero
  * allocation, no join machinery at all.
  *
  * Scale: this is the zero-shuffle membership pattern. A broadcast semi
  * join (q58) already avoids shuffling the big side but still pays the
  * build-relation hash table and an explode of the probe side; a Bloom
  * probe folds the whole test into the scan-stage predicate at a
  * caller-chosen false-positive rate, with NO false negatives. At 100 TB
  * that means benchmark decontamination costs one map pass over the corpus
  * plus a few megabytes of broadcast-equivalent task state.
  */
case class BloomMightContain(child: Expression, filterBytes: SketchBytes)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a BIGINT hash, got ${child.dataType.sql}")

  override def dataType: DataType = BooleanType

  // eval returns non-null for every non-null input, but keep the
  // conservative default (child.nullable) from UnaryExpression.

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes.bytes))

  /** Entry point for generated code (must be public). */
  def mightContain(hash: Long): Boolean = bloom.mightContainLong(hash)

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Reference the expression instance: the serialized plan carries the
    // filter bytes exactly once, and each executor deserializes lazily.
    val ref = ctx.addReferenceObj("bloomMight", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContain($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFunctions {

  /** Spark's stable sketch serialization (BloomFilter.writeTo framing). */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `hash MIGHT-BE-IN filter` as a codegen'd scan-stage predicate. */
  def mightContain(hash: Column, filterBytes: Array[Byte]): Column =
    GraftBridge.toColumn(BloomMightContain(
      GraftBridge.toExpression(hash), new SketchBytes(filterBytes)))
}
