package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.util.sketch.CountMinSketch

/** Native Catalyst expression: Count-Min-Sketch frequency estimate for a
  * string key, evaluated inside the scan stage — the probe side of the
  * heavy-hitters pattern (q76), structurally the twin of
  * [[BloomMightContain]] over Spark's other public sketch.
  *
  * The sketch rides along serialized (Spark's stable `writeTo` framing)
  * and deserializes at most once per executor via a transient lazy val;
  * codegen calls straight into `estimateCount`. CMS guarantees
  * `estimate ≥ true count` always, and
  * `estimate ≤ true count + ε·N` with probability ≥ 1−δ — AccuracySpec
  * pins both bounds against exact counts.
  *
  * Scale: the sketch is built in ONE distributed pass with mergeable
  * per-partition state (`DataFrameStatFunctions.countMinSketch`, a
  * tree-aggregate into a few-KB table), then frequency lookups for any
  * key cost O(depth) — no vocabulary-sized shuffle, no join. This is how
  * a 100 TB corpus answers "how often does token X occur" without
  * materializing the full term-frequency table.
  */
case class CmsEstimate(child: Expression, sketchBytes: SketchBytes)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate needs a STRING key, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes.bytes))

  /** Entry point for generated code (must be public). */
  def estimate(key: org.apache.spark.unsafe.types.UTF8String): Long =
    // the byte[] branch hashes the identical UTF-8 bytes addString stores
    // (addString delegates to addBinary of the encoded bytes), so probing
    // with the UTF8String's bytes skips a per-row String decode/re-encode
    cms.estimateCount(key.getBytes)

  override def nullSafeEval(input: Any): Any =
    estimate(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsEst", this, classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.estimate($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CmsFunctions {

  /** Spark's stable sketch serialization (CountMinSketch.writeTo framing). */
  def serialize(cms: CountMinSketch): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    bos.toByteArray
  }

  /** `estimated_count(key)` as a codegen'd scan-stage lookup. */
  def cms_estimate(key: Column, sketchBytes: Array[Byte]): Column =
    GraftBridge.toColumn(CmsEstimate(
      GraftBridge.toExpression(key), new SketchBytes(sketchBytes)))
}
