package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native product-quantization kernels — one compiled pass per row for
  * both the encode (corpus side) and the ADC scoring (serving side) of
  * [[graft.northstar.ProductQuantizer]].
  *
  * Why native: the Column-algebra formulation of ADC needs
  * `element_at(<nested array literal>, <runtime code>)` per subspace —
  * measured at ~0.25 ms PER ROW on the candidate scan (a single such term
  * cost 5 s over a 20k-row crossjoin where eight full dot products against
  * fixed literals cost 0.3 s), which made ADC ~20× slower than the brute
  * force it is supposed to undercut. Here the codebook rides as ONE flat
  * `double[]` reference object in the generated code and each row is a
  * fused loop — no nested literals, no per-subspace array slicing, no
  * dynamic element_at.
  *
  * Bit-parity contract with the Column formulation (PqSpec pins it):
  *  - encode scores codeword j of subspace s as
  *    (Σ_d c[d]²) − 2·(Σ_d v[s·dsub+d]·c[d]), both sums accumulated in
  *    ascending d — exactly `lit(normSq) − 2·dot_product(slice(v), c)` —
  *    and takes the smallest score with the smallest j on ties (the
  *    array_min-over-struct(d, j) order). Codeword norms are precomputed
  *    at construction with the same ascending fold.
  *  - ADC accumulates Σ over subspaces in ascending s of the ascending-d
  *    dot product — exactly the `reduce(_ + _)` left fold of per-subspace
  *    `dot_product` terms.
  *
  * NULL semantics mirror [[DotProduct]]'s intolerance: NULL input, a NULL
  * element, a vector whose dims don't match the codebook, a code array of
  * the wrong length, or an out-of-range code all yield NULL.
  */
final class PqCodebook(val flat: Array[Double], val m: Int, val ksub: Int)
    extends Serializable {
  require(m > 0 && ksub > 0 && flat.length % (m * ksub) == 0,
    s"flat codebook length ${flat.length} not divisible by m*ksub=${m * ksub}")
  val dsub: Int = flat.length / (m * ksub)
  val dims: Int = m * dsub

  /** Per-codeword squared norms, ascending-d fold (parity with the
    * driver-side `c.map(x => x*x).sum` the Column formulation embedded).
    */
  val normsSq: Array[Double] = {
    val out = new Array[Double](m * ksub)
    var c = 0
    while (c < m * ksub) {
      var s = 0.0
      var d = 0
      while (d < dsub) { val x = flat(c * dsub + d); s += x * x; d += 1 }
      out(c) = s
      c += 1
    }
    out
  }
}

/** Static helpers the generated code calls (one virtual call per row). */
object PqUtil {

  /** Per-subspace argmin codeword ids, or null on any dims/NULL issue. */
  def encode(v: ArrayData, cb: PqCodebook): ArrayData = {
    if (v == null || v.numElements() != cb.dims) return null
    val dsub = cb.dsub
    val codes = new Array[Int](cb.m)
    var s = 0
    while (s < cb.m) {
      var bestScore = Double.MaxValue
      var best = -1
      var j = 0
      while (j < cb.ksub) {
        val base = (s * cb.ksub + j) * dsub
        var dot = 0.0
        var d = 0
        while (d < dsub) {
          if (v.isNullAt(s * dsub + d)) return null
          dot += v.getDouble(s * dsub + d) * cb.flat(base + d)
          d += 1
        }
        val score = cb.normsSq(s * cb.ksub + j) - 2.0 * dot
        // strict < keeps the SMALLEST j on score ties — the
        // array_min(struct(d, j)) tiebreak of the Column formulation
        if (score < bestScore) { bestScore = score; best = j }
        j += 1
      }
      // all-NaN scores (e.g. a NaN component) never satisfy `<`; fall back
      // to codeword 0 — the same deterministic pick the Column
      // array_min(struct(d, j)) formulation makes when every d is NaN —
      // so the [0, ksub) contract holds for every non-null return
      codes(s) = if (best < 0) 0 else best
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** Elementwise a − b, or null on NULL/length mismatch. */
  def vecSub(a: ArrayData, b: ArrayData): ArrayData = {
    if (a == null || b == null) return null
    val n = a.numElements()
    if (b.numElements() != n) return null
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      out(i) = a.getDouble(i) - b.getDouble(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Σ_s q_sub(s) · codebook[s][codes[s]], or null on any mismatch. */
  def adcDot(q: ArrayData, codes: ArrayData, cb: PqCodebook): java.lang.Double = {
    if (q == null || codes == null) return null
    if (q.numElements() != cb.dims || codes.numElements() != cb.m) return null
    val dsub = cb.dsub
    var acc = 0.0
    var s = 0
    while (s < cb.m) {
      if (codes.isNullAt(s)) return null
      val j = codes.getInt(s)
      if (j < 0 || j >= cb.ksub) return null
      val base = (s * cb.ksub + j) * dsub
      var dot = 0.0
      var d = 0
      while (d < dsub) {
        if (q.isNullAt(s * dsub + d)) return null
        dot += q.getDouble(s * dsub + d) * cb.flat(base + d)
        d += 1
      }
      acc += dot
      s += 1
    }
    acc
  }
}

/** Elementwise a − b over two array<double> vectors in one fused loop —
  * the residual computation of IVFADC ([[graft.northstar.IvfPqIndex]]),
  * where the `zip_with` HOF's interpreted per-element lambda (binding
  * allocation + boxing per element) was a measurable fraction of the
  * whole encode pass. NULL semantics mirror [[DotProduct]]: NULL input,
  * a NULL element, or a length mismatch yield NULL.
  */
case class VecSub(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_sub expects two array<double> inputs, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_sub"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    PqUtil.vecSub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = graft.functions.PqUtil.vecSub($a, $b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** array<double> vector → array<int> of m codes (see [[PqUtil.encode]]). */
case class PqEncode(child: Expression, codebook: PqCodebook)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  // dims-mismatch rows produce NULL even when the child is non-nullable
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PqUtil.encode(input.asInstanceOf[ArrayData], codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook,
        classOf[PqCodebook].getName)
      s"""
         |${ev.value} = graft.functions.PqUtil.encode($c, $cb);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (array<double> query, array<int> codes) → approximate inner product
  * (see [[PqUtil.adcDot]]).
  */
case class PqAdcDot(left: Expression, right: Expression, codebook: PqCodebook)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_dot expects (array<double>, array<int>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_dot"
  override def nullable: Boolean = true

  override def nullSafeEval(q: Any, codes: Any): Any =
    PqUtil.adcDot(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook,
        classOf[PqCodebook].getName)
      val boxed = ctx.freshName("adc")
      s"""
         |java.lang.Double $boxed = graft.functions.PqUtil.adcDot($q, $c, $cb);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
