package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity between two double arrays
  * in ONE fused pass (dot + both norms in a single loop) with whole-stage
  * codegen.
  *
  * Why native instead of `zip_with`/`aggregate` HOFs: higher-order
  * functions evaluate their lambda per element through the interpreter and
  * break the surrounding codegen stage; on the ANN hot path (corpus ×
  * queries pairs) that interpreter overhead dominates. Inputs must be
  * `array<double>` — the Column wrapper [[GraftFunctions.cosine_sim]] casts
  * float/int arrays up; SQL callers cast explicitly.
  *
  * Semantics match `Similarity.cosine` bit-for-bit: sequential index-order
  * accumulation, `0.0` for zero-norm inputs, NULL if either side is NULL
  * or the dimensions differ (zip_with null-pads a length mismatch, which
  * poisons its fold to NULL — never a silent prefix cosine); NULL
  * *elements* contribute 0.0 (identically in both eval paths).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  // Returns NULL on dimension mismatch even when both inputs are
  // non-nullable, so nullability must not be inherited from the children:
  // with nullable=false the optimizer would propagate a wrong constraint
  // and nullSafeCodeGen would assign to a FalseLiteral isNull (uncompilable
  // generated code → silent codegen fallback). Same reasoning as DotProduct.
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // mismatched dimensions → NULL (like the zip_with fold, which
    // null-pads and poisons the sum) — never a silent prefix cosine
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else x.getDouble(i)
      val yv = if (y.isNullAt(i)) 0.0 else y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = $a.isNullAt($i) ? 0.0 : $a.getDouble($i);
         |    double $yv = $b.isNullAt($i) ? 0.0 : $b.getDouble($i);
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |  double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |  ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Native fused dot product over two `array<double>` columns.
  *
  * Exact NULL parity with the HOF formulation `aggregate(zip_with(a, b,
  * _ * _), 0.0, _ + _)`: NULL if either array is NULL, if the lengths
  * differ (zip_with null-pads), or if ANY element is NULL (the product
  * poisons the fold) — unlike [[CosineSimilarity]], which zero-fills NULL
  * elements. Used on the LSH bucket hot path where the interpreted HOF
  * lambda per element dominated.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects two array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getDouble(i) * y.getDouble(i); i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |    else { $dot += $a.getDouble($i) * $b.getDouble($i); }
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Column-API entry point for the native cosine; float/int arrays are
    * cast up to array<double> here (the expression itself is strict).
    */
  def cosine_sim(a: Column, b: Column): Column =
    GraftBridge.toColumn(CosineSimilarity(
      GraftBridge.toExpression(a.cast("array<double>")),
      GraftBridge.toExpression(b.cast("array<double>"))))

  /** Column-API entry point for the native dot product (HOF-fold NULL
    * semantics — see [[DotProduct]]).
    */
  def dot_product(a: Column, b: Column): Column =
    GraftBridge.toColumn(DotProduct(
      GraftBridge.toExpression(a.cast("array<double>")),
      GraftBridge.toExpression(b.cast("array<double>"))))

  /** Register graft SQL functions on a session (`SELECT cosine_sim(a, b)`,
    * `dot_product(a, b)`, `shingle_hashes(text, 3)`).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.GraftExtensions.arity
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_sim", exprs => {
        arity(exprs, 2, "cosine_sim(vec, vec)")
        CosineSimilarity(exprs(0), exprs(1))
      }, "scala_udf")
    reg.createOrReplaceTempFunction(
      "dot_product", exprs => {
        arity(exprs, 2, "dot_product(vec, vec)")
        DotProduct(exprs(0), exprs(1))
      }, "scala_udf")
    reg.createOrReplaceTempFunction(
      "shingle_hashes", exprs => {
        arity(exprs, 2, "shingle_hashes(text, k)")
        ShingleHashes(exprs(0),
          graft.GraftExtensions.literalInt(exprs(1), "shingle_hashes k"))
      }, "scala_udf")
    reg.createOrReplaceTempFunction(
      "token_collision_stats", exprs => {
        arity(exprs, 1, "token_collision_stats(text)")
        TokenCollisionStats(exprs(0))
      }, "scala_udf")
    reg.createOrReplaceTempFunction(
      "vec_sub", exprs => {
        arity(exprs, 2, "vec_sub(vec, vec)")
        VecSub(exprs(0), exprs(1))
      }, "scala_udf")
    reg.createOrReplaceTempFunction(
      "dict_match_counts", exprs => {
        arity(exprs, 2, "dict_match_counts(text, array_of_string_literals)")
        DictMatchCounts(exprs(0),
          graft.GraftExtensions.literalStrings(exprs(1),
            "dict_match_counts phrases"))
      }, "scala_udf")
    reg.createOrReplaceTempFunction(
      "dict_replace", exprs => {
        arity(exprs, 3,
          "dict_replace(text, array_of_string_literals, replacement)")
        DictReplace(exprs(0),
          graft.GraftExtensions.literalStrings(exprs(1),
            "dict_replace phrases"),
          graft.GraftExtensions.literalString(exprs(2),
            "dict_replace replacement"))
      }, "scala_udf")
    // the q116 quantile-histogram algebra (Column builders, exposed to
    // SQL through the bridge so percentile gold tables are queryable
    // and maintainable from pure SQL too)
    reg.createOrReplaceTempFunction(
      "qhist_bucket", exprs => {
        arity(exprs, 1, "qhist_bucket(non_negative_long)")
        GraftBridge.toExpressionEager(
          graft.gold.QuantileHist.bucketOf(GraftBridge.toColumn(exprs(0))))
      }, "scala_udf")
    reg.createOrReplaceTempFunction(
      "qhist_rep", exprs => {
        arity(exprs, 1, "qhist_rep(bucket)")
        GraftBridge.toExpressionEager(
          graft.gold.QuantileHist.representative(
            GraftBridge.toColumn(exprs(0))))
      }, "scala_udf")
    reg.createOrReplaceTempFunction(
      "qhist_percentile", exprs => {
        arity(exprs, 3, "qhist_percentile(hist, num_literal, den_literal)")
        GraftBridge.toExpressionEager(
          graft.gold.QuantileHist.percentile(GraftBridge.toColumn(exprs(0)),
            graft.GraftExtensions.literalInt(exprs(1),
              "qhist_percentile num"),
            graft.GraftExtensions.literalInt(exprs(2),
              "qhist_percentile den")))
      }, "scala_udf")
  }

  /** Column-API entry point for the native elementwise subtract. */
  def vec_sub(a: Column, b: Column): Column =
    GraftBridge.toColumn(VecSub(
      GraftBridge.toExpression(a.cast("array<double>")),
      GraftBridge.toExpression(b.cast("array<double>"))))
}
