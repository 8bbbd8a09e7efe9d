package graft.northstar

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Embedding-column vector operations for training-data pipelines: norms,
  * unit-normalization, symmetric int8 quantization (the storage trick that
  * cuts an embedding corpus 4× — absmax scaling per vector, as in
  * Dettmers et al., "8-bit Optimizers via Block-wise Quantization", 2022).
  *
  * The scalar reductions ([[l2Norm]], [[maxAbs]]) ride the native fused
  * [[graft.functions.DotProduct]] / array_max — map-side, codegen'd. The
  * element-wise transforms take the scalar as a pre-computed COLUMN
  * argument: inlining the reduction into the lambda would re-evaluate it
  * per element (the expression-inlining trap — k× recompute), so callers
  * `withColumn` the scalar first and pass it in.
  */
object VectorOps {

  def l2Norm(v: Column): Column = sqrt(GraftFunctions.dot_product(v, v))

  /** The shared build/serving prologue: id + unit-normalized double
    * vector. One definition so a future normalization fix (zero-vector,
    * NaN handling) lands in every ANN path at once instead of drifting
    * across per-index copies.
    */
  def unitVecs(df: DataFrame, idCol: String, vecCol: String,
      outId: String, outVec: String): DataFrame =
    df.select(col(idCol).as(outId),
        Similarity.toDoubleVec(col(vecCol)).as("__raw"))
      .withColumn("__n", l2Norm(col("__raw")))
      .select(col(outId), l2Normalize(col("__raw"), col("__n")).as(outVec))

  /** Per-row dims guard for serving paths: pass `v` through when it has
    * exactly `dims` elements, else raise a `label`ed error — a mismatched
    * query set fails with a clear message instead of deep inside a fused
    * kernel (or, worse, scoring a parsable prefix wrong).
    */
  def dimsGuard(v: Column, dims: Int, label: String): Column =
    when(size(v) === lit(dims), v)
      .otherwise(raise_error(concat(
        lit(s"$label: query vector dims "), size(v).cast("string"),
        lit(s" do not match index dims $dims"))))

  def maxAbs(v: Column): Column = array_max(transform(v, x => abs(x)))

  /** Unit-normalize by a pre-computed norm; zero vectors stay zero. */
  def l2Normalize(v: Column, norm: Column): Column =
    when(norm === 0, v).otherwise(transform(v, x => x / norm))

  /** Symmetric absmax int8 quantization: codes in [-127, 127] as ints.
    * `scale` = [[quantScale]] pre-computed per vector.
    */
  def quantScale(maxAbsVal: Column): Column =
    when(maxAbsVal === 0, lit(1.0)).otherwise(lit(127.0) / maxAbsVal)

  def quantizeInt8(v: Column, scale: Column): Column =
    transform(v, x => round(x * scale).cast("int"))

  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") / scale)

  /** Largest per-component round-trip error of the quantization. */
  def maxQuantError(v: Column, scale: Column): Column =
    array_max(transform(v, x => abs(round(x * scale) / scale - x)))
}
