package graft.northstar

import org.apache.spark.sql.Column
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
