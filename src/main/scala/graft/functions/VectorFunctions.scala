package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.plans.DotProduct

/** Dense-vector math over embedding columns.
  *
  * [[dot]] uses the codegen'd native [[graft.plans.DotProduct]]
  * expression (whole-stage-codegen hot loop); [[dotHof]] is the
  * interpreted `zip_with`+`aggregate` formulation kept as a
  * cross-check — both compute the same sequential double fold,
  * bit-identical to the DuckDB oracle's `list_inner_product` over
  * `DOUBLE[]`.
  *
  * Callers should [[asDouble]]-cast and norm-precompute ONCE per input
  * row before any pairwise join (see Similarity) — never per pair.
  */
object VectorFunctions {

  /** Cast any numeric array column to `array<double>` (a single codegen'd
    * Cast — do this before a join, not inside the join condition). */
  def asDouble(a: Column): Column = a.cast(ArrayType(DoubleType))

  /** Native codegen'd sequential dot product. Inputs must already be
    * `array<double>` (use [[asDouble]]). */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  /** Interpreted higher-order-function dot product (reference/cross-check
    * implementation; ~10× slower than [[dot]] in pairwise joins). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm (native). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot(a,b) / (|a| * |b|). Prefer precomputing the
    * norms per side and dividing by their product when used in a join. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
