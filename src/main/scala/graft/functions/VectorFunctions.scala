package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType(FloatType)` embedding columns, as
  * codegen'd higher-order functions (`zip_with` + `aggregate`) — no UDF,
  * no driver-side collect. Elements are cast to double before any
  * arithmetic so the fold is a sequential double summation, bit-identical
  * to the DuckDB oracle's `list_inner_product` over `DOUBLE[]`.
  */
object VectorFunctions {

  /** Sequential-fold dot product of two array columns (double). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot(a,b) / (|a| * |b|). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
