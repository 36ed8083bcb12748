package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the dense dot product — the hot inner
  * loop of every similarity operator.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are
  * interpreted (CodegenFallback) and allocate an intermediate array per
  * evaluation; on an O(pairs) similarity join that interpretation cost
  * dominates (measured ~10× on the sf0.1 bench). This expression
  * participates in whole-stage codegen (`doGenCode`) and compiles to a
  * tight primitive loop over the two `ArrayData` buffers — no
  * allocation, no boxing, no virtual calls per element.
  *
  * Semantics: sequential left-to-right double summation over
  * min(|a|,|b|) elements — bit-identical to the interpreted
  * `aggregate(zip_with(...))` formulation and to DuckDB's
  * `list_inner_product` over `DOUBLE[]`, so oracle comparisons stay
  * exact. Nulls propagate (null array → null result).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<double> — callers go through
  // VectorFunctions.asDouble (input-type machinery is private[sql], so
  // conformance is by construction rather than analyzer check).
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column API: native dot product of two `array<double>` columns. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
