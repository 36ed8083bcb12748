package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the occurrence count of the MOST FREQUENT
  * element of an `array<string>` column (0 for an empty array). Powers
  * the top-word repetition ratio: the interpreted alternatives are
  * either `aggregate(array_sort(w), ...)` — a CodegenFallback
  * higher-order fold on top of an O(n log n) sort — or an
  * explode + two-level aggregation, which buys a shuffle for what is
  * per-document math. This is one codegen'd hash-count pass, O(n) per
  * document with a per-row map sized to the doc's distinct-word count.
  */
case class TopElementCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TopElementCount.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.TopElementCount.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopElementCount {
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    // UTF8String.hashCode/equals are value-based, so it keys a HashMap
    // directly; values are boxed but the map lives only for this row.
    val counts = new java.util.HashMap[UTF8String, Long](n * 2)
    var best = 0L
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      val c = counts.merge(w, 1L, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best
  }

  /** Column API over an `array<string>` column. */
  def apply(arr: Column): Column =
    Bridge.column(TopElementCount(Bridge.expression(arr)))
}
