package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: how many elements of an `array<string>`
  * column are members of a fixed string set. Replaces the interpreted
  * `size(filter(w, x -> x IN (...)))` higher-order function — which is
  * CodegenFallback AND a linear scan of the IN-list per element — with
  * a codegen'd loop over a prebuilt UTF8String hash set.
  *
  * Used by the language-ID scores (4 marker sets per doc) and the
  * stopword ratio; at 100 TB these run per-row in the scan stage, so
  * per-token cost is the whole game.
  */
case class CountInSet(child: Expression, set: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  // Prebuilt once per task via codegen reference objects (and lazily
  // for interpreted eval) — never per row.
  @transient private lazy val utf8Set: java.util.HashSet[UTF8String] =
    CountInSet.buildSet(set.toArray)

  override def nullSafeEval(input: Any): Any =
    CountInSet.count(input.asInstanceOf[ArrayData], utf8Set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("inSet",
      CountInSet.buildSet(set.toArray), classOf[java.util.HashSet[_]].getName)
    defineCodeGen(ctx, ev, a => s"graft.plans.CountInSet.count($a, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CountInSet {
  def buildSet(strings: Array[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](strings.length * 2)
    strings.foreach(x => s.add(UTF8String.fromString(x)))
    s
  }

  def count(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Column API over an `array<string>` column. */
  def apply(arr: Column, set: Seq[String]): Column =
    Bridge.column(CountInSet(Bridge.expression(arr), set))
}
