package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: the 32-bit SimHash of a words array as
  * one BIGINT. Each token's 32-bit hash (first 8 md5 hex chars = first
  * 4 md5 bytes big-endian) votes ±1 per bit position across ALL token
  * occurrences (duplicates count); the sign of each position's vote is
  * the output bit.
  *
  * SimHash is pure per-document math, so expressing it as a projection
  * removes the token explode + 32-SUM-column aggregation (and its
  * shuffle) entirely — the operator runs at scan speed and is directly
  * usable in Structured Streaming. Bit-identical to the SQL
  * formulation the DuckDB oracle replays.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.SimHash32.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash32 {
  /** Shared hot loop (interpreted eval + generated code). */
  def compute(words: ArrayData): Long = {
    val n = words.numElements()
    val votes = new Array[Int](32)
    var i = 0
    while (i < n) {
      val d = org.apache.commons.codec.digest.DigestUtils.md5(
        words.getUTF8String(i).getBytes)
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Column API over an `array<string>` WORDS column. */
  def apply(words: Column): Column =
    Bridge.column(SimHash32(Bridge.expression(words)))
}
