package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: single-pass character statistics of a
  * string — code-point count, DISTINCT code-point count, and the
  * Shannon entropy (log2) of the code-point distribution — as one
  * struct.
  *
  * Character entropy is a classic corpus-quality signal: gibberish /
  * base64 blobs sit near the ~6-bit ceiling of their alphabet, repeated
  * single-character padding sits near 0, and natural language clusters
  * in a narrow band (≈4.0–4.4 bits for English) — so both tails are
  * filter targets. Expressing it as ONE projection keeps the quality
  * pass at scan speed: the equivalent declarative form
  * (`explode(split(text, ''))` → two aggregations → re-join) multiplies
  * the row count by document length and shuffles it, which is exactly
  * the shape a 100 TB quality sweep cannot afford.
  *
  * Engine parity: DuckDB's `entropy()` aggregate over the per-character
  * unnest computes the same log2 quantity; both sides round to 4
  * decimals so last-ulp summation differences cannot flip the grade.
  */
case class CharStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CharStats.schema

  override def nullSafeEval(input: Any): Any =
    CharStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.CharStats.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharStats {

  val schema: StructType = StructType(Seq(
    StructField("chars", IntegerType, nullable = false),
    StructField("uniq_chars", IntegerType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  private val LOG2 = math.log(2.0)

  /** Shared hot loop (interpreted eval + generated code). One pass to
    * count code points into a hash map, one pass over the (small)
    * alphabet for the entropy sum: H = log2(n) − (Σ c·log2 c)/n. */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Array[Int]](64)
    var i = 0
    var n = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
    }
    if (n == 0) return new GenericInternalRow(Array[Any](0, 0, 0.0))
    var sum = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      sum += c * (math.log(c) / LOG2)
    }
    val h = (math.log(n.toDouble) / LOG2) - sum / n
    new GenericInternalRow(Array[Any](n, counts.size, h))
  }

  /** Column API over a string column. */
  def apply(text: Column): Column =
    Bridge.column(CharStats(Bridge.expression(text)))
}
