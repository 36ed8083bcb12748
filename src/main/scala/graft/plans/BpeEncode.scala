package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: BPE-encode a words array with a FIXED
  * learned merge list (see `TextAnalysis.bpeTrain`). Each word is split
  * into code points and adjacent symbol pairs are merged in ascending
  * rank order (the canonical byte-pair-encoding segmenter: repeatedly
  * merge the lowest-rank pair present, leftmost-first). Output is the
  * per-word token lists concatenated in document order.
  *
  * The merge table is a reference object built ONCE per task (never per
  * row), and the segmenter runs inside whole-stage codegen — this is the
  * per-token hot path of a tokenize-everything pass over a 100 TB
  * corpus, the same argument as [[CountInSet]]. An interpreted
  * `aggregate()` fold per merge would be CodegenFallback and rescan
  * every word once per merge rule instead of once per realized merge.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val ranks = BpeEncode.buildRanks(merges)

  override def nullSafeEval(input: Any): Any =
    BpeEncode.encode(input.asInstanceOf[ArrayData], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks",
      BpeEncode.buildRanks(merges), classOf[java.util.HashMap[_, _]].getName)
    defineCodeGen(ctx, ev, a => s"graft.plans.BpeEncode.encode($a, $ranksRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {

  /** (left, right) → rank. The key joins the pair with NUL (U+0000), which
    * cannot occur inside a symbol (symbols come from word text). */
  def buildRanks(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.putIfAbsent(l + "\u0000" + r, Integer.valueOf(i))
    }
    m
  }

  /** Segment one word (as code-point symbols) with the rank table. */
  private def encodeWord(word: String, ranks: java.util.HashMap[String, Integer],
                         out: java.util.ArrayList[UTF8String]): Unit = {
    if (word.isEmpty) return
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(word.substring(i, i + n))
      i += n
    }
    // canonical BPE: repeatedly apply the lowest-rank pair present
    var done = syms.size() < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.size() - 1) {
        val r = ranks.get(syms.get(j) + "\u0000" + syms.get(j + 1))
        if (r != null && r < bestRank) bestRank = r
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        // merge all leftmost non-overlapping occurrences of the best pair
        val merged = new java.util.ArrayList[String](syms.size())
        var k = 0
        while (k < syms.size()) {
          if (k < syms.size() - 1 && {
                val r = ranks.get(syms.get(k) + "\u0000" + syms.get(k + 1))
                r != null && r == bestRank
              }) {
            merged.add(syms.get(k) + syms.get(k + 1))
            k += 2
          } else {
            merged.add(syms.get(k))
            k += 1
          }
        }
        syms = merged
        done = syms.size() < 2
      }
    }
    var t = 0
    while (t < syms.size()) {
      out.add(UTF8String.fromString(syms.get(t)))
      t += 1
    }
  }

  def encode(words: ArrayData, ranks: java.util.HashMap[String, Integer]): GenericArrayData = {
    val n = words.numElements()
    val out = new java.util.ArrayList[UTF8String](n * 4)
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null) encodeWord(w.toString, ranks, out)
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  /** Column API: BPE tokens of an `array<string>` words column under a
    * fixed merge list. */
  def apply(words: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncode(Bridge.expression(words), merges))
}
