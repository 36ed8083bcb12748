package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: WINNOWED document fingerprints (the
  * rolling-hash selection scheme of Schleimer/Wilkerson/Aiken's MOSS
  * winnowing) over a words array. Pipeline, all in one codegen'd pass:
  * positional word-`gram`-gram 48-bit md5-prefix hashes → sliding
  * window of `window` consecutive gram hashes → each window selects its
  * MINIMUM (leftmost on ties — the deterministic, SQL-mirrorable
  * choice) → sorted distinct selected hashes.
  *
  * The guarantee that makes this the shift-robust fingerprint: any
  * match of length ≥ window+gram-1 words between two documents shares
  * at least one selected hash, while only ~2/(window+1) of all gram
  * hashes are kept. Output `array<bigint>`; NULL when there are fewer
  * than `gram` words. When there are grams but fewer than `window` of
  * them, the single window spans all grams.
  */
case class WinnowedHashes(child: Expression, gram: Int = 3, window: Int = 4)
    extends UnaryExpression {

  require(gram > 0 && window > 0, s"bad gram=$gram / window=$window")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    WinnowedHashes.compute(arr, gram, window) match {
      case null => null
      case fp => new GenericArrayData(fp)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val fp = ctx.freshName("fp")
      s"""
         |final long[] $fp = graft.plans.WinnowedHashes.compute($a, $gram, $window);
         |if ($fp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($fp);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowedHashes {
  /** Shared hot loop: sorted distinct per-window minima of the
    * positional gram hashes, or null when no grams exist. */
  def compute(words: ArrayData, gram: Int, window: Int): Array[Long] = {
    val n = words.numElements()
    val nGrams = n - gram + 1
    if (nGrams <= 0) return null
    val hs = new Array[Long](nGrams)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var k = 0
      while (k < gram) {
        if (k > 0) sb.append(' ')
        sb.append(words.getUTF8String(i + k).toString)
        k += 1
      }
      val d = org.apache.commons.codec.digest.DigestUtils.md5(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      hs(i) = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      i += 1
    }
    val nWindows = math.max(1, nGrams - window + 1)
    val sel = new Array[Long](nWindows)
    var j = 0
    while (j < nWindows) {
      var m = hs(j)
      var t = j + 1
      val end = math.min(j + window, nGrams)
      while (t < end) {
        if (hs(t) < m) m = hs(t)
        t += 1
      }
      sel(j) = m
      j += 1
    }
    java.util.Arrays.sort(sel)
    var w = 1
    var r = 1
    while (r < nWindows) {
      if (sel(r) != sel(w - 1)) { sel(w) = sel(r); w += 1 }
      r += 1
    }
    if (w == nWindows) sel else java.util.Arrays.copyOf(sel, w)
  }

  /** Column API over an `array<string>` WORDS column. */
  def apply(words: Column): Column =
    Bridge.column(WinnowedHashes(Bridge.expression(words)))
}
