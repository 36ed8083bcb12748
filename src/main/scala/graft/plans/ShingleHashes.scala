package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the DISTINCT word-`width`-gram shingles
  * of a words array, each as its first-48-md5-bits hash
  * (`conv(substr(md5(shingle), 1, 12), 16, 10)`), sorted ascending.
  * Output `array<bigint>`; NULL when there are fewer than `width`
  * words.
  *
  * Joining near-dup candidates on the 48-bit hash instead of the
  * shingle STRING shrinks the exploded shuffle (8-byte keys vs ~20-char
  * strings) and keeps the whole shingle builder inside whole-stage
  * codegen — the interpreted HOF formulation both allocates per element
  * and degrades quadratically when an optimizer rule inlines the
  * upstream `split()` (see [[MinhashSignature]]). At 48 bits a
  * same-corpus collision needs ~2^24 distinct shingles per join key
  * space — harmless for intersection COUNTING, and the DuckDB oracle
  * mirrors the exact same hash so grading stays bit-exact.
  */
case class ShingleHashes(child: Expression, width: Int = 3,
                         distinct: Boolean = true)
    extends UnaryExpression {

  require(width > 0, s"bad shingle width=$width")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    ShingleHashes.compute(arr, width, distinct) match {
      case null => null
      case hs => new GenericArrayData(hs)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val hs = ctx.freshName("hs")
      s"""
         |final long[] $hs = graft.plans.ShingleHashes.compute($a, $width, $distinct);
         |if ($hs == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($hs);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  /** Shared hot loop: 48-bit shingle hashes — distinct+sorted (the
    * near-dup set view) or positional in document order (the span view,
    * `distinct = false`) — or null when the words array yields no
    * shingles. */
  def compute(words: ArrayData, width: Int, distinct: Boolean = true): Array[Long] = {
    val n = words.numElements()
    val nShingles = n - width + 1
    if (nShingles <= 0) return null
    val out = new Array[Long](nShingles)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nShingles) {
      out(i) = hashGram(words, i, width, sb)
      i += 1
    }
    if (!distinct) return out
    // distinct via sort + squash (n is per-document — tiny)
    java.util.Arrays.sort(out)
    var w = 1
    var r = 1
    while (r < nShingles) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    if (w == nShingles) out else java.util.Arrays.copyOf(out, w)
  }

  /** The ONE per-gram kernel behind [[compute]] and [[hashAt]] — both
    * forms delegate here, so the 48-bit gram key genuinely cannot
    * drift between the array and table-function surfaces. A NULL word
    * hashes as the empty string: deterministic, position-preserving
    * (the positional variant's element i must stay the gram at word
    * i), and impossible via split() — it only arises from hand-built
    * arrays through the SQL registration. */
  private[plans] def hashGram(words: ArrayData, i: Int, width: Int,
      sb: java.lang.StringBuilder): Long = {
    sb.setLength(0)
    var k = 0
    while (k < width) {
      if (k > 0) sb.append(' ')
      if (!words.isNullAt(i + k))
        sb.append(words.getUTF8String(i + k).toString)
      k += 1
    }
    val d = org.apache.commons.codec.digest.DigestUtils.md5(
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** Hash of the single `width`-gram starting at word `i` — the
    * per-gram kernel of [[compute]], shared by the streaming
    * [[PosNgramsGen]] generator (both delegate to the same private
    * [[hashGram]] loop). */
  def hashAt(words: ArrayData, i: Int, width: Int): Long =
    hashGram(words, i, width, new java.lang.StringBuilder(64))

  /** Column API over an `array<string>` WORDS column. */
  def apply(words: Column): Column =
    Bridge.column(ShingleHashes(Bridge.expression(words)))

  /** Positional (document-order, non-distinct) variant: element i is the
    * hash of the shingle starting at word i — the span view used by
    * duplicated-passage detection. */
  def positional(words: Column): Column =
    Bridge.column(ShingleHashes(Bridge.expression(words), distinct = false))
}
