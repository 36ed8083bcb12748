package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing a full MinHash signature from a
  * WORDS array in ONE pass: build each word-`shingleWidth`-gram, md5 it
  * once, fold every seed's universal-hash minimum inline. Output:
  * `array<bigint>` of length `numHashes`; NULL when there are fewer
  * than `shingleWidth` words (no shingles — short docs drop out of
  * near-dup joins).
  *
  * Why native, and why from words rather than a shingle array: Spark's
  * higher-order functions are interpreted (CodegenFallback), and the
  * interpreted `transform(sequence(...), i -> concat_ws(' ',
  * element_at(w, i)...))` shingle builder degrades QUADRATICALLY when
  * an optimizer rule (e.g. predicate pushdown's alias substitution)
  * inlines the `split()` producing `w` — each element_at then re-splits
  * the whole text per shingle. Building the shingles inside the
  * expression keeps the hot path in whole-stage codegen end-to-end with
  * only per-shingle string allocation. Duplicate shingles need no
  * dedup: a duplicate cannot change any seed's minimum.
  *
  * Semantics are bit-identical to the SQL/oracle formulation
  * `min(((2s+1) * h0 + (1000003 s + 12345)) % (2^61-1))` over DISTINCT
  * space-joined word n-grams, with `h0 = conv(substr(md5(shingle), 1,
  * 12), 16, 10)` — the first 6 md5 bytes read big-endian; all
  * arithmetic stays below 2^62 (no signed-64 overflow in any engine).
  */
case class MinhashSignature(child: Expression, numHashes: Int,
                            shingleWidth: Int = 3)
    extends UnaryExpression {

  require(numHashes > 0 && numHashes <= 1024, s"bad numHashes=$numHashes")
  require(shingleWidth > 0, s"bad shingleWidth=$shingleWidth")

  // Input must be array<string> words (non-null elements, as produced
  // by split()); callers construct via TextFunctions.words.
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Nullable even over a non-null child: fewer than shingleWidth words
  // yields NULL (forcing nullable also keeps nullSafeCodeGen's isNull a
  // real variable the generated block can set).
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    MinhashSignature.compute(arr, numHashes, shingleWidth) match {
      case null => null
      case mins => new GenericArrayData(mins)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      s"""
         |final long[] $mins = graft.plans.MinhashSignature.compute(
         |  $a, $numHashes, $shingleWidth);
         |if ($mins == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSignature {
  /** 2^61 - 1: keeps every intermediate < 2^62 in signed-64 arithmetic. */
  val M61 = 2305843009213693951L

  /** Shared hot loop (called from both interpreted eval and generated
    * code): returns the numHashes seed minima, or null when the words
    * array yields no shingles. */
  def compute(words: ArrayData, numHashes: Int, shingleWidth: Int): Array[Long] = {
    val n = words.numElements()
    val nShingles = n - shingleWidth + 1
    if (nShingles <= 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nShingles) {
      sb.setLength(0)
      var k = 0
      while (k < shingleWidth) {
        if (k > 0) sb.append(' ')
        sb.append(words.getUTF8String(i + k).toString)
        k += 1
      }
      val d = org.apache.commons.codec.digest.DigestUtils.md5(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h0 = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      var s = 0
      while (s < numHashes) {
        val h = ((2L * s + 1) * h0 + (1000003L * s + 12345L)) % M61
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      i += 1
    }
    mins
  }

  /** Column API: MinHash signature of an `array<string>` WORDS column. */
  def apply(words: Column, numHashes: Int): Column =
    Bridge.column(MinhashSignature(Bridge.expression(words), numHashes))

  /** SQL-registration helper: the numHashes argument must be a literal
    * (it is baked into the expression). */
  def foldNumHashes(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"graft_minhash(words, numHashes): numHashes must be an INT literal, got $other")
  }
}
