package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType, StructType}

/** Native Catalyst GENERATOR (table function): one output row per
  * word-`width`-gram of a words array — `(pos INT, gram_hash BIGINT)`,
  * where `gram_hash` is the corpus-wide 48-bit md5 gram key every
  * shingle consumer shares ([[ShingleHashes]]).
  *
  * This is the UDTF extension point done natively: the expression
  * plugs into Catalyst's `Generate` operator (the same physical node
  * `explode` lowers to — per-partition streaming fan-out, no shuffle
  * introduced), but unlike the `posexplode(ShingleHashes.positional(w))`
  * composition it never MATERIALIZES the per-document hash array — rows
  * stream straight out of the iterator, so peak memory per document is
  * one gram, not `len(doc)` longs. Registered in SQL as
  * `graft_pos_ngrams(words, width)` (LATERAL VIEW / table-generating
  * position) by [[GraftExtensions]].
  *
  * Reference analog: none — the reference has no query language; this
  * serves SURVEY.md §2.2's UDF/UDAF/UDTF row with a true
  * table-generating function.
  */
case class PosNgramsGen(child: Expression, width: Int = 3)
    extends UnaryExpression with Generator with CodegenFallback {

  require(width > 0, s"bad ngram width=$width")

  override def elementSchema: StructType = new StructType()
    .add("pos", IntegerType, nullable = false)
    .add("gram_hash", LongType, nullable = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pos_ngrams expects array<string>, got $other")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Nil
    val words = arr.asInstanceOf[ArrayData]
    val nGrams = words.numElements() - width + 1
    if (nGrams <= 0) return Nil
    // stream one row per gram — no per-document array materialization;
    // one reused builder per document through the shared hashGram kernel
    val sb = new java.lang.StringBuilder(64)
    (0 until nGrams).iterator.map { i =>
      InternalRow(i, ShingleHashes.hashGram(words, i, width, sb))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PosNgramsGen {
  /** Fold the SQL-side width argument (must be a foldable integer). */
  def foldWidth(e: Expression): Int = {
    require(e.foldable, "graft_pos_ngrams width must be a literal")
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"graft_pos_ngrams width must be integral, got $other")
    }
  }
}
