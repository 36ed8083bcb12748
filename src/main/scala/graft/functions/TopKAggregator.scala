package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: bounded top-k of a Long-valued column (descending), the
  * custom-aggregation surface the reference lacks entirely (its only
  * "aggregate" is a record counter — SURVEY.md §2.2).
  *
  * The buffer is a sorted Vector capped at k, so partial aggregation is
  * O(k) per partition and the shuffle carries k values per group — the
  * same bounded-state shape `TakeOrderedAndProject` uses, but available
  * inside `groupBy(...).agg(...)` and in streaming aggregations.
  * Usage: `functions.udaf(new TopKLongs(10))`.
  */
class TopKLongs(k: Int) extends Aggregator[Long, Vector[Long], Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Vector[Long] = Vector.empty

  private def insert(buf: Vector[Long], v: Long): Vector[Long] = {
    if (buf.length >= k && v <= buf.last) buf
    else {
      val i = buf.indexWhere(_ < v) match { case -1 => buf.length; case x => x }
      (buf.patch(i, Seq(v), 0)).take(k)
    }
  }

  override def reduce(buf: Vector[Long], v: Long): Vector[Long] = insert(buf, v)

  override def merge(a: Vector[Long], b: Vector[Long]): Vector[Long] =
    b.foldLeft(a)(insert)

  override def finish(buf: Vector[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Vector[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
