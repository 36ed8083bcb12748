package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed UDAF: a bounded map of
  * `capacity` counters whose merged undercount error is at most
  * n/(capacity+1) total occurrences (Agarwal et al., "Mergeable
  * Summaries", PODS '12). Any item with true frequency above
  * n/(capacity+1) is therefore GUARANTEED to appear in the final key
  * set — which makes this the candidate-generation half of an exact
  * two-pass heavy-hitters query (sketch → exact recount of the
  * candidates only), see [[graft.operators.TextAnalysis.heavyHitters]].
  *
  * The buffer is bounded at `capacity` entries regardless of input size,
  * so partial aggregation is safe at any scale: the shuffle carries one
  * ≤capacity-entry map per partition, never the term universe.
  */
class MisraGries(capacity: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], w: String): Map[String, Long] =
    b.get(w) match {
      case Some(c) => b.updated(w, c + 1)
      case None if b.size < capacity => b.updated(w, 1L)
      // Classic MG step: a new item against a full buffer decrements
      // every counter (the new item is absorbed by the decrement).
      // Amortized O(1) per input: each decrement event pays for
      // `capacity` earlier increments.
      case None => b.collect { case (k, c) if c > 1 => k -> (c - 1) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (k, c)) => m.updated(k, m.getOrElse(k, 0L) + c) }
    if (sum.size <= capacity) sum
    else {
      // Subtract the (capacity+1)-th largest count from everything and
      // drop non-positives — the mergeable-summaries reduction that
      // preserves the additive error bound.
      val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
      sum.collect { case (k, c) if c > cut => k -> (c - cut) }
    }
  }

  override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}
