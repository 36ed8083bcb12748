package graft.streaming

import org.apache.spark.TaskContext
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.apache.spark.util.LongAccumulator

/** Controlled transient-task-failure injection — the instrument behind
  * the `stream_task_retry` grade, which proves exactly-once THROUGH a
  * task retry inside a stateful micro-batch (the restart grades only
  * cover graceful stops BETWEEN batches; at 100 TB, task retries are
  * routine and the state-store abort/reload path is what actually
  * protects the answer).
  *
  * Protocol: `arm(tag)` registers a one-shot fault; the UDF throws the
  * FIRST time it sees a marker row on a first-attempt task
  * (`TaskContext.attemptNumber == 0`), consuming the tag atomically
  * (`Set.remove` — exactly one thrower even under 32 concurrent tasks).
  * Spark fails the task, aborts its uncommitted state-store changes,
  * and reschedules it; the retry (attemptNumber > 0) passes through and
  * records itself on `retried` — an accumulator only SUCCESSFUL task
  * attempts can land, so `retried > 0` is machine-checked evidence the
  * recovery path genuinely executed, not just that the throw happened.
  *
  * Single-JVM scope, stated not hidden: arm/consumed read driver-side
  * state, and the throw happens executor-side — valid in local mode
  * (the harness) where both share the JVM. On a real cluster the same
  * grade would ship the tag through a broadcast and verify via the
  * accumulator alone.
  *
  * Reference scope: none — the reference is a single process with no
  * retry path (`internal/sort/external_sort.go` dies with its process);
  * this is north-star scale semantics.
  */
object FaultInjection {

  private val armed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Register a one-shot fault under `tag`. */
  def arm(tag: String): Unit = { armed.add(tag); () }

  /** True once the armed fault has actually fired (tag consumed). */
  def consumed(tag: String): Boolean = !armed.contains(tag)

  /** Pass-through over a BIGINT column that throws ONCE — on the first
    * marker row evaluated by a first-attempt task while `tag` is armed.
    * Non-deterministic so Catalyst neither folds, reorders, nor
    * duplicates the call site. The marker rows must flow through a real
    * TASK: plans that evaluate driver-side (e.g. a projection over a
    * LocalRelation) have no TaskContext and deliberately pass through
    * un-thrown — every graded use reads a file-backed stream, which
    * always schedules tasks. */
  def faultOnce(tag: String, retried: LongAccumulator): UserDefinedFunction =
    udf { (v: Long, marker: Boolean) =>
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() > 0) retried.add(1L)
      if (marker && tc != null && tc.attemptNumber() == 0 && armed.remove(tag))
        throw new RuntimeException(
          s"graft: injected transient task failure ($tag)")
      v
    }.asNondeterministic()
}
