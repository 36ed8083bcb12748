package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming jobs — the streaming-native form of the reference
  * pipeline plus the windowed/sessionized analytics the north star asks
  * for.
  *
  * The reference "streams" only in the transport sense: it drains a
  * bounded Kafka topic to completion, detecting the end with a fragile
  * 5-second idle timeout (`internal/sort/external_sort.go:95-113`). The
  * correct Spark expression of run-to-completion is
  * `Trigger.AvailableNow` — offset-bounded, restartable, exactly-once
  * per sink commit — never a wall-clock heuristic (SURVEY.md §7.4
  * risk 3).
  *
  * Sources here are file-based (the Kafka connector jar is not in this
  * build's offline classpath); the Kafka leg swaps
  * `readStream.format("kafka").option("subscribe", …)` for
  * `readStream.schema(…).parquet(dir)` with zero operator changes —
  * see [[graft.sources.Connectors]].
  */
object Streaming {

  /** EP2 as a stream: bounded sorted copy. Each micro-batch is sorted and
    * written; with `AvailableNow` over a static input this reproduces
    * the reference's "sort the whole bounded topic" run, and on a live
    * source it degrades gracefully to per-batch ordering (global total
    * order across an unbounded stream is undefined — the reference can
    * only do it because its input is bounded).
    *
    * Delivery: each batch OVERWRITES a path derived from its batchId, so
    * a micro-batch retried after a partial write is idempotent — a plain
    * `mode("append")` here would be at-least-once (retried batches would
    * re-append rows). Readers of `outDir` see one extra partition-
    * discovery column `batch` (the micro-batch id); ids are zero-padded
    * so lexicographic directory listing preserves batch order past
    * batch 9. */
  def sortedCopy(spark: SparkSession, inDir: String, schema: StructType,
                 outDir: String, checkpointDir: String,
                 sortCols: Seq[String]): StreamingQuery =
    sortedCopyStream(
      graft.sources.ParquetStreamSource(inDir, schema).loadStream(spark),
      outDir, checkpointDir, sortCols)

  /** EP2's topic-sink leg (reference O10): streaming sorted copy INTO a
    * [[graft.sources.RecordSink]] (MemTopic offline; Kafka when the
    * connector jar is present — both take a one-column `line` frame).
    * Each micro-batch is range-partition total-sorted and appended with
    * writer→partition identity (task i → topic partition i, provided
    * the topic has ≥ task-count partitions), so for a single-batch
    * `AvailableNow` run the (partition, offset) read order IS the
    * global sort order — the "single ordered topic" form the reference
    * validates (`scripts/test_validation.sh`). The batch must carry `line`
    * plus the sort columns; only `line` reaches the sink. */
  def sortedCopyToSink(stream: DataFrame, sink: graft.sources.RecordSink,
                       checkpointDir: String,
                       sortCols: Seq[Column]): StreamingQuery =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink.save(graft.operators.Sorting.totalSort(batch, sortCols: _*)
          .select("line"))
      }
      .start()

  /** Transport-agnostic core of [[sortedCopy]]: takes the already-loaded
    * STREAMING DataFrame (any [[graft.sources.StreamRecordSource]] —
    * file, Kafka, or an in-memory test stream), so the sort/sink logic
    * is provably independent of the transport (ConnectorsSpec runs it
    * over a MemoryStream-backed source). */
  def sortedCopyStream(stream: DataFrame, outDir: String,
                       checkpointDir: String,
                       sortCols: Seq[String]): StreamingQuery =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.orderBy(sortCols.map(col): _*)
          .write.mode("overwrite").parquet(f"$outDir/batch=$batchId%09d")
      }
      .start()

  /** Event-time tumbling-window aggregation with a watermark: the
    * streaming twin of the batch `q_time_window` query. Late events
    * beyond the watermark are dropped; state is bounded by
    * (watermark horizon / window) × |event_type|. */
  def windowedCounts(events: DataFrame, tsMsCol: String = "ts_ms",
                     watermark: String = "1 hour",
                     windowLen: String = "1 hour"): DataFrame =
    events
      .withColumn("event_time", timestamp_millis(col(tsMsCol)))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** SLIDING-window streaming aggregation — the overlapping-window
    * semantic tumbling windows cannot express (each event lands in
    * windowLen/slide windows; the engine fans it out and maintains one
    * aggregate per open window). State is bounded by the number of
    * windows inside the watermark horizon × group cardinality, not by
    * the stream. */
  def slidingCounts(events: DataFrame, tsMsCol: String = "ts_ms",
                    watermark: String = "1 hour",
                    windowLen: String = "1 hour",
                    slide: String = "30 minutes"): DataFrame =
    events
      .withColumn("event_time", timestamp_millis(col(tsMsCol)))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup — the training-data dedup operator in its
    * streaming form: keep the first occurrence of each key, with state
    * bounded by the watermark horizon (late duplicates beyond it are
    * beyond-watermark and dropped along with their state). */
  def dedupStream(df: DataFrame, keyCols: Seq[String],
                  tsMsCol: String = "ts_ms",
                  watermark: String = "1 hour"): DataFrame =
    df.withColumn("event_time", timestamp_millis(col(tsMsCol)))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream–static enrichment join: each micro-batch of the stream
    * joins the (bounded) dimension table — the standard streaming
    * lookup shape. The static side is re-planned per batch, so at scale
    * it should be a broadcast-size dim (hinted here) or a pre-bucketed
    * table; no state is kept for it and no watermark is needed (only
    * stream–stream joins require one). */
  def enrichStream(stream: DataFrame, dim: DataFrame,
                   joinCols: Seq[String]): DataFrame =
    stream.join(broadcast(dim), joinCols)

  /** Streaming corpus maintenance — the streaming twin of the batch
    * `pipeline_incremental` query, with `foreachBatch` as the MERGE
    * driver: each micro-batch of documents is quality-gated, exact-
    * deduplicated within the batch, near-dup-matched against the
    * CURRENT accumulated corpus (the delta-probes-corpus band join of
    * [[graft.operators.Dedup.incrementalMinhashMatches]] — per-batch
    * cost scales with the batch, never the corpus), and only unmatched
    * survivors are written.
    *
    * The corpus lives as parquet under `corpusDir/batch=N/` — each
    * micro-batch OVERWRITES its own batch path, so retries are
    * idempotent (the [[sortedCopyStream]] delivery contract), and the
    * corpus read is a plain partition-discovery scan. At 100 TB the
    * corpus side of the match joins pre-indexed band keys instead of
    * re-signing every document per batch — the signature index is the
    * corpus-maintenance analog of a search index.
    *
    * Near-dups WITHIN one micro-batch are not collapsed (only exact
    * dups are) — the batch-local pair operators + survivor selection
    * handle that upstream if needed. */
  def incrementalIngestStream(docs: DataFrame, corpusDir: String,
                              checkpointDir: String,
                              minAlpha: Double = 0.6): StreamingQuery = {
    import graft.operators.{Dedup, TextAnalysis}
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val kept = Dedup.exactSurvivors(
          TextAnalysis.quality(batch, "doc_id", "text",
              passthrough = Seq("text", "lang", "source"))
            .filter(col("alpha_ratio") >= minAlpha)
            .select("doc_id", "text", "lang", "source"),
          "doc_id", Seq("text"))
        val corpus =
          if (new java.io.File(corpusDir).isDirectory &&
              new java.io.File(corpusDir).list().exists(_.startsWith("batch=")))
            Some(spark.read.parquet(corpusDir)
              .select("doc_id", "text", "lang", "source"))
          else None
        val survivors = corpus match {
          case Some(c) =>
            val matches = Dedup.incrementalMinhashMatches(kept, c,
              "doc_id", "text", numHashes = 16, numBands = 4,
              minEstimate = 0.5)
            kept.join(matches.select(col("new_doc").as("doc_id")).distinct(),
              Seq("doc_id"), "left_anti")
          case None => kept
        }
        survivors.write.mode("overwrite")
          .parquet(f"$corpusDir/batch=$batchId%09d")
      }
      .start()
  }

  /** Streaming JSONL ingest with corrupt-record quarantine — the
    * streaming twin of the graded `ingest_quarantine` query. New JSONL
    * files landing in `inDir` are parsed PERMISSIVEly against the
    * explicit schema; good rows land under `goodDir/batch=N/`, the RAW
    * text of unparseable lines under `quarantineDir/batch=N/`. Nothing
    * kills the stream, nothing is silently dropped, and per-batch
    * overwrite keeps retries idempotent (the [[sortedCopyStream]]
    * delivery contract). The batch is pinned with `persist` before the
    * two writes: the quarantine write projects ONLY the corrupt column,
    * and an unpinned plan would re-read the files under the
    * corrupt-column-only pruning Spark disallows for raw JSON scans. */
  def jsonlIngestStream(spark: SparkSession, inDir: String, schema: StructType,
                        goodDir: String, quarantineDir: String,
                        checkpointDir: String): StreamingQuery = {
    val full = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType))
    spark.readStream
      .schema(full)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          batch.filter(col("_corrupt_record").isNull)
            .drop("_corrupt_record")
            .write.mode("overwrite").parquet(f"$goodDir/batch=$batchId%09d")
          batch.filter(col("_corrupt_record").isNotNull)
            .select(col("_corrupt_record").as("raw"))
            .write.mode("overwrite").parquet(f"$quarantineDir/batch=$batchId%09d")
        } finally batch.unpersist()
      }
      .start()
  }

  /** Stream–stream INNER join on a key within an event-time interval:
    * right events in [left − lowerMs, left + upperMs]. Both sides are
    * watermarked and the join condition bounds both event-time columns,
    * which is exactly what lets the engine EXPIRE join state — without
    * the time bounds a stream–stream join buffers both streams forever.
    * State per key ≈ the watermark horizon + interval width of rows.
    *
    * Column contract: the two sides' non-key columns must not collide
    * (rename upstream); the watermarked time columns come out as
    * `l_event_time` / `r_event_time`. */
  def streamStreamIntervalJoin(left: DataFrame, right: DataFrame,
                               joinCols: Seq[String],
                               leftTsMs: String = "ts_ms",
                               rightTsMs: String = "ts_ms",
                               lowerMs: Long = 0L,
                               upperMs: Long = 1800000L,
                               watermark: String = "1 hour"): DataFrame = {
    val l = left
      .withColumn("l_event_time", timestamp_millis(col(leftTsMs)))
      .withWatermark("l_event_time", watermark).alias("l")
    val r = right
      .withColumn("r_event_time", timestamp_millis(col(rightTsMs)))
      .withWatermark("r_event_time", watermark).alias("r")
    val keyCond = joinCols.map(c => col(s"l.$c") === col(s"r.$c"))
      .reduce(_ && _)
    val timeCond =
      col("r.r_event_time") >= col("l.l_event_time") -
        expr(s"INTERVAL $lowerMs MILLISECONDS") &&
      col("r.r_event_time") <= col("l.l_event_time") +
        expr(s"INTERVAL $upperMs MILLISECONDS")
    joinCols.foldLeft(l.join(r, keyCond && timeCond)) {
      (df, c) => df.drop(col(s"r.$c"))
    }
  }

  /** Stream–stream LEFT OUTER interval join: like
    * [[streamStreamIntervalJoin]], but an unmatched left row EMITS with
    * a null right side — and only once the watermark proves no future
    * right row can still match (the engine holds the left row in join
    * state until `l_event_time + upperMs` falls behind the eviction
    * watermark, then flushes the null result). This is the semantics
    * that makes outer results correct on unbounded streams: emitting
    * the null row any earlier could be contradicted by a late match.
    * Left rows whose expiry horizon is still ahead of the final
    * watermark when a bounded run ends are NEVER emitted as null —
    * the bounded-run analogue of "the stream might still match them".
    * The watermark delay is therefore a REAL one here (not the
    * span-wider-than-fixture pin the inner-join query uses): null
    * emission is driven by watermark passage. */
  def streamStreamLeftOuterJoin(left: DataFrame, right: DataFrame,
                                joinCols: Seq[String],
                                leftTsMs: String = "ts_ms",
                                rightTsMs: String = "ts_ms",
                                lowerMs: Long = 0L,
                                upperMs: Long = 1800000L,
                                watermark: String = "1 hour"): DataFrame = {
    val l = left
      .withColumn("l_event_time", timestamp_millis(col(leftTsMs)))
      .withWatermark("l_event_time", watermark).alias("l")
    val r = right
      .withColumn("r_event_time", timestamp_millis(col(rightTsMs)))
      .withWatermark("r_event_time", watermark).alias("r")
    val keyCond = joinCols.map(c => col(s"l.$c") === col(s"r.$c"))
      .reduce(_ && _)
    val timeCond =
      col("r.r_event_time") >= col("l.l_event_time") -
        expr(s"INTERVAL $lowerMs MILLISECONDS") &&
      col("r.r_event_time") <= col("l.l_event_time") +
        expr(s"INTERVAL $upperMs MILLISECONDS")
    joinCols.foldLeft(l.join(r, keyCond && timeCond, "left_outer")) {
      (df, c) => df.drop(col(s"r.$c"))
    }
  }

  // event_time rides along: flatMapGroupsWithState with event-time
  // timeout requires the watermarked column in its input schema
  case class BandedDoc(bucket: String, doc: Long, sig: Array[Long], tsMs: Long,
                       event_time: java.sql.Timestamp)
  case class BucketDoc(doc: Long, sig: Array[Long], tsMs: Long)
  case class BucketState(docs: List[BucketDoc])
  case class NearDupPair(doc_a: Long, doc_b: Long, est_jaccard: Double)

  /** Streaming MinHash near-duplicate detection — the "streaming ×
    * dedup" composition: the per-doc signature is a pure projection
    * ([[graft.operators.Dedup.minhashSigCol]]), banding is a stateless
    * explode, and the only state is the per-band-bucket doc history,
    * bounded by the watermark (entries older than the watermark are
    * pruned; idle buckets are removed via event-time timeout).
    *
    * A new doc emits one pair per prior same-bucket doc whose signature
    * agreement ≥ `minEstimate`. Pairs colliding in several bands are
    * emitted once per band (at-least-once; batch `minhashPairs` dedupes
    * globally with a `distinct` — a streaming consumer dedupes
    * downstream or tolerates repeats). */
  def minhashNearDupStream(docs: DataFrame, idCol: String = "doc_id",
                           textCol: String = "text", tsMsCol: String = "ts_ms",
                           watermark: String = "1 hour",
                           numHashes: Int = 16, numBands: Int = 4,
                           minEstimate: Double = 0.5): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    import graft.functions.TextFunctions
    import graft.operators.Dedup
    require(numHashes % numBands == 0,
      s"numBands=$numBands must divide numHashes=$numHashes")
    val perBand = numHashes / numBands
    val banded = docs
      .withColumn("event_time", timestamp_millis(col(tsMsCol)))
      .withWatermark("event_time", watermark)
      .select(col(idCol).as("doc"), TextFunctions.words(col(textCol)).as("w"),
        col(tsMsCol).as("tsMs"), col("event_time"))
      .filter(size(col("w")) >= 3)
      .select(col("doc"), Dedup.minhashSigCol(col("w"), numHashes).as("sig"),
        col("tsMs"), col("event_time"))
      .select(col("doc"), col("sig"), col("tsMs"), col("event_time"),
        explode(array((0 until numBands).map { b =>
          // Dedup.bandKey is the shared band-key format — stream buckets
          // must never drift from batch bands
          concat_ws(":", lit(b), Dedup.bandKey(col("sig"), b, perBand))
        }: _*)).as("bucket"))
      .select(col("bucket"), col("doc"), col("sig"), col("tsMs"), col("event_time"))
      .as[BandedDoc]
    banded.groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows, state) =>
          if (state.hasTimedOut) {
            // idle bucket: the watermark passed every entry's horizon
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            var pool = state.getOption.map(_.docs).getOrElse(Nil)
              .filter(_.tsMs >= wm)
            val out = List.newBuilder[NearDupPair]
            rows.toSeq.sortBy(d => (d.tsMs, d.doc)).foreach { d =>
              pool.foreach { p =>
                if (p.doc != d.doc) {
                  val matches = (0 until numHashes).count(i => p.sig(i) == d.sig(i))
                  // HALF_UP, matching Spark's round() in the batch
                  // operator — math.rint is half-even and would diverge
                  // on exact .5 boundaries (e.g. 1/32 at numHashes=32)
                  val est = BigDecimal(matches.toDouble / numHashes)
                    .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
                  if (est >= minEstimate) {
                    val (a, b) = if (p.doc < d.doc) (p.doc, d.doc) else (d.doc, p.doc)
                    out += NearDupPair(a, b, est)
                  }
                }
              }
              pool = BucketDoc(d.doc, d.sig, d.tsMs) :: pool
            }
            state.update(BucketState(pool))
            // expire the bucket once the watermark passes its newest entry
            state.setTimeoutTimestamp(pool.map(_.tsMs).max + 1)
            out.result().iterator
          }
      }
  }

  /** Gap-based sessionization via the BUILT-IN `session_window` — the
    * Spark-idiomatic path (state managed by the engine, watermark-bound
    * eviction for free). [[sessionize]] keeps the custom
    * `flatMapGroupsWithState` formulation for semantics the built-in
    * cannot express (e.g. emitting sessions eagerly on gap detection
    * rather than on watermark close); on bounded input the two agree —
    * asserted in StreamingSpec. */
  def sessionWindowAgg(events: DataFrame, gap: String,
                       tsMsCol: String = "ts_ms",
                       keyCol: String = "user_id",
                       watermark: String = "1 hour"): DataFrame =
    events
      .withColumn("event_time", timestamp_millis(col(tsMsCol)))
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        unix_millis(col("session_window.start")).as("sess_start_ms"),
        unix_millis(col("session_window.end")).as("sess_end_ms"),
        col("n_events"))

  case class Tick(key: String, ts_ms: Long)
  case class GapState(lastBucket: Long)
  case class Gap(key: String, bucket_ms: Long)

  /** Streaming gap DETECTION — the live twin of the batch gap-fill
    * query: per key, state holds only the last seen time bucket (O(1));
    * when an arriving event's bucket skips ahead, every missed bucket
    * in between is emitted as a gap record (which a downstream stage
    * fills with zeros / carried-forward values, exactly like the batch
    * spine join). Emission happens when the next event REVEALS the gap
    * — deterministic and replay-safe, unlike wall-clock timers; pair
    * with an event-time-timeout variant when liveness against a stalled
    * source matters more than determinism. */
  def gapDetectStream(ticks: Dataset[Tick], bucketMs: Long): Dataset[Gap] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.key)
      .flatMapGroupsWithState[GapState, Gap](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Tick], state: GroupState[GapState]) =>
          val buckets = it.map(t => Math.floorDiv(t.ts_ms, bucketMs))
            .toSeq.distinct.sorted
          var last = state.getOption.map(_.lastBucket)
          val gaps = Seq.newBuilder[Gap]
          buckets.foreach { b =>
            last match {
              case Some(l) if b > l + 1 =>
                ((l + 1) until b).foreach(m => gaps += Gap(key, m * bucketMs))
              case _ => ()
            }
            last = Some(last.fold(b)(math.max(_, b)))
          }
          last.foreach(l => state.update(GapState(l)))
          gaps.result().iterator
      }
  }

  case class Evt(user_id: Long, event_id: Long, ts_ms: Long)
  case class SessionState(startMs: Long, endMs: Long, n: Long)
  case class Session(user_id: Long, sess_start_ms: Long, sess_end_ms: Long,
                     n_events: Long)

  /** Custom stateful sessionization via `flatMapGroupsWithState`: per
    * user, events accumulate into an open session; a gap > `gapMs`
    * closes it and emits. The open tail stays in state (it would close
    * via event-time timeout on a live stream). State per key is O(1) —
    * only the open session, never the event list. */
  def sessionize(events: Dataset[Evt], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evts: Iterator[Evt], state: GroupState[SessionState]) =>
          val sorted = evts.toSeq.sortBy(e => (e.ts_ms, e.event_id))
          var cur = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.ts_ms - s.endMs <= gapMs =>
                // min/max — a late (out-of-order) event must neither
                // regress the session end (false split on the next gap
                // check) nor be silently absorbed without extending the
                // reported start
                cur = Some(SessionState(math.min(s.startMs, e.ts_ms),
                  math.max(s.endMs, e.ts_ms), s.n + 1))
              case Some(s) =>
                closed += Session(userId, s.startMs, s.endMs, s.n)
                cur = Some(SessionState(e.ts_ms, e.ts_ms, 1))
              case None =>
                cur = Some(SessionState(e.ts_ms, e.ts_ms, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  /** Input row for [[UserAccumProcessor]]: one event, value pre-floored
    * to exact integer cents so cross-batch accumulation is
    * order-independent. */
  final case class AccumEvent(user_id: Long, event_id: Long, cents: Long)

  /** Output of [[UserAccumProcessor]]: the per-user running account
    * snapshot emitted after every micro-batch that touched the user.
    * `n` is strictly monotone across a user's emissions, so the FINAL
    * state is recoverable batch-boundary-independently as the argmax-n
    * row — exactly how the graded query collapses the append-mode
    * emission log. */
  final case class UserAccumSnapshot(
      user_id: Long, n: Long, cents: Long, max_eid: Long)

  /** The arbitrary-stateful-processing v2 surface (`transformWithState`,
    * Spark 4): a per-key ValueState accumulator updated across
    * micro-batches. Unlike `flatMapGroupsWithState`'s single opaque
    * state object, the StatefulProcessor handle owns NAMED state
    * primitives (value/list/map, optional TTL) backed by the RocksDB
    * state store — the composable-state path for long-lived keyed
    * pipelines (feature stores, per-entity counters) at a 100 TB key
    * universe. State per key is one fixed-width snapshot, never the
    * event list. */
  class UserAccumProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, AccumEvent, UserAccumSnapshot] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var acc: ValueState[UserAccumSnapshot] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[UserAccumSnapshot](
        "acc", Encoders.product[UserAccumSnapshot], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[AccumEvent],
        timerValues: TimerValues): Iterator[UserAccumSnapshot] = {
      val prev =
        if (acc.exists()) acc.get()
        else UserAccumSnapshot(key, 0L, 0L, Long.MinValue)
      var n = prev.n
      var cents = prev.cents
      var maxEid = prev.max_eid
      rows.foreach { r =>
        n += 1; cents += r.cents; maxEid = math.max(maxEid, r.event_id)
      }
      val cur = UserAccumSnapshot(key, n, cents, maxEid)
      acc.update(cur)
      Iterator.single(cur)
    }
  }

  /** Per-user running account via transformWithState: floor-cents
    * projection → groupByKey(user) → StatefulProcessor emission log. */
  def userAccumStream(events: DataFrame): Dataset[UserAccumSnapshot] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id"), col("event_id"),
        floor(col("value") * 100).cast("long").as("cents"))
      .as[AccumEvent]
      .groupByKey(_.user_id)
      .transformWithState(new UserAccumProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append)
  }

  /** Grouping key for [[DayCloseProcessor]]: one state cell per
    * (user, event-day). */
  final case class DayKey(user_id: Long, day: Long)

  /** Input row for [[DayCloseProcessor]]. */
  final case class DayEvent(user_id: Long, day: Long, ts_ms: Long)

  /** One closed-out (user, day) activity window, emitted by the
    * EVENT-TIME TIMER when the watermark passes the key's last event +
    * gap — never by an arriving row. */
  final case class DayClose(user_id: Long, day: Long, n_events: Long,
                            last_ms: Long, fired_ms: Long)

  /** Event-time TIMERS in transformWithState (TimeMode.EventTime): the
    * push-based expiry surface — per key, ONE live timer at
    * last_ms + gap (re-registered on every arrival), and the emission
    * happens in [[DayCloseProcessor.handleExpiredTimer]] when the
    * WATERMARK crosses it, not when data arrives. This is how a 100 TB
    * keyed pipeline closes out idle entities (session close-out,
    * abandoned-cart, SLA breach) without a second scan polling for
    * silence: the timer index is engine state, fired timers are
    * streamed per batch, and state per key is one fixed-width cell +
    * one timer entry.
    *
    * Protocol facts this build pins empirically (and the graded oracle
    * relies on): input rows for a key process BEFORE its expired-timer
    * check within a batch; the expiry test is `timer <= watermark`
    * (boundary INCLUSIVE); and an AvailableNow run executes one final
    * timer sweep after the last data batch with the watermark advanced
    * to the global max event time. */
  class DayCloseProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        DayKey, DayEvent, DayClose] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var st: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)](
        "open", Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: DayKey, rows: Iterator[DayEvent],
        tv: TimerValues): Iterator[DayClose] = {
      val (n0, last0) = if (st.exists()) st.get() else (0L, Long.MinValue)
      var n = n0
      var last = last0
      rows.foreach { r => n += 1; last = math.max(last, r.ts_ms) }
      // exactly one live timer per key: retire the stale expiry before
      // registering the advanced one
      if (last0 != Long.MinValue && last != last0)
        getHandle.deleteTimer(last0 + gapMs)
      getHandle.registerTimer(last + gapMs)
      st.update((n, last))
      Iterator.empty
    }

    override def handleExpiredTimer(key: DayKey, tv: TimerValues,
        expired: ExpiredTimerInfo): Iterator[DayClose] = {
      val out =
        if (st.exists()) {
          val (n, last) = st.get()
          Iterator.single(
            DayClose(key.user_id, key.day, n, last,
              expired.getExpiryTimeInMs()))
        } else Iterator.empty
      st.clear()
      out
    }
  }

  /** Per-(user, day) inactivity close-out via event-time timers: events
    * keyed by (user, day) accumulate count + last-seen; the key EMITS
    * only when its timer (last + gapMs) falls at-or-under the
    * watermark. Keys still inside the gap at end-of-stream never emit —
    * the open tail stays in state, exactly like a live pipeline. */
  def dayCloseStream(events: DataFrame, gapMs: Long): Dataset[DayClose] = {
    import events.sparkSession.implicits._
    events
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .withWatermark("event_time", "0 seconds")
      .select(col("user_id"), expr("ts_ms div 86400000").as("day"),
        col("ts_ms"))
      .as[DayEvent]
      .groupByKey(e => DayKey(e.user_id, e.day))
      .transformWithState(new DayCloseProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append)
  }
}
