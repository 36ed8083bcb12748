package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Type-1 (last-writer-wins) upsert: the MERGE INTO shape without a
  * table format. Rows from `delta` replace same-key rows of `base`;
  * unmatched rows on either side pass through. One full-outer join on
  * the key — at scale both sides shuffle on the key once, or the delta
  * broadcasts when small (the common incremental-ingest case).
  *
  * Columns are taken from `base`'s schema; `delta` must carry the same
  * columns. Per-column `coalesce(delta, base)` implements
  * "update if matched, insert if new, keep if unmatched".
  *
  * Contract: `delta` must be key-unique (run [[Dedup.exactSurvivors]]
  * or a last-write `row_number` filter first) — duplicate delta keys
  * would fan out the join like any MERGE with a non-deterministic
  * source match.
  */
object Upsert {
  def apply(base: DataFrame, delta: DataFrame, key: String): DataFrame = {
    val valueCols = base.columns.filter(_ != key).toSeq
    require(valueCols.forall(delta.columns.contains),
      s"delta must carry base's columns; missing ${valueCols.filterNot(delta.columns.contains).mkString(",")}")
    base.as("b").join(delta.as("d"), Seq(key), "full_outer")
      .select(col(key) +: valueCols.map(c =>
        coalesce(col(s"d.$c"), col(s"b.$c")).as(c)): _*)
  }

  /** Ordered CDC changelog apply — the Debezium/lakehouse "apply a
    * change stream to a snapshot" MERGE: `changelog` rows are
    * `(key, seqCol, opCol, values…)` with op `"U"` (upsert — insert or
    * update) or `"D"` (delete tombstone); the final state keeps, for
    * each key, the base row overridden by the LATEST change, and drops
    * keys whose latest change is a tombstone. A later `"U"` after a
    * `"D"` re-inserts the key.
    *
    * Scale shape: the latest-change-per-key reduction is a
    * partial-aggregable `max_by` on `(seq, op)` — map-side combined, no
    * window, so a 10 B-row changelog reduces before it shuffles — then
    * ONE full-outer join with the base on the key. Per-column
    * `coalesce(change, base)` gives partial-update semantics (a null
    * value column in the winning change keeps the base value), matching
    * [[apply]].
    *
    * Contract: `(key, seqCol)` pairs are unique (a real changelog's
    * offset); equal-seq ties break deterministically by op descending.
    */
  def cdcApply(base: DataFrame, changelog: DataFrame, key: String,
               seqCol: String = "seq", opCol: String = "op"): DataFrame = {
    val valueCols = base.columns.filter(_ != key).toSeq
    require(valueCols.forall(changelog.columns.contains),
      s"changelog must carry base's columns; missing ${valueCols.filterNot(changelog.columns.contains).mkString(",")}")
    val packed = (opCol +: valueCols).mkString(", ")
    val latest = changelog.groupBy(col(key))
      .agg(expr(s"max_by(struct($packed), struct($seqCol, $opCol))").as("__c"))
      .select(col(key) +: col(s"__c.$opCol").as("__op") +:
        valueCols.map(c => col(s"__c.$c").as(s"__d_$c")): _*)
    base.join(latest, Seq(key), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(col(key) +: valueCols.map(c =>
        coalesce(col(s"__d_$c"), col(c)).as(c)): _*)
  }

  /** SCD type-2 history between two full snapshots: where type-1
    * ([[apply]]) overwrites, type-2 KEEPS the old row and closes its
    * validity interval — the versioned-corpus shape (which document
    * text was live for the v3 training run?).
    *
    * Output = history rows `(key, values…, valid_from, valid_to,
    * is_current)` with versions `fromVersion`/`toVersion`:
    *   - key in both, values equal     → one open row (from v1)
    *   - key in both, values changed   → closed v1 row + open v2 row
    *   - key only in v1 (deleted)      → closed v1 row
    *   - key only in v2 (inserted)     → open v2 row
    *
    * One full-outer join on the key (both sides shuffle once) + an
    * Expand-style union of the two row roles; no window, no collect —
    * the history is twice the changed-key count plus the stable keys.
    * Both snapshots must be key-unique (same contract as [[apply]]). */
  def scd2(v1: DataFrame, v2: DataFrame, key: String,
           fromVersion: Long = 1L, toVersion: Long = 2L): DataFrame = {
    val valueCols = v1.columns.filter(_ != key).toSeq
    require(valueCols.forall(v2.columns.contains),
      s"v2 must carry v1's columns; missing ${valueCols.filterNot(v2.columns.contains).mkString(",")}")
    // explicit presence markers — value columns may be legitimately null
    val joined = v1.withColumn("__in_a", lit(true)).as("a")
      .join(v2.withColumn("__in_b", lit(true)).as("b"), Seq(key), "full_outer")
      .withColumn("__in_a", coalesce(col("a.__in_a"), lit(false)))
      .withColumn("__in_b", coalesce(col("b.__in_b"), lit(false)))
      .withColumn("__same", col("__in_a") && col("__in_b") &&
        valueCols.map(c => col(s"a.$c") <=> col(s"b.$c")).reduce(_ && _))
    // role 1: the v1-era row — open if unchanged, closed if changed/deleted
    val oldRows = joined.filter(col("__in_a"))
      .select(col(key) +: valueCols.map(c => col(s"a.$c").as(c)) ++: Seq(
        lit(fromVersion).as("valid_from"),
        when(col("__same"), lit(null).cast("long")).otherwise(toVersion)
          .as("valid_to"),
        col("__same").as("is_current")): _*)
    // role 2: the v2-era row — only for changed or inserted keys
    val newRows = joined.filter(col("__in_b") && !col("__same"))
      .select(col(key) +: valueCols.map(c => col(s"b.$c").as(c)) ++: Seq(
        lit(toVersion).as("valid_from"),
        lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current")): _*)
    oldRows.union(newRows)
  }

  /** Point-in-time (feature-store) join: attach to every event the
    * dimension attributes that were LIVE at the event's time, from an
    * SCD2 history ([[scd2]]'s `valid_from`/`valid_to` contract) — the
    * correctness backbone of feature-store training-set construction
    * (an event must never see attributes from its future: label
    * leakage).
    *
    * The naive formulation is an inequality join on
    * `valid_from <= t < valid_to` — O(|matches|) blowup per key. Since
    * SCD2 validity intervals per key are disjoint with ascending
    * `valid_from`, the latest version with `valid_from <= t` IS the
    * candidate interval, so this reuses [[AsOfJoin.asofLeft]]'s
    * union-window shape (ONE shuffle on the key, linear in |events| +
    * |history|) and then applies the `valid_to` bound as a filter:
    *   - event before the key's first version → no match → dropped
    *   - event in a deleted key's post-deletion era → `valid_to <= t`
    *     → dropped
    * (inner semantics; left semantics would keep the event with nulls).
    *
    * @param pick history value columns to attach to each event */
  def pointInTime(events: DataFrame, history: DataFrame,
                  eventKey: String, eventTime: String, historyKey: String,
                  pick: Seq[String]): DataFrame = {
    val attached = AsOfJoin.asofLeft(
      events, history, eventKey, eventTime, historyKey, "valid_from",
      pick ++ Seq("valid_from", "valid_to"))
    attached
      .filter(col("valid_from").isNotNull &&
        (col("valid_to").isNull || col(eventTime) < col("valid_to")))
      .drop("valid_from", "valid_to")
  }
}
