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
}
