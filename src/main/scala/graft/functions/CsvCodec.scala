package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** CSV line encode/decode — the reference's record representation.
  *
  * The reference holds each record as one comma-joined CSV line with no
  * quoting/escaping; fields are guaranteed comma-free
  * (`internal/data/generator.go:44-56`, `internal/sort/external_sort.go:366-367`).
  * Key extraction is a positional field slice + hand-rolled int parse
  * (`external_sort.go:365-425`). Here both directions are pure codegen'd
  * column expressions (`concat_ws` / `split` / `element_at` / `cast`) —
  * no UDFs, so they stay inside whole-stage codegen and Catalyst can
  * constant-fold / prune around them.
  */
object CsvCodec {

  /** Encode columns into one CSV line ≙ `generator.go:44-56`. Nulls
    * encode as empty fields (raw `concat_ws` would DROP a null element,
    * shifting every later field's position — silent corruption for any
    * nullable input). */
  def encode(cols: Column*): Column =
    concat_ws(",", cols.map(c => coalesce(c.cast("string"), lit(""))): _*)

  /** Extract field `idx` (0-based) from a CSV line ≙
    * `extractKeyString` (`external_sort.go:365-398`). */
  def field(line: Column, idx: Int): Column =
    element_at(split(line, ","), idx + 1)

  /** Extract field `idx` parsed as a typed value ≙ `extractID`
    * (`external_sort.go:402-425` — sign-aware int64 parse; Spark's `cast`
    * handles the sign and overflow-to-null the same way tests expect). */
  def fieldAs(line: Column, idx: Int, dt: DataType): Column =
    field(line, idx).cast(dt)

  /** Decode a whole CSV line into named typed columns, keeping any
    * original columns. `fields` = (name, type) in positional order. */
  def decode(df: DataFrame, lineCol: Column, fields: Seq[(String, DataType)]): DataFrame =
    fields.zipWithIndex.foldLeft(df) { case (acc, ((name, dt), i)) =>
      acc.withColumn(name, fieldAs(lineCol, i, dt))
    }
}
