package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, attach the latest right row
  * with the same key and right.time ≤ left.time.
  *
  * Spark has no native as-of join. The naive formulation — non-equi join
  * on `r.time <= l.time` then argmax per left row — explodes to
  * O(|matches|) intermediate rows per key. This operator uses the
  * union-window technique instead (the shape kdb/Flink use): tag the two
  * inputs, union them, and run one `last(..., ignoreNulls)` window per
  * key ordered by (time, side). Cost: ONE shuffle on the key + a
  * per-partition sort — linear in |L|+|R| regardless of match fan-out,
  * which is what survives 100 TB.
  *
  * Right rows sort before left rows at equal timestamps, giving `<=`
  * match semantics. The right side must be unique per (key, time) —
  * pre-aggregate it otherwise (ties would be resolved arbitrarily).
  */
object AsOfJoin {

  /** @param pick right-side columns to attach to each left row */
  def asofLeft(left: DataFrame, right: DataFrame,
               leftKey: String, leftTime: String,
               rightKey: String, rightTime: String,
               pick: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("__k", "__t", "__side")
    require(!leftCols.exists(c => pick.contains(c) || reserved.contains(c)),
      s"left columns ${leftCols.filter(c => pick.contains(c) || reserved.contains(c))} " +
        "collide with picked right columns or AsOfJoin internals — rename them first")
    val l2 = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime).cast("long"))
      .withColumn("__side", lit(1))
    val r2 = pick.foldLeft(
      right
        .withColumn("__k", col(rightKey))
        .withColumn("__t", col(rightTime).cast("long"))
        .withColumn("__side", lit(0))) { (df, c) => df.withColumnRenamed(c, s"__r_$c") }
      .select(("__k" +: "__t" +: "__side" +: pick.map(c => s"__r_$c")).map(col): _*)

    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE last(struct, ignoreNulls) window, not one per picked column:
    // the struct is non-null exactly for right-side rows, so every
    // picked value comes from the SAME latest matching right row — a
    // per-column last() would stitch a composite row together whenever
    // the latest right row has a NULL in one picked column.
    val matched = u
      .withColumn("__r",
        last(when(col("__side") === 0,
            struct(pick.map(c => col(s"__r_$c").as(c)): _*)),
          ignoreNulls = true).over(w))
    matched.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ pick.map(c => col(s"__r.$c").as(c)): _*)
  }
}
