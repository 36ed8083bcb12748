package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over corpus-scale edge lists — the companion
  * of [[Dedup.connectedComponents]] for graphs where WEIGHT, not just
  * membership, matters (domain authority for crawl prioritization,
  * citation weighting for source mixing).
  */
object Graph {

  /** Fixed-iteration PageRank in EXACT integer micro-units.
    *
    * pr_{t+1}(v) = base + d·Σ_{u→v} pr_t(u)/outdeg(u), evaluated
    * entirely in BIGINT arithmetic: ranks are micro-units (init
    * `unit` = 1.0), per-edge contributions use integer division
    * `pr div deg`, the damping factor is the rational dampNum/dampDen
    * applied as `(dampNum·Σ) div dampDen`. Every aggregation is a sum
    * of longs — associative, so the result is bit-identical in ANY
    * partition order and the "approximate" iterative algorithm carries
    * an exact replayable oracle (the k-means exactMeans / PQ ADC
    * trick). The integer floor loses < 1 micro-unit per edge per round
    * — far below any ranking-relevant difference.
    *
    * Scale shape: per iteration, one equi-join of edges against the
    * current ranks (shuffle on src), one partial-aggregable groupBy on
    * dst, one left join back to the node set. No driver-side state at
    * all — the node count never materializes on the driver; dangling
    * mass is NOT redistributed (nodes with no outlinks absorb rank),
    * the standard simplification when the edge generator guarantees
    * outdegree > 0. Plan depth grows linearly with iterations; for
    * double-digit iteration counts at cluster scale, persist or
    * checkpoint the rank DataFrame every few rounds (same lineage
    * argument as [[Dedup.connectedComponentsWithRounds]]). */
  def pageRank(edges: DataFrame, iterations: Int,
               srcCol: String = "src", dstCol: String = "dst",
               dampNum: Long = 85, dampDen: Long = 100,
               unit: Long = 1000000L): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(dampNum >= 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen must lie in [0,1]")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val base = (unit * (dampDen - dampNum)) / dampDen
    var pr = nodes.withColumn("pr", lit(unit))
    (0 until iterations).foreach { _ =>
      val contrib = e.join(pr.withColumnRenamed("id", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("id"), expr("pr div deg").as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c")).as("m"))
      pr = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"($dampNum * coalesce(m, 0L)) div $dampDen"))
            .as("pr"))
    }
    pr.select(col("id"), col("pr").as("pr_micro"))
  }
}
