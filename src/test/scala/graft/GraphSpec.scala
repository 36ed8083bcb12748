package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: a symmetric cycle is a fixpoint at exactly 1.0 per node") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, iterations = 7)
      .as[(Long, Long)].collect().toMap
    // base + 85% of a full unit flowing along the cycle = the unit again
    assert(pr === Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("pageRank: hub of a star accumulates rank; leaves hold the base") {
    // 4 leaves all link to the hub; hub links back to leaf 1
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L))
      .toDF("src", "dst")
    val pr = Graph.pageRank(edges, iterations = 10)
      .as[(Long, Long)].collect().toMap
    // hub and the leaf it feeds exchange the accumulated mass each
    // round (hub's outdegree is 1), so BOTH sit far above plain leaves
    assert(pr(0L) > 2 * 1000000L, "hub accumulated rank")
    assert(pr(1L) > 2 * 1000000L, "hub-fed leaf accumulated rank")
    // leaves 2..4 receive nothing: exactly the base share
    assert(pr(2L) === 150000L && pr(3L) === 150000L && pr(4L) === 150000L)
  }

  test("pageRank: total mass never exceeds N units and iterations=0 is the init") {
    val edges = (0L until 20L).map(i => (i, (i * 3 + 1) % 20)).toDF("src", "dst")
    val init = Graph.pageRank(edges, iterations = 0)
      .as[(Long, Long)].collect()
    assert(init.forall(_._2 == 1000000L))
    val pr = Graph.pageRank(edges, iterations = 6).as[(Long, Long)].collect()
    val total = pr.map(_._2).sum
    assert(total <= 20L * 1000000L, s"mass grew: $total")
    assert(total >= 20L * 1000000L - 20L * 6L * 100L, s"floor loss too big: $total")
  }
}
