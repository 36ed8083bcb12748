package graft

import graft.operators.Hierarchy

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  private def flatten(rows: Array[(Long, Long, Long)]) =
    rows.map(r => r._1 -> (r._2, r._3)).toMap

  test("rootAndDepth: a linear chain resolves depth = position") {
    // 0 <- 1 <- 2 <- ... <- 9
    val nodes = (0L to 9L)
      .map(i => (i, if (i == 0L) None else Some(i - 1)))
      .toDF("id", "parent")
    val out = flatten(Hierarchy.rootAndDepth(nodes, "id", "parent", rounds = 4)
      .as[(Long, Long, Long)].collect())
    (0L to 9L).foreach { i => assert(out(i) === ((0L, i)), s"node $i") }
  }

  test("rootAndDepth: a forest keeps trees separate; branching depths are per-path") {
    // Tree A: 1 <- {2, 3}, 3 <- 4. Tree B: 10 <- 11.
    val nodes = Seq(
      (1L, None), (2L, Some(1L)), (3L, Some(1L)), (4L, Some(3L)),
      (10L, None), (11L, Some(10L))).toDF("id", "parent")
    val out = flatten(Hierarchy.rootAndDepth(nodes, "id", "parent", rounds = 3)
      .as[(Long, Long, Long)].collect())
    assert(out === Map(
      1L -> ((1L, 0L)), 2L -> ((1L, 1L)), 3L -> ((1L, 1L)), 4L -> ((1L, 2L)),
      10L -> ((10L, 0L)), 11L -> ((10L, 1L))))
  }

  test("rootAndDepth: dangling parent id surfaces as the root instead of dropping the row") {
    val nodes = Seq((1L, None), (2L, Some(99L))).toDF("id", "parent")
    val out = flatten(Hierarchy.rootAndDepth(nodes, "id", "parent", rounds = 3)
      .as[(Long, Long, Long)].collect())
    assert(out(2L) === ((99L, 1L)), "walk stops at the missing ancestor, visibly")
    assert(out(1L) === ((1L, 0L)))
  }

  test("rootAndDepth: rounds bound the resolvable depth at 2^rounds") {
    val nodes = (0L to 9L)
      .map(i => (i, if (i == 0L) None else Some(i - 1)))
      .toDF("id", "parent")
    // 2 rounds resolve pointers 4 deep: node 9 only reaches ancestor 5.
    val partial = flatten(Hierarchy.rootAndDepth(nodes, "id", "parent", rounds = 2)
      .as[(Long, Long, Long)].collect())
    assert(partial(9L) === ((5L, 4L)), "pointer advanced exactly 2^2 hops")
    assert(partial(3L) === ((0L, 3L)), "shallow nodes already at their root")
    // Extra rounds past convergence are no-ops.
    val exact = flatten(Hierarchy.rootAndDepth(nodes, "id", "parent", rounds = 4)
      .as[(Long, Long, Long)].collect())
    val more = flatten(Hierarchy.rootAndDepth(nodes, "id", "parent", rounds = 6)
      .as[(Long, Long, Long)].collect())
    assert(exact === more)
  }

  test("rootAndDepth: lineage cuts (local and dir-backed) leave results identical") {
    // A 200-deep chain needs 9 rounds — enough that both cut cadences
    // actually fire mid-walk.
    val nodes = (0L to 199L)
      .map(i => (i, if (i == 0L) None else Some(i - 1)))
      .toDF("id", "parent")
    val uncut = flatten(Hierarchy.rootAndDepth(nodes, "id", "parent",
      rounds = 9, cutEvery = 100).as[(Long, Long, Long)].collect())
    val local = flatten(Hierarchy.rootAndDepth(nodes, "id", "parent",
      rounds = 9, cutEvery = 3).as[(Long, Long, Long)].collect())
    val dir = java.nio.file.Files.createTempDirectory("graft-hier-ckpt").toString
    val reliable = flatten(Hierarchy.rootAndDepth(nodes, "id", "parent",
      rounds = 9, cutEvery = 3, checkpointDir = Some(dir))
      .as[(Long, Long, Long)].collect())
    assert(uncut(199L) === ((0L, 199L)))
    assert(uncut === local)
    assert(uncut === reliable)
    assert(new java.io.File(dir).listFiles().nonEmpty,
      "dir-backed cuts must actually materialize under the checkpoint dir")
  }
}
