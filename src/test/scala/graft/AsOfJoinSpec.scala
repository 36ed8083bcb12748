package graft

import org.apache.spark.sql.SparkSession

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofLeft: latest right row at-or-before each left time, null when none") {
    val left = Seq((1L, 10L, "e1"), (1L, 25L, "e2"), (1L, 4L, "e0"), (2L, 10L, "e3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, "r5"), (1L, 20L, "r20"), (2L, 50L, "r50"))
      .toDF("rk", "rt", "v")
    val got = AsOfJoin.asofLeft(left, right, "k", "t", "rk", "rt", Seq("v"))
      .select("tag", "v").as[(String, String)].collect().toMap
    assert(got === Map("e0" -> null, "e1" -> "r5", "e2" -> "r20", "e3" -> null))
  }

  test("asofLeft: equal timestamps match (<= semantics)") {
    val left = Seq((1L, 5L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 5L, "atFive")).toDF("rk", "rt", "v")
    val got = AsOfJoin.asofLeft(left, right, "k", "t", "rk", "rt", Seq("v"))
      .select("v").as[String].collect()
    assert(got.sameElements(Array("atFive")))
  }

  test("asofLeft: all picked columns come from the SAME right row — a NULL in the latest match survives") {
    // Latest right row (t=20) has v2 = NULL. Per-column last() would
    // backfill v2 from the older t=5 row, stitching a composite row that
    // never existed; the struct formulation must keep (v1=b, v2=NULL).
    val left = Seq((1L, 30L, "e")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 5L, Some("a"), Some("olderV2")),
      (1L, 20L, Some("b"), Option.empty[String]))
      .toDF("rk", "rt", "v1", "v2")
    val got = AsOfJoin.asofLeft(left, right, "k", "t", "rk", "rt", Seq("v1", "v2"))
      .select("v1", "v2").as[(String, Option[String])].collect()
    assert(got.sameElements(Array(("b", None: Option[String]))))
  }

  test("pointInTime: events see only attributes live at their time") {
    import graft.operators.Upsert
    // v1 -> v2: key 1 changes a->a2, key 2 is deleted, key 4 is inserted
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val v2 = Seq((1L, "a2"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val hist = Upsert.scd2(v1, v2, "k")
    val events = Seq(
      (1L, 1L, "e1v1"), // version 1 era -> a
      (1L, 2L, "e1v2"), // version 2 era -> a2
      (2L, 1L, "e2v1"), // deleted key, v1 era -> b
      (2L, 2L, "e2v2"), // deleted key, post-deletion era -> DROPPED
      (4L, 1L, "e4v1"), // inserted key, before first version -> DROPPED
      (4L, 2L, "e4v2"), // inserted key, v2 era -> d
      (5L, 2L, "e5"))   // key never existed -> DROPPED
      .toDF("ek", "t", "tag")
    val got = Upsert.pointInTime(events, hist, "ek", "t", "k", Seq("v"))
      .select("tag", "v").as[(String, String)].collect().toMap
    assert(got === Map("e1v1" -> "a", "e1v2" -> "a2", "e2v1" -> "b",
      "e4v2" -> "d"))
  }

  test("graft_dot is callable from SQL after registration") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r === 11.0)
  }
}
