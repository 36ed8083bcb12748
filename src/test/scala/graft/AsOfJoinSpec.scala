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

  test("graft_dot is callable from SQL after registration") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r === 11.0)
  }
}
