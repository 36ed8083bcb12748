package graft

import org.apache.spark.sql.functions._

import graft.operators.Profiling

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts rows, nulls, distincts and renders typed min/max") {
    val df = Seq((1L, Some(2.5), "b"), (2L, None, "a"), (3L, Some(2.5), "c"))
      .toDF("id", "x", "s")
    val got = Profiling.profile(df, Seq("id", "x", "s"))
      .orderBy("column").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(got.toSeq === Seq(
      ("id", 3L, 0L, 3L, "1", "3"),
      ("s", 3L, 0L, 3L, "a", "c"),
      ("x", 3L, 1L, 1L, "2.5", "2.5")))
  }

  test("profile exact=false uses HLL distinct and stays sane on exact-free path") {
    val df = (1L to 500L).map(i => i % 50).toDF("v")
    val nd = Profiling.profile(df, Seq("v"), exact = false)
      .select("n_distinct").as[Long].head()
    assert(nd >= 45 && nd <= 55, s"HLL estimate $nd far from 50")
  }

  test("orphans: null FK counts as n_null_fk, never as an orphan") {
    val child = Seq(Some(1L), Some(2L), Some(99L), Some(99L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Profiling.orphans(child, "fk", parent, "pk", "c->p").collect().head
    assert(got.getAs[Long]("n_child_rows") === 5L)
    assert(got.getAs[Long]("n_orphan_rows") === 2L)
    assert(got.getAs[Long]("n_orphan_keys") === 1L)
    assert(got.getAs[Long]("n_null_fk") === 1L)
  }

  test("orphans: duplicate parent keys do not fan out child counts") {
    val child = Seq(1L, 2L).toDF("fk")
    val parent = Seq(1L, 1L, 1L, 2L).toDF("pk")
    val got = Profiling.orphans(child, "fk", parent, "pk", "c->p").collect().head
    assert(got.getAs[Long]("n_child_rows") === 2L)
    assert(got.getAs[Long]("n_orphan_rows") === 0L)
  }
}
