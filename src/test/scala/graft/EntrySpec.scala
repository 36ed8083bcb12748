package graft

/** Driver-contract invariants: the flagship entry returns rows, every
  * oracle key has a matching query, and query names are stable
  * identifiers (the driver uses them as output directory names). */
class EntrySpec extends SparkSpec {

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query has an oracle — rows-only grading must not silently creep back") {
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty,
      s"query without oracle (driver would fall back to a weak rows-only check): $unoracled")
  }

  test("query names are filesystem/JSON-safe") {
    assert(SparkEntry.queries.keys.forall(_.matches("[a-z0-9_]+")))
  }

  test("all graded queries are resolvable (analysis succeeds) on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sf("sf0.001")).schema
      catch { case e: Throwable =>
        fail(s"query $name failed analysis: ${e.getMessage}")
      }
    }
  }
}
