package graft.api

import graft.SparkSpec

/** Smoke: every registered query runs at sf0.001 and returns rows;
  * exact value parity vs DuckDB is checked by tools/oracle_check.py
  * (and the driver's own gate) at sf0.01. */
class QueryCatalogSpec extends SparkSpec {
  // queries whose CORRECT answer is legitimately empty at toy scale:
  // a30's thinned co-occurrence graph has no 16-core at sf0.001 (the
  // cascade peels everything — verified against the unrolled-CTE
  // oracle); at sf0.01 it keeps a 93-node core and the driver gate
  // pins the values. "Runs without error" is the smoke for these.
  private val emptyOkAtToyScale = Set("a30_kcore")

  QueryCatalog.entries.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      val n = q.run(spark, sf).count()
      if (!emptyOkAtToyScale(q.name)) assert(n > 0)
    }
  }

  test("every oracle references only harness tables") {
    QueryCatalog.oracles.values.foreach { sql =>
      assert(!sql.contains(";"), "oracle must be a single statement")
    }
  }

  test("catalog is consistent: unique names, every oracle has a query") {
    val names = QueryCatalog.entries.map(_.name)
    assert(names.distinct.size == names.size,
      names.diff(names.distinct).toString)
    assert(QueryCatalog.oracles.keySet.subsetOf(QueryCatalog.queries.keySet))
  }
}
