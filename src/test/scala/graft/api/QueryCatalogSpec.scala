package graft.api

import graft.SparkSpec

/** Smoke: every registered query runs at sf0.001 and returns rows;
  * exact value parity vs DuckDB is checked by tools/oracle_check.py
  * (and the driver's own gate) at sf0.01. */
class QueryCatalogSpec extends SparkSpec {
  QueryCatalog.entries.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      assert(q.run(spark, sf).count() > 0)
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
