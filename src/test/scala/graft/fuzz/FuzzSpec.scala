package graft.fuzz

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Dual-frontend differential over the [[QueryFuzzer]] corpus: every
  * generated query runs BOTH as its DataFrame rendering and as its
  * SQL string through `spark.sql` over the same tables, and the full
  * result multisets must match row-for-row. This pins the two
  * renderings to each other (a generator bug in either rendering
  * surfaces here, which is what makes the cross-engine digest gate
  * `c17_fuzz_differential` trustworthy: if Spark-API ≡ Spark-SQL
  * in-test and Spark-API ≡ DuckDB at the gate, all three agree).
  *
  * A failure prints the query index and SQL — reproduce with
  * `QueryFuzzer.query(i)`, minimize by shrinking the SQL by hand, and
  * promote the minimized shape to a named gate. */
class FuzzSpec extends SparkSpec {

  private lazy val viewsReady: Unit = {
    Seq("nation", "region", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      graft.catalog.Tables.load(spark, sf, t).createOrReplaceTempView(t)
    }
  }

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(v => if (v == null) "NULL" else v.toString)
        .mkString("\u0001"))
      .sorted.toSeq
  }

  test(s"corpus: ${QueryFuzzer.NumQueries} seeded random queries agree between DataFrame and spark.sql renderings") {
    viewsReady
    val failures = QueryFuzzer.corpus.flatMap { q =>
      val api = canon(q.build(spark, sf))
      val sql = canon(spark.sql(q.sql))
      if (api == sql) None
      else Some(s"q${q.idx}: api=${api.size} rows, sql=${sql.size} rows\n  ${q.sql}")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("corpus exercises every shape: single/join/chain sources, group/project/distinct") {
    val sqls = QueryFuzzer.corpus.map(_.sql)
    assert(sqls.count(_.contains(" JOIN ")) >= 30, "join coverage")
    assert(sqls.count(s => s.count(_ == 'J') >= 2 && s.contains(" JOIN "))
      >= 5, "3-table chain coverage")
    assert(sqls.count(_.contains("GROUP BY")) >= 20, "grouped-agg coverage")
    assert(sqls.count(_.contains("SELECT DISTINCT")) >= 5, "distinct coverage")
    assert(sqls.count(_.contains("WHERE")) >= 40, "predicate coverage")
    assert(sqls.count(_.contains(" OR ")) >= 3, "disjunction coverage")
    assert(sqls.count(_.contains("LIKE")) >= 3, "LIKE coverage")
    assert(sqls.count(_.contains("LEFT JOIN")) >= 5, "outer-join coverage")
    // shifted-key LEFT legs manufacture genuinely unmatched rows
    // (an FK edge always matches), pinning NULL digest semantics
    assert(sqls.count(s => s.contains("LEFT JOIN") && s.contains("+ "))
      >= 2, "null-producing outer-join coverage")
    // v3 shapes (indices 120-179)
    assert(sqls.count(_.contains("EXISTS (")) >= 8, "EXISTS coverage")
    assert(sqls.count(_.contains("NOT EXISTS (")) >= 2,
      "NOT EXISTS coverage")
    assert(sqls.count(_.contains(" OVER (")) >= 10, "window coverage")
    assert(sqls.count(_.contains("lag(")) >= 2, "lag coverage")
    assert(sqls.count(_.contains("ROWS BETWEEN")) >= 2,
      "explicit-frame running-sum coverage")
    assert(sqls.count(_.contains("rank() OVER")) >= 2,
      "non-unique-sort rank coverage")
    assert(sqls.count(_.contains(" LIMIT ")) >= 10, "top-k coverage")
    // v4 shapes (indices 180-239)
    assert(sqls.count(_.contains("CASE WHEN")) >= 5, "CASE coverage")
    assert(sqls.count(_.contains("THEN NULL")) >= 2,
      "NULL-branch CASE coverage")
    assert(sqls.count(_.contains(" IN (")) >= 5, "IN-list coverage")
    assert(sqls.count(_.contains(" NOT IN (")) >= 2, "NOT IN coverage")
    assert(sqls.count(_.contains("HAVING")) >= 5, "HAVING coverage")
    assert(sqls.count(s => s.contains("INTERSECT") ||
      s.contains("EXCEPT") || s.contains(" UNION ")) >= 5,
      "set-op coverage")
    assert(sqls.count(_.contains("(SELECT max(")) +
      sqls.count(_.contains("(SELECT min(")) >= 5,
      "scalar-subquery coverage")
    // the frozen prefixes must never drift: pin by shape markers so a
    // dispatch change that would invalidate historical failure
    // indices fails loudly here
    assert(QueryFuzzer.query(0).sql == QueryFuzzer.corpus(0).sql)
    assert(sqls.take(QueryFuzzer.NumQueriesV2)
      .forall(s => !s.contains(" OVER (") && !s.contains("EXISTS (")),
      "v3 shapes must not leak into the frozen v1/v2 index range")
    assert(sqls.take(QueryFuzzer.NumQueriesV3)
      .forall(s => !s.contains("CASE WHEN") && !s.contains("HAVING") &&
        !s.contains("INTERSECT") && !s.contains("EXCEPT")),
      "v4 shapes must not leak into the frozen v1-v3 index range")
    // v5 composite shapes (indices 240-287)
    assert(sqls.count(s => s.contains(" JOIN ") && s.contains(" OVER ("))
      >= 5, "window-over-join coverage")
    assert(sqls.count(s => s.contains("EXISTS (") &&
      s.contains("GROUP BY")) >= 5, "agg-over-semi coverage")
    assert(sqls.count(s => s.contains(" JOIN ") && s.contains(" LIMIT "))
      >= 5, "top-k-over-join coverage")
    assert(sqls.count(s => s.contains("EXISTS (") && s.contains("lag("))
      >= 5, "window-over-semi coverage")
    assert(sqls.take(QueryFuzzer.NumQueriesV4)
      .forall(s => !(s.contains(" JOIN ") && s.contains(" OVER ("))),
      "v5 shapes must not leak into the frozen v1-v4 index range")
    // the exact-content freeze: the SHA-256 of each frozen prefix is
    // pinned, so ANY drift (a generator refactor, a dependency
    // changing Random, a new shape leaking in) fails here with
    // certainty, not just when it trips a marker heuristic. New shape
    // versions must APPEND indices and pin the next prefix.
    def sha(n: Int): String = {
      val s = sqls.take(n).mkString("\n")
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(sha(QueryFuzzer.NumQueriesV3) ==
      "abdfbe0f657c0bfdd8b7de54a2da6f4a9c10d22c3bfd2b4e653314de960323b0",
      "frozen corpus (indices 0-179) drifted")
    assert(sha(QueryFuzzer.NumQueriesV4) ==
      "3622b771da8dc75308ee7e408b4d44852d532046257db05d22fa7ef77490cf2b",
      "frozen corpus (indices 0-239) drifted")
    // determinism: the corpus is a pure function of the master seed
    assert(QueryFuzzer.corpus.map(_.sql) == QueryFuzzer.corpus.map(_.sql))
  }

  test("digest plan folds every query to one row; digest SQL references every index") {
    viewsReady
    val d = QueryFuzzer.digestAll(spark, sf).collect()
    assert(d.length == QueryFuzzer.NumQueries)
    assert(d.map(_.getInt(0)).toSeq == (0 until QueryFuzzer.NumQueries))
    // non-degenerate: most queries return rows and a nonzero checksum
    assert(d.count(_.getLong(1) > 0) > QueryFuzzer.NumQueries / 2)
    assert(d.count(_.getLong(2) != 0) > QueryFuzzer.NumQueries / 2)
  }
}
