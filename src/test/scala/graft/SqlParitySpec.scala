package graft

/** The SQL surface ≡ the DataFrame surface, query by query: each
  * `SqlQueries.sql` text runs through `spark.sql` against the registered
  * views and must return exactly the rows (schema names included) of its
  * gated DataFrame twin on the same fixture — including bit-equal
  * doubles on the decimal-arithmetic warehouse queries (identical CAST
  * chains compile to the same Catalyst expressions). Runs on the real
  * sf0.001 fixture so the comparison covers every key/window the gate
  * sees at iteration scale.
  */
class SqlParitySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): (Seq[String], Set[Seq[Any]]) = {
    val cols = df.columns.toSeq
    val rows = df.collect().map(r => cols.indices.map(r.get): Seq[Any]).toSet
    (cols, rows)
  }

  SqlQueries.sql.keys.toSeq.sorted.foreach { name =>
    test(s"spark.sql twin of $name matches the DataFrame form") {
      val (sqlCols, sqlRows) = canon(SqlQueries.run(spark, sfDir, name))
      val (dfCols, dfRows) = canon(SparkEntry.queries(name)(spark, sfDir))
      assert(sqlCols === dfCols)
      assert(sqlRows.size === dfRows.size)
      assert(sqlRows === dfRows)
    }
  }

  test("the SQL surface covers reference, warehouse, dedup, similarity, text, curation, null families") {
    assert(SqlQueries.sql.size >= 68)
    Seq("q", "a", "d", "s", "t", "p", "n").foreach { fam =>
      assert(SqlQueries.sql.keys.exists(_.startsWith(fam + "_")) ||
        SqlQueries.sql.keys.exists(_.startsWith(fam)), s"family $fam missing")
    }
    SqlQueries.sql.keys.foreach(n => assert(SparkEntry.queries.contains(n)))
  }
}
