package graft

/** Executes every catalog query at sf0.001 — regression net for future
  * rounds: any query that stops executing (analysis error, runtime
  * failure) fails `sbt test` without needing the Verify harness. Value
  * correctness stays the oracle's job (tools/compare.py / driver t2). */
class AllQueriesSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
      // release frames persisted for multi-consumer reuse inside a query
      // (jaccard/simhash) — without this a whole-catalog session
      // accumulates cached blocks for its lifetime
      spark.catalog.clearCache()
    }
  }

  test("catalog and oracle key sets are identical") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }
}
