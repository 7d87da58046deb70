package graft

/** Driver-contract smoke: entry() returns rows, every query key has an
  * oracle or is explicitly rows-only, and a fast subset executes at
  * sf0.001 (the full oracle comparison is the driver's t2 gate, replicated
  * locally by tools/compare.py). */
class EntrySpec extends SparkSpec {

  test("entry returns rows > 0 on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    assert(q === o, s"queries without oracles (rows-only check): ${q -- o}")
  }

  test("fast query subset produces rows at sf0.001") {
    val subset = Seq("project_rename", "antijoin_processed", "dedup_exact",
      "text_token_count", "window_ohlc", "agg_pricing_summary", "topk_orders")
    subset.foreach { k =>
      val n = SparkEntry.queries(k)(spark, sf).count()
      assert(n > 0, s"$k returned no rows")
    }
  }
}
