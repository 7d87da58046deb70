package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtQueries

/** Pins that ANALYZE TABLE statistics actually reach Catalyst: exact
  * rowCount on the scan, and a CBO-propagated cardinality estimate on a
  * join node (size-only estimation leaves join rowCount undefined). */
class StatsSpec extends SparkSpec {

  test("ddl_analyze_stats: catalog stats reach the optimized plan under CBO") {
    // builds the tables, ANALYZEs them, and runs the stats-driven join
    val out = ExtQueries.all("ddl_analyze_stats")(spark, sf)
    assert(out.count() > 0)

    val cboWas = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val orders = spark.table("graft_cbo_orders")
      val scanStats = orders.queryExecution.optimizedPlan.stats
      assert(scanStats.rowCount.contains(BigInt(orders.count())),
        s"scan rowCount should be exact from ANALYZE, got ${scanStats.rowCount}")

      val joined = spark.table("graft_cbo_customer")
        .join(orders, col("c_custkey") === col("o_custkey"))
      val joinStats = joined.queryExecution.optimizedPlan.stats
      assert(joinStats.rowCount.isDefined,
        "CBO should estimate join cardinality from column ndv stats")
      // sanity: the ndv-based estimate is within 10x of truth, not a
      // file-size guess (truth: every order matches exactly one customer)
      val truth = BigInt(orders.count())
      val est = joinStats.rowCount.get
      assert(est >= truth / 10 && est <= truth * 10,
        s"join estimate $est vs truth $truth")
    } finally spark.conf.set("spark.sql.cbo.enabled", cboWas)
  }
}
