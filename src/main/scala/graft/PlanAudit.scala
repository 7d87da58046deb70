package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: one-line physical-plan health summary per catalog query —
  * exchange (shuffle) count, sort-merge joins, cartesian/broadcast-nested-
  * loop joins, and interpreted (non-codegen) fallbacks. Source of
  * docs/PLAN_AUDIT.md; anything flagged here is either justified in the
  * operator's scaladoc or a bug. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("| query | exchanges | SMJ | cartesian/BNL | codegen fallback |")
    println("|---|---|---|---|---|")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        // formatted mode prints tree + detail -> counts halved
        def n(pat: String) = pat.r.findAllIn(plan).length / 2
        val ex = n("Exchange ")
        val smj = n("SortMergeJoin")
        val cart = n("CartesianProduct") + n("BroadcastNestedLoopJoin")
        val fb = if (plan.contains("CodegenFallback")) "YES" else ""
        println(f"| $name | $ex | ${if (smj > 0) smj.toString else ""} | ${if (cart > 0) cart.toString else ""} | $fb |")
      } catch { case e: Throwable => println(s"| $name | ERR ${e.getClass.getSimpleName} | | | |") }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
