package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** The native as-of join (AsOfJoinPlan -> AsOfJoinStrategy ->
  * AsOfJoinExec + PruneAsOfJoin): same answers as the composed
  * union+window operator, with the plan a dedicated operator should
  * have — one exchange per side, pruned scans. */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val clicks = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100L, 1.0),
    (1L, ts("2024-01-01 11:00:00"), 101L, 2.0),
    (2L, ts("2024-01-01 11:30:00"), 102L, 3.0),
  ).toDF("user_id", "ts", "event_id", "value")

  private lazy val purchases = Seq(
    (1L, ts("2024-01-01 11:00:00"), 200L, 9.0), // tie: click AT 11:00 matches
    (1L, ts("2024-01-01 10:30:00"), 201L, 9.0),
    (2L, ts("2024-01-01 10:30:00"), 202L, 9.0), // before any click -> null
    (3L, ts("2024-01-01 12:00:00"), 203L, 9.0), // user with no clicks -> null
  ).toDF("user_id", "ts", "event_id", "value")

  test("asOfNative matches the composed operator's tie and null semantics") {
    val got = AsOfJoin.asOfNative(purchases, clicks, "user_id", "ts", "event_id", Seq("value"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asof_event_id")).map(_.toLong)).toMap
    assert(got(200L) === Some(101L))
    assert(got(201L) === Some(100L))
    assert(got(202L) === None)
    assert(got(203L) === None)
  }

  test("asOfNative equals asOf on the events table, row for row") {
    val e = graft.queries.Staging.tbl(spark, sf, "events")
    val c = e.filter(col("event_type") === "click")
    val p = e.filter(col("event_type") === "purchase")
    val cols = Seq("event_id", "user_id", "ts", "asof_ts", "asof_event_id", "asof_value")
    val composed = AsOfJoin.asOf(p, c, "user_id", "ts", "event_id", Seq("value"))
      .selectExpr(cols: _*).orderBy("event_id").collect()
    val native = AsOfJoin.asOfNative(p, c, "user_id", "ts", "event_id", Seq("value"))
      .selectExpr(cols: _*).orderBy("event_id").collect()
    assert(native.length === composed.length)
    assert(native.sameElements(composed))
  }

  test("tolerance bounds the lookback") {
    // doc purchases: 200 at 11:00 (click at 11:00, gap 0), 201 at 10:30
    // (latest click 10:00, gap 30min)
    def run(tolMin: Long) =
      AsOfJoin.asOfNative(purchases, clicks, "user_id", "ts", "event_id", Seq("value"),
        toleranceUs = Some(tolMin * 60L * 1000000))
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("asof_event_id")).map(_.toLong)).toMap
    val g30 = run(30)
    assert(g30(200L) === Some(101L)) // gap 0 within 30min
    assert(g30(201L) === Some(100L)) // gap exactly 30min: inclusive
    val g29 = run(29)
    assert(g29(200L) === Some(101L))
    assert(g29(201L) === None) // 30min gap exceeds 29min tolerance
  }

  test("native plan: AsOfJoinExec with one exchange per side") {
    val e = graft.queries.Staging.tbl(spark, sf, "events")
    val c = e.filter(col("event_type") === "click")
    val p = e.filter(col("event_type") === "purchase")
    val df = AsOfJoin.asOfNative(p, c, "user_id", "ts", "event_id", Seq("value"))
      .select("event_id", "asof_event_id")
    df.count() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix -> prints as "AsOfJoin"
    assert(plan.contains("AsOfJoin user_id"), s"expected native exec in:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 2, s"expected exactly 2 shuffles, got $exchanges:\n$plan")
  }

  test("PruneAsOfJoin narrows the scans under a projection") {
    val e = graft.queries.Staging.tbl(spark, sf, "events")
    val c = e.filter(col("event_type") === "click")
    val p = e.filter(col("event_type") === "purchase")
    val df = AsOfJoin.asOfNative(p, c, "user_id", "ts", "event_id", Seq("value"))
      .select("event_id", "asof_event_id")
    val plan = df.queryExecution.executedPlan.toString
    // neither side should read the untouched wide columns
    assert(!plan.contains("props"), s"scan must not read the unreferenced props column:\n$plan")
    // the matched payload (value) is unreferenced -> pruned off the right side
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("asof_value"), s"unused matched column must be pruned:\n$optimized")
  }
}
