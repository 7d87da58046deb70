package graft

import org.apache.spark.sql.functions._
import graft.etl.{Ops, Schemas}

/** Ports of the reference's unit truth tables
  * (/root/reference/tests/unit/utils_test.py:13-44 and
  * tests/unit/btc_etl_test.py:95-112) against the real engine. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("filename validity truth table (utils_test.py:13-24)") {
    val cases = Seq(
      ("btcusd-2023-10-01.csv", true),   // canonical
      ("ethusd-2023-10-01.csv", false),  // wrong prefix
      ("btcusd-2023/10/01.csv", false),  // wrong separators
      ("btcusd-2023-10-01", false),      // missing .csv
      ("btcusd-20231001.csv", false),    // no hyphens
      ("", false),                       // empty
      ("btcusd-2023-10-32.csv", false),  // impossible day — needs date parse
      ("btcusd-2023-13-01.csv", false),  // impossible month
      ("btcusd-2023-10-01x.csv", false), // length 22 (utils.py:9)
      ("xbtcusd-2023-10-01.csv", false), // prefix not anchored
    )
    val got = cases.map(_._1).toDF("name")
      .select(col("name"), Ops.isValidBtcFilename(col("name")).as("valid"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (name, want) => assert(got(name) === want, s"case: '$name'") }
  }

  test("dateFromFilename extracts chars [7:17] (utils.py:19-21)") {
    val d = Seq("btcusd-2023-10-01.csv").toDF("name")
      .select(date_format(Ops.dateFromFilename(col("name")), "yyyy-MM-dd")).head().getString(0)
    assert(d === "2023-10-01")
  }

  test("dropAllNull keeps partially-null rows (btc_etl.py:160 how='all')") {
    val df = Seq(
      (1, Some(1.0), Some(2.0)), // full row: kept
      (2, Some(1.0), None),      // partial: KEPT (the how='all' subtlety)
      (3, None, None),           // all null: dropped
    ).toDF("id", "a", "b")
    val kept = Ops.dropAllNull(df, Seq("a", "b")).select("id").as[Int].collect().sorted
    assert(kept.toSeq === Seq(1, 2))
  }

  test("requireColumns fails fast on a missing column (btc_etl.py:156-157)") {
    val df = Seq((1, "x")).toDF("id", "other")
    val e = intercept[IllegalArgumentException] {
      Ops.requireColumns(df, Seq("Time"))
    }
    assert(e.getMessage.contains("Time"))
    // and passes when present
    Ops.requireColumns(df, Seq("id", "other"))
  }

  test("makeTimestamp combines file date + HH:mm:ss (btc_etl.py:163)") {
    val ts = Seq(("2023-10-01", "12:34:56")).toDF("d", "t")
      .select(date_format(Ops.makeTimestamp(to_date(col("d")), col("t")), "yyyy-MM-dd HH:mm:ss"))
      .head().getString(0)
    assert(ts === "2023-10-01 12:34:56")
  }

  test("renameAndSelect produces the exact sink shape (btc_etl.py:166-176)") {
    val row = (("00:00:00"), 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0)
    val df = Seq(row).toDF("Time", "Open", "High", "Low", "Close",
      "Volume_(BTC)", "Volume_(Currency)", "Weighted_Price")
      .withColumn("date_time", lit("2023-10-01 00:00:00"))
    val out = Ops.renameAndSelect(df)
    assert(out.columns.toSeq === Schemas.sinkCols)
    val r = out.head()
    assert(r.getDouble(1) === 1.0 && r.getDouble(7) === 7.0)
  }

  test("antiJoinLedger drops exactly the ledgered keys and broadcasts") {
    val data = (1 to 100).map(i => (i.toLong, s"row$i")).toDF("k", "v")
    val ledger = Seq(1L, 2L, 3L).toDF("k")
    val out = Ops.antiJoinLedger(data, ledger, "k")
    assert(out.count() === 97)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"ledger anti-join should broadcast, got:\n$plan")
  }

  test("ledgerAppend is a distinct union") {
    val a = Seq(1L, 2L).toDF("k")
    val b = Seq(2L, 3L).toDF("k")
    assert(Ops.ledgerAppend(a, b).as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
  }
}
