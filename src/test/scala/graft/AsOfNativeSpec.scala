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

  test("edge: empty right side, null keys, null timestamps") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_id", LongType), StructField("value", DoubleType)))
    def df(rows: Seq[Row]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

    // empty right: every left row emits with null match
    val emptyR = df(Seq.empty)
    val left = df(Seq(Row(1L, ts("2024-01-01 10:00:00"), 1L, 1.0)))
    val r1 = AsOfJoin.asOfNative(left, emptyR, "user_id", "ts", "event_id", Seq("value")).collect()
    assert(r1.length === 1 && r1(0).isNullAt(r1(0).fieldIndex("asof_event_id")))

    // null keys cluster together (window PARTITION BY semantics): a
    // null-key left row matches the null-key right row, not user 1's
    val nullKeyR = df(Seq(
      Row(null, ts("2024-01-01 09:00:00"), 10L, 5.0),
      Row(1L, ts("2024-01-01 09:30:00"), 11L, 6.0)))
    val nullKeyL = df(Seq(
      Row(null, ts("2024-01-01 10:00:00"), 20L, 0.0),
      Row(1L, ts("2024-01-01 10:00:00"), 21L, 0.0)))
    val r2 = AsOfJoin.asOfNative(nullKeyL, nullKeyR, "user_id", "ts", "event_id", Seq("value"))
      .collect().map(r => r.getLong(r.fieldIndex("event_id")) ->
        Option(r.getAs[java.lang.Long]("asof_event_id")).map(_.toLong)).toMap
    assert(r2(20L) === Some(10L))
    assert(r2(21L) === Some(11L))

    // null right ts sorts first and under a tolerance can never match
    val nullTsR = df(Seq(Row(1L, null, 30L, 7.0)))
    val r3 = AsOfJoin.asOfNative(left, nullTsR, "user_id", "ts", "event_id", Seq("value"),
      toleranceUs = Some(3600L * 1000000)).collect()
    assert(r3(0).isNullAt(r3(0).fieldIndex("asof_event_id")))
    // without tolerance the null-ts row is still "earliest" -> it matches
    val r4 = AsOfJoin.asOfNative(left, nullTsR, "user_id", "ts", "event_id", Seq("value")).collect()
    assert(r4(0).getAs[java.lang.Long]("asof_event_id") === 30L)
  }

  private def asOfDir(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame,
      dir: String, tolUs: Option[Long] = None) =
    AsOfJoin.asOfNative(l, r, "user_id", "ts", "event_id", Seq("value"), tolUs, dir)
      .collect().map(row => row.getAs[Long]("event_id") ->
        Option(row.getAs[java.lang.Long]("asof_event_id")).map(_.toLong)).toMap

  test("forward direction: earliest click at/after the probe, smallest-tie rule") {
    val got = asOfDir(purchases, clicks, "forward")
    assert(got(200L) === Some(101L)) // click AT 11:00 matches forward too
    assert(got(201L) === Some(101L)) // next click after 10:30 is 11:00
    assert(got(202L) === Some(102L)) // user 2's click is ahead of the probe
    assert(got(203L) === None)       // no clicks at all
    // equal-ts forward tie: two clicks at the same instant -> smallest id
    val tieR = Seq(
      (1L, ts("2024-01-01 12:00:00"), 301L, 1.0),
      (1L, ts("2024-01-01 12:00:00"), 300L, 2.0)).toDF("user_id", "ts", "event_id", "value")
    val tieL = Seq((1L, ts("2024-01-01 11:59:00"), 400L, 0.0))
      .toDF("user_id", "ts", "event_id", "value")
    assert(asOfDir(tieL, tieR, "forward")(400L) === Some(300L))
    // and the backward tie rule on the same data stays largest-id
    val tieLAfter = Seq((1L, ts("2024-01-01 12:01:00"), 401L, 0.0))
      .toDF("user_id", "ts", "event_id", "value")
    assert(asOfDir(tieLAfter, tieR, "backward")(401L) === Some(301L))
  }

  test("forward tolerance bounds the lookahead") {
    val g29 = asOfDir(purchases, clicks, "forward", Some(29L * 60 * 1000000))
    assert(g29(200L) === Some(101L)) // gap 0
    assert(g29(201L) === None)       // 30min ahead exceeds 29min
    assert(g29(202L) === None)       // 60min ahead
    val g60 = asOfDir(purchases, clicks, "forward", Some(60L * 60 * 1000000))
    assert(g60(201L) === Some(101L))
    assert(g60(202L) === Some(102L)) // exactly 60min: inclusive
  }

  test("nearest direction: closer side wins, exact ties prefer backward") {
    val got = asOfDir(purchases, clicks, "nearest")
    assert(got(200L) === Some(101L)) // exact hit
    assert(got(201L) === Some(100L)) // 30min back vs 30min fwd -> backward
    assert(got(202L) === Some(102L)) // only a forward candidate exists
    assert(got(203L) === None)
    // asymmetric gaps: 10min fwd beats 50min back
    val l = Seq((1L, ts("2024-01-01 10:50:00"), 500L, 0.0))
      .toDF("user_id", "ts", "event_id", "value")
    assert(asOfDir(l, clicks, "nearest")(500L) === Some(101L))
    // nearest tolerance applies to both directions
    assert(asOfDir(purchases, clicks, "nearest", Some(20L * 60 * 1000000))(201L) === None)
    assert(asOfDir(purchases, clicks, "nearest", Some(30L * 60 * 1000000))(201L) === Some(100L))
  }

  test("long event-time columns support tolerance in raw units") {
    val r = Seq((1L, 100L, 10L, 1.0), (1L, 200L, 11L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val l = Seq((1L, 205L, 20L, 0.0), (1L, 350L, 21L, 0.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = AsOfJoin.asOfNative(l, r, "user_id", "ts", "event_id", Seq("value"),
      toleranceUs = Some(50L), direction = "backward")
      .collect().map(row => row.getAs[Long]("event_id") ->
        Option(row.getAs[java.lang.Long]("asof_event_id")).map(_.toLong)).toMap
    assert(got(20L) === Some(11L)) // gap 5 <= 50
    assert(got(21L) === None)      // gap 150 > 50
  }

  test("mismatched key/ts types fail loudly instead of mis-comparing") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), 1L, 1.0)).toDF("user_id", "ts", "event_id", "value")
    val rIntKey = l.withColumn("user_id", col("user_id").cast("int"))
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(l, rIntKey, "user_id", "ts", "event_id", Seq("value"))
    }
    assert(e1.getMessage.contains("key types differ"))
    val rLongTs = l.withColumn("ts", col("ts").cast("long"))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(l, rLongTs, "user_id", "ts", "event_id", Seq("value"))
    }
    assert(e2.getMessage.contains("event-time types differ"))
    val e3 = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(l, l, "user_id", "ts", "event_id", Seq("value"),
        toleranceUs = None, direction = "sideways")
    }
    assert(e3.getMessage.contains("direction"))
  }

  test("forward/nearest edge: empty right side and null timestamps") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_id", LongType), StructField("value", DoubleType)))
    def df(rows: Seq[Row]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val left = df(Seq(Row(1L, ts("2024-01-01 10:00:00"), 1L, 1.0)))
    for (d <- Seq("forward", "nearest")) {
      val r = AsOfJoin.asOfNative(left, df(Seq.empty), "user_id", "ts", "event_id",
        Seq("value"), None, d).collect()
      assert(r.length === 1 && r(0).isNullAt(r(0).fieldIndex("asof_event_id")), d)
    }
    // nearest: a null-ts candidate loses to a timestamped one
    val mixed = df(Seq(
      Row(1L, null, 30L, 7.0),
      Row(1L, ts("2024-01-01 18:00:00"), 31L, 8.0)))
    val r = AsOfJoin.asOfNative(left, mixed, "user_id", "ts", "event_id",
      Seq("value"), None, "nearest").collect()
    assert(r(0).getAs[java.lang.Long]("asof_event_id") === 31L)
  }

  test("multi-key as-of: struct-packed keys match per (user, group) independently") {
    val r = Seq(
      (1L, "x", ts("2024-01-01 10:00:00"), 10L, 1.0),
      (1L, "y", ts("2024-01-01 10:30:00"), 11L, 2.0),
      (2L, "x", ts("2024-01-01 09:00:00"), 12L, 3.0),
    ).toDF("user_id", "grp", "ts", "event_id", "value")
    val l = Seq(
      (1L, "x", ts("2024-01-01 11:00:00"), 20L, 0.0), // -> 10 (not 11: grp differs)
      (1L, "y", ts("2024-01-01 11:00:00"), 21L, 0.0), // -> 11
      (2L, "y", ts("2024-01-01 11:00:00"), 22L, 0.0), // -> none (no (2,y) right)
    ).toDF("user_id", "grp", "ts", "event_id", "value")
    val got = AsOfJoin.asOfNativeMultiKey(l, r, Seq("user_id", "grp"),
      "ts", "event_id", Seq("value"))
      .collect().map(row => row.getAs[Long]("event_id") ->
        Option(row.getAs[java.lang.Long]("asof_event_id")).map(_.toLong)).toMap
    assert(got(20L) === Some(10L))
    assert(got(21L) === Some(11L))
    assert(got(22L) === None)
    // equals the single-key form on a concatenated key
    val lk = l.withColumn("ck", concat_ws("|", col("user_id"), col("grp")))
    val rk = r.withColumn("ck", concat_ws("|", col("user_id"), col("grp")))
    val single = AsOfJoin.asOfNative(lk, rk, "ck", "ts", "event_id", Seq("value"))
      .collect().map(row => row.getAs[Long]("event_id") ->
        Option(row.getAs[java.lang.Long]("asof_event_id")).map(_.toLong)).toMap
    assert((20L to 22L).forall(id => got(id) === single(id)))
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
