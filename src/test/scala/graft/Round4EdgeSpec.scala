package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Edge-input behavior of the round-4 primitives: degenerate cardinalities
  * that the sf-table catalog queries never exercise. */
class Round4EdgeSpec extends SparkSpec {
  import spark.implicits._

  test("kmv values sketch shorter than k when distincts < k") {
    graft.expressions.GraftFunctions.register(spark)
    val s = Seq(1L, 2L, 3L, 2L, 1L).toDF("hv")
      .agg(call_function("graft_kmv_values", col("hv"), lit(64)))
      .head().getSeq[Long](0)
    assert(s === Seq(1L, 2L, 3L))
  }

  test("kmv values of an empty frame is an empty sketch") {
    graft.expressions.GraftFunctions.register(spark)
    val s = Seq.empty[Long].toDF("hv")
      .agg(call_function("graft_kmv_values", col("hv"), lit(64)))
      .head().getSeq[Long](0)
    assert(s.isEmpty)
  }

  test("shingle generator emits nothing for docs with fewer than n tokens") {
    graft.expressions.GraftFunctions.register(spark)
    val out = Seq("one two", "x", "").toDF("text")
      .select(graft.functions.CrossFns.tokens(col("text")).as("w"))
      .select(call_function("graft_shingle_gen", col("w"), lit(3)))
    assert(out.count() === 0L)
  }

  test("shingle generator on exactly n tokens emits one row at pos 1") {
    graft.expressions.GraftFunctions.register(spark)
    val rows = Seq("a b c").toDF("text")
      .select(graft.functions.CrossFns.tokens(col("text")).as("w"))
      .select(call_function("graft_shingle_gen", col("w"), lit(3)))
      .collect()
    assert(rows.length === 1)
    assert(rows(0).getInt(0) === 1)
    // hash of "a b c" == charHash of the joined string
    val expect = Seq("a b c").toDF("s")
      .select(graft.functions.CrossFns.charHash(col("s"))).head().getLong(0)
    assert(rows(0).getLong(1) === expect)
  }

  test("temporal join: single-version user matches version 1 at any later probe") {
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "click"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 7L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val byTs = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val byVer = Window.partitionBy("user_id").orderBy("version")
    val dim = events
      .withColumn("chg", when(lag(col("event_type"), 1).over(byTs).isNull ||
        lag(col("event_type"), 1).over(byTs) =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("version", sum("chg").over(byTs.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "version")
      .agg(first("event_type").as("state"), min("ts").as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVer))
      .select(col("user_id").as("d_user"), col("version"), col("valid_from"), col("valid_to"))
    val probes = events.select(col("event_id"), col("user_id"),
      (col("ts") + expr("INTERVAL 30 MINUTES")).as("pts"))
    val joined = probes.join(dim,
      col("user_id") === col("d_user") && col("pts") >= col("valid_from") &&
        (col("valid_to").isNull || col("pts") < col("valid_to")))
    assert(joined.count() === 2L)
    assert(joined.filter(col("version") =!= 1L).count() === 0L)
  }

  test("winnowing guarantee: docs sharing a long substring share a fingerprint") {
    graft.expressions.GraftFunctions.register(spark)
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"red green blue $shared yellow purple"))
      .toDF("doc_id", "text")
    val w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 0)
    val fp = docs
      .select(col("doc_id"), graft.functions.CrossFns.tokens(col("text")).as("w"))
      .select(col("doc_id"), call_function("graft_shingle_gen", col("w"), lit(3)))
      .withColumn("c", col("sh") * 16777216L + col("pos"))
      .withColumn("sel", min(col("c")).over(w))
      .filter(col("pos") >= 4)
      .select(col("doc_id"), expr("sel div 16777216").as("fp_sh"))
      .distinct()
    val a = fp.filter(col("doc_id") === 1L).select("fp_sh")
    val b = fp.filter(col("doc_id") === 2L).select("fp_sh")
    assert(a.intersect(b).count() > 0L,
      "a 10-token shared run must yield at least one shared winnowing fingerprint")
  }

  test("token budget: a single doc larger than the budget still ships") {
    // pre-doc running total is 0 < budget, so the first doc always passes
    val docs = Seq(("d1", "s1", 10000L)).toDF("doc_id", "source", "n_tokens")
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val kept = docs
      .withColumn("taken_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .filter(col("taken_before") < 800L)
    assert(kept.count() === 1L)
  }
}
