package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, the most recent right row with
  * right.ts <= left.ts within the same key — the canonical time-series
  * operator Spark's join zoo lacks.
  *
  * Implemented by composition (preference (a) of the custom-operator
  * ladder: compose built-ins before reaching for a custom
  * LogicalPlan/Strategy): union-tag both sides, one window pass per key
  * carrying the last right row forward, filter back to left rows. Exactly
  * one shuffle (hash partition by key) and one per-partition sort — the
  * same cost profile a dedicated sort-merge as-of physical operator would
  * have, but it inherits AQE, codegen and spill handling for free.
  *
  * Tie rule: right rows sort before left rows at equal ts (an event AT the
  * probe time matches), and among equal-ts right rows the largest tie-key
  * wins. Deterministic — mirrored exactly by the oracle SQL.
  */
object AsOfJoin {

  /** Returns one row per left row: (keyCol, tsCol, tieCol) plus
    * `asof_<tsCol>`, `asof_<tieCol>` and `asof_<payload...>` from the
    * matched right row (nulls when no right row precedes).
    *
    * @param keyCol equi key on both sides
    * @param tsCol  event-time column on both sides
    * @param tieCol unique per-row tiebreak column on both sides
    * @param payload extra right-side columns to carry
    */
  /** Native form of [[asOf]]: plans a first-class
    * [[graft.plans.AsOfJoinPlan]] node that a dedicated sort-merge
    * physical operator executes (preference (c) of the ladder — logical
    * node + planner strategy + exec, registered through
    * `SparkSessionExtensions` or, as a fallback here, the session's
    * experimental methods). Same semantics, tie rule and output schema as
    * [[asOf]]; the win is the plan — each side shuffles once by key and
    * right rows never surface as output rows, where the composed form
    * pushes the whole union through a window. */
  def asOfNative(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, payload: Seq[String]): DataFrame =
    asOfNative(left, right, keyCol, tsCol, tieCol, payload, toleranceUs = None)

  /** As [[asOfNative]] with a lookback bound: a right row more than
    * `toleranceUs` microseconds older than the probe is no match (and no
    * older row could be closer, so the result is null) — pandas
    * merge_asof's `tolerance`. */
  def asOfNative(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, payload: Seq[String], toleranceUs: Option[Long]): DataFrame =
    asOfNative(left, right, keyCol, tsCol, tieCol, payload, toleranceUs, "backward")

  /** Full pandas `merge_asof` surface: `direction` is `backward` (most
    * recent right at/before the probe), `forward` (earliest right
    * at/after it; equal-ts ties take the smallest tie key) or `nearest`
    * (closer of the two, exact ties preferring backward). `toleranceUs`
    * bounds the gap in whichever direction(s) apply; event-time columns
    * may be timestamps (µs tolerance) or raw longs. */
  def asOfNative(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, payload: Seq[String], toleranceUs: Option[Long],
      direction: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val spark = left.sparkSession
    // idempotent registration for sessions built without withExtensions
    // (the catalog queries run under the driver's plain session)
    val exp = GraftBridge.experimental(spark)
    if (!GraftBridge.plannerStrategies(spark)
        .exists(_.isInstanceOf[graft.plans.AsOfJoinStrategy]))
      exp.extraStrategies = exp.extraStrategies :+ new graft.plans.AsOfJoinStrategy
    if (!GraftBridge.operatorOptimizationRules(spark).contains(graft.plans.PruneAsOfJoin) &&
        !exp.extraOptimizations.contains(graft.plans.PruneAsOfJoin))
      exp.extraOptimizations = exp.extraOptimizations :+ graft.plans.PruneAsOfJoin

    val lplan = GraftBridge.analyzed(left)
    // Re-alias the right side with fresh exprIds: left and right often
    // derive from the same scan (a self as-of join), and the analyzer's
    // DeduplicateRelations rewrites the conflicting subtree's ids without
    // knowing how to rewrite this node's own attribute fields. Anchoring
    // those fields to fresh alias outputs keeps them valid through the
    // rewrite; the alias Project collapses into the scan projection.
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val rBase = GraftBridge.analyzed(right)
    val rAliases = rBase.output.map(a => Alias(a, a.name)())
    val rplan = Project(rAliases, rBase)
    val rAttrs = rAliases.map(_.toAttribute)
    def lattr(n: String) = lplan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${lplan.output.map(_.name)}"))
    def rattr(n: String) = rAttrs.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${rAttrs.map(_.name)}"))
    val matched = (tsCol +: tieCol +: payload).map(rattr)
    val matchedOut = matched.map(a =>
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    GraftBridge.ofRows(spark, graft.plans.AsOfJoinPlan(
      lplan, rplan, lattr(keyCol), lattr(tsCol),
      rattr(keyCol), rattr(tsCol), rattr(tieCol),
      matched, matchedOut, toleranceUs, direction))
  }

  /** Multi-key as-of join: equi-match on SEVERAL key columns (the
    * (symbol, venue) case) by packing them into one struct column on
    * both sides — struct equality, hashing, and ordering are all native
    * Catalyst, so the single-key plan/exec runs unchanged: one hash
    * exchange per side on the packed key, same merge. The packed column
    * is dropped from the output. */
  def asOfNativeMultiKey(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String, payload: Seq[String],
      toleranceUs: Option[Long] = None, direction: String = "backward"): DataFrame = {
    require(keyCols.nonEmpty)
    val packed = "_asof_key"
    val l = left.withColumn(packed, struct(keyCols.map(col): _*))
    val r = right.withColumn(packed, struct(keyCols.map(col): _*))
    asOfNative(l, r, packed, tsCol, tieCol, payload, toleranceUs, direction)
      .drop(packed)
  }

  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, payload: Seq[String]): DataFrame = {
    val r = right.select(
      col(keyCol).as("_k"), col(tsCol).as("_ts"), col(tieCol).as("_tie"),
      lit(0).as("_tag"),
      struct(col(tsCol).as("ts") +: col(tieCol).as("tie") +:
        payload.map(c => col(c).as(c)): _*).as("_r"))
    val l = left.select(
      col(keyCol).as("_k"), col(tsCol).as("_ts"), col(tieCol).as("_tie"),
      lit(1).as("_tag"),
      lit(null).cast(r.schema("_r").dataType).as("_r"))

    val w = Window.partitionBy("_k")
      .orderBy(col("_ts"), col("_tag"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, 0)

    val matched = r.unionByName(l)
      .withColumn("_last", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)

    val base = matched.select(
      col("_k").as(keyCol), col("_ts").as(tsCol), col("_tie").as(tieCol),
      col("_last"))
    (Seq("ts" -> s"asof_$tsCol", "tie" -> s"asof_$tieCol") ++
      payload.map(c => c -> s"asof_$c"))
      .foldLeft(base) { case (df, (f, name)) =>
        df.withColumn(name, col("_last").getField(f))
      }
      .drop("_last")
  }
}
