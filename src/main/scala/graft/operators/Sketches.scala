package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-accelerated aggregations. The shape shared by both entry
  * points here: ONE bounded-memory mergeable sketch pass (partial
  * aggregation — tasks ship `O(sketch)` bytes, never rows), then use the
  * sketch to cut the expensive exact pass down to the rows that matter.
  */
object Sketches {

  /** Exact heavy hitters via a Count-Min prefilter: keys whose true
    * count >= threshold, with their exact counts.
    *
    * Pass 1 builds one CMS over the key column (driver receives
    * `depth*width` longs, not rows). Pass 2 keeps only rows whose
    * ESTIMATE reaches the threshold — since a CMS can only overcount,
    * no true heavy hitter is lost, and because the estimate is a pure
    * function of the key, every row of a surviving key survives: the
    * exact groupBy after the filter counts full key groups. The final
    * HAVING removes the overcount-only false positives. Result: exact
    * answers, but the groupBy's shuffle carries only candidate-key rows
    * — at 100 TB with a selective threshold, that's the difference
    * between shuffling the table and shuffling the hot keys.
    *
    * The sketch is passed to [[graft.expressions.CmsLookupExpr]] as a
    * driver-held reference object (no `lit(bytes)` in the plan — see
    * [[RuntimeFilter.bloomPrefilter]] for why).
    *
    * Determinism precondition: `df` is scanned twice (sketch pass, then
    * the filtered exact pass), so its rows must be stable across
    * re-evaluation — a nondeterministic source (unseeded sample, a
    * directory re-listed between passes) can lose true heavy hitters.
    * Persist such a frame before calling, or cut at a checkpoint; stable
    * file scans (the normal case) need nothing. */
  def heavyHitters(df: DataFrame, keyCol: String, threshold: Long,
                   depth: Int = 4, width: Int = 1 << 14): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val sketch = df
      .agg(call_function("graft_cms_sketch", col(keyCol), lit(depth), lit(width)))
      .head().getAs[Array[Byte]](0)
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val estimate = GraftBridge.column(graft.expressions.CmsLookupExpr(
      UnresolvedAttribute(keyCol), new graft.expressions.GraftCms(sketch)))
    df.filter(estimate >= threshold)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }

  /** Equi-width histogram quantile sketch: the mergeable quantile
    * estimator (t-digest/KLL's fixed-grid cousin — deterministic, so it
    * oracle-checks exactly where rank-sketches can't). Values bucket to
    * `floor(value/width)` clamped to [0, buckets); the per-group
    * histogram is one partial-aggregatable count — tasks ship at most
    * `buckets` longs per group, never rows — and the p-th percentile
    * estimate is the upper edge of the first bucket whose cumulative
    * count reaches ceil(p·n/100), computed with INTEGER arithmetic
    * ((n·p + 99) div 100) so estimates are engine-exact. Resolution is
    * the declared bucket width: the scan-free trade every histogram
    * sketch makes. Returns (group, pct, n, bucket, est_upper). */
  def histQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      bucketWidth: Double, numBuckets: Int, pcts: Seq[Int]): DataFrame =
    quantilesFromHist(
      bucketize(df, valueCol, bucketWidth, numBuckets)
        .groupBy(col(groupCol), col("b")).agg(count(lit(1)).as("c")),
      groupCol, bucketWidth, pcts)

  /** Adds bucket column `b`: floor(value/width) clamped to [0, buckets). */
  def bucketize(df: DataFrame, valueCol: String,
      bucketWidth: Double, numBuckets: Int): DataFrame =
    df.withColumn("b", least(greatest(floor(col(valueCol) / bucketWidth), lit(0d))
      .cast("long"), lit(numBuckets - 1L)))

  /** Grouped Gini coefficient from the bounded bucket histogram — the
    * inequality metric without a global per-group rank pass: per bucket
    * (count c_b, value mass s_b in integer units), the Lorenz-trapezoid
    * term T = Σ_b c_b·(2·cumS_b − s_b) gives G = 1 − T/(N·S). Returns
    * the EXACT integers (n, sum_units, lorenz_t) plus the convenience
    * g_ppm = 1e6 − T div max((N·S) div 1e6, 1) (clamped denominator:
    * a group with under 1e6 total units would zero it — ANSI division
    * error). Values within a bucket are treated as equal — the standard
    * grouped-Gini approximation, bias bounded by the bucket width.
    * Shuffles: one partial-aggregatable histogram + a per-group
    * cumulative over ≤`numBuckets` rows. */
  def histGini(df: DataFrame, groupCol: String, unitsCol: String,
      bucketWidth: Long, numBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df
      .withColumn("b", least(expr(s"$unitsCol div ${bucketWidth}L"),
        lit(numBuckets - 1L)))
      .groupBy(col(groupCol), col("b"))
      .agg(count(lit(1)).as("c"), sum(col(unitsCol)).as("s"))
    hist.withColumn("cum_s", sum(col("s")).over(
        Window.partitionBy(groupCol).orderBy("b")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(groupCol))
      .agg(sum(col("c")).as("n"), sum(col("s")).as("sum_units"),
        sum(col("c") * (lit(2L) * col("cum_s") - col("s"))).as("lorenz_t"))
      .select(col(groupCol), col("n"), col("sum_units"), col("lorenz_t"),
        (lit(1000000L) -
          expr("lorenz_t div greatest((n * sum_units) div 1000000L, 1L)")).as("g_ppm"))
  }

  /** Percentile walk over a (group, b, c) histogram frame — shared by the
    * direct and rolled-up forms, which is the point: histograms merge by
    * plain count addition, so a quantile computed from merged daily
    * sketches is IDENTICAL to one computed from raw rows. */
  def quantilesFromHist(hist: DataFrame, groupCol: String,
      bucketWidth: Double, pcts: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cum = hist
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(groupCol).orderBy("b")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(groupCol)))
    cum.select(col(groupCol), col("b"), col("cum"), col("n"),
        explode(typedLit(pcts.map(_.toLong))).as("pct"))
      .filter(col("cum") >= expr("(n * pct + 99L) div 100L"))
      .groupBy(col(groupCol), col("pct"), col("n"))
      .agg(min(col("b")).as("bucket"))
      .withColumn("est_upper", (col("bucket") + 1L) * bucketWidth)
      .select(col(groupCol), col("pct"), col("n"), col("bucket"), col("est_upper"))
  }
}
