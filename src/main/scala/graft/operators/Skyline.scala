package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto frontier): rows minimizing both
  * `cents` and `days` — a row survives iff no other row is ≤ in both
  * dims and < in at least one.
  *
  * The classic formulation is an all-pairs NOT EXISTS; the previous
  * join-free form here used a GLOBAL no-partition range window, which
  * Spark executes on a SINGLE partition (the documented WindowExec
  * scale-killer). This version keeps the O(n log n) join-free idea but
  * distributes the sort:
  *
  *  1. value-bucket on `cents` by approximate quantiles (equal cents
  *     always co-bucket, lower buckets are strictly cheaper);
  *  2. ONE window pass per bucket — partitionBy(bucket) orderBy(cents)
  *     computes the strictly-cheaper running min, the same-price min
  *     (range frame [0,0]) and nothing else, all three frames sharing
  *     the same shuffle+sort;
  *  3. per-bucket day-minima (one map-side-combined aggregate,
  *     bucket-count rows) fold into an EXCLUSIVE prefix-min on the
  *     driver — metadata-scale, ≤ `buckets` values — and rejoin as an
  *     array literal indexed by bucket (codegen'd `element_at`, no
  *     extra join, no single-partition window anywhere).
  *
  * A row's global strictly-cheaper min is then
  * least(in-bucket running min, lower-bucket prefix min); the survivor
  * predicate is unchanged from the single-window form, so the output is
  * bit-identical. Three passes over the input (quantile probe,
  * per-bucket minima, windowed filter), each fully parallel — the plan
  * that survives a 100× scale-up, unlike the one-task global window.
  */
object Skyline {

  val DefaultBuckets = 32

  /** `points` must carry BIGINT columns `cents` and `days`; all columns
    * of frontier rows are returned unchanged.
    *
    * Skew caveat: the quantile bounds are DEDUPLICATED (equal cents must
    * co-bucket for the prefix-min to be exact), so a value distribution
    * dominated by one cents value collapses to few buckets and the
    * per-bucket window re-concentrates those rows on few tasks — the
    * hazard this rewrite removes for spread-out data returns for
    * near-constant data. A warning is logged when the distinct bounds
    * fall below half the requested buckets; the equal-cents run cannot
    * be salted without breaking the range-frame same-price min, so the
    * mitigation at scale is pre-aggregating duplicate (cents, days)
    * pairs (order-invariant for the frontier) before calling this. */
  def paretoMin(points: DataFrame, buckets: Int = DefaultBuckets): DataFrame = {
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    // value-based bucket bounds: deterministic given the data, and the
    // bucket id is a pure function of cents, so re-execution of any
    // branch assigns identical buckets (unlike spark_partition_id over
    // a sampled RangePartitioner, which can shift between actions)
    val bounds =
      if (probes.isEmpty) Array.empty[Long]
      else points.stat.approxQuantile("cents", probes, 0.001)
        .map(_.toLong).distinct.sorted
    if (probes.nonEmpty && bounds.length < (buckets - 1) / 2)
      System.err.println(
        s"[skyline] cents distribution collapsed ${buckets - 1} quantile probes " +
          s"to ${bounds.length} distinct bounds — heavy value skew; per-bucket " +
          "windows will concentrate (see paretoMin scaladoc)")
    val bucketCol =
      if (bounds.isEmpty) lit(0)
      // count of bounds strictly below cents — a monotone step function,
      // codegen'd as a chain of whens (no higher-order-function fallback)
      else bounds.map(b => when(col("cents") > lit(b), 1).otherwise(0))
        .reduce(_ + _)
    val pts = points.withColumn("sky_bucket", bucketCol)
    // per-bucket day minima: bucket-count rows to the driver (≤ buckets,
    // data-size-independent — the same metadata-scale collect contract
    // as the quantile probe above)
    val perBucket = pts.groupBy("sky_bucket").agg(min("days").as("bm"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nBuckets = bounds.length + 1
    val prefix = new Array[java.lang.Long](nBuckets)
    var run: java.lang.Long = null
    for (b <- 0 until nBuckets) {
      prefix(b) = run // EXCLUSIVE prefix: min of strictly lower buckets
      perBucket.get(b).foreach { m =>
        if (run == null || m < run.longValue) run = m
      }
    }
    val prefLit = array(prefix.map(v =>
      if (v == null) lit(null).cast("long") else lit(v.longValue)): _*)
    val w = Window.partitionBy("sky_bucket").orderBy("cents")
    pts
      .withColumn("sky_mdc_local",
        min("days").over(w.rangeBetween(Window.unboundedPreceding, -1)))
      .withColumn("sky_mds", min("days").over(w.rangeBetween(0, 0)))
      .withColumn("sky_pmin", element_at(prefLit, col("sky_bucket") + 1))
      // least() skips NULLs (Postgres semantics): no cheaper row in the
      // bucket AND an empty lower prefix ⇒ NULL ⇒ undominated-by-cheaper
      .withColumn("sky_mdc", least(col("sky_mdc_local"), col("sky_pmin")))
      .filter(
        (col("sky_mdc").isNull || col("sky_mdc") > col("days")) &&
          col("sky_mds") === col("days"))
      .select(points.columns.map(col): _*)
  }
}
