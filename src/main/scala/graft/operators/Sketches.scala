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
}
