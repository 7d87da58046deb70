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
    * between shuffling the table and shuffling the hot keys. */
  def heavyHitters(df: DataFrame, keyCol: String, threshold: Long,
                   depth: Int = 4, width: Int = 1 << 14): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val sketch = df
      .agg(call_function("graft_cms_sketch", col(keyCol), lit(depth), lit(width)))
      .head().getAs[Array[Byte]](0)
    df.filter(call_function("graft_cms_lookup", col(keyCol), lit(sketch)) >= threshold)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }
}
