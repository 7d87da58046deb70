package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series regularisation and robust anomaly screening over the
  * `events` stream — the feed-preparation ops a metrics/feature pipeline
  * needs before windowed models: a dense hourly spine with forward-fill,
  * and median/MAD outlier flagging.
  *
  * Scale posture: the spine is generated distributed (`sequence` +
  * `explode` per user — no driver loop, no crossJoin against a global
  * calendar), the fill window partitions by user (thousands of independent
  * partitions, no global sort), and the MAD pass is two partial-aggregatable
  * shuffles on a 5-value group key plus a broadcast join back.
  */
object TimeSeries {

  /** Dense hourly grid per user from their first to last active hour;
    * missing hours get n_events=0, gap=true, and value forward-filled from
    * the last observed hour. Exact decimal sums; the fill itself is a
    * per-user running `last(ignoreNulls)` — rows-preserving, keyed window. */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("v"), count(lit(1)).as("n_events"))
    val spine = hourly.groupBy("user_id")
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
    spine.join(hourly, Seq("user_id", "h"), "left")
      .select(
        col("user_id"), col("h"),
        col("v").isNull.as("gap"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("v"), ignoreNulls = true)
          .over(Window.partitionBy("user_id").orderBy("h")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("v_fill"))
  }

  /** Median/MAD anomaly screen per event_type: flag rows with
    * |value - median| > k * MAD (MAD = median absolute deviation). Robust
    * to the outliers it hunts, unlike z-scores. Two exact-percentile
    * aggregation passes (tiny group cardinality -> results broadcast back);
    * the row-level flagging is a narrow map. */
  def madAnomalies(events: DataFrame, k: Double): DataFrame = {
    val med = events.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = events.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .filter(col("adev") > lit(k) * col("mad"))
      .select(
        col("event_id"), col("event_type"), col("value"),
        round(col("med"), 6).as("med"),
        round(col("mad"), 6).as("mad"))
  }
}
