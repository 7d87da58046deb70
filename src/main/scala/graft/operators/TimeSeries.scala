package graft.operators

import graft.Ckpt.Ops
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

  /** Subsequence motif discovery over the hourly mean-value series — the
    * Matrix-Profile question ("which two non-overlapping windows of this
    * series are most alike?") answered with the engine's standard
    * bucket-then-verify shape instead of an O(n²) profile: windows are
    * length-`w` hourly subsequences (one per position, assembled with
    * `lead` — series length is TIME-bounded, so the per-series window
    * state never scales with row count; the raw-events → hourly-mean agg
    * is the only data-scale pass and it's partial-aggregatable); each
    * window's PAA signature (segment-pair sums integer-divided by
    * `paaDiv`) is its grid bucket, an equi-join on the signature
    * generates candidates (same-bucket, non-overlapping `pos_a + w <=
    * pos_b`), and candidates verify with the EXACT integer L1 distance.
    * Top-1 per series by (l1, pos_a, pos_b) = the motif. Values are
    * quantised (floor(mean·100)) so every distance is engine-exact; the
    * PAA grid is the documented recall/cost dial — a coarser `paaDiv`
    * admits more candidates, the verify stage stays exact either way. */
  /** Hourly quantised-mean series per event_type with a dense position
    * index: qv = floor(100·mean) computed INTEGER-only (cent-quantise,
    * integer-sum, integer-divide — a double sum would be
    * accumulation-order-dependent). The raw-events → hourly agg is the
    * only data-scale pass and is partial-aggregatable; series length is
    * TIME-bounded so downstream per-series windows never scale with row
    * count. */
  private def hourlyCentSeries(events: DataFrame): DataFrame = {
    val hourly = events
      .withColumn("cents", round(col("value") * 100d, 0).cast("long"))
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(expr("sum(cents) div count(1)").as("qv"))
    hourly.withColumn("pos",
      row_number().over(Window.partitionBy("event_type").orderBy("hr")))
  }

  /** Autocorrelation sufficient statistics per (series, lag), lags
    * 1..maxLag over the hourly quantised-mean series: for each lag the
    * paired frame (x_t, x_{t+lag}) reduced to exact integer moments —
    * n_pairs, num = n·Σxy − Σx·Σy (the autocovariance numerator) and the
    * two variance denominators den_x/den_y. The ratio r = num/√(den_x·
    * den_y) is left to the caller: the product of denominators can
    * overflow int64, and emitting exact integer moments keeps the report
    * bit-identical across engines and partitionings (the library's
    * integer-exact scoring rule). One `lead` window per lag on the
    * TIME-bounded series, then a partial-aggregatable reduce — no
    * self-join, no data-scale window. */
  def autocorrStats(events: DataFrame, maxLag: Int): DataFrame = {
    require(maxLag >= 1)
    val series = hourlyCentSeries(events)
    val byPos = Window.partitionBy("event_type").orderBy("pos")
    val withLeads = (1 to maxLag).foldLeft(series) {
      case (df, l) => df.withColumn(s"y$l", lead(col("qv"), l).over(byPos))
    }
    // unpivot the lag columns into (lag, y) rows so ALL lags reduce in
    // ONE partial-aggregatable pass (a per-lag union would re-aggregate
    // the series frame once per lag — maxLag exchanges instead of one)
    val stacked = withLeads.select(col("event_type"), col("qv"),
      expr(s"stack($maxLag, " +
        (1 to maxLag).map(l => s"${l}L, y$l").mkString(", ") + ") AS (lag, y)"))
      .filter(col("y").isNotNull)
    stacked.groupBy("event_type", "lag")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("qv")).as("sx"), sum(col("y")).as("sy"),
        sum(col("qv") * col("y")).as("sxy"),
        sum(col("qv") * col("qv")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("lag"), col("n_pairs"),
        (col("n_pairs") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n_pairs") * col("sxx") - col("sx") * col("sx")).as("den_x"),
        (col("n_pairs") * col("syy") - col("sy") * col("sy")).as("den_y"))
  }

  /** Hour-of-day seasonal profile per series: for each (event_type,
    * hour-of-day) bucket, the exact integer seasonal index
    * idx_ppm = (bucket_sum · N · 10^6) div (bucket_n · S) — the ratio of
    * bucket mean to series mean kept as ONE integer expression over
    * exact cent sums (no intermediate float mean, no double division
    * chain). Bound: bucket_sum·N·10^6 must fit int64 — holds through
    * sf0.1 (≤1.6e18) and is the documented ceiling; beyond that the
    * index needs a decimal widening, not a different plan. Two
    * partial-aggregatable shuffles (cent agg, 1-row-per-series stats
    * broadcast back). */
  def seasonalProfile(events: DataFrame): DataFrame = {
    val cents = events.withColumn("cents", round(col("value") * 100d, 0).cast("long"))
    val buckets = cents
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
    val totals = cents.groupBy("event_type")
      .agg(count(lit(1)).as("nn"), sum("cents").as("s"))
    buckets.join(broadcast(totals), Seq("event_type"))
      .select(col("event_type"), col("hod"), col("n"), col("sum_cents"),
        expr("(sum_cents * nn * 1000000L) div (n * s)").as("idx_ppm"))
  }

  /** CUSUM changepoint per series over the hourly quantised-mean series:
    * deviations are scaled integers d_t = n·x_t − S (n = series length,
    * S = series sum — so Σd = 0 exactly, no float mean), the CUSUM is
    * their running prefix sum, and the changepoint is the position of the
    * maximum |CUSUM| (ties → earliest). Emits the exact integer CUSUM
    * peak so the split-quality signal is engine-exact. Series stats ride
    * a window over the TIME-bounded series; everything upstream is the
    * partial-aggregatable hourly reduce. */
  def changepointCusum(events: DataFrame): DataFrame = {
    val series = hourlyCentSeries(events)
    val whole = Window.partitionBy("event_type")
    val byPos = Window.partitionBy("event_type").orderBy("pos")
    series
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("s", sum(col("qv")).over(whole))
      .withColumn("d", col("n") * col("qv") - col("s"))
      .withColumn("cusum", sum(col("d")).over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rk", row_number().over(
        whole.orderBy(abs(col("cusum")).desc, col("pos"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("n").as("n_hours"),
        col("pos").cast("long").as("cp_pos"), col("hr").as("cp_hr"),
        col("cusum").as("cusum_peak"))
  }

  /** Holt double-exponential smoothing (level + trend, alpha = beta = 1/2)
    * over the per-type hourly mean series, returning each series' final
    * smoothing state and one-step forecast. The update
    *   level' = (level + trend)/2 + x/2
    *   trend' =  trend/2 + (level' - level)/2
    * uses ONLY halving and add/sub on doubles — both are exact IEEE
    * operations applied in a fixed fold order, so the result is
    * bit-identical across engines (the window_ewma contract, extended to
    * a 2-component state), with no float-summation-order hazard.
    *
    * Scale shape: the hourly aggregation is partial-aggregatable; the fold
    * runs per SERIES over a collect_list bounded by the calendar (hours in
    * the retention window — thousands, not data-scale), the same
    * per-series array contract as [[motifTopK]]. The accumulator rides an
    * aggregate() HOF struct, so the whole op is one shuffle + one
    * map-side fold. */
  def holtSmoothing(events: DataFrame): DataFrame = {
    val hourly = events
      .withColumn("cents", round(col("value") * 100d, 0).cast("long"))
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(expr("sum(cents) div count(1)").as("qv"))
    hourly.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("hr"), col("qv")))).as("s"))
      .select(col("event_type"),
        size(col("s")).cast("long").as("n_hours"),
        aggregate(
          transform(expr("slice(s, 2, size(s) - 1)"), x => x("qv").cast("double")),
          struct(element_at(col("s"), 1)("qv").cast("double").as("level"),
            lit(0.0d).as("trend")),
          (acc, x) => {
            val level2 = (acc("level") + acc("trend")) / lit(2.0d) + x / lit(2.0d)
            struct(level2.as("level"),
              (acc("trend") / lit(2.0d) + (level2 - acc("level")) / lit(2.0d)).as("trend"))
          }).as("st"))
      .select(col("event_type"), col("n_hours"),
        col("st")("level").as("level"), col("st")("trend").as("trend"),
        (col("st")("level") + col("st")("trend")).as("forecast_next"))
  }

  /** STL-style additive decomposition of each per-type hourly series into
    * trend + seasonal + residual — the classical decomposition
    * (Cleveland et al. 1990's shape with a single smoothing pass, the
    * moving-average variant): trend is a centred moving average over
    * ±`halfWindow` positions, the seasonal component is the hour-of-day
    * mean of the detrended series, and the residual is what's left. All
    * three components are EXACT integers (cent-quantised series,
    * sum-div-count means — Spark `div` and DuckDB `//` both truncate
    * toward zero, including on the negative detrended values), so the
    * decomposition is bit-identical across engines and partitionings and
    * recombines exactly: qv = trend + seasonal + resid + the emitted
    * rounding slack is zero by construction since resid is defined as the
    * difference.
    *
    * Scale shape: the raw-events → hourly reduce is the only data-scale
    * pass (partial-aggregatable); the trend window and position index ride
    * per-SERIES keyed windows over the TIME-bounded series (thousands of
    * rows per type, never data-scale); the seasonal profile is a ≤24-row-
    * per-type aggregate broadcast back. Window edges use the clipped
    * window's own count, so the first/last `halfWindow` hours average over
    * fewer points rather than going null. */
  def stlDecompose(events: DataFrame, halfWindow: Int): DataFrame = {
    require(halfWindow >= 1)
    val series = hourlyCentSeries(events)
    val detr = series
      .withColumn("trend",
        expr(s"sum(qv) OVER (PARTITION BY event_type ORDER BY pos " +
          s"ROWS BETWEEN $halfWindow PRECEDING AND $halfWindow FOLLOWING) div " +
          s"count(qv) OVER (PARTITION BY event_type ORDER BY pos " +
          s"ROWS BETWEEN $halfWindow PRECEDING AND $halfWindow FOLLOWING)"))
      .withColumn("detr", col("qv") - col("trend"))
      .withColumn("hod", hour(col("hr")).cast("long"))
    val seasonal = detr.groupBy("event_type", "hod")
      .agg(expr("sum(detr) div count(1)").as("seasonal"))
    detr.join(broadcast(seasonal), Seq("event_type", "hod"))
      .select(col("event_type"), col("pos").cast("long").as("pos"),
        date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hr_s"),
        col("qv"), col("trend"), col("seasonal"),
        (col("qv") - col("trend") - col("seasonal")).as("resid"))
  }

  /** Theil-Sen robust trend per event-type hourly series: the MEDIAN of
    * all pairwise slopes — the trend estimator with a 29% breakdown
    * point, immune to the outliers that drag an OLS slope (the reason a
    * drift monitor prefers it). Each pairwise slope is the exact integer
    * (Δcents·10⁶) div Δhours with sign-magnitude truncating division
    * (identical in both engines on the non-negative magnitudes); only
    * the median is float (the anomaly_mad percentile pairing, round 6).
    *
    * Scale shape: the raw-events → hourly reduce is the only data-scale
    * pass. The slope stage is LENGTH-GATED per series (see
    * [[theilSenFromHourly]]): series up to [[TheilSenExactGate]] points
    * run the exact all-pairs median (fixtures top out at 720); longer
    * series dispatch to windowed Theil-Sen — n·W pairs instead of n²,
    * with a bounded exact-percentile buffer per window — so a 10-year
    * 87k-point monitor costs ~22M slope rows, not 3.8G, and nothing
    * OOMs the percentile buffer. */
  def theilSenTrend(events: DataFrame): DataFrame =
    theilSenFromHourly(
      events
        .withColumn("cents", round(col("value") * 100d, 0).cast("long"))
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(expr("sum(cents) div count(1)").as("qv")))

  /** Per-series point count above which the exact all-pairs slope
    * median dispatches to the windowed form: 4096² ≈ 8.4M pair rows and
    * a same-sized percentile buffer per series is the accepted exact
    * ceiling; every fixture (≤720 points) stays exact. */
  val TheilSenExactGate = 4096

  /** Window width (points) for the windowed form: W² = 65k slopes per
    * window bound the per-group percentile buffer; total slope rows are
    * n·W ≈ linear in series length. */
  val TheilSenWindow = 256

  /** The slope/median stage from an already-reduced (event_type, hr, qv)
    * hourly frame — shared by the batch form and the streaming twin
    * whose mergeable state is the (Σcents, n) hourly cube.
    *
    * Length-gated dispatch, decided per series inside one plan:
    *
    *  - n ≤ [[TheilSenExactGate]]: the classical estimator — median of
    *    ALL n(n−1)/2 pairwise slopes.
    *  - n > gate: WINDOWED Theil-Sen (median-of-medians): slopes pair
    *    only within calendar-aligned windows of [[TheilSenWindow]]
    *    points — window id = `hrs div W` where `hrs` is the hour index
    *    (unix seconds already divided by 3600), so boundaries are
    *    deterministic and data-independent — per-window exact slope
    *    median, then the median of window medians. n·W/2 pair rows
    *    instead of n²/2, every percentile buffer ≤ W²/2 values;
    *    robustness is preserved (each window median has the 29%
    *    breakdown point; the outer median tolerates corrupt windows),
    *    at the price of ignoring cross-window pairs — the long-baseline
    *    pairs whose slopes cluster tightest around the trend anyway,
    *    making the windowed estimate a strictly finer-variance family
    *    member, not a different statistic.
    *
    * `n_pairs` reports the pairs the estimate actually aggregated, so
    * its meaning follows the arm: all n(n−1)/2 pairs below the gate,
    * the Σ of WITHIN-window pair counts above it (≈ n·W/2 — NOT
    * comparable to the exact arm's count; a series' arm is decidable
    * from the reported n_points vs [[TheilSenExactGate]]).
    *
    * The gate is a count over the already-reduced calendar-bounded
    * frame (broadcast back), so both branches stay in one lazy plan and
    * only the qualifying series reach each side's exchanges. The hourly
    * frame is localCheckpointed first: it is group-cardinality-sized
    * (series × hours), and the checkpoint stops the data-scale
    * events→hourly reduce from re-running once per consumer (gate
    * count, both self-join sides, final join — 4× before this). Fixtures
    * never cross the gate, so the oracle mirrors only the exact arm. */
  private[graft] def theilSenFromHourly(hourly: DataFrame): DataFrame = {
    val s = hourly
      .withColumn("hrs", expr("unix_timestamp(hr) div 3600"))
      .graftCheckpoint()
    val counts = s.groupBy("event_type").agg(count(lit(1)).as("n_points"))
    val sized = s.join(broadcast(counts), Seq("event_type"))

    def pairSlopes(df: DataFrame, keys: Seq[String]): DataFrame = {
      val keyCols = ("event_type" +: keys)
      val a = df.select((keyCols.map(col) :+
        col("qv").as("qa")) :+ col("hrs").as("ha"): _*)
      val b = df.select((keyCols.map(col) :+
        col("qv").as("qb")) :+ col("hrs").as("hb"): _*)
      a.join(b, keyCols)
        .filter(col("ha") < col("hb"))
        .select(keyCols.map(col) :+
          expr("""(CASE WHEN qb - qa < 0 THEN -1 ELSE 1 END) *
                 |((abs(qb - qa) * 1000000) div (hb - ha))""".stripMargin)
            .as("slope"): _*)
    }

    val exact = pairSlopes(sized.filter(col("n_points") <= TheilSenExactGate), Nil)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile(slope, 0.5)").as("m"))

    val windowed = pairSlopes(
        sized.filter(col("n_points") > TheilSenExactGate)
          .withColumn("win", expr(s"hrs div $TheilSenWindow")),
        Seq("win"))
      .groupBy("event_type", "win")
      .agg(count(lit(1)).as("wp"), expr("percentile(slope, 0.5)").as("wm"))
      .groupBy("event_type")
      .agg(sum("wp").as("n_pairs"), expr("percentile(wm, 0.5)").as("m"))

    exact.unionByName(windowed)
      .join(counts, Seq("event_type"))
      .select(col("event_type"), col("n_points"), col("n_pairs"),
        round(col("m"), 6).as("slope_ppm_per_hr"))
  }

  /** Shape similarity between every event-type pair's HOUR-OF-DAY
    * profile by banded dynamic time warping — "do these two metrics have
    * the same daily rhythm, possibly phase-shifted?", the elastic
    * distance a seasonal-shape clustering keys on where pointwise L1
    * punishes any phase offset. Profiles are exact integer mean cents
    * per hour-of-day (≤24 points per series); the DP runs in the
    * `graft_dtw_band` native expression (two-row kernel, zero per-cell
    * allocation) with the Sakoe-Chiba band a plan-time literal —
    * band ≥ 24 is full DTW, band = 0 degenerates to pointwise L1.
    *
    * Scale shape: ONE data-scale partial-aggregatable reduce to
    * |types|×24 profile rows; the pair self-join and per-pair DP run on
    * the |types|-row profile frame — group-cardinality, never
    * data-scale. DTW cost is exact int64 (cents along the optimal
    * path), bit-identical across engines. */
  def dtwProfileDistances(events: DataFrame, band: Int): DataFrame =
    dtwFromHodProfiles(
      events
        .withColumn("cents", round(col("value") * 100d, 0).cast("long"))
        .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
        .agg(expr("sum(cents) div count(1)").as("qv")),
      band)

  /** The pair/DP stage from an already-reduced (event_type, hod, qv)
    * profile frame — shared by the batch form and the streaming twin
    * whose mergeable state is the (Σcents, n) hour-of-day cube. */
  private[graft] def dtwFromHodProfiles(hodProfile: DataFrame, band: Int): DataFrame = {
    graft.expressions.GraftFunctions.register(hodProfile.sparkSession)
    val prof = hodProfile
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("hod"), col("qv")))).as("p"))
      .select(col("event_type"), expr("transform(p, x -> x.qv)").as("arr"))
    prof.as("a").join(prof.as("b"), col("a.event_type") < col("b.event_type"))
      .select(
        col("a.event_type").as("et_a"), col("b.event_type").as("et_b"),
        size(col("a.arr")).cast("long").as("n_a"),
        size(col("b.arr")).cast("long").as("n_b"),
        call_function("graft_dtw_band",
          col("a.arr"), col("b.arr"), lit(band)).as("dtw_cost"))
  }

  /** Seasonality-aware anomaly screen: flag hours whose STL RESIDUAL
    * deviates more than k × MAD from the series' median residual. The
    * plain median/MAD screen ([[madAnomalies]]) flags every rush hour of
    * a strongly seasonal series; screening the residual instead asks
    * "is this hour surprising GIVEN the trend and the time-of-day
    * profile" — the question an operational anomaly page actually wants.
    * Composes [[stlDecompose]] (exact integer residuals) with the same
    * two exact-percentile passes and float policy (round 6) as the MAD
    * screen.
    *
    * Scale shape: inherits STL's one data-scale hourly reduce; the
    * median/MAD aggregations and the flagging run on the TIME-bounded
    * series rows, group cardinality ≤ |event types| → results broadcast
    * back. */
  def stlResidualAnomalies(events: DataFrame, halfWindow: Int, k: Double): DataFrame = {
    val stl = stlDecompose(events, halfWindow)
    val med = stl.groupBy("event_type")
      .agg(expr("percentile(resid, 0.5)").as("med"))
    val dev = stl.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("resid") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .filter(col("adev") > lit(k) * col("mad"))
      .select(col("event_type"), col("pos"), col("hr_s"), col("qv"),
        col("resid"), round(col("med"), 6).as("med"),
        round(col("mad"), 6).as("mad"))
  }

  /** Lagged cross-correlation sufficient statistics between every ORDERED
    * pair of distinct event-type hourly series, lags 0..`maxLag` — "does
    * series B follow series A h hours later?", the lead/lag discovery
    * primitive behind metric root-causing and feature-lag selection. Both
    * orientations are emitted ((A,B) and (B,A), each with B lagging A by
    * 0..maxLag), so an A-follows-B relationship surfaces as the (B,A) row
    * — an `et_a < et_b` screen would silently halve the discovery space.
    * Series align on ABSOLUTE epoch hours (not per-series positions, which
    * would slip wherever one series has a gap); for each lag the pair
    * frame (a@t, b@t+lag) reduces to the same exact integer moments as
    * [[autocorrStats]] — n_pairs, num = n·Σxy − Σx·Σy, den_a, den_b — and
    * the float ratio is left to the caller (den products can overflow
    * int64; integer moments stay engine-exact).
    *
    * Scale shape: one data-scale partial-aggregatable hourly reduce; the
    * lag fan-out explodes the TIME-bounded series `maxLag+1` ways and
    * equi-joins on the single shifted-hour key (series-length-scale
    * shuffle, never data-scale); the moment reduce is
    * partial-aggregatable. */
  def crossCorrStats(events: DataFrame, maxLag: Int): DataFrame = {
    require(maxLag >= 0)
    val series = hourlyCentSeries(events)
      .withColumn("hrs", expr("unix_timestamp(hr) div 3600"))
    val a = series.select(col("event_type").as("et_a"), col("qv").as("xa"),
        col("hrs"), explode(sequence(lit(0L), lit(maxLag.toLong))).as("lag"))
      .withColumn("hrs_b", col("hrs") + col("lag"))
    val b = series.select(col("event_type").as("et_b"), col("qv").as("xb"),
      col("hrs").as("hrs_b"))
    a.join(b, Seq("hrs_b")).filter(col("et_a") =!= col("et_b"))
      .groupBy("et_a", "et_b", "lag")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("xa")).as("sa"), sum(col("xb")).as("sb"),
        sum(col("xa") * col("xb")).as("sab"),
        sum(col("xa") * col("xa")).as("saa"),
        sum(col("xb") * col("xb")).as("sbb"))
      .select(col("et_a"), col("et_b"), col("lag"), col("n_pairs"),
        (col("n_pairs") * col("sab") - col("sa") * col("sb")).as("num"),
        (col("n_pairs") * col("saa") - col("sa") * col("sa")).as("den_a"),
        (col("n_pairs") * col("sbb") - col("sb") * col("sb")).as("den_b"))
  }

  def motifTopK(events: DataFrame, w: Int, paaDiv: Long, k: Int): DataFrame = {
    require(w % 2 == 0, "window length must be even (PAA segment pairs)")
    // qv = floor(100·mean) computed INTEGER-only: cent-quantise each value
    // (round(value·100) — exact for 2-decimal data), integer-sum, integer-
    // divide. A double sum would be accumulation-order-dependent.
    val hourly = events
      .withColumn("cents", round(col("value") * 100d, 0).cast("long"))
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(expr("sum(cents) div count(1)").as("qv"))
    val byHr = Window.partitionBy("event_type").orderBy("hr")
    val series = hourly.withColumn("pos", row_number().over(byHr))
    val byPos = Window.partitionBy("event_type").orderBy("pos")
    val withLeads = (1 until w).foldLeft(series.withColumn("v0", col("qv"))) {
      case (df, i) => df.withColumn(s"v$i", lead(col("qv"), i).over(byPos))
    }.filter(col(s"v${w - 1}").isNotNull)
    val sigCols = (0 until w / 2).map(s =>
      expr(s"(v${2 * s} + v${2 * s + 1}) div ${paaDiv}L").as(s"p$s"))
    val keyed = withLeads.select(
      (col("event_type") +: col("pos").as("pos") +:
        (0 until w).map(i => col(s"v$i"))) ++ sigCols: _*)
    val a = keyed.select(col("event_type") +: col("pos").as("pos_a") +:
      (0 until w).map(i => col(s"v$i").as(s"a$i")) ++:
      (0 until w / 2).map(s => col(s"p$s")): _*)
    val b = keyed.select(col("event_type").as("et_b") +: col("pos").as("pos_b") +:
      (0 until w).map(i => col(s"v$i").as(s"b$i")) ++:
      (0 until w / 2).map(s => col(s"p$s").as(s"q$s")): _*)
    val sigMatch = (0 until w / 2).map(s => col(s"p$s") === col(s"q$s"))
      .reduce(_ && _)
    val l1 = (0 until w).map(i => abs(col(s"a$i") - col(s"b$i")))
      .reduce(_ + _)
    a.join(b,
        col("event_type") === col("et_b") && sigMatch &&
          col("pos_a") + w <= col("pos_b"))
      .withColumn("l1", l1)
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("l1"), col("pos_a"), col("pos_b"))))
      .filter(col("rk") <= k)
      .select(col("event_type"), col("rk").cast("long").as("rk"),
        col("pos_a").cast("long").as("pos_a"), col("pos_b").cast("long").as("pos_b"),
        col("l1"))
  }
}
