package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Staging._

/** Product-analytics and sketch operators over the `events` stream table —
  * the query family a training-data platform's companion analytics tier
  * runs (funnel conversion, cohort retention, cardinality estimation).
  * Each is oracle-checked against DuckDB (see [[Oracles]]).
  */
object AnalyticsQueries {

  /** Strict-sequence conversion funnel signup → view → click → purchase:
    * a user counts for step N only with an event strictly after their
    * step-N-1 entry time. Four conditional aggregations over `events`,
    * every one keyed on `user_id`: after the first shuffle the join and
    * every later aggregation reuse that hash partitioning (AQE exchange
    * reuse), so the plan costs ONE wide shuffle of the events table plus
    * three co-partitioned map-side passes — no pair blowup, no windows.
    * Each stage's scan filter-pushes its `event_type` to the parquet scan.
    * At 100 TB the same shape holds: stage frames are |users| rows, far
    * smaller than events, and every join key is already clustered. */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "events").select(col("user_id"), col("ts"), col("event_type"))
    def stage(t: String, prev: Option[DataFrame]): DataFrame = prev match {
      case None =>
        e.filter(col("event_type") === t)
          .groupBy("user_id").agg(min("ts").as("entry_ts"))
      case Some(p) =>
        e.filter(col("event_type") === t)
          .join(p.select(col("user_id"), col("entry_ts").as("prev_ts")), "user_id")
          .filter(col("ts") > col("prev_ts"))
          .groupBy("user_id").agg(min("ts").as("entry_ts"))
    }
    val s1 = stage("signup", None)
    val s2 = stage("view", Some(s1))
    val s3 = stage("click", Some(s2))
    val s4 = stage("purchase", Some(s3))
    val steps = Seq("signup" -> s1, "view" -> s2, "click" -> s3, "purchase" -> s4)
    steps.zipWithIndex.map { case ((name, df), i) =>
      df.agg(count("*").as("n_users"))
        .select(lit(i + 1).as("step"), lit(name).as("stage"), col("n_users"))
    }.reduce(_ unionByName _).orderBy("step")
  }

  /** Last-touch attribution: each purchase is credited to the user's most
    * recent click at-or-before it (event-time order, event_id tie-break —
    * deterministic), reported per attributed-click DAY; purchases with no
    * preceding click land on a NULL day. ONE pass over events: a per-user
    * running "last click ts" (last_value IGNORE NULLS over the event-time
    * frame) — no purchase×click self-join, so the scale cost is a single
    * shuffle on user_id with bounded per-user window state. Values are
    * summed as exact DECIMAL cents and emitted as double (typed_agg's
    * float policy). */
  def funnelAttribution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tbl(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value").cast("decimal(18,2)").as("v"))
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(date_format(col("last_click_ts"), "yyyy-MM-dd").as("click_day"))
      .agg(count(lit(1)).as("n_purchases"), sum("v").cast("double").as("sum_value"))
      .orderBy("click_day")
  }

  /** Weekly cohort retention: cohort = Monday week of a user's first
    * event; for each (cohort, week offset) count the users active that
    * week. Two aggregations on `user_id`/(user, week) + one broadcast-able
    * join of the per-user cohort frame (|users| rows) back onto the
    * distinct activity frame. Cohort tables are the canonical "is our data
    * flywheel retaining contributors" question; the output is
    * |weeks| x |weeks| — tiny at any corpus scale. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "events")
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
    val cohort = e.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    val active = e.distinct()
    active.join(cohort, "user_id")
      .groupBy(col("cohort_wk"), expr("datediff(wk, cohort_wk) div 7").as("week_no"))
      .agg(countDistinct("user_id").as("n_users"))
      .select(date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_week"),
        col("week_no"), col("n_users"))
      .orderBy("cohort_week", "week_no")
  }

  /** HyperLogLog distinct-count per event_type, declared entirely in
    * DataFrame ops so Catalyst keeps partial aggregation — the sketch IS
    * the (bucket → max rho) frame, and `max` is HLL's merge, so map-side
    * combine builds per-partition registers and the shuffle carries at
    * most 64 rows per group: the exact property that makes HLL the
    * 100 TB cardinality sketch. m=64 registers; key = event_id % 997
    * (mirrors sketch_kmv_distinct so the two sketches are comparable on
    * the same ground truth).
    *
    * Cross-engine determinism: the scrambled polynomial hash (CrossFns),
    * rho from the binary-string length (`conv(w,10,2)` here ≡ DuckDB
    * `bin(w)` — no float log2), 2^-rho as exact 1.0/(1L<<rho), and the
    * harmonic sum over ≤64 exact powers of two is itself exact, so the
    * one alpha*m²/S division is the single rounding step in both engines.
    * Raw HLL estimate (no small-range correction — documented bias below
    * ~2.5m; the exact count rides alongside for the eval). */
  def sketchHllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "events")
      .select(col("event_type"),
        graft.functions.CrossFns.scrambledHash(expr("cast(event_id % 997 as string)")).as("hv"))
      .distinct()
    val regs = e
      .withColumn("bucket", col("hv") % 64)
      .withColumn("w", expr("hv div 64"))
      .withColumn("rho", when(col("w") === 0, lit(25))
        .otherwise(lit(25) - length(conv(col("w"), 10, 2))))
      .groupBy("event_type", "bucket").agg(max("rho").as("m"))
    val est = regs.groupBy("event_type")
      .agg(sum(lit(1.0) / expr("shiftleft(1L, cast(m as int))")).as("s_present"),
        count("*").as("n_present"))
      .select(col("event_type"),
        (lit(0.709) * lit(4096.0) /
          (col("s_present") + (lit(64) - col("n_present")))).as("hll_est"))
    val exact = tbl(spark, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct(expr("event_id % 997")).as("exact"))
    est.join(exact, "event_type").orderBy("event_type")
  }

  /** HLL register ROLLUP — the re-aggregation property in action: daily
    * (event_type, day, bucket → max rho) register tables roll up to the
    * all-time sketch with another max per bucket, and because max is
    * associative the rolled-up estimate is BIT-IDENTICAL to the estimate
    * computed directly from raw data (both emitted; oracle pins both).
    * This is the warehouse sketch-rollup-table pattern: persist tiny
    * per-day register frames (≤64 rows per group), answer any coarser
    * distinct-count later without rescanning events — at 100 TB the
    * rollup reads register rows, not data. */
  def sketchHllRollup(spark: SparkSession, dir: String): DataFrame = {
    def hv(e: DataFrame) = e.select(col("event_type"),
      date_format(col("ts"), "yyyy-MM-dd").as("day"),
      graft.functions.CrossFns.scrambledHash(expr("cast(event_id % 997 as string)")).as("hv"))
    def regs(df: DataFrame, keys: Seq[String]): DataFrame = df
      .withColumn("bucket", col("hv") % 64)
      .withColumn("w", expr("hv div 64"))
      .withColumn("rho", when(col("w") === 0, lit(25))
        .otherwise(lit(25) - length(conv(col("w"), 10, 2))))
      .groupBy((keys :+ "bucket").map(col): _*).agg(max("rho").as("m"))
    def estimate(r: DataFrame, alias: String): DataFrame = r
      .groupBy("event_type")
      .agg(sum(lit(1.0) / expr("shiftleft(1L, cast(m as int))")).as("s_present"),
        count("*").as("n_present"))
      .select(col("event_type"),
        (lit(0.709) * lit(4096.0) /
          (col("s_present") + (lit(64) - col("n_present")))).as(alias))
    // fine-grained daily registers, max-merged up to event_type
    val daily = regs(hv(tbl(spark, dir, "events")).distinct(), Seq("event_type", "day"))
    val rolled = daily.groupBy("event_type", "bucket").agg(max("m").as("m"))
    val estRollup = estimate(rolled, "hll_est_rollup")
    // direct path from a fresh scan (separate lineage)
    val direct = regs(hv(tbl(spark, dir, "events"))
      .select("event_type", "hv").distinct(), Seq("event_type"))
    val estDirect = estimate(direct, "hll_est_direct")
    val exact = tbl(spark, dir, "events").groupBy("event_type")
      .agg(countDistinct(expr("event_id % 997")).as("exact"))
    estRollup.join(estDirect, "event_type").join(exact, "event_type")
      .orderBy("event_type")
  }

  /** Histogram quantile sketch over the value column, per event type —
    * the deterministic fixed-grid quantile estimator (see
    * [[graft.operators.Sketches.histQuantiles]]): p50/p90/p99 upper-edge
    * estimates at bucket width 5 over [0, 500), each group's sketch at
    * most 100 longs regardless of row count. */
  def sketchQuantileHist(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.histQuantiles(
      tbl(spark, dir, "events"), "event_type", "value",
      bucketWidth = 5.0, numBuckets = 100, pcts = Seq(50, 90, 99))
      .orderBy("event_type", "pct")

  /** Histogram quantile ROLLUP — the re-aggregation property for
    * quantiles, the sibling of [[sketchHllRollup]]: per-day histograms
    * merge by plain count addition, so percentiles computed from the
    * merged daily sketches are IDENTICAL to percentiles computed directly
    * from raw rows (both emitted; equality is itself an output column the
    * oracle pins). Rank-based quantiles can't do this — the histogram
    * grid is what buys mergeability. At 100 TB: persist tiny per-day
    * (group, bucket, count) frames, answer any coarser-period percentile
    * later from register rows, never rescanning events. */
  def sketchQuantileRollup(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    val pcts = Seq(50, 90, 99)
    val daily = Sketches.bucketize(
        tbl(spark, dir, "events")
          .withColumn("day", date_format(col("ts"), "yyyy-MM-dd")),
        "value", 5.0, 100)
      .groupBy(col("event_type"), col("day"), col("b"))
      .agg(count(lit(1)).as("c"))
    val merged = daily.groupBy("event_type", "b").agg(sum("c").as("c"))
    val rollup = Sketches.quantilesFromHist(merged, "event_type", 5.0, pcts)
      .select(col("event_type"), col("pct"), col("est_upper").as("est_rollup"))
    val direct = Sketches.histQuantiles(
        tbl(spark, dir, "events"), "event_type", "value", 5.0, 100, pcts)
      .select(col("event_type"), col("pct"), col("n"), col("est_upper").as("est_direct"))
    direct.join(rollup, Seq("event_type", "pct"))
      .withColumn("matches",
        when(col("est_direct") === col("est_rollup"), 1L).otherwise(0L))
      .orderBy("event_type", "pct")
  }

  /** GDPR right-to-be-forgotten on the lake table: delete every event of
    * the subject users (user_id % 50 == 0) from a date-partitioned
    * parquet sink via [[graft.etl.LakeOps.deleteKeys]] — column-pruned
    * affected-partition discovery, staged rewrite of ONLY those
    * partitions, rename-promote commit, stale-dir cleanup for
    * deleted-to-empty partitions. The readback aggregation proves the
    * delete's exact semantics against the oracle. */
  def sinkDeleteKeys(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("gdpr")
    val e = tbl(spark, dir, "events")
      .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      .select("event_id", "user_id", "event_date", "event_type", "value")
    e.repartition(col("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(out)
    val subjects = e.filter(col("user_id") % 50 === 0).select("user_id").distinct()
    graft.etl.LakeOps.deleteKeys(spark, out, subjects, "user_id", "event_date")
    graft.etl.LakeOps.readTable(spark, out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_id"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  /** Incremental aggregate maintenance: the (event_type, event_date)
    * rollup is a commutative monoid (count + DECIMAL sum), so the stored
    * aggregate of the first 19 days merges with the delta batch's
    * aggregate by union + re-sum — no rescan of history, the move that
    * keeps a 100 TB corpus's statistics table maintainable per-ingest.
    * Derived columns (avg) are computed AFTER the merge from the monoid
    * state, never merged themselves. Oracle = the one-shot aggregation
    * over the full table, which the merged result must equal exactly
    * (DECIMAL accumulation, one cast to double at the end). */
  def pipelineIncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "events")
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("event_date"),
        col("value").cast("decimal(18,2)").as("v"))
    def partial(df: DataFrame): DataFrame =
      df.groupBy("event_type", "event_date")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
    val stored = partial(e.filter(col("event_date") < "2024-01-20"))
    val delta = partial(e.filter(col("event_date") >= "2024-01-20"))
    stored.unionByName(delta)
      .groupBy("event_type", "event_date")
      .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v"))
      .select(col("event_type"), col("event_date"), col("n"),
        col("sum_v").cast("double").as("sum_value"),
        (col("sum_v").cast("double") / col("n")).as("avg_value"))
      .orderBy("event_type", "event_date")
  }

  /** Point lookup through the file-level bloom index
    * ([[graft.operators.BloomIndex]]): the orders table laid out in 64
    * hash-bucket partition dirs (clustered by NOTHING the probe key
    * correlates with — footer min/max can't skip here), a 4096-bit bloom
    * per dir built in one narrow scan, and three customer-key probes that
    * read only the candidate dirs (static partition pruning via the
    * collected candidate values — `PartitionFilters` in the plan, dirs
    * never listed past their names). False positives fall to the exact
    * IN-filter; false negatives are impossible, so rows equal a full
    * scan's. BloomIndexSpec asserts the pruning ratio; at 100 TB this is
    * the "find one user's rows without scanning the corpus" primitive. */
  def ddlBloomIndex(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("bloomidx")
    val o = tbl(spark, dir, "orders")
      .withColumn("bkt", (col("o_orderkey") % 64).cast("int"))
    o.repartition(col("bkt"))
      .write.mode("overwrite").partitionBy("bkt").parquet(out)
    val base = spark.read.parquet(out)
    val index = graft.operators.BloomIndex.build(base, "o_custkey", "bkt")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probes = Seq(7L, 42L, 101L)
    val cands = probes.flatMap(k => graft.operators.BloomIndex.candidates(index, k)).distinct
    index.unpersist()
    base.filter(col("bkt").isin(cands: _*) && col("o_custkey").isin(probes: _*))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Per-document top-5 terms by tf-idf — the relevance-weighting layer a
    * corpus search / keyword-extraction pass runs. Integer-scaled idf
    * (`(N * 1e6) div df` — pure int64 arithmetic, bit-identical in any
    * engine; the ln() form trades that determinism for ~nothing at
    * ranking granularity). Plan shape: one explode + (doc,term) count,
    * a term-keyed df aggregate joined back on term — the join is
    * vocabulary x corpus-terms and Zipf-skewed, exactly the place AQE
    * skew-split or a broadcast of the head vocabulary goes at 100 TB —
    * then a PER-DOC window top-k (partitioned by doc_id: parallel, never
    * a global sort). Scoped to doc_id < 20 for output size; df/N stay
    * corpus-wide. */
  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val terms = docs.select(col("doc_id"),
      explode(graft.functions.CrossFns.tokens(col("text"))).as("term"))
    val n = docs.count()
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df derived from the (doc,term) frame — one row per (doc,term), so a
    // plain count IS the document frequency; saves re-exploding the corpus
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term")
      .withColumn("score", col("tf") * expr(s"(${n}L * 1000000L) div df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored.filter(col("doc_id") < 20)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select("doc_id", "rk", "term", "tf", "df", "score")
      .orderBy("doc_id", "rk")
  }

  /** BM25-lite ranked retrieval for a 3-term query over the documents
    * corpus: the standard Robertson tf saturation (k1=1.2, b=0.75 length
    * normalisation) with a rational idf (`(N-df+1)*1e6 div (df+1)` in
    * place of the ln form — same monotonicity, integer-exact). All
    * inputs (tf, df, dl, total tokens T, N) are exact integers; each
    * per-(doc,term) score is ONE double multiply + divide
    * (idf * 22*T*tf / (10*T*tf + 3*T + 9*dl*N), the k1/b constants
    * cleared to integers), floored to micro-units so the per-doc sum is
    * integer — no float accumulation order anywhere. Top-10 via
    * orderBy+limit = distributed TakeOrdered. */
  def textBm25(spark: SparkSession, dir: String): DataFrame =
    bm25Scores(spark, dir)
      .orderBy(col("bm25_micro").desc, col("doc_id"))
      .limit(10)

  /** Full integer-micro BM25 scored frame (doc_id, bm25_micro) — shared
    * by [[textBm25]] (top-10 report) and [[textRrfFusion]] (lexical leg). */
  private def bm25Scores(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val terms = docs.select(col("doc_id"),
      explode(graft.functions.CrossFns.tokens(col("text"))).as("term"))
    val n = docs.count()
    val dl = terms.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val t = dl.agg(sum("dl")).head().getLong(0)
    val query = Seq("the", "data", "model")
    val tf = terms.filter(col("term").isin(query: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(df, "term").join(dl, "doc_id")
      .withColumn("idf", expr(s"((${n}L - df + 1) * 1000000L) div (df + 1)"))
      .withColumn("score_micro", floor(
        col("idf").cast("double") * (lit(22.0 * t) * col("tf").cast("double")) /
          (lit(10.0 * t) * col("tf").cast("double") + lit(3.0 * t) +
            lit(9.0 * n) * col("dl").cast("double"))).cast("long"))
      .groupBy("doc_id").agg(sum("score_micro").as("bm25_micro"))
  }

  /** Market-basket association rules over order baskets — the classic
    * co-occurrence miner (Apriori's 2-itemset tier, which at web scale
    * is the tier that matters: higher orders prune through it): for
    * every part pair co-ordered ≥ 3 times, SUPPORT (basket count),
    * CONFIDENCE x⇒y in exact percent (n_xy·100 div n_x) and LIFT in
    * exact ppm (n_xy·N·10^6 div (n_x·n_y)). One self-join on the order
    * key bounded by basket size, two partial-aggregatable count
    * passes, a 1-row basket total on a crossJoin (audited scalar
    * pattern). Top-20 by (lift, x, y) via TakeOrdered. */
  def analyticsMarketBasket(spark: SparkSession, dir: String): DataFrame = {
    // r16: per-order sorted distinct item ARRAYS replace the (ok, item)
    // distinct + self-join — the same map-side i<j pair kernel as
    // Graph.orderPartPairs (guide §2.4): one exchange on the order key
    // (partial collect_set) instead of a distinct pass + a join's
    // second probe-side shuffle; the sorted array gives x < y for free.
    // Three plan branches read the array frame (order count, item
    // counts, pair explode) — persist so the basket build runs once.
    val arrs = tbl(spark, dir, "lineitem")
      .groupBy(col("l_orderkey").as("ok"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nOrders = arrs.agg(count(lit(1)).as("n_orders"))
    val itemN = arrs.select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("n_item"))
    val pairN = arrs.filter(size(col("items")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(items) - 1), i ->
          |  transform(sequence(i + 1, size(items)), j ->
          |    named_struct('x', items[i-1], 'y', items[j-1]))))""".stripMargin)).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= 3)
    pairN
      .join(itemN.select(col("item").as("x"), col("n_item").as("n_x")), Seq("x"))
      .join(itemN.select(col("item").as("y"), col("n_item").as("n_y")), Seq("y"))
      .crossJoin(nOrders)
      .select(col("x"), col("y"), col("n_xy"),
        expr("(n_xy * 100L) div n_x").as("conf_xy_pct"),
        expr("(n_xy * 100L) div n_y").as("conf_yx_pct"),
        expr("(n_xy * n_orders * 1000000L) div (n_x * n_y)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("x"), col("y"))
      .limit(20)
  }

  /** WEIGHTED histogram quantiles — the quantile sketch with a weight
    * column (here: quantity-weighted price percentiles per return
    * flag, i.e. "the price under which half the UNITS ship", not half
    * the line items). Same bounded grid and integer rank walk as
    * sketch_quantile_hist; the histogram's per-bucket count is simply
    * the weight sum, which stays partial-aggregatable and mergeable —
    * the property that makes the weighted form free at 100 TB. */
  def sketchQuantileWeighted(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    val li = tbl(spark, dir, "lineitem").select(
      col("l_returnflag").as("g"), col("l_extendedprice").as("v"),
      round(col("l_quantity"), 0).cast("long").as("wt"))
    val hist = Sketches.bucketize(li, "v", bucketWidth = 1000.0, numBuckets = 100)
      .groupBy("g", "b").agg(sum("wt").as("c"))
    Sketches.quantilesFromHist(hist, "g", 1000.0, Seq(50, 90, 99))
      .orderBy("g", "pct")
  }

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    * maximal stopword-free token runs (gaps-and-islands over the token
    * position stream — island id = pos − rank-among-content-words, a
    * doc-bounded window like every positional text op here); word
    * statistics accumulate over ALL phrase instances corpus-wide
    * (freq = occurrences, deg = Σ co-phrase length), and a phrase
    * scores Σ_w (deg_w · 10^6) div freq_w over its word multiset —
    * integer-exact, so the ranking is bit-stable. Distinct phrases are
    * scored once (RAKE's candidate-keyword rule); top-20 by
    * (score, phrase). */
  def textKeywordsRake(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.CrossFns.tokens
    val stop = graft.operators.TextOps.enStopwords
    val toks = tbl(spark, dir, "documents")
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "term")))
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val phrases = toks
      .filter(!col("term").isInCollection(stop))
      .withColumn("isl", col("pos") - row_number().over(byPos))
      .groupBy("doc_id", "isl")
      .agg(
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("pos"), col("term")))),
          s => s("term"))).as("phrase"),
        count(lit(1)).as("len"))
    val words = phrases
      .select(col("phrase"), col("len"), explode(split(col("phrase"), " ")).as("term"))
    val stats = words.groupBy("term")
      .agg(count(lit(1)).as("freq"), sum("len").as("deg"))
    phrases.select(col("phrase")).distinct()
      .select(col("phrase"), explode(split(col("phrase"), " ")).as("term"))
      .join(stats, Seq("term"))
      .groupBy("phrase")
      .agg(count(lit(1)).as("n_words"),
        sum(expr("(deg * 1000000L) div freq")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("phrase"))
      .limit(20)
  }

  /** Gini inequality coefficient from the bounded histogram sketch — the
    * source-skew / value-concentration metric a curation pipeline reads
    * per segment, computed WITHOUT any global per-group sort (the exact
    * Gini needs a full rank pass; the grouped/Lorenz-trapezoid form
    * needs only the same ≤200-cell histogram the quantile sketch ships):
    * per bucket (count c_b, cent mass s_b), the trapezoid term
    * T = Σ_b c_b·(2·cumS_b − s_b) gives G = 1 − T/(N·S). Emitted as the
    * EXACT integers (n, sum_cents, lorenz_t) plus the convenience
    * g_ppm = 1e6 − T div ((N·S) div 1e6) — every operation integer, so
    * the report is engine-exact; resolution is the declared bucket
    * width (values within a bucket are treated as equal — the standard
    * grouped-Gini approximation, bias bounded by bucket width).
    * Shuffles: one partial-aggregatable histogram, a per-group
    * cumulative over ≤200 bucket rows, a broadcast totals join. */
  def sketchGini(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.histGini(
      tbl(spark, dir, "orders").select(
        col("o_orderpriority").as("grp"),
        round(col("o_totalprice") * 100d, 0).cast("long").as("cents")),
      "grp", "cents", bucketWidth = 250000L, numBuckets = 200)
      .withColumnRenamed("sum_units", "sum_cents")
      .orderBy("grp")

  /** Event-transition matrix (first-order Markov counts): for every
    * consecutive event pair within a user's timeline, count
    * (from_type → to_type) — the navigation-flow census behind funnel
    * design and anomaly screens. One `lead` over the user-keyed window
    * (thousands of independent user partitions — no global sort) + a
    * partial-aggregatable pair count. Ordering ties break on event_id;
    * timestamps compare at µs in both engines (DuckDB TIMESTAMP is µs,
    * Staging.tbl truncates Spark's read the same way). */
  def funnelTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    tbl(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  /** Collocation extraction: corpus bigrams ranked by exact integer
    * LIFT — lift_ppm = (c_xy · N · 10^6) div (c_x · c_y), the
    * independence ratio PMI exponentiates, kept integer so the ranking
    * is bit-stable (log-PMI would float-drift between engines; the
    * ordering is the same monotone transform away). Min-count ≥ 5
    * screens the unstable tail, top-20 by (lift, w1, w2).
    *
    * Scale shape: bigrams ride the existing shingle HOF (no
    * self-join on token position), both count passes are
    * partial-aggregatable, the unigram joins are plain equi-joins on the
    * vocabulary (AQE broadcasts when small), and the corpus total rides
    * a 1-row crossJoin (audited scalar pattern). */
  def textCollocations(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CrossFns.{tokens, shingles}
    val docs = tbl(spark, dir, "documents")
    val toks = docs.select(explode(tokens(col("text"))).as("term"))
    // the vocab-sized unigram frame feeds three branches (both join sides +
    // the corpus total) — persist it so the corpus is tokenised once, and
    // derive the total by re-aggregating it rather than a second full pass
    val uni = toks.groupBy("term").agg(count(lit(1)).as("cu"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = uni.agg(sum("cu").as("nt"))
    // bind the token array to an ATTRIBUTE before shingling: shingles()'
    // lambda indexes its argument per gram, and an inline tokens(text)
    // expression would re-tokenise the document on every element_at —
    // O(len·grams) per doc. A prior projection evaluates it once per row.
    docs.select(tokens(col("text")).as("toks"))
      .select(explode(shingles(col("toks"), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= 5)
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
      .withColumn("w2", element_at(split(col("bg"), " "), 2))
      .join(uni.select(col("term").as("w1"), col("cu").as("cx")), Seq("w1"))
      .join(uni.select(col("term").as("w2"), col("cu").as("cy")), Seq("w2"))
      .crossJoin(tot)
      .select(col("w1"), col("w2"), col("cxy"),
        expr("(cxy * nt * 1000000L) div (cx * cy)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** Hybrid retrieval with reciprocal-rank fusion (Cormack et al. 2009):
    * fuse a lexical ranking (the integer-micro BM25 of [[textBm25]]) with
    * a dense ranking (quantised-integer inner product against a probe
    * embedding, the MIPS form — ranking on the raw int64 dot avoids any
    * float sqrt) by RRF: score(d) = Σ_rankers 10^9 div (60 + rank_d).
    *
    * Scale shape: each ranker independently reduces to its top-50 via
    * orderBy+limit (TakeOrdered — distributed partial top-k, no global
    * sort), and ONLY those ≤50-row frames get a rank window (bounded by
    * the limit, not the corpus) before the full-outer fuse on doc_id. A
    * document missing from a ranker's top list contributes nothing for
    * that ranker — the standard RRF treatment. Integer arithmetic
    * end-to-end. */
  def textRrfFusion(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CrossFns.{quantize, qdot}
    import org.apache.spark.sql.expressions.Window
    val topN = 50
    val lex = bm25Scores(spark, dir)
      .orderBy(col("bm25_micro").desc, col("doc_id")).limit(topN)
      // rank window over a frame BOUNDED BY THE LIMIT (≤50 rows at any
      // corpus size) — the degenerate-but-non-foldable partition key
      // (pmod(id,1) = 0 for every row; a literal would be folded away)
      // declares the intended single partition instead of tripping the
      // WindowExec scale warning on a provably constant-size frame
      .withColumn("r_lex", row_number().over(
        Window.partitionBy(pmod(col("doc_id"), lit(1)))
          .orderBy(col("bm25_micro").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("r_lex"))
    val emb = tbl(spark, dir, "embeddings")
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("qv").as("pqv"))
    val dense = emb.crossJoin(broadcast(probe))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id").as("doc_id"), qdot(col("qv"), col("pqv")).as("dot"))
      .orderBy(col("dot").desc, col("doc_id")).limit(topN)
      // same ≤topN bounded frame as r_lex above
      .withColumn("r_dense", row_number().over(
        Window.partitionBy(pmod(col("doc_id"), lit(1)))
          .orderBy(col("dot").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("r_dense"))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(expr("1000000000 div (60 + r_lex)"), lit(0L)) +
          coalesce(expr("1000000000 div (60 + r_dense)"), lit(0L))).as("rrf_micro"),
        col("r_lex"), col("r_dense"))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
      .limit(10)
  }

  /** Semi-structured projection through the VARIANT type (Spark 4):
    * `parse_json` once into the binary-encoded variant, then typed
    * `variant_get` path extraction — the open-schema ingestion shape
    * that replaces per-query string re-parsing (`get_json_object`, cf.
    * project_json_extract) with a parse-once / extract-many encoding.
    * At scale the variant column is the right storage for ragged
    * event payloads: one decode per row at ingest, columnar-friendly
    * binary afterwards. Distinct event_ids with k present are counted
    * per type alongside min/max typed extractions. */
  def projectVariant(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "events")
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n_k"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Dynamic partition pruning: the fact table is stored partitioned by
    * day; the join's dim side carries the selective filter (first 5 days
    * of the month), and Catalyst injects the dim's surviving keys as a
    * runtime `dynamicpruning` subquery into the fact scan's
    * PartitionFilters — the fact side never lists, opens, or reads the
    * other 25 days (AnalyticsSpec pins the injected filter). This is the
    * date-dim star-join shape that makes "join a year of 100 TB fact to
    * this quarter's dim slice" read a quarter, not a year — without the
    * query author naming partitions anywhere. */
  def joinPartitionPruned(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("dpp")
    val e = tbl(spark, dir, "events")
      .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      .select("event_id", "event_date", "event_type", "value")
    e.repartition(col("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(out)
    val dim = e.select("event_date").distinct()
      .withColumn("dom", substring(col("event_date"), 9, 2).cast("int"))
    val fact = spark.read.parquet(out)
    fact.join(dim.filter(col("dom") <= 5), "event_date")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_partition_pruned" -> (joinPartitionPruned _),
    "project_variant" -> (projectVariant _),
    "text_tfidf" -> (textTfidf _),
    "text_bm25" -> (textBm25 _),
    "text_rrf_fusion" -> (textRrfFusion _),
    "text_collocations" -> (textCollocations _),
    "funnel_transitions" -> (funnelTransitions _),
    "sketch_gini" -> (sketchGini _),
    "text_keywords_rake" -> (textKeywordsRake _),
    "sketch_quantile_weighted" -> (sketchQuantileWeighted _),
    "analytics_market_basket" -> (analyticsMarketBasket _),
    "funnel_steps" -> (funnelSteps _),
    "funnel_attribution" -> (funnelAttribution _),
    "cohort_retention" -> (cohortRetention _),
    "sketch_hll_distinct" -> (sketchHllDistinct _),
    "sketch_hll_rollup" -> (sketchHllRollup _),
    "sketch_quantile_hist" -> (sketchQuantileHist _),
    "sketch_quantile_rollup" -> (sketchQuantileRollup _),
    "sink_delete_keys" -> (sinkDeleteKeys _),
    "pipeline_incremental_agg" -> (pipelineIncrementalAgg _),
    "ddl_bloom_index" -> (ddlBloomIndex _),
  )
}
