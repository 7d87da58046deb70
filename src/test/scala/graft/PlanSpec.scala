package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan assertions: the properties that make the engine viable at
  * 100 TB — column pruning reaching the scan, filter pushdown, broadcast
  * joins for small sides, partition pruning on the date-partitioned sink,
  * and unbroken whole-stage codegen over the hot expressions. */
class PlanSpec extends SparkSpec {

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("project_select prunes the parquet ReadSchema to the selected columns") {
    val plan = formatted(graft.queries.CoreQueries.projectSelect(spark, sf))
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_shipdate"))
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_comment"),
      s"scan must not read unprojected columns:\n$readSchema")
  }

  test("filters are pushed down to the parquet scan") {
    val df = graft.queries.Staging.tbl(spark, sf, "lineitem")
      .filter(col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    val plan = formatted(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"expected pushed filter in:\n$plan")
  }

  test("ledger anti-join broadcasts the ledger side (no fact shuffle)") {
    val plan = formatted(graft.queries.CoreQueries.antijoinProcessed(spark, sf))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"anti-join should be broadcast:\n$plan")
  }

  test("star join broadcasts all dimension tables") {
    val plan = formatted(graft.queries.ExtQueries.joinAggRevenue(spark, sf))
    // formatted mode prints each node in the tree and again in the detail
    // section -> 2 occurrences per join
    val n = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(n >= 3, s"region/nation/customer should all broadcast, got $n in:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("profile_table reads the events table exactly once (single-pass profiler)") {
    val plan = formatted(graft.queries.ExtQueries.profileTable(spark, sf))
    // formatted mode prints each node twice (tree + detail) -> 2 per scan
    val scans = "Scan parquet".r.findAllIn(plan).length / 2
    assert(scans === 1, s"profiler must be one scan, found $scans in:\n$plan")
  }

  test("agg_pivot is a single scan (explicit pivot values, no distinct pre-pass)") {
    val plan = formatted(graft.queries.ExtQueries.aggPivot(spark, sf))
    val scans = "Scan parquet".r.findAllIn(plan).length / 2
    assert(scans === 1, s"pivot must not rescan for values, found $scans in:\n$plan")
  }

  test("decontamination broadcasts the benchmark shingle set") {
    val plan = formatted(graft.queries.ExtQueries.pipelineDecontaminate(spark, sf))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"benchmark-shingle semi-join should broadcast:\n$plan")
  }

  test("date-partitioned sink read prunes partitions") {
    val out = java.nio.file.Files.createTempDirectory("graft-prune-").toString
    graft.queries.Staging.tbl(spark, sf, "events")
      .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("event_date").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("event_date") === "2024-01-03")
    val plan = formatted(pruned)
    // the date predicate becomes a PartitionFilter on the scan, not a data
    // filter (Timescale chunk-exclusion analog)
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-03"), plan)
    // and the scan actually lists only the one matching partition
    pruned.collect()
    val scans = pruned.queryExecution.executedPlan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    }.flatten
    assert(scans.nonEmpty, pruned.queryExecution.executedPlan.toString)
    val files = scans.map(_.metrics("numFiles").value).sum
    val total = spark.read.parquet(out).inputFiles.length
    assert(files < total / 5, s"pruning should skip most partitions: $files of $total files read")
  }

  test("aggregations use partial (map-side) aggregation before the shuffle") {
    val plan = formatted(graft.queries.ExtQueries.aggPricingSummary(spark, sf))
    // HashAggregate appears twice per agg: partial + final
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
    assert(plan.contains("hashpartitioning(l_returnflag"), plan)
  }

  test("native expressions stay inside WholeStageCodegen") {
    val df = graft.queries.Staging.tbl(spark, sf, "documents")
      .select(graft.functions.CrossFns.charHash(col("text")).as("h"))
      .filter(col("h") > 0)
    // formatted mode marks codegen'd nodes with '*'; the hash must sit in
    // a starred Project/Filter, not a fallback
    val plan = formatted(df)
    assert(plan.contains("* Project") && plan.contains("* Filter"), plan)
    assert(!plan.contains("CodegenFallback"), plan)
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    // external tables via option("path") — warehouse dir is static conf
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket-wh-").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    graft.queries.Staging.tbl(spark, sf, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    graft.queries.Staging.tbl(spark, sf, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").count()
    joined.collect()
    val plan = formatted(joined)
    // both sides read pre-bucketed: below the SortMergeJoin there must be
    // no Exchange (the tree prints root-first, so the join's children are
    // the lines between the join and the end of the tree section)
    val tree = plan.linesIterator.toSeq
    val joinIdx = tree.indexWhere(_.contains("SortMergeJoin"))
    assert(joinIdx > 0, plan)
    val below = tree.drop(joinIdx + 1)
      .takeWhile(l => l.trim.nonEmpty && !l.contains("== Initial Plan =="))
    assert(!below.exists(_.contains("Exchange")),
      s"bucketed join must not shuffle either side:\n$plan")
    assert(plan.contains("Bucketed: true"), plan)
  }

  test("ddl_bucket_join catalog query joins exchange-free below the SortMergeJoin") {
    val df = graft.queries.ExtQueries.ddlBucketJoin(spark, sf)
    df.collect()
    val plan = formatted(df)
    val tree = plan.linesIterator.toSeq
    val joinIdx = tree.indexWhere(_.contains("SortMergeJoin"))
    assert(joinIdx > 0, plan)
    val below = tree.drop(joinIdx + 1)
      .takeWhile(l => l.trim.nonEmpty && !l.contains("== Initial Plan =="))
    assert(!below.exists(_.contains("Exchange")),
      s"bucketed join must not shuffle either side:\n$plan")
    assert(plan.contains("Bucketed: true"), plan)
  }

  test("z-order layout write is fully parallel (no global window, no single-partition exchange)") {
    import graft.operators.ZOrder
    val o = graft.queries.Staging.tbl(spark, sf, "orders").select(
      col("o_orderkey"),
      (col("o_custkey") % 256).cast("int").as("x"),
      (datediff(col("o_orderdate"), lit("1992-01-01").cast("date")) % 256)
        .cast("int").as("y"))
    val layout = o
      .withColumn("bucket", shiftright(ZOrder.mortonKey(col("x"), col("y"), 8), 10))
      .repartition(col("bucket"))
    val plan = formatted(layout)
    assert(!plan.contains("Window"), s"layout must not use a window:\n$plan")
    assert(!plan.contains("SinglePartition"), s"layout must stay parallel:\n$plan")
    assert(plan.contains("hashpartitioning(bucket"), plan)
  }

  test("z-order footer stats prune the rectangle to fewer files than linear layout") {
    val rows = graft.queries.ExtQueries.ddlZorder(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (zTotal, zTouched) = rows("zorder")
    val (lTotal, lTouched) = rows("linear")
    // totals = non-empty key buckets; they differ slightly between layouts
    // at tiny SF but both are bounded by the 64 bucket ranges
    assert(zTotal <= 64 && lTotal <= 64 && zTotal > 8 && lTotal > 8, s"$rows")
    assert(zTouched < lTouched, s"z-order must touch fewer files: $rows")
    assert(zTouched <= 2, s"rectangle is one aligned z-range, expected ~1 file: $rows")
  }

  test("skyline runs distributed: windows are bucket-partitioned, never SinglePartition") {
    // the r7 verdict's one live data-scale single-partition plan: the
    // old no-partition range window moved the whole orders frame to one
    // task. The bucketed-prefix-min rewrite must keep every exchange
    // hash/range-partitioned and every Window keyed on the bucket.
    val plan = formatted(graft.queries.ExtQueries.aggSkyline(spark, sf))
    assert(plan.contains("Window"), s"skyline still uses the window pass:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"skyline must not plan a single-partition exchange:\n$plan")
    assert(plan.contains("hashpartitioning(sky_bucket"),
      s"window must be keyed on the value bucket:\n$plan")
    // the frontier is value-identical to the all-pairs NOT EXISTS form
    val rows = graft.queries.ExtQueries.aggSkyline(spark, sf).collect()
    val o = graft.queries.Staging.tbl(spark, sf, "orders").select(
      col("o_orderkey").as("okey"),
      expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"),
      datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
        .cast("long").as("days")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = o.filter { case (_, c, d) =>
      !o.exists { case (_, c2, d2) =>
        c2 <= c && d2 <= d && (c2 < c || d2 < d) }
    }.sortBy(t => (t._2, t._3, t._1))
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      === brute.toSeq)
  }

  test("text rankings use distributed TakeOrdered top-k, not a global window") {
    val qs = Map(
      "text_ngram_freq" -> graft.queries.ExtQueries.textNgramFreq _,
      "text_vocab" -> graft.queries.ExtQueries.textVocab _,
      "text_bpe_pairs" -> graft.queries.ExtQueries.textBpePairs _)
    for ((name, q) <- qs) {
      val plan = formatted(q(spark, sf))
      assert(plan.contains("TakeOrderedAndProject"), s"$name should TakeOrdered:\n$plan")
      assert(!plan.contains("Window"), s"$name must not use a window:\n$plan")
      assert(!plan.contains("SinglePartition"),
        s"$name must not funnel the vocab through one task:\n$plan")
    }
  }

  test("z-order production path: repartitionByRange layout skips like the bucketed form") {
    import graft.operators.ZOrder
    val o = graft.queries.Staging.tbl(spark, sf, "orders").select(
      col("o_orderkey"),
      (col("o_custkey") % 256).cast("int").as("x"),
      (datediff(col("o_orderdate"), lit("1992-01-01").cast("date")) % 256)
        .cast("int").as("y"))
    val out = java.nio.file.Files.createTempDirectory("graft-zrange-").toString
    // the sampled-boundary form the scaladoc promises works at 100 TB:
    // range-partition directly on the Morton key, one file per range
    o.withColumn("z", ZOrder.mortonKey(col("x"), col("y"), 8))
      .repartitionByRange(32, col("z"), col("o_orderkey"))
      .sortWithinPartitions("z")
      .drop("z")
      .write.mode("overwrite").parquet(out)
    val stats = ZOrder.fileStats(spark, out, Seq("x", "y"))
    assert(stats.size >= 16 && stats.size <= 33, s"${stats.size} files")
    val touched = ZOrder.touchedFiles(stats, Map("x" -> 32L, "y" -> 32L))
    // sampled boundaries aren't bit-deterministic, but the locality
    // property is: the aligned rectangle lands in a handful of z-ranges
    assert(touched.size <= 4,
      s"rectangle should touch few range files: ${touched.size} of ${stats.size}")
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val old = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 95% of fact rows share one key -> one reducer partition dwarfs the
      // rest. The consumer is a PARTIAL-aggregatable global agg with no
      // distribution requirement on the join key — a groupBy(k) parent
      // would (correctly) veto the split, since splitting breaks its
      // co-partitioning.
      val fact = spark.range(200000)
        .select(when(col("id") % 20 =!= 0, 7L).otherwise(col("id") % 97).as("k"),
          concat(lit("payload-"), col("id"), lit("-"), col("id") * 31).as("p"))
      val dim = spark.range(97).select(col("id").as("k"), col("id").cast("string").as("d"))
      val joined = fact.join(dim, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(length(col("p"))).as("bytes"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // OptimizeSkewedJoin marks the split join; without AQE the hot key
      // would hit ONE task — the runtime re-plan is the 100 TB safety net
      assert(plan.contains("skew=true"), s"expected a skew-split join in:\n$plan")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("3-D Morton layout: a cube predicate touches far fewer files than linear sort") {
    import graft.operators.ZOrder
    val o = graft.queries.Staging.tbl(spark, sf, "orders").select(
      (col("o_custkey") % 64).cast("int").as("x"),
      (datediff(col("o_orderdate"), lit("1992-01-01").cast("date")) % 64).cast("int").as("y"),
      (floor(col("o_totalprice") / 5000) % 64).cast("int").as("w"))
    def touched(key: org.apache.spark.sql.Column, label: String) = {
      val out = java.nio.file.Files.createTempDirectory(s"graft-z3-$label-").toString
      // 18-bit key >> 12 -> 64 contiguous ranges
      ZOrder.writeLayout(o, key, shift = 12, out)
      val stats = ZOrder.fileStats(spark, out, Seq("x", "y", "w"))
      (ZOrder.touchedFiles(stats,
        Map("x" -> 16L, "y" -> 16L, "w" -> 16L)).size, stats.size)
    }
    val (zT, zN) = touched(ZOrder.mortonKey(Seq(col("x"), col("y"), col("w")), 6), "z")
    val (lT, lN) = touched(col("x") * 4096 + col("y") * 64 + col("w"), "lin")
    // the aligned 16^3 cube is 1/64 of the key space: a handful of
    // z-ranges, but smeared across most x-major stripes linearly
    assert(zT * 2 < lT, s"3-D z-order should halve touched files at least: z $zT/$zN vs linear $lT/$lN")
  }

  test("minhash signature pipeline has no shuffle before the bucket join") {
    val bands = graft.operators.Dedup.bandedSignatures(spark,
      graft.queries.Staging.tbl(spark, sf, "documents"))
    val plan = formatted(bands)
    assert(!plan.contains("Exchange"),
      s"signature computation must be map-side only:\n$plan")
  }

  test("null-safe join plans as a hash-key join, never a nested loop") {
    val plan = formatted(graft.queries.ExtQueries.all("join_null_safe")(spark, sf))
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"EqualNullSafe must stay an equi-join key:\n$plan")
    assert(plan.contains("Join"), plan)
  }
}
