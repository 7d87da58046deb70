package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomIndex
import graft.queries.{AnalyticsQueries, Staging}

/** Specs for the analytics/lake-index batch: bloom-index pruning and
  * exactness, GDPR deleteKeys partition handling, HLL estimate quality,
  * funnel strictness. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("bloom index: no false negatives, real pruning, exact rows") {
    val out = Staging.tmpDir("bloomspec")
    val o = Staging.tbl(spark, sf, "orders")
      .withColumn("bkt", (col("o_orderkey") % 64).cast("int"))
    o.repartition(col("bkt")).write.mode("overwrite").partitionBy("bkt").parquet(out)
    val base = spark.read.parquet(out)
    val index = BloomIndex.build(base, "o_custkey", "bkt")

    // ground truth: buckets actually containing each probe key
    for (k <- Seq(7L, 42L, 101L)) {
      val truth = base.filter(col("o_custkey") === k)
        .select("bkt").distinct().as[Int].collect().toSet
      val cands = BloomIndex.candidates(index, k).map(_.toString.toInt).toSet
      assert(truth.subsetOf(cands), s"false negative for key $k")
      // 4096-bit bloom over ~hundreds of keys/bucket: pruning must bite
      assert(cands.size < 64, s"no pruning for key $k (${cands.size}/64)")
      val viaIndex = base.filter(col("bkt").isin(cands.toSeq: _*) && col("o_custkey") === k)
        .select("o_orderkey").as[Long].collect().sorted
      val full = base.filter(col("o_custkey") === k)
        .select("o_orderkey").as[Long].collect().sorted
      assert(viaIndex.sameElements(full))
    }
  }

  test("bloom index plan prunes partition dirs statically") {
    val out = Staging.tmpDir("bloomplan")
    val o = Staging.tbl(spark, sf, "orders")
      .withColumn("bkt", (col("o_orderkey") % 64).cast("int"))
    o.repartition(col("bkt")).write.mode("overwrite").partitionBy("bkt").parquet(out)
    val base = spark.read.parquet(out)
    val pruned = base.filter(col("bkt").isin(1, 2, 3) && col("o_custkey") === 7L)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(400))
    // the scan's selected partition count is visible via the file index
    val scanned = pruned.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString
    assert(scanned.contains("bkt"), "partition column not in scan filters")
  }

  test("deleteKeys removes subjects, keeps others, drops emptied partitions") {
    val out = Staging.tmpDir("gdprspec")
    Seq(
      (1L, 100L, "2024-01-01", 10.0),
      (2L, 200L, "2024-01-01", 20.0),
      (3L, 100L, "2024-01-02", 30.0), // partition 01-02 becomes empty
      (4L, 300L, "2024-01-03", 40.0),
    ).toDF("id", "uid", "d", "v")
      .repartition(col("d"))
      .write.mode("overwrite").partitionBy("d").parquet(out)

    graft.etl.LakeOps.deleteKeys(spark, out, Seq(100L).toDF("uid"), "uid", "d")

    val left = spark.read.parquet(out).select("id", "uid", "d")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(left.toSeq == Seq((2L, 200L, "2024-01-01"), (4L, 300L, "2024-01-03")))
    assert(!new java.io.File(s"$out/d=2024-01-02").exists(),
      "deleted-to-empty partition dir must be dropped")
    // untouched partition keeps its original files (no rewrite)
    assert(new java.io.File(s"$out/d=2024-01-03").exists())
    // no staging residue
    assert(!new java.io.File(out).listFiles().exists(_.getName.startsWith(".graft_staging")))
  }

  test("deleteKeys with no matching subjects is a no-op") {
    val out = Staging.tmpDir("gdprnoop")
    Seq((1L, 100L, "2024-01-01", 1.0)).toDF("id", "uid", "d", "v")
      .write.mode("overwrite").partitionBy("d").parquet(out)
    val before = new java.io.File(s"$out/d=2024-01-01").listFiles().map(_.getName).toSet
    graft.etl.LakeOps.deleteKeys(spark, out, Seq(999L).toDF("uid"), "uid", "d")
    val after = new java.io.File(s"$out/d=2024-01-01").listFiles().map(_.getName).toSet
    assert(before == after)
  }

  test("hll estimate lands within 3 sigma of exact at sf0.001") {
    // m=64 -> relative standard error 1.04/sqrt(64) ~ 13%; sf0.001 has
    // n ~ 200 per type, just above the 2.5m small-range threshold where
    // the RAW estimator (deliberately uncorrected — the linear-counting
    // correction needs ln(), which is not bit-stable across engines) is
    // at its noisiest. 3 sigma ~ 40%.
    val rows = AnalyticsQueries.sketchHllDistinct(spark, sf).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val est = r.getAs[Double]("hll_est")
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(est - exact) / exact < 0.40,
        s"${r.getString(0)}: est=$est exact=$exact")
    }
  }

  test("rrf fusion: scores decompose into the two rank legs") {
    val rows = AnalyticsQueries.textRrfFusion(spark, sf).collect()
    assert(rows.length === 10)
    for (r <- rows) {
      val lex = Option(r.getAs[java.lang.Long]("r_lex")).map(_.toLong)
      val den = Option(r.getAs[java.lang.Long]("r_dense")).map(_.toLong)
      assert(lex.isDefined || den.isDefined, "doc must appear in at least one leg")
      val expect = lex.map(x => 1000000000L / (60 + x)).getOrElse(0L) +
        den.map(x => 1000000000L / (60 + x)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_micro") === expect)
    }
    // descending by fused score (ties broken by doc_id upstream)
    val scores = rows.map(_.getAs[Long]("rrf_micro"))
    assert(scores.sliding(2).forall(w => w(0) >= w(1)))
  }

  test("importance sampling never selects target-source docs") {
    val sel = graft.queries.ExtQueries.sampleImportance(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sel.size === 20)
    val tgt = Staging.tbl(spark, sf, "documents")
      .filter(col("source") === "src18")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sel.intersect(tgt).isEmpty)
  }

  test("histogram Gini: perfect equality scores 0, single-holder scores (n-1)/n") {
    import spark.implicits._
    import graft.operators.Sketches
    def giniOf(cents: Seq[Long]): Long =
      Sketches.histGini(cents.map(("g", _)).toDF("grp", "cents"),
        "grp", "cents", bucketWidth = 250000L, numBuckets = 200)
        .head().getAs[Long]("g_ppm")
    // equality: four equal values -> T = N·S -> g_ppm 0
    assert(giniOf(Seq.fill(4)(1000000L)) === 0L)
    // one holder of everything (others zero): G = (n-1)/n = 0.75
    assert(giniOf(Seq(0L, 0L, 0L, 4000000L)) === 750000L)
  }

  test("transition matrix mass = total events minus one per active user") {
    val total = Staging.tbl(spark, sf, "events").count()
    val users = Staging.tbl(spark, sf, "events").select("user_id").distinct().count()
    val mass = AnalyticsQueries.funnelTransitions(spark, sf)
      .agg(sum("n")).head().getLong(0)
    assert(mass === total - users)
  }

  test("curriculum stages partition the scored corpus into disjoint ascending score ranges") {
    val rows = graft.queries.ExtQueries.pipelineCurriculum(spark, sf)
      .orderBy("stage").collect()
    assert(rows.nonEmpty && rows.length <= 4)
    // stages are bucket-ordered: score ranges never overlap
    for (Array(a, b) <- rows.sliding(2))
      assert(a.getAs[Long]("max_score") < b.getAs[Long]("min_score"))
    // census covers every doc with >= 2 tokens (the bigram-scored set)
    val scoredDocs = Staging.tbl(spark, sf, "documents")
      .select(size(graft.functions.CrossFns.tokens(col("text"))).as("nt"))
      .filter(col("nt") >= 2).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === scoredDocs)
  }

  test("dedup_cluster_ari: pair-count invariants and index bounds") {
    val r = graft.queries.ExtQueries.dedupClusterAri(spark, sf).head()
    val (s, ap, bp) = (r.getAs[Long]("same_pairs"),
      r.getAs[Long]("a_pairs"), r.getAs[Long]("b_pairs"))
    assert(r.getAs[Long]("n_docs") === 500L)
    assert(s <= math.min(ap, bp), "agreeing pairs bounded by each clustering's pairs")
    assert(r.getAs[Long]("ari_ppm") <= 1000000L, "ARI <= 1")
    assert(s > 0L, "the corpus has genuine duplicate groups both tiers find")
  }

  test("profile_drift: chi2_ppm matches a BigInt reference; halves partition every event") {
    val rows = graft.queries.ExtQueries.profileDrift(spark, sf).collect()
    val total = Staging.tbl(spark, sf, "events").count()
    assert(rows.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).sum === total)
    val byType = rows.groupBy(_.getString(0))
    for ((_, rs) <- byType) {
      val ta = rs.map(_.getAs[Long]("n_a")).sum
      val tb = rs.map(_.getAs[Long]("n_b")).sum
      for (r <- rs) {
        val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
        val dev = BigInt(na) * tb - BigInt(nb) * ta
        val expect = (BigInt(1000000) * dev * dev) / (BigInt(ta) * tb * (na + nb))
        assert(BigInt(r.getAs[Long]("chi2_ppm")) === expect,
          s"type=${r.getString(0)} bucket=${r.getAs[Long]("bucket")}")
      }
    }
  }

  test("funnel attribution: totals cover every purchase; unattributed land on NULL day") {
    val rows = AnalyticsQueries.funnelAttribution(spark, sf).collect()
    val purchases = Staging.tbl(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum === purchases,
      "attribution must partition the purchase set")
    // click_day is either NULL (no preceding click) or a valid yyyy-MM-dd
    assert(rows.forall { r =>
      val d = r.getAs[String]("click_day")
      d == null || d.matches("\\d{4}-\\d{2}-\\d{2}")
    })
  }

  test("funnel steps are monotonically non-increasing and strict") {
    val rows = AnalyticsQueries.funnelSteps(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("step")).toSeq == Seq(1, 2, 3, 4))
    val counts = rows.map(_.getAs[Long]("n_users"))
    assert(counts.sliding(2).forall(w => w(0) >= w(1)), counts.mkString(","))
  }

  test("transformWithState restores the state-store provider conf") {
    val before = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val out = graft.streaming.TransformStateStream.run(spark, sf)
    assert(out.count() > 0)
    assert(spark.conf.getOption("spark.sql.streaming.stateStore.providerClass") == before)
  }

  test("join_partition_pruned plan carries a dynamicpruning subquery") {
    val out = Staging.tmpDir("dppspec")
    val e = Staging.tbl(spark, sf, "events")
      .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      .select("event_id", "event_date", "event_type", "value")
    e.repartition(col("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(out)
    val dim = e.select("event_date").distinct()
      .withColumn("dom", substring(col("event_date"), 9, 2).cast("int"))
    val joined = spark.read.parquet(out).join(dim.filter(col("dom") <= 5), "event_date")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      "fact scan must carry a runtime partition-pruning subquery:\n" + plan.take(800))
  }

  test("incremental agg merge equals one-shot aggregation") {
    val merged = AnalyticsQueries.pipelineIncrementalAgg(spark, sf)
    val oneShot = Staging.tbl(spark, sf, "events")
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("event_date"),
        col("value").cast("decimal(18,2)").as("v"))
      .groupBy("event_type", "event_date")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .select(col("event_type"), col("event_date"), col("n"),
        col("sum_v").cast("double").as("sum_value"),
        (col("sum_v").cast("double") / col("n")).as("avg_value"))
    assert(merged.exceptAll(oneShot).isEmpty && oneShot.exceptAll(merged).isEmpty)
  }

  test("HLL register rollup is lossless: rolled-up estimate bit-equals the direct estimate") {
    val out = graft.queries.AnalyticsQueries.all("sketch_hll_rollup")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val a = r.getAs[Double]("hll_est_rollup")
      val b = r.getAs[Double]("hll_est_direct")
      assert(a == b, s"${r.getAs[String]("event_type")}: rollup $a != direct $b")
    }
  }

  test("skyline window formulation equals brute-force dominance on a tie-heavy fixture") {
    // (okey, cents, days): 1 and 2 tie exactly (both skyline); 3 shares
    // 1's price but is later (dominated in-group); 4 cheaper but later
    // than nothing cheaper (skyline); 5 dominated across prices; 6 is
    // the earliest overall at a high price (skyline)
    val rows = Seq(
      (1L, 500L, 10L), (2L, 500L, 10L), (3L, 500L, 11L),
      (4L, 300L, 20L), (5L, 600L, 30L), (6L, 900L, 5L))
    val df = rows.toDF("okey", "cents", "days")
    import org.apache.spark.sql.expressions.Window
    // the skyline is GLOBAL by definition — the single partition is the
    // semantics under test; keyed on a non-foldable constant (6-row
    // fixture) so the suite log stays free of partition-less WindowExec
    // warnings (a foldable key like lit(0) is optimised away and warns)
    val cheaper = Window.partitionBy(pmod(col("okey"), lit(1L))).orderBy("cents")
      .rangeBetween(Window.unboundedPreceding, -1)
    val same = Window.partitionBy("cents")
    val sky = df.withColumn("mdc", min("days").over(cheaper))
      .withColumn("mds", min("days").over(same))
      .filter((col("mdc").isNull || col("mdc") > col("days")) && col("mds") === col("days"))
      .select("okey").as[Long].collect().toSet
    // brute force: p survives iff no q with q<=p in both dims, < in one
    val brute = rows.filter { p => !rows.exists(q =>
      q._2 <= p._2 && q._3 <= p._3 && (q._2 < p._2 || q._3 < p._3))
    }.map(_._1).toSet
    assert(sky === brute)
    assert(sky === Set(1L, 2L, 4L, 6L))
  }
}
