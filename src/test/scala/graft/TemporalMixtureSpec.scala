package graft

import org.apache.spark.sql.functions._
import graft.queries.{CoreQueries, ExtQueries}
import graft.streaming.StreamQueries

/** Semantic invariants for the round-4 additions: temporal (point-in-time)
  * join, epoch-weighted mixture, XML/Avro round trips, observe-metrics,
  * and the streaming quality gate's batch parity. */
class TemporalMixtureSpec extends SparkSpec {

  test("join_temporal preserves probe cardinality (exactly one interval per probe)") {
    val probes = queries.Staging.tbl(spark, sf, "events").count()
    val joined = ExtQueries.all("join_temporal")(spark, sf)
    assert(joined.count() === probes)
    // and no probe matched two intervals
    val dup = joined.groupBy("event_id").count().filter(col("count") > 1).count()
    assert(dup === 0L)
  }

  test("join_temporal probe state can differ from the probe event's own state") {
    // the +30min shift must move at least one probe into a later version —
    // otherwise the query degenerates to a self-lookup and tests nothing
    val joined = ExtQueries.all("join_temporal")(spark, sf)
    val events = queries.Staging.tbl(spark, sf, "events")
      .select(col("event_id"), col("event_type"))
    val moved = joined.join(events, "event_id")
      .filter(not(col("state") <=> col("event_type"))).count()
    assert(moved > 0L)
  }

  test("sample_epochs: epoch-1 rows cover every doc of sources with weight >= 1") {
    val out = ExtQueries.all("sample_epochs")(spark, sf)
    val docs = queries.Staging.tbl(spark, sf, "documents")
      .groupBy("source").agg(count(lit(1)).as("n_total"))
    // sources with weight >= 1.0 (src num % 4 != 0) emit ALL docs at epoch 1
    val full = out.filter(col("epoch") === 1)
      .join(docs, "source")
      .withColumn("num", regexp_extract(col("source"), "(\\d+)", 1).cast("int"))
      .filter(col("num") % 4 =!= 0)
    assert(full.filter(col("n_docs") =!= col("n_total")).count() === 0L)
    // no source emits beyond its ceil(weight) epochs (max weight 2.3 -> 3)
    assert(out.filter(col("epoch") > 3).count() === 0L)
    // deterministic: same plan twice -> identical rows
    val again = ExtQueries.all("sample_epochs")(spark, sf)
    assert(out.exceptAll(again).count() === 0L)
  }

  test("xml and avro round trips preserve nulls and row count") {
    val events = queries.Staging.tbl(spark, sf, "events")
    val nNullValue = events.filter(col("value").isNull).count()
    for (key <- Seq("scan_xml", "scan_avro")) {
      val back = CoreQueries.all(key)(spark, sf)
      assert(back.count() === events.count(), s"$key row count")
      assert(back.filter(col("value").isNull).count() === nNullValue, s"$key nulls")
    }
  }

  test("pipeline_observe_metrics matches a direct aggregation (zero extra scan)") {
    val m = ExtQueries.all("pipeline_observe_metrics")(spark, sf).head()
    val d = queries.Staging.tbl(spark, sf, "documents")
      .agg(count(lit(1)), sum("n_chars"), count(when(col("lang") === "en", 1)))
      .head()
    assert(m.getAs[Long]("n_docs") === d.getLong(0))
    assert(m.getAs[Long]("sum_chars") === d.getLong(1))
    assert(m.getAs[Long]("n_en") === d.getLong(2))
  }

  test("sink_jdbc_roundtrip: live embedded-Derby write/read, partitioned extract") {
    val back = CoreQueries.all("sink_jdbc_roundtrip")(spark, sf)
    val events = queries.Staging.tbl(spark, sf, "events")
    assert(back.count() === events.count())
    assert(back.filter(col("value").isNull).count() ===
      events.filter(col("value").isNull).count())
  }

  test("jdbc partitioned read plans one task per range split") {
    import spark.implicits._
    val url = s"jdbc:derby:${queries.Staging.tmpDir("jdbcspec")}/specdb;create=true"
    (1L to 100L).toDF("id").withColumn("v", col("id") * 2)
      .write.format("jdbc").option("url", url).option("dbtable", "T").save()
    val unsorted = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "T")
      .option("partitionColumn", "id").option("numPartitions", 4)
      .option("lowerBound", 1L).option("upperBound", 101L)
      .load()
    // before any sort/AQE coalesce, the scan is 4 range-predicate tasks
    assert(unsorted.rdd.getNumPartitions === 4)
    assert(unsorted.count() === 100L)
  }

  test("stream_temporal_join unions to the batch temporal join exactly") {
    val streamed = StreamQueries.all("stream_temporal_join")(spark, sf)
    val batch = ExtQueries.all("join_temporal")(spark, sf)
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("project_unpivot emits one row per (row, metric) with no loss") {
    val li = queries.Staging.tbl(spark, sf, "lineitem")
    val long = ExtQueries.all("project_unpivot")(spark, sf)
    assert(long.count() === li.count() * 4)
    assert(long.select("metric").distinct().count() === 4)
  }

  test("stream_available_now drains in bounded batches then self-terminates") {
    // the query inside calls awaitTermination() with no stop(): reaching
    // this assertion at all proves AvailableNow terminated the stream
    val out = StreamQueries.all("stream_available_now")(spark, sf)
    val events = queries.Staging.tbl(spark, sf, "events")
    assert(out.count() === events.count())
  }

  test("stream_quality_gate equals the batch gopher gate (per-doc rules, exact parity)") {
    val streamed = StreamQueries.all("stream_quality_gate")(spark, sf)
    val docs = queries.Staging.tbl(spark, sf, "documents")
    val keep = graft.operators.TextOps.gopherSignals(docs)
      .filter(col("passes")).select("doc_id")
    val batch = docs.join(keep, Seq("doc_id"), "left_semi")
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("stream_cdc_chunks equals the batch CDC census bit-for-bit") {
    val streamed = StreamQueries.all("stream_cdc_chunks")(spark, sf)
    val batch = graft.operators.Dedup.cdcChunkStats(
      queries.Staging.tbl(spark, sf, "documents"))
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("readabilityScores: known-answer counts and exact milli-score") {
    import spark.implicits._
    // "go on. it is ok!" → 5 words, 2 sentence runs ('.'+'!'), vowel runs:
    // o / o / i / i / o → 5
    val df = Seq((1L, "go on. it is ok!")).toDF("doc_id", "text")
    val r = graft.operators.TextOps.readabilityScores(df).head()
    assert(r.getAs[Long]("n_words") === 5L)
    assert(r.getAs[Long]("n_sents") === 2L)
    assert(r.getAs[Long]("n_sylls") === 5L)
    // 206835 - (1015*5) div 2 - (84600*5) div 5 = 206835 - 2537 - 84600
    assert(r.getAs[Long]("fre_milli") === 206835L - 2537L - 84600L)
    // empty-ish doc: guards keep the divisions defined
    val z = graft.operators.TextOps.readabilityScores(
      Seq((2L, "")).toDF("doc_id", "text")).head()
    assert(z.getAs[Long]("n_words") === 0L && z.getAs[Long]("fre_milli") === 206835L)
  }

  test("sample_doremi: weights sum to ~1e6 and favor the high-ppx source; uniform on ties") {
    val out = queries.ExtQueries.sampleDoremi(spark, sf).collect()
    val weights = out.map(_.getAs[Long]("weight_ppm"))
    // floor-division normalisation: total within k ppm of the budget
    assert(weights.sum <= 1000000L && weights.sum >= 1000000L - out.length)
    val byExcess = out.sortBy(_.getAs[Long]("excess"))
    assert(byExcess.head.getAs[Long]("weight_ppm") === 0L,
      "the best (min-ppx) source gets zero excess weight")
    assert(byExcess.last.getAs[Long]("weight_ppm") === weights.max,
      "max-excess source carries the max weight")
  }
}
