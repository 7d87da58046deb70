package graft

import org.apache.spark.sql.functions._
import graft.etl.BtcPipeline

/** Golden test over the full reference dataset (/root/reference/dataset-test,
  * read-only): 732 daily CSVs, 2011-12-31 → 2013-12-31. Expected values
  * pinned from an independent DuckDB scan of the same files (SURVEY §5,
  * FIXTURES §A.4). */
class BtcPipelineSpec extends SparkSpec {

  private val refDir = "/root/reference/dataset-test"

  private lazy val out = BtcPipeline.transform(spark, refDir).cache()

  test("golden: post-drop row count (how='all' on 7 metrics)") {
    assert(out.count() === 346394L)
  }

  test("golden: pre-drop row count = 1,053,608 over 732 files") {
    val raw = spark.read.option("header", "true")
      .schema(graft.etl.Schemas.btcCsv).csv(refDir)
    assert(raw.count() === 1053608L)
    assert(raw.select(input_file_name()).distinct().count() === 732L)
  }

  test("golden: min/max date_time") {
    val r = out.agg(
      date_format(min("date_time"), "yyyy-MM-dd HH:mm:ss"),
      date_format(max("date_time"), "yyyy-MM-dd HH:mm:ss")).head()
    assert(r.getString(0) === "2011-12-31 07:52:00")
    assert(r.getString(1) === "2013-12-31 23:59:00")
  }

  test("golden: spot-check day total (2013-12-31: 1202 traded minutes, vol sum)") {
    val r = out.filter(to_date(col("date_time")) === lit("2013-12-31"))
      .agg(count(lit(1)), round(sum(col("volume_btc").cast("decimal(20,8)")), 6).cast("double"))
      .head()
    assert(r.getLong(0) === 1202L) // 1440 minutes, 238 empty ones dropped
    assert(r.getDouble(1) === 7919.32033)
  }

  test("sink schema matches the reference DDL shape (btc_etl.py:73-82)") {
    assert(out.columns.toSeq === graft.etl.Schemas.sinkCols)
    val types = out.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("date_time") === "timestamp")
    assert(graft.etl.Schemas.sinkCols.tail.forall(c => types(c) === "double"))
  }

  test("watch phase: streams reference-shaped files into the sink exactly once") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-watch-").toString
    val src = s"$tmp/src"; new java.io.File(src).mkdirs()
    def drop(name: String): Unit =
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"/root/reference/dataset-test/$name"),
        java.nio.file.Paths.get(s"$src/$name"))

    drop("btcusd-2013-01-01.csv")
    java.nio.file.Files.writeString( // ignored by the *.csv glob
      java.nio.file.Paths.get(s"$src/not-a-valid-name.csv.bak"), "junk")
    val q = graft.etl.BtcPipeline.watch(spark, src, s"$tmp/sink", s"$tmp/ckpt")
    q.processAllAvailable()
    val n1 = spark.read.parquet(s"$tmp/sink").count()
    assert(n1 > 0 && n1 <= 1440)

    // a new file lands while watching -> picked up incrementally
    drop("btcusd-2013-01-02.csv")
    q.processAllAvailable()
    q.stop()
    val n2 = spark.read.parquet(s"$tmp/sink").count()
    assert(n2 > n1, "new file must be ingested")

    // restart from the same checkpoint: nothing re-ingested
    val q2 = graft.etl.BtcPipeline.watch(spark, src, s"$tmp/sink", s"$tmp/ckpt")
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(s"$tmp/sink").count() === n2,
      "checkpoint restart must not duplicate rows")
  }

  test("backfill is idempotent via the ledger (FIXTURES §A.5)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-backfill-").toString
    val sink = s"$tmp/sink"
    val ledger = s"$tmp/ledger"
    // first run ingests everything; second run must add nothing
    BtcPipeline.backfill(spark, refDir, sink, ledger)
    val n1 = spark.read.parquet(sink).count()
    BtcPipeline.backfill(spark, refDir, sink, ledger)
    val n2 = spark.read.parquet(sink).count()
    assert(n1 === n2, "second backfill over the same files must be a no-op")
    assert(n1 > 0)
    // the sink is date-partitioned (hypertable analog, btc_etl.py:99-101)
    assert(new java.io.File(sink).listFiles().exists(_.getName.startsWith("date=")))
  }

  test("cross-batch PK: replaying a processed file after ledger loss adds zero rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-replay-").toString
    val src = s"$tmp/src"; new java.io.File(src).mkdirs()
    for (name <- Seq("btcusd-2013-01-01.csv", "btcusd-2013-01-02.csv"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"/root/reference/dataset-test/$name"),
        java.nio.file.Paths.get(s"$src/$name"))
    val sink = s"$tmp/sink"
    BtcPipeline.backfill(spark, src, sink, s"$tmp/ledger")
    val n1 = spark.read.parquet(sink).count()
    assert(n1 > 0)
    // simulate ledger loss: the file-level skip is gone, the file is
    // re-read — but the sink-side PK anti-join must reject every row
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$tmp/ledger"))
    BtcPipeline.backfill(spark, src, sink, s"$tmp/ledger")
    assert(spark.read.parquet(sink).count() === n1,
      "replayed rows must be rejected by the cross-batch PK anti-join")
  }

  test("NOT NULL PK: null-Time rows are dropped and cannot multiply on replay") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-nullpk-").toString
    val src = s"$tmp/src"; new java.io.File(src).mkdirs()
    // a null Time with non-null metrics survives dropna(how='all') but
    // yields a null date_time — the reference's PRIMARY KEY would reject it
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$src/btcusd-2013-02-01.csv"),
      """Time,Open,High,Low,Close,Volume_(BTC),Volume_(Currency),Weighted_Price
        |,1,2,3,4,5,6,7
        |00:01:00,1,2,3,4,5,6,7
        |""".stripMargin)
    val sink = s"$tmp/sink"
    BtcPipeline.backfill(spark, src, sink, s"$tmp/ledger")
    val rows1 = spark.read.parquet(sink)
    assert(rows1.count() === 1L, "null date_time row must not reach the sink")
    assert(rows1.filter(col("date_time").isNull).count() === 0L)
    // ledger loss + replay: null keys never match a left_anti join, so
    // without the NOT NULL filter every replay would append another null row
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$tmp/ledger"))
    BtcPipeline.backfill(spark, src, sink, s"$tmp/ledger")
    assert(spark.read.parquet(sink).count() === 1L,
      "replay after ledger loss must add zero rows, including null-PK rows")
  }

  test("dedupPk keeps the lexicographically-smallest metric row per key") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2013-01-01 00:00:00")
    val conflicting = Seq(
      (ts, 9.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0),
      (ts, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0),
      (java.sql.Timestamp.valueOf("2013-01-01 00:01:00"), 8.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0),
    ).toDF(graft.etl.Schemas.sinkCols: _*)
    // deterministic regardless of input order / partitioning
    for (df <- Seq(conflicting, conflicting.orderBy(col("open_price").desc).repartition(7))) {
      val kept = BtcPipeline.dedupPk(df).orderBy("date_time").collect()
      assert(kept.length === 2)
      assert(kept(0).getDouble(1) === 1.0, "min metric tuple survives")
      assert(kept(1).getDouble(1) === 8.0)
    }
  }
}
