package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.etl.Ops
import graft.functions.CrossFns._
import Staging._

/** One oracle-checked query per reference operator (SURVEY.md §2.1 v1 keys).
  *
  * Conventions shared with [[Oracles]] so outputs hash-match DuckDB:
  *   - timestamps leave the query as `yyyy-MM-dd HH:mm:ss` strings,
  *   - double aggregations accumulate as exact DECIMAL then convert once,
  *   - every query ends in an explicit orderBy on a deterministic key.
  */
object CoreQueries {

  private val tsFmt = "yyyy-MM-dd HH:mm:ss"

  /** #1 scan_csv — real CSV scan with an explicit schema (never inferSchema:
    * at 100 TB inference is an extra full pass). Input staged 1:1 from the
    * customer table. */
  def scanCsv(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("scancsv")
    tbl(spark, dir, "customer").write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    spark.read.option("header", "true").schema(schema).csv(out)
      .orderBy("c_custkey")
  }

  /** #2 scan_directory — glob scan over a multi-file directory; one task per
    * file split, embarrassingly parallel on a cluster. */
  def scanDirectory(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("scandir")
    tbl(spark, dir, "events").select(col("event_id"), col("event_type"), col("value"))
      .repartition(8, col("event_id"))
      .write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    spark.read.option("header", "true").schema(schema)
      .option("pathGlobFilter", "*.csv").csv(out)
      .orderBy("event_id")
  }

  /** #1b scan_json — JSON-lines scan with explicit schema (the other
    * text-source format a complete engine needs; same no-inference rule). */
  def scanJson(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("scanjson")
    tbl(spark, dir, "events").select(col("event_id"), col("event_type"), col("value"))
      .repartition(4, col("event_id"))
      .write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    spark.read.schema(schema).json(out).orderBy("event_id")
  }

  /** #1b' scan_json_corrupt — PERMISSIVE ingestion of a feed with
    * malformed lines, the robustness contract real JSONL ingest needs
    * (the reference's analog is its per-file error isolation): every
    * event_id%10==0 line is written deterministically TRUNCATED, the
    * read declares `_corrupt_record`, and the report censuses good rows
    * per type (exact decimal value sums — doubles round-trip Jackson's
    * shortest representation, so the sum is bit-stable) against the
    * quarantined corrupt-line count. No inference pass, no job failure
    * on bad data: corrupt lines land in their column, scan stays one
    * pass. */
  def scanJsonCorrupt(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("scanjsoncorrupt")
    val e = tbl(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    e.select(
        when(col("event_id") % 10 === 0,
          concat(lit("{\"event_id\":"), col("event_id").cast("string"),
            lit(",\"event_type\":")))
          .otherwise(to_json(struct(col("event_id"), col("event_type"), col("value"))))
          .as("value"))
      .repartition(4)
      .write.mode("overwrite").text(out)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("_corrupt_record", StringType)))
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(out)
      .select(
        when(col("_corrupt_record").isNotNull, lit("(corrupt)"))
          .otherwise(col("event_type")).as("bucket"),
        coalesce(col("value"), lit(0.0d)).as("v"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), decSum2(col("v")).as("sum_value"))
      .orderBy("bucket")
  }

  /** #1c scan_orc — columnar ORC round trip (built-in vectorised reader;
    * predicate pushdown and column pruning work as for parquet). */
  def scanOrc(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("scanorc")
    tbl(spark, dir, "events").select(col("event_id"), col("event_type"), col("value"))
      .write.mode("overwrite").orc(out)
    spark.read.orc(out).orderBy("event_id")
  }

  /** #1d scan_xml — Spark 4's built-in XML source (merged from spark-xml):
    * element-per-row round trip with an explicit schema. XML is the one
    * text format where a field is an *element*, not a position — absent
    * elements read back as null, which the nullable events columns
    * exercise. No inference (`rowTag` + schema), same rule as CSV/JSON. */
  def scanXml(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("scanxml")
    tbl(spark, dir, "events").select(col("event_id"), col("event_type"), col("value"))
      .repartition(4, col("event_id"))
      .write.mode("overwrite").option("rowTag", "event").xml(out)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    spark.read.option("rowTag", "event").schema(schema).xml(out)
      .orderBy("event_id")
  }

  /** #1e scan_avro — row-oriented Avro round trip (the wire format of
    * Kafka/CDC feeds). Schema travels in the file; reading projects a
    * column subset so pruning still applies (Avro decodes per-record, so
    * pruning saves decode, not IO — the columnar formats stay the
    * analytics default; Avro is the ingest edge). This distribution
    * bundles AvroFileFormat in spark-sql but omits it from the
    * DataSourceRegister service list, so the short name "avro" doesn't
    * resolve — the fully-qualified format class does. */
  private val AvroFmt = "org.apache.spark.sql.avro.AvroFileFormat"

  def scanAvro(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("scanavro")
    tbl(spark, dir, "events").select(col("event_id"), col("event_type"), col("value"))
      .repartition(4, col("event_id"))
      .write.mode("overwrite").format(AvroFmt).save(out)
    spark.read.format(AvroFmt).load(out)
      .select("event_id", "event_type", "value")
      .orderBy("event_id")
  }

  /** Synthesised filename column over orders: 1-in-5 valid, four distinct
    * invalid shapes including the regex-passing-but-impossible date
    * (utils_test.py:20's day-32 case). Shared by #3/#4. */
  private def withFname(df: DataFrame): DataFrame = {
    val base = date_format(col("o_orderdate"), "yyyy-MM-dd")
    val name = when(col("o_orderkey") % 5 === 0, concat(lit("btcusd-"), base, lit(".csv")))
      .when(col("o_orderkey") % 5 === 1, concat(lit("ethusd-"), base, lit(".csv")))
      .when(col("o_orderkey") % 5 === 2, concat(lit("btcusd-"), regexp_replace(base, "-", "/"), lit(".csv")))
      .when(col("o_orderkey") % 5 === 3, concat(lit("btcusd-"), base))
      .otherwise(concat(lit("btcusd-"), substring(base, 1, 4), lit("-13-32.csv")))
    df.withColumn("fname", name)
  }

  /** #3 filter_filename_valid (utils.py:5-15). */
  def filterFilenameValid(spark: SparkSession, dir: String): DataFrame =
    withFname(tbl(spark, dir, "orders"))
      .filter(Ops.isValidBtcFilename(col("fname")))
      .select(col("o_orderkey"), col("fname"))
      .orderBy("o_orderkey")

  /** #4 project_extract_date (utils.py:19-21). */
  def projectExtractDate(spark: SparkSession, dir: String): DataFrame =
    withFname(tbl(spark, dir, "orders"))
      .filter(Ops.isValidBtcFilename(col("fname")))
      .select(
        col("o_orderkey"),
        date_format(Ops.dateFromFilename(col("fname")), "yyyy-MM-dd").as("file_date"))
      .orderBy("o_orderkey")

  /** #5 sort_by_date — total order via range-partitioned sort. */
  def sortByDate(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "events")
      .select(col("event_id"), date_format(col("ts"), tsFmt).as("ts_str"))
      .orderBy(col("ts_str"), col("event_id"))

  /** #6 filter_required_column (btc_etl.py:156-157). */
  def filterRequiredColumn(spark: SparkSession, dir: String): DataFrame = {
    val e = Ops.requireColumns(tbl(spark, dir, "events"), Seq("event_id", "ts", "value"))
    e.filter(col("ts").isNotNull)
      .select(col("event_id"), col("value"))
      .orderBy("event_id")
  }

  /** Events with deterministically synthesised nulls (the testdata has
    * none); shared by #7 and the flagship pipeline. */
  private def withSynthNulls(df: DataFrame): DataFrame = df
    .withColumn("value2", when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
    .withColumn("props2", when(col("event_id") % 3 === 0, lit(null)).otherwise(col("props")))

  /** #7 filter_dropna_all (btc_etl.py:160 how='all'): drop only when ALL
    * metric columns are null; partially-null rows kept. */
  def filterDropnaAll(spark: SparkSession, dir: String): DataFrame =
    Ops.dropAllNull(withSynthNulls(tbl(spark, dir, "events")), Seq("value2", "props2"))
      .select(col("event_id"), col("value2"), col("props2"))
      .orderBy("event_id")

  /** #8 project_make_timestamp (btc_etl.py:163): rebuild the event time from
    * a date string + time string — pure codegen'd expressions where the
    * reference ran a per-row Python lambda. */
  def projectMakeTimestamp(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "events")
      .withColumn("date_s", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("time_s", date_format(col("ts"), "HH:mm:ss"))
      .select(
        col("event_id"),
        date_format(Ops.makeTimestamp(to_date(col("date_s")), col("time_s")), tsFmt).as("date_time"))
      .orderBy("event_id")

  /** #9 project_rename (btc_etl.py:166-174): zero-cost plan aliasing. */
  def projectRename(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "lineitem")
      .withColumnsRenamed(Map(
        "l_orderkey" -> "order_key", "l_linenumber" -> "line_no",
        "l_quantity" -> "quantity", "l_extendedprice" -> "price"))
      .select(col("order_key"), col("line_no"), col("quantity"), col("price"))
      .orderBy("order_key", "line_no")

  /** #10 project_select (btc_etl.py:176): pruning projection — reaches the
    * parquet scan as ReadSchema (verified in PlanSpec). */
  def projectSelect(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
      .orderBy("l_orderkey", "l_linenumber")

  /** #11 antijoin_processed (utils.py:24-29): ledger = already-ingested keys;
    * broadcast left_anti keeps the fact side shuffle-free. */
  def antijoinProcessed(spark: SparkSession, dir: String): DataFrame = {
    val orders = tbl(spark, dir, "orders")
    val ledger = orders.filter(col("o_orderkey") % 10 < 3).select("o_orderkey")
    Ops.antiJoinLedger(orders, ledger, "o_orderkey")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** #12 ledger_append (utils.py:32-36): ledger ∪ new batch, distinct. */
  def ledgerAppend(spark: SparkSession, dir: String): DataFrame = {
    val orders = tbl(spark, dir, "orders")
    val ledger = orders.filter(col("o_orderkey") % 10 < 3).select("o_orderkey")
    val processed = orders.filter(col("o_orderkey") % 4 === 0).select("o_orderkey")
    Ops.ledgerAppend(ledger, processed).orderBy("o_orderkey")
  }

  /** #13 sink_append_db (btc_etl.py:179-180): two append batches into one
    * parquet sink, read back — order-insensitive, like the reference's
    * nondeterministic MT completion order. */
  def sinkAppendDb(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("sink")
    val shaped = tbl(spark, dir, "events").select(
      col("event_id"),
      date_format(col("ts"), tsFmt).as("date_time"),
      col("event_type"), col("value"))
    shaped.filter(col("event_id") % 2 === 0).write.mode("append").parquet(out)
    shaped.filter(col("event_id") % 2 === 1).write.mode("append").parquet(out)
    spark.read.parquet(out).orderBy("event_id")
  }

  /** #13b sink_jdbc_roundtrip — the reference's sink is a real SQL
    * database (pooled batched inserts into Postgres/Timescale,
    * btc_etl.py:49,179-180); this distribution ships embedded Derby, so
    * the JDBC path runs END-TO-END against a live database rather than
    * only through unit-tested option builders: two append batches stream
    * through `df.write.format("jdbc")` with [[graft.sources.JdbcSink]]'s
    * options (one connection per task, `batchsize`d addBatch inserts,
    * table auto-created by the Derby dialect), then the table is read
    * back as a PARTITIONED jdbc scan — 4 range-predicate tasks on
    * event_id, the parallel-extract shape that keeps a warehouse pull
    * from serialising through one connection. Derby quirk: REAL/DOUBLE
    * NaN is rejected by the dialect, but events has no NaN. */
  def sinkJdbcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val url = s"jdbc:derby:${tmpDir("jdbcdb")}/graftdb;create=true"
    val opts = graft.sources.JdbcSink.writerOptions(
      graft.sources.JdbcSink.JdbcOptions(url, "GRAFT_SINK", numPartitions = 4))
    val shaped = tbl(spark, dir, "events").select(
      col("event_id"),
      date_format(col("ts"), tsFmt).as("date_time"),
      col("event_type"), col("value"))
    shaped.filter(col("event_id") % 2 === 0)
      .write.format("jdbc").options(opts).mode("append").save()
    shaped.filter(col("event_id") % 2 === 1)
      .write.format("jdbc").options(opts).mode("append").save()
    val b = shaped.agg(min("event_id"), max("event_id")).head()
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", "GRAFT_SINK")
      .option("partitionColumn", "event_id")
      .option("lowerBound", b.getLong(0)).option("upperBound", b.getLong(1) + 1)
      .option("numPartitions", 4)
      .load()
      .orderBy("event_id")
  }

  /** #13c sink_jdbc_idempotent — the reference is at-least-once into its
    * DB (Redis-down or crash between to_sql and SADD replays a whole
    * file, btc_etl.py:144,180; the PK collision then FAILS the batch,
    * utils_test-documented). Here the replay is made a NO-OP instead:
    * each append anti-joins the incoming batch against the sink's
    * current keys (one pruned key-column JDBC read) so only missing
    * rows insert — a full double-append leaves exactly one copy of
    * every row, which is precisely what the oracle checks. The same
    * anti-join-before-append idiom as the parquet sink's cross-batch
    * PK guard (BtcPipeline), now live on a real database. */
  def sinkJdbcIdempotent(spark: SparkSession, dir: String): DataFrame = {
    val url = s"jdbc:derby:${tmpDir("jdbcidem")}/idemdb;create=true"
    val opts = graft.sources.JdbcSink.writerOptions(
      graft.sources.JdbcSink.JdbcOptions(url, "GRAFT_IDEM", numPartitions = 4))
    val shaped = tbl(spark, dir, "events").select(
      col("event_id"),
      date_format(col("ts"), tsFmt).as("date_time"),
      col("event_type"), col("value"))
    def appendOnce(batch: org.apache.spark.sql.DataFrame): Unit = {
      // bound the existing-keys read to the batch's key RANGE — the
      // between-filter pushes down into the database's WHERE clause.
      // NOTE: the bound shrinks the read only when arriving batches are
      // key-clustered (time/sequence-ordered ingest); a batch whose keys
      // span the whole domain (as here, where the batch IS the full
      // table) still scans ~the whole key column. Correctness never
      // depends on the bound — it is purely a pushdown optimisation.
      val r = batch.agg(min("event_id"), max("event_id")).head()
      if (r.isNullAt(0)) return // empty batch: nothing to append
      // branch on an explicit metadata probe, NOT a catch-all: any
      // failure of the existing-keys read other than "no table yet"
      // (lock timeout, connection loss) must fail the batch rather than
      // silently disable the dedup guard (see JdbcSink.tableExists)
      val existing =
        if (!graft.sources.JdbcSink.tableExists(url, "GRAFT_IDEM"))
          spark.emptyDataFrame.select(lit(0L).as("event_id")).limit(0)
        else spark.read.format("jdbc")
          .option("url", url).option("dbtable", "GRAFT_IDEM")
          .load().select("event_id")
          .filter(col("event_id").between(r.getLong(0), r.getLong(1)))
      batch.join(existing, Seq("event_id"), "left_anti")
        .write.format("jdbc").options(opts).mode("append").save()
    }
    appendOnce(shaped)
    appendOnce(shaped) // full replay — must insert zero rows
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", "GRAFT_IDEM")
      .load().orderBy("event_id")
  }

  /** #13d sink_jdbc_multirow — the reference sink's actual STATEMENT
    * shape, not just its writer options: `to_sql(..., method='multi')`
    * renders multi-row `INSERT INTO … VALUES (…),(…)` TEXT per chunk
    * from each worker thread (btc_etl.py:179-180).
    * [[graft.sources.JdbcStatementWriter]] is that writer — one
    * connection per partition task, `batchSize`-row statements, no
    * prepared placeholders (so it also writes to endpoints like hive2
    * that Spark's built-in jdbc writer cannot; the networked
    * executor-JVM leg is `graft.JdbcClusterSmoke`'s write leg). Here it
    * runs END-TO-END against live embedded Derby with the replay guard:
    * append, then a FULL replay through the anti-join (must insert zero
    * rows), then a partitioned parallel read-back — exactly one copy of
    * every row. */
  def sinkJdbcMultirow(spark: SparkSession, dir: String): DataFrame = {
    val url = s"jdbc:derby:${tmpDir("jdbcmulti")}/multidb;create=true"
    // DDL over a plain connection: the statement writer appends only.
    // Column names are QUOTED lowercase so they match the frame's
    // schema verbatim (the writer double-quotes ANSI identifiers —
    // `value` is reserved in Derby).
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("""CREATE TABLE GRAFT_MULTI ("event_id" BIGINT,
        "date_time" VARCHAR(32), "event_type" VARCHAR(32), "value" DOUBLE)""")
      finally st.close()
    } finally conn.close()
    val shaped = tbl(spark, dir, "events").select(
      col("event_id"),
      date_format(col("ts"), tsFmt).as("date_time"),
      col("event_type"), col("value"))
    val audit = graft.sources.JdbcStatementWriter.append(
      shaped.repartition(4, col("event_id")), url, "GRAFT_MULTI", batchSize = 500)
    require(audit.map(_.rows).sum > 0, "first append wrote nothing")
    val replay = graft.sources.JdbcStatementWriter
      .appendIdempotent(shaped, url, "GRAFT_MULTI", "event_id")
    require(replay.map(_.rows).sum == 0,
      s"replay must insert zero rows, inserted ${replay.map(_.rows).sum}")
    val b = shaped.agg(min("event_id"), max("event_id")).head()
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", "GRAFT_MULTI")
      .option("partitionColumn", "event_id")
      .option("lowerBound", b.getLong(0)).option("upperBound", b.getLong(1) + 1)
      .option("numPartitions", 4)
      .load().orderBy("event_id")
  }

  /** #14 ddl_create_table (btc_etl.py:70-86): idempotent CREATE TABLE in the
    * session catalog; result = resulting schema. */
  def ddlCreateTable(spark: SparkSession, dir: String): DataFrame = {
    val loc = tmpDir("ddl")
    spark.sql("DROP TABLE IF EXISTS graft_sink_tbl")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS graft_sink_tbl
         |(event_id BIGINT, date_time TIMESTAMP, event_type STRING, value DOUBLE)
         |USING PARQUET LOCATION '$loc'""".stripMargin)
    // second create must be a no-op (IF NOT EXISTS)
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS graft_sink_tbl
         |(event_id BIGINT, date_time TIMESTAMP, event_type STRING, value DOUBLE)
         |USING PARQUET LOCATION '$loc'""".stripMargin)
    spark.sql("DESCRIBE TABLE graft_sink_tbl")
      .select(col("col_name"), col("data_type"))
      .orderBy("col_name")
  }

  /** #15 ddl_partition_time (btc_etl.py:89-101, the hypertable): write
    * partitioned by day, read back, aggregate per partition — downstream
    * reads prune partitions exactly like Timescale chunk exclusion. */
  def ddlPartitionTime(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("part")
    tbl(spark, dir, "events")
      .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      // cluster rows by the partition column before partitionBy: without
      // this every task writes a file into every partition (tasks ×
      // partitions small files — a real killer at 100 TB)
      .repartition(col("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(out)
    spark.read.parquet(out)
      .groupBy(col("event_date").cast("string").as("event_date"))
      .agg(count(lit(1)).as("n"), decSum2(col("value")).as("sum_value"))
      .orderBy("event_date")
  }

  /** #18 parallel_files: aggregate over the multi-file staged directory —
    * Spark's task-per-split replaces the reference's hand-rolled
    * ThreadPoolExecutor (btc_etl.py:108-124). */
  def parallelFiles(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("parfiles")
    tbl(spark, dir, "events").select(col("event_id"), col("event_type"), col("value"))
      .repartition(8, col("event_id"))
      .write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    spark.read.option("header", "true").schema(schema).csv(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), decSum2(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  /** #19 error_isolation (btc_etl.py:141-147): corrupt cells isolated at row
    * granularity by the PERMISSIVE CSV reader — bad field -> null, row and
    * file survive (the reference fails the whole file). */
  def errorIsolation(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("errors")
    tbl(spark, dir, "events")
      .select(
        col("event_id"),
        when(col("event_id") % 11 === 0, lit("not-a-number"))
          .otherwise(col("value").cast("string")).as("value"))
      .write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("value", DoubleType)))
    spark.read.option("header", "true").option("mode", "PERMISSIVE").schema(schema).csv(out)
      .orderBy("event_id")
  }

  /** #20 pipeline_backfill (flagship, btc_etl.py:230-233): the whole batch
    * composition — require-columns, dropna(all), timestamp assembly,
    * rename/select, in-batch PK dedup — one narrow declarative plan. */
  def pipelineBackfill(spark: SparkSession, dir: String): DataFrame = {
    val e = Ops.requireColumns(tbl(spark, dir, "events"), Seq("event_id", "ts", "value", "props"))
    val kept = Ops.dropAllNull(withSynthNulls(e), Seq("value2", "props2"))
    kept
      .withColumn("date_s", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("time_s", date_format(col("ts"), "HH:mm:ss"))
      .withColumn("date_time", Ops.makeTimestamp(to_date(col("date_s")), col("time_s")))
      .dropDuplicates("event_id")
      .select(
        col("event_id"),
        date_format(col("date_time"), tsFmt).as("date_time"),
        col("event_type"), col("value2").as("value"))
      .orderBy("event_id")
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_csv" -> (scanCsv _),
    "scan_json" -> (scanJson _),
    "scan_json_corrupt" -> (scanJsonCorrupt _),
    "scan_orc" -> (scanOrc _),
    "scan_xml" -> (scanXml _),
    "scan_avro" -> (scanAvro _),
    "scan_directory" -> (scanDirectory _),
    "filter_filename_valid" -> (filterFilenameValid _),
    "project_extract_date" -> (projectExtractDate _),
    "sort_by_date" -> (sortByDate _),
    "filter_required_column" -> (filterRequiredColumn _),
    "filter_dropna_all" -> (filterDropnaAll _),
    "project_make_timestamp" -> (projectMakeTimestamp _),
    "project_rename" -> (projectRename _),
    "project_select" -> (projectSelect _),
    "antijoin_processed" -> (antijoinProcessed _),
    "ledger_append" -> (ledgerAppend _),
    "sink_append_db" -> (sinkAppendDb _),
    "sink_jdbc_roundtrip" -> (sinkJdbcRoundtrip _),
    "sink_jdbc_idempotent" -> (sinkJdbcIdempotent _),
    "sink_jdbc_multirow" -> (sinkJdbcMultirow _),
    "ddl_create_table" -> (ddlCreateTable _),
    "ddl_partition_time" -> (ddlPartitionTime _),
    "parallel_files" -> (parallelFiles _),
    "error_isolation" -> (errorIsolation _),
    "pipeline_backfill_then_watch" -> (pipelineBackfill _),
  )
}
