package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch backfill pipeline over a directory of `btcusd-YYYY-MM-DD.csv`
  * minute-bar files — the reference's main path (btc_etl.py:104-147)
  * re-expressed as one declarative plan.
  *
  * Scale notes (the reference processes one pandas frame per file on a
  * thread pool; this runs one Spark task per file split):
  *   - the glob scan parallelises across the cluster; with 100 TB of daily
  *     files the unit of parallelism stays the file — no shuffle anywhere
  *     in the transform (scan -> filter -> project is narrow),
  *   - the filename-validity filter and date extraction run on the
  *     already-scanned `input_file_name()`, not a separate listing pass,
  *   - the ledger anti-join broadcasts the (small) ledger; the fact side
  *     never shuffles,
  *   - the sink partitions by date, so downstream reads prune by time like
  *     the reference's TimescaleDB hypertable (btc_etl.py:99-101).
  */
object BtcPipeline {

  /** Scan + validate + transform: the per-file ETL (btc_etl.py:150-176).
    * Returns the sink-shaped frame (date_time + 7 renamed metric columns).
    * Accepts a directory or an explicit file list (the backfill passes only
    * the not-yet-ingested delta). */
  def transform(spark: SparkSession, dir: String): DataFrame =
    transformPaths(spark, Seq(dir))

  def transformPaths(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .schema(Schemas.btcCsv)
      .option("pathGlobFilter", "*.csv")
      .csv(paths: _*)
      .withColumn("_file", regexp_extract(input_file_name(), "([^/]+)$", 1))

    val valid = raw
      .filter(Ops.isValidBtcFilename(col("_file")))
      .withColumn("file_date", Ops.dateFromFilename(col("_file")))

    val kept = Ops.dropAllNull(valid, Schemas.metricCols)

    val stamped = kept
      .withColumn("date_time", Ops.makeTimestamp(col("file_date"), col("Time")))

    Ops.renameAndSelect(stamped)
  }

  /** The unbounded "watch" phase (btc_etl.py:185-228): a Structured
    * Streaming query over the same directory. The file-source checkpoint
    * replaces watchdog + the Redis processed-set with exactly-once file
    * tracking; `foreachBatch` writes each micro-batch into the same
    * date-partitioned sink as the backfill. Returns the running query —
    * callers stop() it (prod would awaitTermination). On a first start with
    * a fresh checkpoint the source lists existing files too, so a single
    * streaming query covers backfill+watch (SURVEY §2.1 #19). */
  def watch(
      spark: SparkSession,
      srcDir: String,
      sinkPath: String,
      checkpoint: String,
      maxFilesPerTrigger: Int = 16): org.apache.spark.sql.streaming.StreamingQuery = {
    val stream = spark.readStream
      .option("header", "true")
      .schema(Schemas.btcCsv)
      .option("pathGlobFilter", "*.csv")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(srcDir)
      .withColumn("_file", regexp_extract(input_file_name(), "([^/]+)$", 1))

    val shaped = {
      val valid = stream
        .filter(Ops.isValidBtcFilename(col("_file")))
        .withColumn("file_date", Ops.dateFromFilename(col("_file")))
      val kept = Ops.dropAllNull(valid, Schemas.metricCols)
      Ops.renameAndSelect(
        kept.withColumn("date_time", Ops.makeTimestamp(col("file_date"), col("Time"))))
        .withColumn("date", to_date(col("date_time")))
    }

    shaped.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.dropDuplicates("date_time")
          .write.mode("append").partitionBy("date").parquet(sinkPath)
      }
      .start()
  }

  /** Full backfill with FILE-level skip: the ledger anti-join happens on
    * the directory LISTING (metadata), before any data is read — at 100 TB
    * the job scans only the not-yet-ingested delta, exactly like the
    * reference's is_processed check before pd.read_csv
    * (btc_etl.py:115,130,152). Then: transform the delta, dedup the PK
    * within the batch (btc_etl.py:74 — a duplicate `date_time` would abort
    * the reference file's insert; we keep one deterministically), append to
    * the date-partitioned sink, and append the ledger last (sink-then-
    * ledger ordering: a crash between the two reprocesses the file into an
    * idempotent partitioned sink rather than losing it — same at-least-once
    * stance as btc_etl.py:144,180, upgraded by the streaming checkpoint in
    * the watch phase). */
  def backfill(
      spark: SparkSession,
      srcDir: String,
      sinkPath: String,
      ledgerPath: String): Unit = {
    import spark.implicits._

    val ledger: DataFrame =
      if (new java.io.File(ledgerPath).exists())
        spark.read.parquet(ledgerPath)
      else Seq.empty[String].toDF("path")

    // metadata-level listing (on HDFS/S3 this is the FileSystem listing;
    // rows = files, so "collect" is bounded by the delta file count)
    val listed = Option(new java.io.File(srcDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && f.getName.endsWith(".csv"))
      .map(_.getAbsolutePath).toSeq
    val freshPaths = Ops.antiJoinLedger(listed.toDF("path"), ledger, "path")
      .as[String].collect().sorted.toSeq
    if (freshPaths.isEmpty) return

    val fresh = transformPaths(spark, freshPaths)
      .dropDuplicates("date_time")
      .withColumn("date", to_date(col("date_time")))

    fresh
      .select((Schemas.sinkCols :+ "date").map(col): _*)
      // cluster by the partition column: one writer task per date instead
      // of tasks × dates small files
      .repartition(col("date"))
      .write.mode("append").partitionBy("date").parquet(sinkPath)

    Ops.ledgerAppend(ledger, freshPaths.toDF("path"))
      .write.mode("overwrite").parquet(ledgerPath + ".tmp")
    // atomic-ish swap so a crash mid-write never truncates the ledger
    val tmp = new java.io.File(ledgerPath + ".tmp")
    val dst = new java.io.File(ledgerPath)
    if (dst.exists()) { org.apache.commons.io.FileUtils.deleteDirectory(dst) }
    tmp.renameTo(dst)
  }
}
