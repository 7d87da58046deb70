package graft

import org.apache.spark.sql.SparkSession

/** Throughput over the reference's own dataset (/root/reference/dataset-test,
  * 732 daily CSVs / 1,053,608 rows): the full backfill pipeline —
  * scan+validate+transform+dedup+partitioned write — end to end, the same
  * work `process_existing_files()` does in the reference
  * (tests/benchmark.py:40-45, minus the Postgres round-trip).
  * Prints one JSON line.
  */
object RefBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft-refbench-").toString
    // warm
    spark.range(1000).selectExpr("sum(id)").collect()
    val t0 = System.nanoTime()
    graft.etl.BtcPipeline.backfill(spark, "/root/reference/dataset-test",
      s"$tmp/sink", s"$tmp/ledger")
    val secs = (System.nanoTime() - t0) / 1e9
    // incremental rerun: every file ledgered -> metadata-only, no data read
    val t1 = System.nanoTime()
    graft.etl.BtcPipeline.backfill(spark, "/root/reference/dataset-test",
      s"$tmp/sink", s"$tmp/ledger")
    val incSecs = (System.nanoTime() - t1) / 1e9
    val rows = spark.read.parquet(s"$tmp/sink").count()
    println(s"""{"metric":"refbench_backfill","value":$secs,"unit":"sec","rows":$rows,"files":732,"incremental_noop_sec":$incSecs}""")
    spark.stop()
  }
}
