package graft

import org.apache.spark.sql.SparkSession

/** Throughput over the reference's own dataset (/root/reference/dataset-test,
  * 732 daily CSVs / 1,053,608 rows): the full backfill pipeline —
  * scan+validate+transform+dedup+partitioned write — end to end, the same
  * work `process_existing_files()` does in the reference
  * (tests/benchmark.py:40-45, minus the Postgres round-trip).
  *
  * Mirrors the reference's MT-vs-ST harness (tests/benchmark.py:31-50,
  * README.md:28 "20% or higher"): one single-threaded run (local[1], the
  * ST analog), then the parallel run (local[N]); speedup and %-faster are
  * computed exactly like benchmark.py:47-50. Prints one JSON line.
  */
object RefBench {

  private def newSession(cores: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.range(1000).selectExpr("sum(id)").collect() // warm codegen paths
    s
  }

  private def timeBackfill(spark: SparkSession, tmp: String): Double = {
    val t0 = System.nanoTime()
    graft.etl.BtcPipeline.backfill(spark, "/root/reference/dataset-test",
      s"$tmp/sink", s"$tmp/ledger")
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    // ST analog first, in its own session (benchmark.py runs ST then MT)
    val stSpark = newSession("1")
    val stTmp = java.nio.file.Files.createTempDirectory("graft-refbench-st-").toString
    val stSecs = timeBackfill(stSpark, stTmp)
    stSpark.stop()

    val spark = newSession(cpus)
    val tmp = java.nio.file.Files.createTempDirectory("graft-refbench-").toString
    val secs = timeBackfill(spark, tmp)
    // incremental rerun: every file ledgered -> metadata-only, no data read
    val incSecs = timeBackfill(spark, tmp)
    val rows = spark.read.parquet(s"$tmp/sink").count()

    val speedup = stSecs / secs
    val pctFaster = (speedup - 1) * 100 // benchmark.py:47-50
    println(
      s"""{"metric":"refbench_backfill","value":$secs,"unit":"sec","rows":$rows,"files":732,""" +
        s""""incremental_noop_sec":$incSecs,"st_sec":$stSecs,"mt_sec":$secs,""" +
        f""""speedup":$speedup%.2f,"pct_faster":$pctFaster%.1f,"mt_cores":$cpus}""")
    spark.stop()
  }
}
