package graft.tmp

import org.apache.spark.sql.SparkSession

/** Scratch profiler for ErLedger.foldBatch — not part of the catalog. */
object LedgerProf {
  def main(args: Array[String]): Unit = {
    sys.props("erledger.prof") = "1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val cust = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
    val src = graft.queries.Staging.tmpDir("lpsrc")
    cust.repartition(4).write.mode("overwrite").parquet(src)
    val base = graft.queries.Staging.tmpDir("lprof")
    val files = new java.io.File(src).listFiles().filter(_.getName.endsWith(".parquet")).sorted
    files.zipWithIndex.foreach { case (f, i) =>
      val b = spark.read.parquet(f.getAbsolutePath)
      val t0 = System.nanoTime()
      graft.etl.ErLedger.foldBatch(b, i.toLong, s"$base/hist", s"$base/fwd", s"$base/golden")
      println(f"[prof] batch $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
