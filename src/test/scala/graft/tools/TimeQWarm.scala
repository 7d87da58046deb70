package graft

/** Dev tool: warm per-query timing — `runMain graft.TimeQWarm <sfDir> <n> <key...>`
  * runs each named catalog query n times in one session and reports the
  * fastest run (steady-state comparison, noise-free of JVM/scan warmup). */
import org.apache.spark.sql.SparkSession
object TimeQWarm {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val n = args(1).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(2).foreach { key =>
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(key)(spark, dir).count()
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      println(f"TIMEQWARM $key best=${times.map(_._1).min}%.3fs " +
        f"all=${times.map(t => f"${t._1}%.2f").mkString(",")} rows=${times.head._2}")
    }
    spark.stop()
  }
}
