package graft

/** Dev tool: time one catalog query cold — `runMain graft.TimeQ <key> <sfDir>`. */
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(args(0))(spark, args(1)).count()
    println(s"TIMEQ ${args(0)} rows=$n secs=${(System.nanoTime()-t0)/1e9}")
    spark.stop()
  }
}
