package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: prove the spark.sql.extensions registration path end-to-end —
  * `runMain graft.ExtCheck` builds a session with GraftExtensions only (no
  * library-side register call) and resolves the functions from SQL. */
object ExtCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val h = spark.sql("SELECT graft_char_hash('ab') AS h").head().getLong(0)
    val s = spark.sql("SELECT graft_simhash60(array('a','b')) AS s").head().getLong(0)
    println(s"EXTCHECK char_hash=$h simhash=$s ok=${h == (97L * 31 + 98) % 1000000007L}")
    spark.stop()
  }
}
