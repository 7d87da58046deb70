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
    // planner-strategy injection: asOfNative must plan through the
    // extensions-registered strategy, NOT the experimental fallback
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 11:00:00")
    val l = Seq((1L, t1, 10L, 1.0)).toDF("k", "ts", "tie", "v")
    val r = Seq((1L, t0, 20L, 2.0)).toDF("k", "ts", "tie", "v")
    val df = graft.operators.AsOfJoin.asOfNative(l, r, "k", "ts", "tie", Seq("v"))
    val viaInjection = org.apache.spark.sql.GraftBridge.experimental(spark).extraStrategies.isEmpty
    val matchedTie = df.head().getAs[Long]("asof_tie")
    println(s"EXTCHECK asof_native matched_tie=$matchedTie via_injection=$viaInjection " +
      s"ok=${matchedTie == 20L && viaInjection}")
    spark.stop()
  }
}
