package graft.tmp

import org.apache.spark.sql.SparkSession
import graft.operators.Graph

/** Scratch profiler for louvainMoves round scaling. */
object LouvProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.queries.Staging.tbl(spark, "/root/testdata/sf0.1", "lineitem")
    val g = Graph.coPartEdgesMin(li, 2L).localCheckpoint()
    println(s"[louv] edges=${g.count()}")
    for (r <- Seq(1, 2, 3, 4, 8)) {
      val t0 = System.nanoTime()
      Graph.louvainMoves(g, r).count()
      println(f"[louv] rounds=$r ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
