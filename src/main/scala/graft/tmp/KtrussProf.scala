package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Scratch profiler for graph_ktruss phases — not part of the catalog. */
object KtrussProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val li = graft.queries.Staging.tbl(spark, "/root/testdata/sf0.1", "lineitem")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"[ktp] $tag%-16s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      t0 = System.nanoTime()
    }
    val e0 = Graph.coPartEdges(li).localCheckpoint()
    println(s"[ktp] edges=${e0.count()}")
    lap("coPartEdges")
    val sup = Graph.initialSupport(e0)
    lap("initialSupport")
    val thr = 10L
    val dropped = sup.filter(col("sup") < thr).select("src", "dst").localCheckpoint()
    println(s"[ktp] dropped=${dropped.count()} of ${sup.count()}")
    lap("round1-filter")
    val survivors = sup.filter(col("sup") >= thr).localCheckpoint()
    val sup2 = Graph.initialSupport(survivors.select("src", "dst"))
    lap("round2-recount")
    val full = Graph.kTruss(Graph.coPartEdges(li), 12)
    println(s"[ktp] result rows=${full.count()}")
    lap("kTruss-total")
    spark.stop()
  }
}
