package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Scratch micro-profiler for supportWithin's fast path. */
object SupProf {
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
    val e = Graph.coPartEdges(li).localCheckpoint()
    e.count()
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"[sp] $tag%-16s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      t0 = System.nanoTime()
    }
    def bidir(edges: org.apache.spark.sql.DataFrame) =
      edges.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val degF = bidir(e).groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
      .persist(lvl)
    val st = degF.agg(coalesce(max("d"), lit(0L)), coalesce(sum("d"), lit(0L))).head()
    println(s"[sp] maxD=${st.getLong(0)} sumD=${st.getLong(1)}")
    lap("degProbe")
    val adj = bidir(e).groupBy(col("src").as("node"))
      .agg(collect_set(col("dst")).as("nbrs")).persist(lvl)
    println(s"[sp] adjRows=${adj.count()}")
    lap("adjBuild")
    val joined = e.select("src", "dst")
      .join(broadcast(adj.select(col("node").as("src"), col("nbrs").as("ns"))), "src")
      .join(broadcast(adj.select(col("node").as("dst"), col("nbrs").as("nd"))), "dst")
      .select(col("src"), col("dst"),
        size(array_intersect(col("ns"), col("nd"))).cast("long").as("sup"))
    println(s"[sp] bcast sup>0=${joined.filter(col("sup") > 0).count()}")
    lap("bcastJoin+count")
    val ck = joined.localCheckpoint()
    ck.count()
    lap("checkpoint")
    val joined2 = e.select("src", "dst")
      .join(adj.select(col("node").as("src"), col("nbrs").as("ns")), "src")
      .join(adj.select(col("node").as("dst"), col("nbrs").as("nd")), "dst")
      .select(col("src"), col("dst"),
        size(array_intersect(col("ns"), col("nd"))).cast("long").as("sup"))
    println(s"[sp] smj sup>0=${joined2.filter(col("sup") > 0).count()}")
    lap("smjJoin+count")
    spark.stop()
  }
}
