package graft
// scratch profiling harness (test scope, not shipped)
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
object ProfTool {
  def main(a: Array[String]): Unit = {
    val pf = sys.env.getOrElse("PF", "true")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", pf)
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    @volatile var jobs = 0; @volatile var stages = 0; @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages += 1; tasks += s.stageInfo.numTasks }
    })
    def t[A](tag: String)(f: => A): A = {
      jobs = 0; stages = 0; tasks = 0
      val t0=System.nanoTime(); val r=f
      println(f"[prof] $tag%-28s ${(System.nanoTime()-t0)/1e9}%.2fs  jobs=$jobs stages=$stages tasks=$tasks"); r
    }
    graft.queries.Staging.tbl(spark, dir, "documents").count()
    graft.queries.ExtQueries.pipelineDedupReport(spark, dir).count()
    spark.catalog.clearCache()
    for (k <- Seq("pipeline_dedup_report", "dedup_cc_clusters", "link_er_clusters", "graph_triangles", "agg_pricing_summary", "join_broadcast_dim")) {
      if (SparkEntry.queries.contains(k)) {
        t(s"$k")(SparkEntry.queries(k)(spark, dir).count())
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
