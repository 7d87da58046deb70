package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.SparkPlan

/** Dev tool: list catalog queries whose INITIAL physical plan contains a
  * WindowExec with an EMPTY partition spec (the single-partition
  * WindowExec scale hazard). Streaming keys are skipped — their windows
  * run inside foreachBatch jobs this scan can't see without executing. */
object WindowScan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def emptyPartWindows(p: SparkPlan): Int =
      p.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }.size
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("stream_"))
      .foreach { case (name, fn) =>
        try {
          val n = emptyPartWindows(fn(spark, sfDir).queryExecution.executedPlan)
          if (n > 0) println(s"WINDOWSCAN $name $n")
        } catch { case e: Throwable => println(s"WINDOWSCAN $name ERR ${e.getClass.getSimpleName}") }
        spark.catalog.clearCache()
      }
    println("WINDOWSCAN done")
    spark.stop()
  }
}
