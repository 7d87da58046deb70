package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump `.explain("formatted")` for catalog queries to files —
  * the before/after plan evidence for optimization rounds.
  *
  * Usage: runMain graft.PlanDump <outDir> [sfDir] key1 key2 ...
  * (no keys = every catalog key). One `<outDir>/<key>_<suffix>.txt` per
  * key; suffix from SPARK_GRAFT_PLAN_SUFFIX (default "before").
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <outDir> [sfDir] key1 key2 ...")
    val outDir = new java.io.File(args(0))
    val (sfDir, keys) =
      if (args.length > 1 && new java.io.File(args(1)).isDirectory)
        (args(1), args.drop(2).toSeq)
      else ("/root/testdata/sf0.001", args.drop(1).toSeq)
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    outDir.mkdirs()
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => keys.isEmpty || keys.contains(n) }
    wanted.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          new java.io.File(outDir, s"${name}_$suffix.txt").toPath, plan)
        println(s"[plandump] wrote $name")
      } catch { case e: Throwable =>
        println(s"[plandump] ERR $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
