package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen compiler, parquet reader, broadcast infra)
    // so per-query timings reflect steady state, not first-query JIT.
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      SparkEntry.queries("agg_pricing_summary")(spark, sfDir).count()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      val secs = (System.nanoTime() - t0) / 1e9
      // intra-query persist()s (jaccard/simhash reuse) must not leak into
      // the next query's timing or memory
      spark.catalog.clearCache()
      (name, secs, ok)
    }
    val timed = results.collect { case (n, s, true) => n -> s }
    val failed = results.collect { case (n, _, false) => n }
    regressionDiff(sfDir, timed, failed)
    // The driver keeps only the last ~2000 chars of output and parses the
    // JSON line out of it, so: (a) this line is the FINAL thing printed,
    // after the stderr regression diff; (b) the queries map carries the
    // slowest subset so the line stays well under the tail window. The
    // full per-query record is the committed docs/bench/<sf>.json.
    System.err.flush()
    val top = timed.sortBy(-_._2).take(20).sortBy(_._1)
    val qs = top.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = timed.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"failed":$failedJson,"queries":$qs,"full":"docs/bench/${new java.io.File(sfDir).getName}.json","sf":"$sfDir"}""")
    spark.stop()
  }

  /** Per-query regression tracking across rounds: diff against (then
    * overwrite) the committed per-sf history file docs/bench/<sf>.json.
    * (The driver's BENCH_r*.json keeps only a truncated stdout tail, so
    * the repo maintains its own full per-query record.) stderr only —
    * stdout stays the single JSON line the driver parses. Flags queries
    * that moved by >20% AND >0.3s in either direction. */
  private def regressionDiff(sfDir: String, timed: Seq[(String, Double)],
                             failed: Seq[String]): Unit = try {
    val sfName = new java.io.File(sfDir).getName
    val hist = new java.io.File(s"docs/bench/$sfName.json")
    if (hist.exists()) {
      val prev = "\"([A-Za-z0-9_]+)\":([-0-9.eE+]+)".r
        .findAllMatchIn(scala.io.Source.fromFile(hist).mkString)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
      System.err.println(s"[bench] regression diff vs ${hist.getPath}:")
      var flagged = 0
      timed.foreach { case (name, secs) =>
        prev.get(name).foreach { p =>
          val delta = secs - p
          if (math.abs(delta) > 0.3 && math.abs(delta) > 0.2 * p) {
            flagged += 1
            val dir = if (delta > 0) "SLOWER" else "faster"
            System.err.println(f"[bench]   $name%-28s $p%.2fs -> $secs%.2fs  ($dir ${math.abs(delta)}%.2fs)")
          }
        }
      }
      val newQ = timed.map(_._1).filterNot(prev.contains)
      if (newQ.nonEmpty) System.err.println(s"[bench]   new queries: ${newQ.mkString(", ")}")
      if (flagged == 0) System.err.println("[bench]   no query moved >20% and >0.3s")
    }
    if (failed.nonEmpty) {
      // A broken run must not become the next round's regression baseline.
      System.err.println(s"[bench] ${failed.size} queries FAILED (${failed.mkString(", ")}); history NOT rewritten")
    } else {
      hist.getParentFile.mkdirs()
      val json = timed.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(hist.toPath, json + "\n")
    }
  } catch { case e: Throwable => System.err.println(s"[bench] diff skipped: $e") }
}
