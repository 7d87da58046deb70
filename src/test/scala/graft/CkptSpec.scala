package graft

/** Contract of [[Ckpt]]: the checkpoint mode changes WHERE the eager
  * truncation blocks live (executor-local vs reliable dir), never the
  * rows. Toggling `spark.graft.checkpoint.mode` on the same session must
  * produce bit-identical results for iterative operators — the property
  * that lets a 100-TB deployment flip to `reliable` (executor-loss-safe)
  * without re-validating a single query. */
class CkptSpec extends SparkSpec {

  private def rows(key: String): Seq[String] = {
    val df = SparkEntry.queries(key)(spark, sf)
    df.collect().map(_.toString).sorted.toSeq
  }

  private def bitIdentical(key: String): Unit = {
    val prev = spark.conf.getOption(Ckpt.ModeKey)
    try {
      spark.conf.set(Ckpt.ModeKey, "local")
      val local = rows(key)
      spark.conf.set(Ckpt.ModeKey, "reliable")
      val dir = java.nio.file.Files.createTempDirectory(s"ckpt-$key").toString
      spark.conf.set(Ckpt.DirKey, dir)
      // Ckpt only applies DirKey while the context's checkpoint dir is
      // unset; pin it so THIS test's temp dir is really the one used
      spark.sparkContext.setCheckpointDir(dir)
      val reliable = rows(key)
      assert(local == reliable, s"$key differs between checkpoint modes")
      assert(local.nonEmpty, s"$key returned no rows")
    } finally {
      prev match {
        case Some(m) => spark.conf.set(Ckpt.ModeKey, m)
        case None => spark.conf.unset(Ckpt.ModeKey)
      }
    }
  }

  // One representative per iterative family that routes through Ckpt:
  // fixed-round power iteration, monotone-shrink loop, LSH band
  // pipeline, and the ER-ledger fold inside the linkage family.
  test("pagerank bit-identical across checkpoint modes")(bitIdentical("graph_pagerank"))
  test("kcore bit-identical across checkpoint modes")(bitIdentical("graph_kcore"))
  test("minhash-lsh dedup bit-identical across checkpoint modes")(bitIdentical("dedup_minhash_lsh"))
  test("label propagation bit-identical across checkpoint modes")(bitIdentical("graph_label_prop"))

  test("mode defaults by master: local on local[n], reliable elsewhere, conf wins") {
    // this suite runs on local[n] -> unset conf must resolve to `local`
    val prev = spark.conf.getOption(Ckpt.ModeKey)
    try {
      spark.conf.unset(Ckpt.ModeKey)
      assert(Ckpt.mode(spark) == "local",
        s"unset mode on master ${spark.sparkContext.master} should be local")
      // an explicit conf always wins over the master heuristic
      spark.conf.set(Ckpt.ModeKey, "reliable")
      assert(Ckpt.mode(spark) == "reliable")
      spark.conf.set(Ckpt.ModeKey, "local")
      assert(Ckpt.mode(spark) == "local")
    } finally {
      prev match {
        case Some(m) => spark.conf.set(Ckpt.ModeKey, m)
        case None => spark.conf.unset(Ckpt.ModeKey)
      }
    }
  }

  test("reliable mode writes to the configured checkpoint dir") {
    val dir = java.nio.file.Files.createTempDirectory("ckpt-probe")
    val prev = spark.conf.getOption(Ckpt.ModeKey)
    try {
      spark.conf.set(Ckpt.ModeKey, "reliable")
      spark.conf.set(Ckpt.DirKey, dir.toString)
      // force a fresh dir pickup: Ckpt only sets it when unset
      spark.sparkContext.setCheckpointDir(dir.toString)
      import Ckpt.Ops
      val out = spark.range(100).toDF("id").graftCheckpoint()
      assert(out.count() == 100)
      val files = java.nio.file.Files.walk(dir).count()
      assert(files > 1, s"no checkpoint files under $dir")
    } finally {
      prev match {
        case Some(m) => spark.conf.set(Ckpt.ModeKey, m)
        case None => spark.conf.unset(Ckpt.ModeKey)
      }
    }
  }
}
