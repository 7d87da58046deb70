package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.queries.Staging

/** The census→rebuild loop and its atomic generation swap
  * ([[graft.operators.Similarity.ivfRebuild]]): the `needs_rebuild` flag
  * must have an executable remedy, the swap must be invisible until its
  * single marker-rename commit point, and a rebuilt index must serve
  * exactly what a fresh build over the same corpus serves. */
class IvfRebuildSpec extends SparkSpec {

  /** The drifted-index fixture of the `simsearch_ivf_rebuild` catalog
    * key: natural build+append, then a tight positive-orthant cluster
    * (distinct vectors — balanceable, unlike a duplicate flood). */
  private def driftedIndex(tag: String): (String, org.apache.spark.sql.DataFrame) = {
    val emb = Staging.tbl(spark, sf, "embeddings")
    val idx = Staging.tmpDir(tag)
    Similarity.ivfBuildIndex(emb.filter(col("vec_id") < 400),
      numCentroids = 8, iterations = 1, indexDir = idx)
    Similarity.ivfAppendIndex(emb.filter(col("vec_id") >= 400), idx)
    val flood = emb.filter(col("vec_id") % 5 === 0)
      .select((lit(1000000L) + col("vec_id")).as("vec_id"),
        transform(col("embedding"), x => abs(x.cast("double")) + lit(1.0d))
          .as("embedding"))
    Similarity.ivfAppendIndex(flood, idx)
    val drifted = emb.select(col("vec_id"), col("embedding")).union(flood)
    (idx, drifted)
  }

  test("census flags the drifted index; rebuild clears every flag and keeps the corpus") {
    val (idx, _) = driftedIndex("ivfreb-loop")
    val pre = Similarity.ivfCellCensus(spark, idx).collect()
    assert(pre.exists(_.getAs[Long]("needs_rebuild") == 1L),
      "fixture must trip the rebuild flag before the rebuild")
    val ran = Similarity.ivfRebuildIfNeeded(spark, idx, numCentroids = 8,
      iterations = 1, sampleMod = 2L)
    assert(ran, "flagged index must trigger a rebuild")
    val post = Similarity.ivfCellCensus(spark, idx).collect()
    assert(post.forall(_.getAs[Long]("needs_rebuild") == 0L),
      s"post-rebuild census still flagged: ${post.mkString(", ")}")
    assert(post.map(_.getAs[Long]("n_vectors")).sum ==
      pre.map(_.getAs[Long]("n_vectors")).sum, "rebuild must not lose vectors")
    assert(post.map(_.getAs[Long]("load_ppm")).max <
      pre.map(_.getAs[Long]("load_ppm")).max, "rebuild must reduce the hot-cell load")
    // a balanced index does not re-trigger
    assert(!Similarity.ivfRebuildIfNeeded(spark, idx, numCentroids = 8,
      iterations = 1, sampleMod = 2L))
  }

  test("rebuilt index serves bit-identically to a fresh build over the drifted corpus") {
    val (idx, drifted) = driftedIndex("ivfreb-serve")
    Similarity.ivfRebuild(spark, idx, numCentroids = 8, iterations = 1, sampleMod = 2L)
    val fresh = Staging.tmpDir("ivfreb-fresh")
    Similarity.ivfBuildIndex(drifted, numCentroids = 8, iterations = 1,
      indexDir = fresh, sampleMod = 2L)
    val served = Similarity.ivfProbePersisted(drifted, idx, k = 5, nprobe = 2,
      probePred = col("vec_id") < 5).collect().map(_.toString).sorted.toSeq
    val freshServed = Similarity.ivfProbePersisted(drifted, fresh, k = 5, nprobe = 2,
      probePred = col("vec_id") < 5).collect().map(_.toString).sorted.toSeq
    assert(served.nonEmpty && served == freshServed,
      "rebuilt index must serve exactly what a fresh build serves")
  }

  test("crash between stage and commit leaves the old generation live; commit swaps atomically") {
    val (idx, drifted) = driftedIndex("ivfreb-crash")
    def probe() = Similarity.ivfProbePersisted(drifted, idx, k = 5, nprobe = 2,
      probePred = col("vec_id") < 5).collect().map(_.toString).sorted.toSeq
    val before = probe()
    // stage only — the "crash before commit": readers must be unaffected
    val gen = Similarity.ivfRebuildStage(spark, idx, numCentroids = 8,
      iterations = 1, sampleMod = 2L)
    assert(gen == 1L)
    assert(Similarity.ivfLiveRoot(spark, idx) == idx,
      "an uncommitted generation must not change the live root")
    assert(probe() == before, "readers must not observe a staged, uncommitted rebuild")
    // the commit point: one marker rename — after it the new gen is live
    Similarity.ivfRebuildCommit(spark, idx, gen)
    assert(Similarity.ivfLiveRoot(spark, idx) == s"$idx/gen-1")
    // vacuum (ran inside commit) reclaimed the flat gen-0 tables
    val root = new java.io.File(idx)
    assert(!new java.io.File(root, "vectors").exists(),
      "superseded flat tables must be vacuumed after commit")
    // a re-driven commit whose marker already landed is a no-op + vacuum
    Similarity.ivfRebuildCommit(spark, idx, gen)
    assert(Similarity.ivfLiveRoot(spark, idx) == s"$idx/gen-1")
    // a second rebuild bumps the generation and vacuums gen-1
    Similarity.ivfRebuild(spark, idx, numCentroids = 8, iterations = 1, sampleMod = 2L)
    assert(Similarity.ivfLiveRoot(spark, idx) == s"$idx/gen-2")
    assert(!new java.io.File(root, "gen-1").exists(),
      "superseded generation dir must be vacuumed")
  }

  test("vacuum is idempotent after a crash between marker commit and cleanup") {
    val (idx, drifted) = driftedIndex("ivfreb-vac")
    val gen = Similarity.ivfRebuildStage(spark, idx, numCentroids = 8,
      iterations = 1, sampleMod = 2L)
    // simulate "marker landed, vacuum crashed": write the marker by hand
    // and skip the cleanup ivfRebuildCommit would run
    val root = new org.apache.hadoop.fs.Path(idx)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(root, s".graft_ivf_gen_$gen"), false).close()
    // readers already resolve the committed generation despite the garbage
    assert(Similarity.ivfLiveRoot(spark, idx) == s"$idx/gen-$gen")
    assert(new java.io.File(idx, "vectors").exists(), "pre-crash state: old tables still on disk")
    val served = Similarity.ivfProbePersisted(drifted, idx, k = 5, nprobe = 2,
      probePred = col("vec_id") < 5).count()
    assert(served > 0)
    // re-running vacuum reclaims the superseded flat tables; twice is a no-op
    Similarity.ivfVacuum(spark, idx)
    Similarity.ivfVacuum(spark, idx)
    assert(!new java.io.File(idx, "vectors").exists(), "vacuum must reclaim the old tables")
    assert(Similarity.ivfProbePersisted(drifted, idx, k = 5, nprobe = 2,
      probePred = col("vec_id") < 5).count() == served)
  }

  test("rebuilding over a rebuilt dir via ivfBuildIndex resets generations") {
    val (idx, drifted) = driftedIndex("ivfreb-reset")
    Similarity.ivfRebuild(spark, idx, numCentroids = 8, iterations = 1, sampleMod = 2L)
    assert(Similarity.ivfLiveRoot(spark, idx) == s"$idx/gen-1")
    // a from-scratch BUILD over the same dir must not stay shadowed by
    // the stale generation marker
    Similarity.ivfBuildIndex(drifted, numCentroids = 8, iterations = 1, indexDir = idx)
    assert(Similarity.ivfLiveRoot(spark, idx) == idx,
      "build must reset generation state back to the flat layout")
    assert(Similarity.ivfCellCensus(spark, idx).collect()
      .map(_.getAs[Long]("n_vectors")).sum == drifted.count())
  }

  test("an append racing the stage phase is replayed into the new generation at commit") {
    val (idx, _) = driftedIndex("ivfreb-appreplay")
    val total0 = spark.read.parquet(s"${Similarity.ivfLiveRoot(spark, idx)}/vectors").count()
    val gen = Similarity.ivfRebuildStage(spark, idx, numCentroids = 8,
      iterations = 1, sampleMod = 2L)
    // concurrent ingest lands in the about-to-be-superseded live root —
    // without commit-time replay these rows would be silently vacuumed
    val emb = Staging.tbl(spark, sf, "embeddings")
    Similarity.ivfAppendIndex(
      emb.filter(col("vec_id") < 7)
        .select((col("vec_id") + lit(3000000L)).as("vec_id"), col("embedding")),
      idx)
    Similarity.ivfRebuildCommit(spark, idx, gen) // default: vacuum at commit
    val live = Similarity.ivfLiveRoot(spark, idx)
    assert(live == s"$idx/gen-1")
    val vecs = spark.read.parquet(s"$live/vectors")
    assert(vecs.count() == total0 + 7,
      "rows appended after the stage read must survive the swap")
    assert(vecs.filter(col("vec_id") >= 3000000L).count() == 7,
      "the replayed rows must be the appended ones")
    assert(!new java.io.File(idx, "vectors").exists(),
      "vacuum still reclaims the superseded root after the replay")
  }

  test("vacuum=false retention: a reader that resolved before the commit finishes; explicit vacuum reclaims") {
    val (idx, drifted) = driftedIndex("ivfreb-retain")
    // this reader resolves the OLD root now (paths capture at read time)
    val pinned = Similarity.ivfProbePersisted(drifted, idx, k = 5, nprobe = 2,
      probePred = col("vec_id") < 5)
    val gen = Similarity.ivfRebuildStage(spark, idx, numCentroids = 8,
      iterations = 1, sampleMod = 2L)
    Similarity.ivfRebuildCommit(spark, idx, gen, vacuum = false)
    assert(Similarity.ivfLiveRoot(spark, idx) == s"$idx/gen-1")
    // the pinned reader SPANS the commit — with retention it must finish
    assert(pinned.collect().nonEmpty,
      "a reader spanning a vacuum=false commit must complete its scan")
    assert(new java.io.File(idx, "vectors").exists(),
      "retention: superseded generation stays on disk until explicit vacuum")
    // maintenance-time reclamation once in-flight readers drained
    Similarity.ivfVacuum(spark, idx)
    assert(!new java.io.File(idx, "vectors").exists())
    assert(Similarity.ivfProbePersisted(drifted, idx, k = 5, nprobe = 2,
      probePred = col("vec_id") < 5).count() > 0)
  }

  test("a reader looping across repeated swaps always sees one full generation, never a mix or an error") {
    val (idx, drifted) = driftedIndex("ivfreb-race")
    // first rebuild: from here on every rebuild retrains the SAME corpus
    // with the same params, so every generation serves bit-identically —
    // any deviation a racing reader observes is a torn read
    Similarity.ivfRebuild(spark, idx, numCentroids = 8, iterations = 1, sampleMod = 2L)
    def serve(): Seq[String] = Similarity.ivfProbePersisted(drifted, idx,
      k = 5, nprobe = 2, probePred = col("vec_id") < 5)
      .collect().map(_.toString).sorted.toSeq
    val baseline = serve()
    assert(baseline.nonEmpty)
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val probes = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      while (!done.get() || probes.get() < 3) {
        try {
          val r = serve()
          probes.incrementAndGet()
          if (r != baseline) failures.add(s"torn/partial read: ${r.size} rows vs baseline ${baseline.size}")
        } catch { case e: Throwable => failures.add(s"reader error: $e"); probes.incrementAndGet() }
      }
    })
    reader.start()
    try {
      // swaps land WHILE the reader loops; retention keeps each reader's
      // resolved generation alive until its scan completes
      for (_ <- 1 to 2) {
        val g = Similarity.ivfRebuildStage(spark, idx, numCentroids = 8,
          iterations = 1, sampleMod = 2L)
        Similarity.ivfRebuildCommit(spark, idx, g, vacuum = false)
      }
    } finally {
      done.set(true)
      reader.join(120000)
    }
    assert(!reader.isAlive, "reader thread must terminate")
    assert(failures.isEmpty, s"concurrent reader failures: ${failures.toArray.mkString("; ")}")
    assert(probes.get() >= 3)
    // maintenance vacuum after the readers drain; serving unchanged
    Similarity.ivfVacuum(spark, idx)
    assert(serve() == baseline)
  }

  test("appends after a rebuild land in the live generation") {
    val (idx, _) = driftedIndex("ivfreb-app")
    Similarity.ivfRebuild(spark, idx, numCentroids = 8, iterations = 1, sampleMod = 2L)
    val emb = Staging.tbl(spark, sf, "embeddings")
    val n0 = spark.read.parquet(s"$idx/gen-1/vectors").count()
    Similarity.ivfAppendIndex(
      emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + lit(2000000L)).as("vec_id"), col("embedding")),
      idx)
    assert(spark.read.parquet(s"$idx/gen-1/vectors").count() == n0 + 10,
      "append must write into the live generation")
  }
}
