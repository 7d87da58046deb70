package graft.operators

import graft.Ckpt.Ops
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.CrossFns._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Vector math runs on quantised integers (floor(x*1e6)) so results are
  * bit-reproducible across engines — see CrossFns.quantize. The final
  * cosine is a fixed dag of double ops on identical int64 operands.
  *
  * Scale path: brute force is the correctness baseline (linear per probe,
  * broadcast-nested-loop — no shuffle of the corpus). The LSH/IVF variants
  * bucket the corpus first so each probe only scans its bucket.
  */
object Similarity {

  /** vec_id, qv (quantised), nrm (integer self-dot). Zero-norm vectors are
    * dropped — cosine undefined. */
  def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("nrm", qdot(col("qv"), col("qv")))
      .filter(col("nrm") > 0)

  /** Brute-force top-k cosine for a probe set. The probe side is tiny and
    * broadcast; the corpus streams through map-side — one pass, no shuffle
    * until the per-probe top-k (k rows per probe). */
  def bruteForceTopK(emb: DataFrame, probePred: org.apache.spark.sql.Column, k: Int): DataFrame = {
    val q = quantized(emb)
    val probes = q.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("qv").as("pqv"), col("nrm").as("pnrm"))
    val pairs = broadcast(probes).join(q, col("probe_id") =!= col("vec_id"))
      .withColumn("cosine", qcosine(qdot(col("pqv"), col("qv")), col("pnrm"), col("nrm")))
    val w = Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("vec_id"))
    pairs
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      // bigint: DuckDB's row_number is int64, Spark's int32 — match schemas
      .select(col("probe_id"), col("vec_id"), col("rk").cast("long").as("rk"), col("cosine"))
  }

  /** SQ8 scalar-quantised search: coarse-rank candidates by the dot
    * product of SYMMETRIC INT8 codes (q8 = sign·(|q|·127 div max|q|),
    * max|q| a corpus scalar — at rest these are 1 byte/dim, an 8×
    * narrower candidate scan than the micro-unit vectors), keep the
    * `refine` deepest per probe, rerank that shortlist by the exact
    * cosine. The third compression point on the recall/scan-width curve
    * beside IVF (prune by cell) and IVF-PQ (codebook compression):
    * SQ8 scans everything but reads almost nothing per row.
    *
    * All integer steps are exact and engine-identical (sign-magnitude
    * truncating division; int8 dots ≤ 64·127² ≪ int64); only the rerank
    * cosine is the standard float dag. Probe side broadcasts; the
    * corpus streams map-side; the only shuffle is the per-probe top-R.
    * max|q| rides a 1-row crossJoin (the audited scalar pattern). */
  def sq8TopK(emb: DataFrame, k: Int, refine: Int,
      probePred: org.apache.spark.sql.Column): DataFrame = {
    require(refine >= k)
    val q = quantized(emb)
    val mF = q.agg(
      max(expr("aggregate(qv, CAST(0 AS BIGINT), (a, x) -> greatest(a, abs(x)))"))
        .as("m"))
    val coded = q.crossJoin(broadcast(mF))
      .withColumn("q8", expr(
        "transform(qv, x -> (CASE WHEN x < 0 THEN -1 ELSE 1 END) * " +
          "((abs(x) * 127) div m))"))
    val probes = coded.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("qv").as("pqv"),
        col("nrm").as("pnrm"), col("q8").as("p8"))
    val wc = Window.partitionBy("probe_id").orderBy(col("coarse").desc, col("vec_id"))
    val wr = Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("vec_id"))
    broadcast(probes).join(coded, col("probe_id") =!= col("vec_id"))
      .withColumn("coarse", qdot(col("p8"), col("q8")))
      .withColumn("crk", row_number().over(wc))
      .filter(col("crk") <= refine)
      .withColumn("cosine", qcosine(qdot(col("pqv"), col("qv")), col("pnrm"), col("nrm")))
      .withColumn("rk", row_number().over(wr))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("vec_id"), col("rk").cast("long").as("rk"),
        col("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold.
    * All-pairs here (fine at testdata scale); at 100 TB the LSH-bucketed
    * variant below bounds the pair space first. */
  def cosinePairs(emb: DataFrame, threshold: Double): DataFrame = {
    val q = quantized(emb)
    val a = q.select(col("vec_id").as("vec_a"), col("qv").as("qa"), col("nrm").as("na"))
    val b = q.select(col("vec_id").as("vec_b"), col("qv").as("qb"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine", qcosine(qdot(col("qa"), col("qb")), col("na"), col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** IVF (inverted-file) approximate top-k: the corpus is partitioned into
    * K centroid cells (deterministic "training": the first K vectors by
    * vec_id are the centroids); a probe searches only its nprobe nearest
    * cells. At 100 TB this bounds each probe to ~nprobe/K of the corpus and
    * the cell assignment is a single map-side pass over the data (centroids
    * broadcast); the only shuffle keys on the small cell id.
    *
    * Assignment argmax is computed as array_max over (cosine, -cid) structs
    * — no per-vector window/shuffle; ties break toward the smaller cid. */
  def ivfTopK(emb: DataFrame, k: Int, numCentroids: Int, nprobe: Int,
      probePred: org.apache.spark.sql.Column): DataFrame = {
    val q = quantized(emb)

    // "Training": centroids live on the driver (K × dim longs — the same
    // place a trained IVF index keeps them), then ride the task binary to
    // executors as ONE referenced object (expressions.IvfIndex). The plan
    // holds three array literals and a single native expression, so
    // analysis/codegen cost is independent of K — the previous
    // K-struct-literal formulation blew up the expression tree and
    // generated code at the K≈10⁴⁺ a 100 TB index needs. Assignment stays
    // a pure per-row map: NO join, NO aggregation, NO shuffle.
    val cents: Array[(Long, Seq[Long], Long)] = q.filter(col("vec_id") < numCentroids)
      .select(col("vec_id"), col("qv"), col("nrm"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1)

    val cidsL = typedLit(cents.map(_._1).toSeq)
    val cqvsL = typedLit(cents.map(_._2).toSeq)
    val cnrmsL = typedLit(cents.map(_._3).toSeq)
    // top-n nearest cell ids for a vector, by (cosine desc, cid asc)
    def cells(n: Int) =
      call_function("graft_ivf_cells", col("qv"), col("nrm"), cidsL, cqvsL, cnrmsL, lit(n))

    val assigned = q
      .withColumn("cid", element_at(cells(1), 1))
      .select(col("vec_id"), col("qv"), col("nrm"), col("cid"))

    val probes = q.filter(probePred)
      .select(
        col("vec_id").as("probe_id"), col("qv").as("pqv"), col("nrm").as("pnrm"),
        explode(cells(nprobe)).as("cid"))

    broadcast(probes).join(assigned, Seq("cid"))
      .filter(col("probe_id") =!= col("vec_id"))
      .withColumn("cosine", qcosine(qdot(col("pqv"), col("qv")), col("pnrm"), col("nrm")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("vec_id"), col("rk").cast("long").as("rk"), col("cosine"))
  }

  /** Deterministic Lloyd trainer shared by the trained-IVF probe path and
    * SemDeDup: initial centroids = the first K corpus vectors (renumbered
    * 0..K-1); each iteration is one map-side assignment pass + one
    * (cid, pos) hash agg, centroids recomputed as TRUNCATED integer means
    * (int64 `s/n` — identical to DuckDB `//`; float means would be
    * accumulation-order-dependent). Empty cells keep their previous
    * centroid. Driver holds K×dim longs — index-training footprint only. */
  private def lloydCentroids(q: DataFrame, numCentroids: Int,
      iterations: Int): Array[(Long, Array[Long], Long)] =
    lloydIterate(q, iterations,
      q.filter(col("vec_id") < numCentroids)
        .select(col("vec_id"), col("qv"), col("nrm"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
        .sortBy(_._1).zipWithIndex
        .map { case ((_, qv, nrm), i) => (i.toLong, qv, nrm) })

  /** [[lloydCentroids]] for corpora whose vec_ids are ARBITRARY (graph
    * node ids, not dense 0..N, where `vec_id < K` could seed an empty or
    * undersized set): seeds = the first K vectors in vec_id order,
    * renumbered 0..K−1. Same deterministic truncated-integer-mean
    * iteration. */
  private[graft] def lloydCentroidsQ(q: DataFrame, numCentroids: Int,
      iterations: Int): Array[(Long, Array[Long], Long)] =
    lloydIterate(q, iterations,
      q.orderBy("vec_id").limit(numCentroids)
        .select(col("vec_id"), col("qv"), col("nrm"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
        .sortBy(_._1).zipWithIndex
        .map { case ((_, qv, nrm), i) => (i.toLong, qv, nrm) })

  /** The shared Lloyd iteration: per round ONE map-side assignment pass
    * (centroids ride the task binary as a referenced object) + one
    * (cid, pos) hash agg; new centroid = truncated integer mean (`s/n`,
    * identical to DuckDB `//` which also truncates toward zero). Empty
    * cells keep their previous centroid. */
  private def lloydIterate(q: DataFrame, iterations: Int,
      init: Array[(Long, Array[Long], Long)]): Array[(Long, Array[Long], Long)] = {
    var cents = init

    def cellsExpr(n: Int) = call_function("graft_ivf_cells", col("qv"), col("nrm"),
      typedLit(cents.map(_._1).toSeq), typedLit(cents.map(_._2.toSeq).toSeq),
      typedLit(cents.map(_._3).toSeq), lit(n))

    for (_ <- 1 to iterations) {
      val sums = q.withColumn("cid", element_at(cellsExpr(1), 1))
        .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy("cid", "pos").agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      val byCid = sums.groupBy(_._1)
      cents = cents.map { case (cid, prev, prevNrm) =>
        byCid.get(cid) match {
          case Some(rows) =>
            val c = prev.clone()
            rows.foreach { case (_, pos, s, n) => c(pos) = s / n }
            (cid, c, c.map(x => x * x).sum)
          case None => (cid, prev, prevNrm) // empty cell: centroid unchanged
        }
      }
    }
    cents
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", arXiv:2303.09540):
    * embedding-space near-duplicate PRUNING, not pair reporting — cluster
    * the corpus with k-means, compare only within a cluster, and drop all
    * but one of each semantic-duplicate set. Re-expressed relationally:
    * deterministic Lloyd cells ([[lloydCentroids]]), a within-cell pairwise
    * cosine (join keyed on cid — never corpus×corpus), and a one-pass keep
    * rule: a vector is pruned iff an EARLIER (smaller vec_id) vector in
    * its cell scores >= threshold against it. One-pass chaining caveat is
    * inherent and documented: in a chain a~b, b~c with cos(a,c) below
    * threshold, both b and c are pruned where a sequential greedy would
    * keep c — the stricter of the two standard SemDeDup resolutions.
    *
    * Scale shape (the paper's own cost model): pairwise work is
    * sum(cell²), controlled by K — at 100 TB, K grows with the corpus so
    * cells stay ~constant-sized; the join shuffles on cid only, and a
    * skewed giant cell is a K-tuning signal, not a plan hazard. Output is
    * one row per vector (keep + evidence), so rows-out never exceeds
    * rows-in. */
  /** Cell assignment + within-cell earlier-neighbor cosines shared by the
    * SemDeDup forms: (assigned vectors, the pairwise frame with a
    * `cosine` column over pairs vec_a < vec_id in the same cell). */
  private def semanticPairs(emb: DataFrame, numCentroids: Int,
      iterations: Int): (DataFrame, DataFrame) = {
    val q = quantized(emb)
    val cents = lloydCentroids(q, numCentroids, iterations)
    val assigned = q
      .withColumn("cid", element_at(call_function("graft_ivf_cells",
        col("qv"), col("nrm"),
        typedLit(cents.map(_._1).toSeq), typedLit(cents.map(_._2.toSeq).toSeq),
        typedLit(cents.map(_._3).toSeq), lit(1)), 1))
      .select(col("vec_id"), col("qv"), col("nrm"), col("cid"))
    val earlier = assigned.select(col("cid").as("cid_a"), col("vec_id").as("vec_a"),
      col("qv").as("qa"), col("nrm").as("na"))
    val pairs = assigned.join(earlier,
        col("cid") === col("cid_a") && col("vec_a") < col("vec_id"))
      .withColumn("cosine", qcosine(qdot(col("qa"), col("qv")), col("na"), col("nrm")))
    (assigned, pairs)
  }

  def semanticDedup(emb: DataFrame, numCentroids: Int, iterations: Int,
      threshold: Double): DataFrame = {
    val (assigned, pairs) = semanticPairs(emb, numCentroids, iterations)
    val dupCnt = pairs
      .filter(col("cosine") >= threshold)
      .groupBy("vec_id").agg(count(lit(1)).as("n_dup_earlier"))
    assigned.join(dupCnt, Seq("vec_id"), "left_outer")
      .withColumn("n_dup_earlier", coalesce(col("n_dup_earlier"), lit(0L)))
      .select(col("vec_id"), col("cid"), col("n_dup_earlier"),
        when(col("n_dup_earlier") === 0L, 1L).otherwise(0L).as("keep"))
      .orderBy("vec_id")
  }

  /** SemDeDup threshold sweep — the tuning signal the paper reads before
    * committing a prune rate: for each candidate threshold, how many
    * vectors would be pruned (= have an earlier same-cell neighbor at or
    * above it) and what fraction of the corpus that is. One pairwise pass
    * computes each vector's max earlier-neighbor cosine (doc-scale rows);
    * the sweep is then a 4-row broadcast against that summary — choosing
    * a different threshold costs nothing beyond this query. prune_ppm is
    * integer arithmetic (n*1e6/total) so the curve is engine-exact. */
  def semanticDedupSweep(emb: DataFrame, numCentroids: Int, iterations: Int,
      thresholds: Seq[Double]): DataFrame = {
    val (assigned, pairs) = semanticPairs(emb, numCentroids, iterations)
    val maxCos = pairs.groupBy("vec_id").agg(max(col("cosine")).as("max_cos"))
    val total = assigned.agg(count(lit(1)).as("n_total"))
    val th = thresholds.foldLeft(Seq.empty[org.apache.spark.sql.Column])(
      (acc, t) => acc :+ lit(t))
    maxCos
      .select(explode(array(th: _*)).as("threshold"), col("max_cos"))
      .groupBy("threshold")
      .agg(sum(when(col("max_cos") >= col("threshold"), 1L).otherwise(0L)).as("n_pruned"))
      .crossJoin(broadcast(total)) // 1-row scalar: corpus size
      // decimal(38,0) product: n_pruned × 1e6 would overflow int64 past
      // ~9.2e12 pruned rows (same guard as ivfCellCensus's load_ppm)
      .select(col("threshold"), col("n_pruned"), col("n_total"),
        expr("cast(n_pruned as decimal(38,0)) * 1000000 div n_total").as("prune_ppm"))
      .orderBy("threshold")
  }

  /** IVF with DETERMINISTIC k-means training: Lloyd iterations on exact
    * integer arithmetic. Initial centroids = the first K corpus vectors;
    * each iteration assigns every vector to its nearest centroid (the same
    * native top-cells expression the probe path uses — one map-side pass)
    * and recomputes each centroid as the TRUNCATED integer mean per
    * dimension (int64 `s/n`, identical to DuckDB's `//` — float means
    * would be accumulation-order-dependent and engine-specific). Empty
    * cells keep their previous centroid. The driver holds K×dim longs per
    * iteration — the footprint of any k-means trainer; cluster-side work
    * per iteration is one assignment pass + one (cid, pos) hash agg, both
    * linear in the corpus. */
  def ivfTrainedTopK(emb: DataFrame, k: Int, numCentroids: Int, nprobe: Int,
      iterations: Int, probePred: org.apache.spark.sql.Column): DataFrame = {
    val q = quantized(emb)
    probeWithCents(q, lloydCentroids(q, numCentroids, iterations), k, nprobe, probePred)
  }

  /** [[ivfTrainedTopK]] with SAMPLE-BOUNDED training — the FAISS posture
    * for a 100 TB index: k-means never needs the whole corpus, it needs a
    * representative sample, so Lloyd runs on the deterministic modulus
    * sample `vec_id % sampleMod = 0` (seeds = the first K sample vectors
    * in vec_id order, renumbered 0..K−1 per [[lloydCentroidsQ]]) and ONLY
    * the final assignment + probe pass touches the full corpus. Training
    * cost is thereby decoupled from corpus growth: pick sampleMod ∝
    * corpus/targetSample and each Lloyd iteration scans a ~constant-sized
    * frame while the serving path is unchanged (ScaleCheck's
    * `simsearch_ivf_train_sampled` ladder records the decoupling). The
    * sample rule is pure integer arithmetic, so the DuckDB oracle
    * reproduces the trained centroids bit-for-bit. */
  def ivfTrainedTopKSampled(emb: DataFrame, k: Int, numCentroids: Int, nprobe: Int,
      iterations: Int, sampleMod: Long,
      probePred: org.apache.spark.sql.Column): DataFrame = {
    val q = quantized(emb)
    val cents = lloydCentroidsQ(trainSample(q, sampleMod), numCentroids, iterations)
    probeWithCents(q, cents, k, nprobe, probePred)
  }

  /** Extract-and-materialise the training sample ONCE (one corpus pass,
    * via [[graft.Ckpt]]), so each Lloyd iteration scans sample-sized
    * blocks instead of re-filtering the full corpus — without this the
    * per-iteration scan stays linear in the corpus and sampling buys
    * nothing (measured: ScaleCheck's train ladder was scan-bound equal
    * before the materialisation). Total training cost becomes
    * 1 corpus pass + iterations × sample pass. */
  private def trainSample(q: DataFrame, sampleMod: Long): DataFrame =
    if (sampleMod <= 1L) q
    else q.filter(col("vec_id") % sampleMod === 0).graftCheckpoint()

  /** Shared serving tail of the trained-IVF family: assign the full
    * corpus to the given centroids (one map-side pass), explode each
    * probe into its nprobe nearest cells, equi-join, exact cosine, per
    * probe top-k. */
  private def probeWithCents(q: DataFrame, cents: Array[(Long, Array[Long], Long)],
      k: Int, nprobe: Int, probePred: org.apache.spark.sql.Column): DataFrame = {
    val assigned = assignCells(q, cents)
    val probes = q.filter(probePred)
      .select(
        col("vec_id").as("probe_id"), col("qv").as("pqv"), col("nrm").as("pnrm"),
        explode(centroidCells(cents, nprobe)).as("cid"))
    broadcast(probes).join(assigned, Seq("cid"))
      .filter(col("probe_id") =!= col("vec_id"))
      .withColumn("cosine", qcosine(qdot(col("pqv"), col("qv")), col("pnrm"), col("nrm")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("vec_id"), col("rk").cast("long").as("rk"), col("cosine"))
  }

  /** Contrastive hard-negative mining over the trained IVF index: for each
    * probe vector, the top-k most-cosine-similar vectors whose LABEL
    * differs from the probe's — the "hard negatives" an embedding-model
    * trainer pairs with each anchor (high similarity, wrong class; easy
    * negatives teach nothing). Same trained-Lloyd cells and nprobe probing
    * as [[ivfTrainedTopK]] — at scale each anchor scans nprobe cells, not
    * the corpus, and mining the negatives for N anchors is one equi-join
    * on the cell id; the label ride-along is a projection of the same
    * source row, no extra join. Ties and ordering follow the ANN family:
    * (cosine desc, vec_id). */
  def hardNegatives(emb: DataFrame, k: Int, numCentroids: Int, nprobe: Int,
      iterations: Int, probePred: org.apache.spark.sql.Column): DataFrame = {
    val q = quantized(emb)
      .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
    val cents = lloydCentroids(quantized(emb), numCentroids, iterations)

    def cellsExpr(n: Int) = call_function("graft_ivf_cells", col("qv"), col("nrm"),
      typedLit(cents.map(_._1).toSeq), typedLit(cents.map(_._2.toSeq).toSeq),
      typedLit(cents.map(_._3).toSeq), lit(n))

    val assigned = q
      .withColumn("cid", element_at(cellsExpr(1), 1))
      .select(col("vec_id"), col("qv"), col("nrm"), col("label"), col("cid"))
    val probes = q.filter(probePred)
      .select(
        col("vec_id").as("probe_id"), col("qv").as("pqv"), col("nrm").as("pnrm"),
        col("label").as("plabel"), explode(cellsExpr(nprobe)).as("cid"))
    broadcast(probes).join(assigned, Seq("cid"))
      .filter(col("plabel") =!= col("label"))
      .withColumn("cosine", qcosine(qdot(col("pqv"), col("qv")), col("pnrm"), col("nrm")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("plabel"), col("vec_id"), col("label"),
        col("rk").cast("long").as("rk"), col("cosine"))
  }

  /** Nearest-cells expression for a driver-held centroid array — the same
    * single native expression the in-memory IVF paths use (centroids ride
    * the task binary as reference objects; plan size independent of K). */
  private def centroidCells(cents: Array[(Long, Array[Long], Long)], n: Int) =
    call_function("graft_ivf_cells", col("qv"), col("nrm"),
      typedLit(cents.map(_._1).toSeq), typedLit(cents.map(_._2.toSeq).toSeq),
      typedLit(cents.map(_._3).toSeq), lit(n))

  /** Cell assignment of a quantised frame against driver-held centroids:
    * one map-side pass, no shuffle. */
  private def assignCells(q: DataFrame, cents: Array[(Long, Array[Long], Long)]): DataFrame =
    q.withColumn("cid", element_at(centroidCells(cents, 1), 1))
      .select(col("vec_id"), col("qv"), col("nrm"), col("cid"))

  /** BUILD a persistent IVF index: train deterministic Lloyd centroids
    * ONCE and write the index as two parquet tables under `indexDir` —
    *
    *   - `centroids/`: (cid, cqv, cnrm) — K rows, the trained codebook;
    *   - `vectors/`:   (vec_id, qv, nrm) PARTITIONED BY cid — the
    *     inverted file. Probes scan THIS table with cell partition
    *     pruning; the raw corpus is never re-read and k-means never
    *     re-runs.
    *
    * This is the difference between a demo and a deployable index: a
    * 100 TB similarity deployment trains once, persists, probes many
    * times, and appends increments ([[ivfAppendIndex]]) — the index
    * build is one assignment pass + one partitioned write, and index
    * metadata (centroids) stays K×dim longs. */
  def ivfBuildIndex(emb: DataFrame, numCentroids: Int, iterations: Int,
      indexDir: String, sampleMod: Long = 1L): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    // a BUILD is from-scratch: clear any generation state a prior
    // ivfRebuild left, or the fresh flat tables would stay invisible
    // behind the old generation marker
    ivfResetGenerations(spark, indexDir)
    val q = quantized(emb)
    // sampleMod > 1: sample-bounded training (see ivfTrainedTopKSampled) —
    // Lloyd scans only the materialised modulus sample; assignment below
    // stays full-corpus
    val cents =
      if (sampleMod <= 1L) lloydCentroids(q, numCentroids, iterations)
      else lloydCentroidsQ(trainSample(q, sampleMod), numCentroids, iterations)
    cents.toSeq.map { case (cid, cqv, cnrm) => (cid, cqv.toSeq, cnrm) }
      .toDF("cid", "cqv", "cnrm")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
    assignCells(q, cents)
      .write.mode("overwrite").partitionBy("cid").parquet(s"$indexDir/vectors")
  }

  /** [[ivfBuildIndex]] for a PRE-QUANTISED corpus (vec_id, qv, nrm) —
    * vector tables whose components are already exact int64 (the
    * graph-embedding store: SGNS components are integers by
    * construction, so there is no float column to quantise). Zero-norm
    * vectors are dropped (cosine undefined — the [[quantized]] rule);
    * seeds per [[lloydCentroidsQ]] (first K in vec_id order, so
    * arbitrary id spaces like graph node ids work). Same two-table
    * layout: K-row `centroids/` metadata + cell-PARTITIONED `vectors/`. */
  def ivfBuildIndexQ(qRaw: DataFrame, numCentroids: Int, iterations: Int,
      indexDir: String, sampleMod: Long = 1L): Unit =
    ivfBuildIndexQImpl(qRaw, numCentroids, iterations, indexDir, sampleMod,
      rebalance = true)

  /** [[ivfBuildIndexQ]] with the pre-write REBALANCE togglable — the
    * A/B seam the r16/r17 store-layout adjudication measures through
    * (rebalance=false reproduces the 256-tiny-file write the hint
    * exists to prevent). Production callers use the public form. */
  private[graft] def ivfBuildIndexQImpl(qRaw: DataFrame, numCentroids: Int,
      iterations: Int, indexDir: String, sampleMod: Long,
      rebalance: Boolean): Unit = {
    val spark = qRaw.sparkSession
    import spark.implicits._
    ivfResetGenerations(spark, indexDir) // build = from-scratch (see ivfBuildIndex)
    // the pre-quantised corpus is often EXPENSIVE to produce (the graph
    // store: a full SGNS training) and the build consumes it 2+iterations
    // times (seed collect, each Lloyd pass, the assignment write) —
    // checkpoint once so the input pipeline runs once, not three times.
    // Deliberately NOT rebalanced (r17 adjudication): the graph input
    // arrives as the SGNS epoch's checkpoint partitioning — at local
    // scale that is ~shuffle-partition-count tiny partitions whose
    // per-job scheduling floor costs the build ~1s at sf0.1 vs an
    // AQE-coalesced input, but at corpus scale those partitions are
    // data-sized and an input rebalance would be a pure extra corpus
    // exchange. A local-only constant is exactly what this build must
    // not be tuned for; the write-side REBALANCE below is the one that
    // owns output layout.
    val q = qRaw.select(col("vec_id"), col("qv"), col("nrm"))
      .filter(col("nrm") > 0)
      .graftCheckpoint()
    // sampleMod > 1: sample-bounded training (see ivfTrainedTopKSampled)
    val cents = lloydCentroidsQ(trainSample(q, sampleMod), numCentroids, iterations)
    cents.toSeq.map { case (cid, cqv, cnrm) => (cid, cqv.toSeq, cnrm) }
      .toDF("cid", "cqv", "cnrm")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
    // Output sizing is EXPLICIT (guide §6): the assignment inherits its
    // input's partitioning — for the graph store that is the SGNS
    // epoch's checkpointed join output (~shuffle-partition-count tiny
    // partitions), and a bare partitionBy write would cut
    // partitions×K files (measured: 256 vs 8 at sf0.1, every later
    // store read paying the per-file open cost). AQE REBALANCE on the
    // cell key sizes files by DATA, not by inherited partition count —
    // locally it coalesces to a handful of files; at corpus scale it
    // splits oversized cells across files (skew-aware), the
    // write.distribution-mode=hash pattern.
    val assigned = assignCells(q, cents)
    // the REBALANCE hint is an AQE feature — with AQE disabled it is a
    // silent no-op and the write regresses to partitions×K tiny files
    // (r16 advisor finding); fall back to an explicit cid hash
    // repartition there (the plain write.distribution-mode=hash shape,
    // without AQE's skew-splitting of oversized cells)
    val sized =
      if (!rebalance) assigned
      else if (spark.sessionState.conf.adaptiveExecutionEnabled)
        assigned.hint("rebalance", col("cid"))
      else assigned.repartition(col("cid"))
    sized.write.mode("overwrite").partitionBy("cid").parquet(s"$indexDir/vectors")
  }

  /** SERVE top-k from a persisted IVF index where the PROBES are rows of
    * the index itself (self-similarity serving — "which vectors live
    * near this one", the graph-embedding query shape): zero training
    * jobs, no corpus re-read. Centroids load from the K-row metadata
    * table; the probe set is one filter pass over the vectors table
    * (broadcast — sample-bounded by probePred); each probe's candidate
    * scan then reads ONLY its nprobe cell partitions via the cid
    * equi-join against the broadcast probe side. Per-probe cost is
    * ~nprobe/K of the corpus instead of all of it — the sub-quadratic
    * serving path the brute-force contract keys are graded against. */
  def ivfProbeIndexSelf(spark: SparkSession, indexDir: String, k: Int,
      nprobe: Int, probePred: org.apache.spark.sql.Column): DataFrame = {
    val root = ivfLiveRoot(spark, indexDir)
    val cents = ivfLoadCentroids(spark, root)
    val index = spark.read.parquet(s"$root/vectors")
      // partition-column type inference may narrow cid — normalise to long
      .select(col("vec_id"), col("qv"), col("nrm"), col("cid").cast("long").as("cid"))
    val probes = index.filter(probePred)
      .withColumn("cid", explode(centroidCells(cents, nprobe)))
      .select(col("cid"), col("vec_id").as("probe_id"),
        col("qv").as("pqv"), col("nrm").as("pnrm"))
    broadcast(probes).join(index, Seq("cid"))
      .filter(col("probe_id") =!= col("vec_id"))
      .withColumn("cosine", qcosine(qdot(col("pqv"), col("qv")), col("pnrm"), col("nrm")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("vec_id"), col("rk").cast("long").as("rk"), col("cosine"))
  }

  /** Load a persisted index's centroids to the driver — K rows of index
    * METADATA (the same footprint every IVF server holds in memory). */
  def ivfLoadCentroids(spark: SparkSession, indexDir: String): Array[(Long, Array[Long], Long)] =
    spark.read.parquet(s"${ivfLiveRoot(spark, indexDir)}/centroids").collect()
      .map(r => (r.getAs[Long]("cid"), r.getAs[Seq[Long]]("cqv").toArray,
        r.getAs[Long]("cnrm")))
      .sortBy(_._1)

  /** PROBE a persisted IVF index: no training jobs — centroids load from
    * the index's K-row metadata table and the candidate scan reads the
    * cell-partitioned `vectors/` table (probed cells only; the cid
    * equi-join against the broadcast probe side prunes partitions).
    * Identical ranking semantics to [[ivfTrainedTopK]] — with the same
    * training parameters the results match bit-for-bit, which is what
    * the shared oracle checks. */
  def ivfProbePersisted(emb: DataFrame, indexDir: String, k: Int, nprobe: Int,
      probePred: org.apache.spark.sql.Column): DataFrame = {
    val spark = emb.sparkSession
    val root = ivfLiveRoot(spark, indexDir)
    val cents = ivfLoadCentroids(spark, root)
    val index = spark.read.parquet(s"$root/vectors")
      // partition-column type inference may narrow cid — normalise to long
      .select(col("vec_id"), col("qv"), col("nrm"), col("cid").cast("long").as("cid"))
    val probes = quantized(emb).filter(probePred)
      .withColumn("cid", explode(centroidCells(cents, nprobe)))
      .select(col("cid"), col("vec_id").as("probe_id"),
        col("qv").as("pqv"), col("nrm").as("pnrm"))
    broadcast(probes).join(index, Seq("cid"))
      .filter(col("probe_id") =!= col("vec_id"))
      .withColumn("cosine", qcosine(qdot(col("pqv"), col("qv")), col("pnrm"), col("nrm")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("vec_id"), col("rk").cast("long").as("rk"), col("cosine"))
  }

  /** APPEND new vectors to a persisted IVF index: assign them to the
    * EXISTING cells (centroids unchanged — the standard IVF increment;
    * retraining is a separate, explicit rebuild) and append to the
    * cell-partitioned vectors table. One map-side assignment pass + one
    * partitioned append — cost linear in the increment, not the index.
    *
    * Concurrency vs [[ivfRebuild]]: an append racing the rebuild's STAGE
    * phase is safe — its files land after the stage's recorded read set
    * and the commit replays them into the new generation. Appends must
    * not race the COMMIT itself (see the [[ivfRebuild]] contract); the
    * streaming maintenance tail (`stream_ivf_maintain`) serialises both
    * in one foreachBatch writer, which is the deployment shape. */
  def ivfAppendIndex(embNew: DataFrame, indexDir: String): Unit = {
    val spark = embNew.sparkSession
    val root = ivfLiveRoot(spark, indexDir)
    val cents = ivfLoadCentroids(spark, root)
    assignCells(quantized(embNew), cents)
      .write.mode("append").partitionBy("cid").parquet(s"$root/vectors")
  }

  /** [[ivfAppendIndex]] for a PRE-QUANTISED increment (vec_id, qv, nrm)
    * — the [[ivfBuildIndexQ]] duality, and the graph-embedding ANN
    * store's ingest shape (SGNS components are exact int64 already, so
    * there is no float column to quantise). Zero-norm rows are dropped
    * (cosine undefined — the [[quantized]] rule). Same concurrency
    * contract as [[ivfAppendIndex]]. */
  def ivfAppendIndexQ(qNew: DataFrame, indexDir: String): Unit = {
    val spark = qNew.sparkSession
    val root = ivfLiveRoot(spark, indexDir)
    val cents = ivfLoadCentroids(spark, root)
    assignCells(
      qNew.select(col("vec_id"), col("qv"), col("nrm")).filter(col("nrm") > 0),
      cents)
      .write.mode("append").partitionBy("cid").parquet(s"$root/vectors")
  }

  /** Cell-balance CENSUS of a persisted IVF index — the maintenance
    * signal [[ivfAppendIndex]] needs: appends assign into FROZEN cells,
    * so sustained drift (or a near-duplicate flood) silently skews the
    * inverted file and probe cost degrades toward a scan of the hot
    * cell. One row per cell: vector count, its load relative to the mean
    * cell (`load_ppm`, exact integer ppm — 1_000_000 = exactly
    * mean-sized), and the rebuild flag `needs_rebuild = 1` when the cell
    * holds more than `rebuildFactor`× the mean (default 2× — the
    * documented skew threshold at which a deployment should retrain
    * centroids via [[ivfBuildIndex]] rather than keep appending).
    *
    * Cost is metadata-scale by construction: the scan reads only the
    * partition column and row counts of `vectors/` (cid is a partition
    * value — no data pages), one partial-agg shuffle on K cell ids, and
    * a 1-row broadcast for the corpus totals. Run it after every append
    * batch; it is the census that converts "probe latency drifted" from
    * a mystery into a rebuild ticket. */
  def ivfCellCensus(spark: SparkSession, indexDir: String,
      rebuildFactor: Int = 2): DataFrame = {
    val perCell = spark.read.parquet(s"${ivfLiveRoot(spark, indexDir)}/vectors")
      .select(col("cid").cast("long").as("cid"))
      .groupBy("cid").agg(count(lit(1)).as("n_vectors"))
    val totals = perCell.agg(count(lit(1)).as("n_cells"),
      sum(col("n_vectors")).as("n_total"))
    perCell.crossJoin(broadcast(totals)) // 1-row scalar: observed-cell totals
      // the load products run in decimal(38,0): n_vectors × n_cells ×
      // 1e6 overflows int64 at ~1e10 vectors across thousands of cells —
      // exactly the corpus this census targets (`div` on decimals still
      // returns the exact integral long; the DuckDB oracle mirrors with
      // a HUGEINT cast)
      .select(col("cid"), col("n_vectors"),
        expr("cast(n_vectors as decimal(38,0)) * n_cells * 1000000 div n_total")
          .as("load_ppm"),
        when(col("n_vectors").cast("decimal(38,0)") * col("n_cells")
            > lit(rebuildFactor.toLong) * col("n_total"),
          1L).otherwise(0L).as("needs_rebuild"))
      .orderBy("cid")
  }

  // ---- index generations: rebuild with an atomic swap -------------------

  private val GenMarkerPrefix = ".graft_ivf_gen_"

  /** Resolve the LIVE root of a persisted IVF index. A freshly built
    * index is flat (`indexDir/{centroids,vectors}` — generation 0); each
    * [[ivfRebuild]] writes a full replacement under `indexDir/gen-<N>/`
    * and commits it with one atomic marker-file rename, after which every
    * reader/appender resolves through the highest marker. Readers never
    * observe a mixed index: a half-written generation has no marker (old
    * root stays live), and the marker rename is the single commit point —
    * the same highest-version-wins contract as the lake manifests
    * (`etl/LakeOps.scala`). Resolution cost is one directory listing. */
  private[graft] def ivfLiveRoot(spark: SparkSession, indexDir: String): String = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    ivfLiveGen(fs, root) match {
      case Some(g) => s"$indexDir/gen-$g"
      case None    => indexDir
    }
  }

  private def ivfLiveGen(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Option[Long] =
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith(GenMarkerPrefix))
      .flatMap(s => scala.util.Try(
        s.getPath.getName.stripPrefix(GenMarkerPrefix).toLong).toOption)
      .sorted.lastOption

  /** REBUILD a persisted IVF index in place — the executable remedy for
    * [[ivfCellCensus]]'s `needs_rebuild` flag: appends assign into frozen
    * cells, so sustained drift or a near-duplicate flood skews the
    * inverted file until probe cost approaches a scan of the hot cell;
    * the fix is retraining the centroids on the corpus the index actually
    * holds now. Two phases, each crash-safe:
    *
    *  1. [[ivfRebuildStage]] — read the LIVE `vectors/` table (the
    *     pre-quantised corpus; the raw embeddings are never re-read),
    *     retrain deterministic Lloyd centroids SAMPLE-BOUNDED
    *     (`sampleMod`, the [[ivfTrainedTopKSampled]] posture — training
    *     cost stays ~constant as the index grows), re-assign the full
    *     corpus in one map-side pass, and write the new K-row codebook +
    *     cell-partitioned inverted file under `indexDir/gen-<N>/` — a
    *     sibling of the live data, invisible to every reader.
    *  2. [[ivfRebuildCommit]] — one atomic marker rename makes gen N the
    *     index, then superseded generations are vacuumed. A reader
    *     resolves either the old root or the new one, never a mix; a
    *     crash between stage and commit leaves the old index live (the
    *     orphaned gen dir is overwritten by the next attempt); a crash
    *     after the marker but before the vacuum leaves only reclaimable
    *     garbage ([[ivfVacuum]] is idempotent).
    *
    * Serving downtime is zero for a probe that RESOLVES AND EXECUTES on
    * one side of the commit: resolution flips atomically with the marker
    * and each side is a complete index. The caveat is a reader that
    * resolved the OLD root and is still scanning when the superseded
    * generation is vacuumed — a DataFrame captures the resolved path at
    * read time, so the default vacuum-at-commit would yank its files
    * mid-scan. Deployments with long-running concurrent readers commit
    * with `vacuum = false` and reclaim later via an explicit
    * [[ivfVacuum]] once in-flight readers have drained — the lake-format
    * retention pattern (IvfRebuildSpec loops a live reader across
    * repeated swaps to pin this).
    *
    * Concurrency contract: SINGLE MAINTENANCE WRITER per index for
    * rebuild vs rebuild AND append vs COMMIT (two rebuilds race on the
    * same gen-N staging dir; an append racing the commit's final listing
    * can slip into the window between diff and marker). An append racing
    * the long STAGE phase is safe: the stage records the exact file set
    * it consumed (`.staged_manifest`), and the commit diffs the
    * superseded root's files against it, re-assigning any rows that
    * landed after the stage read into the new generation before the
    * marker lands — nothing is silently vacuumed. */
  def ivfRebuild(spark: SparkSession, indexDir: String, numCentroids: Int,
      iterations: Int, sampleMod: Long = 1L, vacuum: Boolean = true): Unit =
    ivfRebuildCommit(spark, indexDir,
      ivfRebuildStage(spark, indexDir, numCentroids, iterations, sampleMod),
      vacuum)

  /** Phase 1 of [[ivfRebuild]]: stage generation N+1 next to the live
    * index. Returns the staged generation number; nothing is live until
    * [[ivfRebuildCommit]]. */
  private[graft] def ivfRebuildStage(spark: SparkSession, indexDir: String,
      numCentroids: Int, iterations: Int, sampleMod: Long = 1L): Long = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gen = ivfLiveGen(fs, root).getOrElse(0L) + 1
    val live = ivfLiveRoot(spark, indexDir)
    // List the live inverted file's data files FIRST and read exactly
    // that set: the listing then IS what this stage consumed, and the
    // commit can diff it against the superseded root to catch rows a
    // concurrent ivfAppendIndex landed after this read (which would
    // otherwise be vacuumed away — data loss).
    val consumed = listParquetDataFiles(fs,
      new org.apache.hadoop.fs.Path(s"$live/vectors"))
    require(consumed.nonEmpty, s"no live vectors under $live/vectors")
    // one read feeds the seed collect, every Lloyd pass and the
    // re-assignment write — checkpoint so the scan runs once (the
    // ivfBuildIndexQ rule)
    val q = spark.read.parquet(consumed: _*)
      .select(col("vec_id"), col("qv"), col("nrm"))
      .graftCheckpoint()
    val cents = lloydCentroidsQ(trainSample(q, sampleMod), numCentroids, iterations)
    cents.toSeq.map { case (cid, cqv, cnrm) => (cid, cqv.toSeq, cnrm) }
      .toDF("cid", "cqv", "cnrm")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/gen-$gen/centroids")
    assignCells(q, cents)
      .write.mode("overwrite").partitionBy("cid").parquet(s"$indexDir/gen-$gen/vectors")
    // the stage manifest: superseded root + exact consumed-file set
    val mf = fs.create(
      new org.apache.hadoop.fs.Path(s"$indexDir/gen-$gen/$StageManifest"), true)
    try mf.write((live +: consumed).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally mf.close()
    gen
  }

  private val StageManifest = ".staged_manifest"

  /** Recursive data-file listing of a parquet table dir (hidden/_ files
    * skipped), sorted for a deterministic manifest. */
  private def listParquetDataFiles(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[String] = {
    if (!fs.exists(dir)) Seq.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = fs.listFiles(dir, true)
      while (it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) out += f.getPath.toString
      }
      out.sorted.toSeq
    }
  }

  /** Phase 2 of [[ivfRebuild]]: first REPLAY any appends that landed in
    * the superseded root after the stage read (file-listing diff against
    * the stage manifest, re-assigned with the NEW generation's centroids
    * — see the [[ivfRebuild]] concurrency contract), then THE commit
    * point — rename a dot-prefixed temp file to the generation marker
    * (atomic on every Hadoop filesystem that backs an index) — then, by
    * default, vacuum superseded data. Pass `vacuum = false` when
    * long-running readers may still be scanning the old generation and
    * reclaim later with an explicit [[ivfVacuum]] (retention pattern). */
  private[graft] def ivfRebuildCommit(spark: SparkSession, indexDir: String,
      gen: Long, vacuum: Boolean = true): Unit = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dest = new org.apache.hadoop.fs.Path(root, s"$GenMarkerPrefix$gen")
    val mfPath = new org.apache.hadoop.fs.Path(s"$indexDir/gen-$gen/$StageManifest")
    if (!fs.exists(dest) && fs.exists(mfPath)) {
      // append-replay: rows landed in the superseded root after the
      // stage read must follow the corpus into the new generation
      val lines = {
        val in = fs.open(mfPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      }
      val consumed = lines.tail.toSet
      val nowFiles = listParquetDataFiles(fs,
        new org.apache.hadoop.fs.Path(s"${lines.head}/vectors"))
      val missed = nowFiles.filterNot(consumed)
      if (missed.nonEmpty) {
        val cents = ivfLoadCentroids(spark, s"$indexDir/gen-$gen")
        // idempotent replay: a commit re-driven after a pre-marker failure
        // (e.g. the rename IOException path) recomputes the same `missed`
        // diff — anti-join on vec_id against what gen-N already holds so
        // the second drive appends nothing. Column-pruned id scan of the
        // staged generation only; assignment is deterministic, so any rows
        // the first drive landed are byte-identical to what this would
        // re-derive.
        val already = spark.read.parquet(s"$indexDir/gen-$gen/vectors")
          .select(col("vec_id"))
        val replay = spark.read.parquet(missed: _*)
          .select(col("vec_id"), col("qv"), col("nrm"))
          .join(already, Seq("vec_id"), "left_anti")
        assignCells(replay, cents)
          .write.mode("append").partitionBy("cid").parquet(s"$indexDir/gen-$gen/vectors")
      }
    }
    if (!fs.exists(dest)) { // idempotent: a re-driven commit whose marker
      val tmp = new org.apache.hadoop.fs.Path(root, //  already landed only vacuums
        s".graft_ivf_marker_tmp_${System.nanoTime()}")
      fs.create(tmp, false).close()
      if (!fs.rename(tmp, dest))
        throw new java.io.IOException(s"IVF generation commit failed: $tmp -> $dest")
    }
    if (vacuum) ivfVacuum(spark, indexDir)
  }

  /** Drop ALL generation state under an index dir — markers and gen
    * dirs — returning it to the flat layout a fresh build writes. Called
    * by the build entry points so re-building over a rebuilt index
    * cannot leave the new tables shadowed by a stale marker. */
  private def ivfResetGenerations(spark: SparkSession, indexDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root))
      for (s <- fs.listStatus(root)) {
        val n = s.getPath.getName
        if (n.startsWith(GenMarkerPrefix) || n.startsWith(".graft_ivf_marker_tmp_") ||
            (s.isDirectory && n.startsWith("gen-")))
          fs.delete(s.getPath, true)
      }
  }

  /** Reclaim superseded index generations: every gen dir below the live
    * marker, the flat gen-0 tables once a marker exists, stale markers
    * and orphaned temp markers. Idempotent — safe to re-run after a
    * crashed commit's cleanup. Never touches the live generation. */
  private[graft] def ivfVacuum(spark: SparkSession, indexDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    ivfLiveGen(fs, root).foreach { live =>
      for (s <- fs.listStatus(root)) {
        val n = s.getPath.getName
        val superseded =
          (s.isDirectory && (n == "centroids" || n == "vectors")) ||
          (s.isDirectory && n.startsWith("gen-") &&
            scala.util.Try(n.stripPrefix("gen-").toLong).toOption.exists(_ < live)) ||
          (s.isFile && n.startsWith(GenMarkerPrefix) &&
            scala.util.Try(n.stripPrefix(GenMarkerPrefix).toLong).toOption.exists(_ < live)) ||
          (s.isFile && n.startsWith(".graft_ivf_marker_tmp_"))
        if (superseded) fs.delete(s.getPath, true)
      }
    }
  }

  /** The census→rebuild LOOP closed: run [[ivfCellCensus]], and when any
    * cell crosses the `rebuildFactor`×-mean skew threshold, execute
    * [[ivfRebuild]] — retrain (sample-bounded), atomic swap, vacuum.
    * Returns whether a rebuild ran. The flag collect is K rows of index
    * metadata (the same footprint [[ivfLoadCentroids]] holds). */
  def ivfRebuildIfNeeded(spark: SparkSession, indexDir: String,
      numCentroids: Int, iterations: Int, sampleMod: Long = 1L,
      rebuildFactor: Int = 2): Boolean = {
    val skewed = ivfCellCensus(spark, indexDir, rebuildFactor)
      .agg(max(col("needs_rebuild")).as("m")).collect()(0).getLong(0) > 0
    if (skewed) ivfRebuild(spark, indexDir, numCentroids, iterations, sampleMod)
    skewed
  }

  /** IVF-PQ approximate top-k: IVF cells bound WHICH vectors a probe
    * scans (nprobe/K of the corpus); product quantization bounds HOW MANY
    * BYTES each scanned candidate costs. Every vector's residual against
    * its cell centroid is split into `numSub` subspaces and each subspace
    * encoded as the index of its nearest codeword (argmin L2, exact int64
    * arithmetic) — the candidate frame carries (cid, numSub codes,
    * reconstructed norm) instead of the full vector: at dim=64/int64
    * that's 512 B -> ~24 B per row, the ~16-21× probe-bandwidth cut an
    * IVF-PQ index exists for. Scoring is asymmetric: approx_dot =
    * dot(probe, centroid) + dot(probe, decode(codes)) with the centroid
    * from an 8-row broadcast and decode a codebook lookup (the
    * [[graft.expressions.PqCodebooks]] object rides the task binary once
    * — no bytes in the plan). Codebook "training" is deterministic (the
    * first `cbSize` residuals are the codewords), mirroring the IVF
    * centroid rule, so the DuckDB oracle reproduces every code
    * bit-identically.
    *
    * PQ scores are lossy, so the final step REFINES: the top `refine`
    * candidates by approximate score are re-ranked with exact cosines —
    * only those `refine` full vectors per probe are ever fetched (the
    * Faiss `IVFPQR`/refine pattern). Probe bandwidth is thus
    * codes-per-candidate + vectors-per-shortlist; recall loss reduces to
    * cell misses plus true neighbors the distorted scores push out of
    * the shortlist — simsearch_recall_ivfpq grades it against exact
    * truth next to the uncompressed IVF. */
  def ivfPqTopK(emb: DataFrame, k: Int, numCentroids: Int, nprobe: Int,
      numSub: Int, cbSize: Int, refine: Int,
      probePred: org.apache.spark.sql.Column): DataFrame =
    ivfPqTopK(emb, k, numCentroids, nprobe, numSub, cbSize, refine, pqIters = 0, probePred)

  /** As [[ivfPqTopK]], with `pqIters` deterministic Lloyd iterations
    * refining each subspace codebook: assign every residual subvector to
    * its nearest codeword (the same encode expression the probe path
    * uses — one map-side pass), recompute each codeword as the TRUNCATED
    * integer mean of its assignees (int64 `s/n`, the cross-engine form;
    * empty codewords keep their previous value), repeat. The driver
    * holds numSub × cbSize × subDim longs per iteration — a k-means
    * trainer's footprint; cluster-side work per iteration is one encode
    * pass + one (m, code, dim) hash agg, linear in the corpus. `refine
    * <= 0` ranks purely by PQ scores (isolates codebook quality — the
    * form the recall ladder compares). */
  def ivfPqTopK(emb: DataFrame, k: Int, numCentroids: Int, nprobe: Int,
      numSub: Int, cbSize: Int, refine: Int, pqIters: Int,
      probePred: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val spark = emb.sparkSession
    val q = quantized(emb)
    val cents: Array[(Long, Seq[Long], Long)] = q.filter(col("vec_id") < numCentroids)
      .select(col("vec_id"), col("qv"), col("nrm"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1)
    val cidsL = typedLit(cents.map(_._1).toSeq)
    val cqvsL = typedLit(cents.map(_._2).toSeq)
    val cnrmsL = typedLit(cents.map(_._3).toSeq)
    def cells(n: Int) =
      call_function("graft_ivf_cells", col("qv"), col("nrm"), cidsL, cqvsL, cnrmsL, lit(n))

    val dim = cents.head._2.length
    require(dim % numSub == 0, s"dim $dim not divisible into $numSub subspaces")
    val subDim = dim / numSub

    import spark.implicits._
    val centDf = cents.map { case (cid, cqv, _) => (cid, cqv) }.toSeq.toDF("cid", "cqv")
    val assigned = q.withColumn("cid", element_at(cells(1), 1))
    val resid = assigned.join(broadcast(centDf), Seq("cid"))
      .withColumn("rv", zip_with(col("qv"), col("cqv"), (a, b) => a - b))

    // seed codebooks: the first cbSize residuals, code = vec_id rank
    val train: Array[Array[Long]] = resid.filter(col("vec_id") < cbSize)
      .select(col("vec_id"), col("rv")).collect()
      .sortBy(_.getLong(0)).map(_.getSeq[Long](1).toArray)
    var cb = new graft.expressions.PqCodebooks(numSub, subDim,
      Array.tabulate(numSub)(m => train.map(_.slice(m * subDim, (m + 1) * subDim))))
    def pqEncode(colName: String) =
      GraftBridge.column(graft.expressions.PqEncodeExpr(UnresolvedAttribute(colName), cb))
    def pqDecode(colName: String) =
      GraftBridge.column(graft.expressions.PqDecodeExpr(UnresolvedAttribute(colName), cb))

    for (_ <- 1 to pqIters) {
      val sums = resid.withColumn("codes", pqEncode("rv"))
        .select(posexplode(col("rv")).as(Seq("pos", "v")), col("codes"))
        .withColumn("m", (col("pos") / subDim).cast("int"))
        .withColumn("i", (col("pos") % subDim).cast("int"))
        .withColumn("code", element_at(col("codes"), col("m") + 1))
        .groupBy("m", "code", "i")
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), (r.getLong(3), r.getLong(4))))
        .toMap
      cb = new graft.expressions.PqCodebooks(numSub, subDim,
        Array.tabulate(numSub, cb.codebooks.head.length) { (m, c) =>
          val prev = cb.codebooks(m)(c)
          Array.tabulate(subDim) { i =>
            sums.get((m, c, i)).map { case (s, n) => s / n }.getOrElse(prev(i))
          }
        })
    }

    // the compact candidate frame: codes + reconstructed norm, no vectors
    val encoded = resid
      .withColumn("codes", pqEncode("rv"))
      .withColumn("recon", zip_with(col("cqv"), pqDecode("codes"), (a, b) => a + b))
      .withColumn("recon_nrm", qdot(col("recon"), col("recon")))
      .filter(col("recon_nrm") > 0)
      .select("vec_id", "cid", "codes", "recon_nrm")

    val probes = q.filter(probePred)
      .select(
        col("vec_id").as("probe_id"), col("qv").as("pqv"), col("nrm").as("pnrm"),
        explode(cells(nprobe)).as("cid"))

    val scored = broadcast(probes).join(encoded, Seq("cid"))
      .join(broadcast(centDf), Seq("cid"))
      .filter(col("probe_id") =!= col("vec_id"))
      .withColumn("adot", qdot(col("pqv"), col("cqv")) + qdot(col("pqv"), pqDecode("codes")))
      .withColumn("approx_cos", qcosine(col("adot"), col("pnrm"), col("recon_nrm")))

    if (refine <= 0)
      // pure PQ ranking: no full vector is ever read for candidates
      scored
        .withColumn("rk", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("approx_cos").desc, col("vec_id"))))
        .filter(col("rk") <= k)
        .select(col("probe_id"), col("vec_id"), col("rk").cast("long").as("rk"),
          col("approx_cos"))
    else {
      val shortlist = scored
        .withColumn("ark", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("approx_cos").desc, col("vec_id"))))
        .filter(col("ark") <= refine)
        .select(col("probe_id"), col("pqv"), col("pnrm"), col("vec_id"))
      // exact re-rank of the shortlist: the only point full vectors are read
      broadcast(shortlist)
        .join(q.select(col("vec_id"), col("qv"), col("nrm")), Seq("vec_id"))
        .withColumn("cosine", qcosine(qdot(col("pqv"), col("qv")), col("pnrm"), col("nrm")))
        .withColumn("rk", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("vec_id"))))
        .filter(col("rk") <= k)
        .select(col("probe_id"), col("vec_id"), col("rk").cast("long").as("rk"),
          col("cosine"))
    }
  }

  /** Random-hyperplane LSH bucket id: sign bits of dot products with
    * NumPlanes deterministic pseudo-random hyperplanes (components derived
    * from the cross-engine char hash, so buckets reproduce anywhere).
    * Vectors sharing a bucket are near-duplicate candidates — an O(n)
    * shuffle on the bucket id replaces the O(n^2) pair space. */
  def lshBuckets(emb: DataFrame, numPlanes: Int): DataFrame =
    bucketsOf(quantized(emb), numPlanes)

  /** Bucket id for an already-quantised frame (any extra columns pass
    * through). */
  private def bucketsOf(q: DataFrame, numPlanes: Int): DataFrame = {
    // plane p component i = charHash("p:i") mod 2001 - 1000 (range [-1000,1000])
    val planeComponent = (p: Int, i: org.apache.spark.sql.Column) =>
      (charHash(concat(lit(s"$p:"), i.cast("string"))) % 2001L) - 1000L
    val bucketBits = (0 until numPlanes).map { p =>
      val dot = aggregate(
        zip_with(col("qv"), transform(sequence(lit(0), size(col("qv")) - 1), i => planeComponent(p, i)),
          (x, r) => x * r),
        lit(0L), (acc, v) => acc + v)
      when(dot >= 0, lit(1L) * (1L << p)).otherwise(lit(0L))
    }
    q.withColumn("bucket", bucketBits.reduce(_ + _))
  }

  /** LSH-bucketed top-k probe search: each probe scans only its hyperplane
    * bucket (expected corpus/2^planes of the data) — the ANN alternative to
    * IVF when no centroid training is wanted. Recall is partial by
    * construction; brute force remains the exhaustive baseline. */
  def lshTopK(emb: DataFrame, numPlanes: Int, k: Int,
      probePred: org.apache.spark.sql.Column): DataFrame = {
    val b = lshBuckets(emb, numPlanes)
    val probes = b.filter(probePred)
      .select(col("bucket"), col("vec_id").as("probe_id"), col("qv").as("pqv"), col("nrm").as("pnrm"))
    broadcast(probes).join(b, Seq("bucket"))
      .filter(col("probe_id") =!= col("vec_id"))
      .withColumn("cosine", qcosine(qdot(col("pqv"), col("qv")), col("pnrm"), col("nrm")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("vec_id"), col("rk").cast("long").as("rk"), col("cosine"))
  }

  /** Multi-probe LSH top-k: each probe scans its own bucket PLUS every
    * bucket at Hamming distance 1 (flip one hyperplane bit) — the
    * standard recall knob for hyperplane LSH. Crucially this stays an
    * EQUI-join: the probe side explodes into its 1+numPlanes candidate
    * bucket ids and joins on bucket equality, so the corpus is still
    * touched only in the probed buckets ((numPlanes+1)/2^numPlanes of
    * it) — a bit_count(xor) join predicate would instead degrade to a
    * corpus-wide nested loop. simsearch_recall vs simsearch_recall_multiprobe
    * measures what the extra buckets buy. */
  def lshMultiProbeTopK(emb: DataFrame, numPlanes: Int, k: Int,
      probePred: org.apache.spark.sql.Column): DataFrame = {
    val b = lshBuckets(emb, numPlanes)
    val neighborBuckets = array(
      (col("bucket") +: (0 until numPlanes).map(p =>
        col("bucket").bitwiseXOR(lit(1L << p)))): _*)
    val probes = b.filter(probePred)
      .select(explode(neighborBuckets).as("bucket"),
        col("vec_id").as("probe_id"), col("qv").as("pqv"), col("nrm").as("pnrm"))
    broadcast(probes).join(b, Seq("bucket"))
      .filter(col("probe_id") =!= col("vec_id"))
      .withColumn("cosine", qcosine(qdot(col("pqv"), col("qv")), col("pnrm"), col("nrm")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("vec_id"), col("rk").cast("long").as("rk"), col("cosine"))
  }

  /** Cluster-emitting embedding near-dup dedup — the scale-safe output
    * shape for heavy duplication (the pair form below grows quadratically
    * with duplicate multiplicity; see docs/SCALING.md). Two levels,
    * both O(n):
    *
    *  1. EXACT duplicates collapse first: group by the quantised vector
    *     itself (cluster-first, the same move simhashPairs makes) — an
    *     f-way-replicated corpus shrinks back to its distinct vectors
    *     before any further work, so compute AND rows-out stay flat under
    *     duplication.
    *  2. Star verification among distinct vectors: each is cosine-checked
    *     against its LSH bucket's single REPRESENTATIVE (min vec_id) —
    *     ONE exact cosine per distinct vector, never all bucket pairs.
    *     Verified members merge into the representative's cluster
    *     (member counts carry the exact-dup multiplicities); unverified
    *     vectors stay singletons. Recall vs the pair form is partial for
    *     chains a ~ b ~ c with a !~ c — the standard star-clustering
    *     tradeoff. */
  def lshCosineClusters(emb: DataFrame, numPlanes: Int, threshold: Double): DataFrame = {
    val q = quantized(emb)
      .groupBy("qv")
      .agg(min(col("vec_id")).as("vec_id"), min(col("nrm")).as("nrm"),
        count(lit(1)).as("n_copies"))
    // the bucket REPRESENTATIVE (min vec_id, with its vector) comes from
    // ONE min-struct window over the bucket — vec_ids are distinct, so
    // struct ordering picks exactly the min-id row. A single shuffle by
    // bucket, no self-joins, no persist (the previous groupBy+2-join form
    // had to cache the bucketed frame and leaked it to library callers).
    val w = Window.partitionBy("bucket")
    bucketsOf(q, numPlanes)
      .withColumn("repS", min(struct(col("vec_id"), col("qv"), col("nrm"))).over(w))
      .withColumn("rep", col("repS.vec_id"))
      .withColumn("cosine",
        qcosine(qdot(col("qv"), col("repS.qv")), col("nrm"), col("repS.nrm")))
      .withColumn("cluster",
        when(col("vec_id") === col("rep") || col("cosine") >= threshold, col("rep"))
          .otherwise(col("vec_id")))
      .groupBy("cluster").agg(sum(col("n_copies")).as("n_members"))
      .select(col("cluster").as("rep"), col("n_members"))
  }

  /** LSH-bucketed embedding near-dup pairs: hyperplane-sign buckets first,
    * exact cosine only within a bucket — the O(n) candidate pass that
    * replaces the all-pairs join at scale (recall < 1 by construction;
    * the brute-force cosinePairs is the exhaustive baseline). */
  def lshCosinePairs(emb: DataFrame, numPlanes: Int, threshold: Double): DataFrame = {
    val b = lshBuckets(emb, numPlanes)
    val a = b.select(col("bucket"), col("vec_id").as("vec_a"), col("qv").as("qa"), col("nrm").as("na"))
    val c = b.select(col("bucket"), col("vec_id").as("vec_b"), col("qv").as("qb"), col("nrm").as("nb"))
    a.join(c, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", qcosine(qdot(col("qa"), col("qb")), col("na"), col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** ε-NN RADIUS search, exact baseline: every candidate whose cosine
    * with the probe reaches `minCos` — the "all near neighbours" dual of
    * top-k, what dedup-by-threshold and retrieval-with-cutoff actually
    * want. Probes broadcast; the corpus streams map-side (linear per
    * probe — the correctness baseline the bucketed form is measured
    * against). */
  def rangeSearch(emb: DataFrame, minCos: Double,
      probePred: org.apache.spark.sql.Column): DataFrame = {
    val q = quantized(emb)
    val probes = q.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("qv").as("pqv"), col("nrm").as("pnrm"))
    broadcast(probes).join(q, col("probe_id") =!= col("vec_id"))
      .withColumn("cosine", qcosine(qdot(col("pqv"), col("qv")), col("pnrm"), col("nrm")))
      .filter(col("cosine") >= minCos)
      .select(col("probe_id"), col("vec_id"), col("cosine"))
  }

  /** Radius search through the LSH buckets: candidates limited to the
    * probe's hyperplane bucket, exact cosine only in-bucket — the O(n)
    * scale path (recall < 1 by construction; measured by
    * simsearch_recall_range against [[rangeSearch]]). */
  def rangeSearchLsh(emb: DataFrame, numPlanes: Int, minCos: Double,
      probePred: org.apache.spark.sql.Column): DataFrame = {
    val b = lshBuckets(emb, numPlanes)
    val probes = b.filter(probePred)
      .select(col("bucket"), col("vec_id").as("probe_id"),
        col("qv").as("pqv"), col("nrm").as("pnrm"))
    broadcast(probes).join(b, Seq("bucket"))
      .filter(col("probe_id") =!= col("vec_id"))
      .withColumn("cosine", qcosine(qdot(col("pqv"), col("qv")), col("pnrm"), col("nrm")))
      .filter(col("cosine") >= minCos)
      .select(col("probe_id"), col("vec_id"), col("cosine"))
  }

  /** ColBERT-style MaxSim late interaction (Khattab & Zaharia, SIGIR
    * 2020) over multi-vector representations: each embedding is split
    * into `nSub` contiguous sub-vectors ("token vectors"); the score of
    * a candidate for a probe is Σ over probe sub-vectors of the MAX
    * integer dot product against any candidate sub-vector. Raw quantised
    * dots (no normalisation) keep every score an exact BIGINT — the
    * ordering contract the oracle can mirror bit-for-bit.
    *
    * Scale: probes broadcast (tiny), the corpus streams map-side through
    * one codegen'd nested-lambda scoring expression — O(nSub²·subdim)
    * scalar work per (probe, candidate), no shuffle until the per-probe
    * top-k. The late-interaction structure is what an IVF cell or LSH
    * bucket would wrap at 100 TB: bucket first, MaxSim only in-bucket. */
  def maxSimTopK(emb: DataFrame, k: Int, nSub: Int,
      probePred: org.apache.spark.sql.Column): DataFrame = {
    val subs = emb
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("subs", expr(
        s"""transform(sequence(0, ${nSub - 1}),
           |  s -> slice(qv, s * (size(qv) div $nSub) + 1, size(qv) div $nSub))""".stripMargin))
      .select(col("vec_id"), col("subs"))
    val probes = subs.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("subs").as("ps"))
    val scored = broadcast(probes)
      .join(subs.select(col("vec_id"), col("subs").as("cs")),
        col("probe_id") =!= col("vec_id"))
      .withColumn("score", expr(
        """aggregate(ps, 0L, (acc, p) -> acc + array_max(transform(cs,
          |  c -> aggregate(zip_with(p, c, (x, y) -> x * y), 0L, (a2, v) -> a2 + v))))""".stripMargin))
    val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("vec_id"), col("rk").cast("long").as("rk"),
        col("score"))
  }
}
