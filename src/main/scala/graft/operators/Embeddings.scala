package graft.operators

import graft.Ckpt.Ops
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.CrossFns._

/** Spectral analytics over the embedding corpus: the top principal
  * component by power iteration, computed ENTIRELY in exact integer /
  * decimal arithmetic so the loadings are bit-identical across engines,
  * partitionings and reruns — the reproducibility contract every other
  * scoring operator in the library honours, extended to an iterative
  * linear-algebra op.
  *
  * Integer discipline: vectors quantise to micro-units (floor(x·1e6) —
  * CrossFns.quantize); the covariance NUMERATOR n·Σxy − Σx·Σy is exact
  * (decimal(38,0) ↔ DuckDB HUGEINT — int64 would overflow past ~5k rows);
  * each power step rescales to max|component| = 1e6 via truncated integer
  * division of non-negative operands (`div` ↔ `//`, identical semantics),
  * so magnitudes stay bounded: |cov| ≤ n²·1e12, |y| ≤ 64·|cov|·1e6
  * ≤ ~1e27 ≪ decimal(38) range. The sign is canonicalised by flipping so
  * the lowest-index component attaining max|x| is positive.
  *
  * Scale shape: the Gram pass is the only data-scale work — each row
  * flat-maps its upper-triangle elementwise products (plus a
  * diagonal-trick entry per dim for the linear sums) map-side, and
  * partial aggregation reduces every partition to dim·(dim+3)/2 groups
  * before the single shuffle (no self-join on vec_id, which would
  * shuffle the corpus; no second pass for Σq). The power steps fold
  * DRIVER-SIDE in exact BigInt arithmetic over the collected dim×dim
  * matrix — a distributed per-step form was measured at ~1s of
  * scheduler overhead per step on a matrix that fits in L2. */
object Embeddings {

  /** Exact sufficient statistics for the covariance numerator in ONE
    * data-scale pass: a per-partition dense SYRK kernel (primitive-long
    * upper-triangle multiply-accumulate, spilled into BigInt every 4096
    * rows so per-partition row counts are unbounded without overflow:
    * the kernel REQUIRES |q| ≤ 4.7e7 — checked per element, failing
    * loudly — so spillEvery·q² < 2^63 per cell between spills) emits
    * dim·(dim+3)/2 partial rows per partition; the single shuffle then
    * reduces partitions × groups rows with an exact decimal(38,0) sum.
    * Replaces the earlier per-row upper-triangle explode (2144 struct
    * allocations per row + a decimal hash-agg over rows × 2144 entries —
    * the allocation dominated the key's cost at every scale); a dense
    * Gram is genuine per-partition imperative work, the mapPartitions
    * contract's intended case. Partial sums cross the shuffle as strings
    * cast to decimal(38,0) — the default BigDecimal encoder is
    * decimal(38,18), whose 20 integer digits a big partition could
    * overflow. Returns (i, j, s, n): j = -1 rows carry Σq_i, others
    * Σ(q_i·q_j); n = total contributing rows on every group. */
  private def gramStats(emb: DataFrame, dim: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val nPairs = dim * (dim + 1) / 2
    val spillEvery = 4096
    emb.select(quantize(col("embedding")).as("qv"))
      .where(col("qv").isNotNull)
      .as[Array[Long]]
      .mapPartitions { it =>
        val accP = new Array[Long](nPairs)
        val accS = new Array[Long](dim)
        val bigP = Array.fill(nPairs)(BigInt(0))
        val bigS = Array.fill(dim)(BigInt(0))
        var n = 0L
        var sinceSpill = 0
        def spill(): Unit = {
          var p = 0
          while (p < nPairs) { bigP(p) += accP(p); accP(p) = 0L; p += 1 }
          var i = 0
          while (i < dim) { bigS(i) += accS(i); accS(i) = 0L; i += 1 }
          sinceSpill = 0
        }
        while (it.hasNext) {
          val q = it.next()
          var i = 0
          var p = 0
          while (i < dim) {
            val qi = q(i)
            // Overflow contract, checked loudly: a cell accumulates up to
            // spillEvery products, so |q| must satisfy spillEvery·q² <
            // 2^63 — |q| ≤ 4.7e7 (embedding magnitude ≤ 47 at the 1e6
            // quantise scale). Unnormalized embeddings past that would
            // silently wrap between spills and corrupt the Gram stats;
            // fail the task instead (the decimal(38,0) reduce it feeds
            // was exact for any magnitude, so the kernel must be too).
            if (qi > 47000000L || qi < -47000000L)
              throw new IllegalArgumentException(
                s"gramStats: |quantized component| $qi exceeds the int64 " +
                  "MAC bound 4.7e7 (embedding magnitude > 47); normalise " +
                  "or rescale the embedding column first")
            accS(i) += qi
            var j = i
            while (j < dim) { accP(p) += qi * q(j); p += 1; j += 1 }
            i += 1
          }
          n += 1
          sinceSpill += 1
          if (sinceSpill == spillEvery) spill()
        }
        if (n == 0L) Iterator.empty
        else {
          spill()
          val out = new Array[(Int, Int, String, Long)](nPairs + dim)
          var p = 0
          var i = 0
          while (i < dim) {
            var j = i
            while (j < dim) { out(p) = (i, j, bigP(p).toString, n); p += 1; j += 1 }
            i += 1
          }
          i = 0
          while (i < dim) { out(nPairs + i) = (i, -1, bigS(i).toString, n); i += 1 }
          out.iterator
        }
      }
      .toDF("i", "j", "sp", "np")
      .groupBy("i", "j")
      .agg(sum(col("sp").cast("decimal(38,0)")).as("s"),
        sum(col("np")).as("n"))
  }

  /** Top-principal-component loadings: (dim, loading_ppm), loading in
    * micro-units of the max-|component| (so max |loading_ppm| = 1e6
    * exactly), after `iters` power steps from the all-ones start.
    *
    * The power steps run DRIVER-SIDE in exact BigInt arithmetic over the
    * collected covariance — dim² entries (4096 at dim 64), the
    * metadata-scale collect contract (same as the centroid pull and the
    * skyline's prefix-min fold). A distributed form was measured first:
    * 8 steps of dim-row join/agg frames cost ~1s of scheduler overhead
    * EACH (and left lazy the plan doubles per step — ~99s for 8), for a
    * matrix that fits in a cache line's neighbourhood. Only the Gram
    * pass is data-scale, and it stays distributed. BigInt /, abs and
    * sign match the SQL `div`/abs/CASE semantics exactly (truncation
    * toward zero on the non-negative operands used here). */
  /** The Gram sufficient statistics as a frame — the MERGEABLE state a
    * streaming twin accumulates: sums per (i, j) key add across batches,
    * so cross-batch merging equals the one-shot corpus pass bit-for-bit. */
  def gramStatsOf(emb: DataFrame, dim: Int = 64): DataFrame = gramStats(emb, dim)

  /** Assemble C = n·Σxy − Σx·Σy from the one-pass stats, driver-side
    * (dim·(dim+3)/2 rows — metadata-scale, the centroid-pull contract). */
  private def covMatrix(emb: DataFrame, dim: Int): Array[Array[BigInt]] =
    covFromStats(gramStats(emb, dim), dim)._1

  /** (covariance numerator matrix, n). Cells zero-initialised so a
    * sparse or EMPTY stats frame (an all-null batch's Gram pass emits no
    * rows) yields an all-zero matrix instead of null BigInts NPE-ing the
    * ladder; callers gate on n == 0 for the clean empty contract. */
  private def covFromStats(stats: DataFrame, dim: Int): (Array[Array[BigInt]], BigInt) = {
    val rows = stats.collect()
    var n = BigInt(0)
    val si = Array.fill(dim)(BigInt(0))
    val sij = Array.fill(dim, dim)(BigInt(0))
    rows.foreach { r =>
      val (i, j, s) = (r.getInt(0), r.getInt(1), BigInt(r.getDecimal(2).toBigInteger))
      if (j < 0) { si(i) = s; n = BigInt(r.getLong(3)) }
      else { sij(i)(j) = s; sij(j)(i) = s }
    }
    (Array.tabulate(dim, dim)((i, j) => n * sij(i)(j) - si(i) * si(j)), n)
  }

  private val PpmScale = BigInt(1000000)

  /** `iters` power steps from the all-ones start, each rescaled to
    * max|component| = 1e6 by truncated division — RAW (no sign
    * canonicalisation; flip at output with [[canonSign]]). */
  private def powerLadder(mat: Array[Array[BigInt]], dim: Int, iters: Int): Array[BigInt] = {
    var x = Array.fill(dim)(PpmScale)
    for (_ <- 1 to iters) {
      val y = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(BigInt(0))((a, j) => a + mat(i)(j) * x(j)))
      val m = y.map(_.abs).max
      require(m > 0, "degenerate matrix: no variance along any axis")
      x = y.map(v => (if (v < 0) -BigInt(1) else BigInt(1)) * ((PpmScale * v.abs) / m))
    }
    x
  }

  /** Canonical sign: flip so the lowest dim attaining |v| = 1e6 is
    * positive. */
  private def canonSign(x: Array[BigInt]): Long =
    if (x(x.indexWhere(_.abs == PpmScale)) < 0) -1L else 1L

  def pcaPowerLoadings(emb: DataFrame, iters: Int, dim: Int = 64): DataFrame =
    pcaLoadingsFromStats(gramStats(emb, dim), iters, dim)

  /** The ladder + sign canonicalisation from an already-computed (or
    * incrementally merged — see [[gramStatsOf]]) stats frame. */
  def pcaLoadingsFromStats(stats: DataFrame, iters: Int, dim: Int = 64): DataFrame = {
    require(iters >= 1)
    val spark = stats.sparkSession
    import spark.implicits._
    val (cov, n) = covFromStats(stats, dim)
    // Empty stats (zero rows seen — e.g. a stream whose batches were all
    // null) → empty loadings frame, not an opaque NPE/require crash deep
    // in the ladder; a NON-empty degenerate matrix still fails loudly
    // via powerLadder's variance require.
    if (n == 0) Seq.empty[(Long, Long)].toDF("dim", "loading_ppm")
    else {
      val x = powerLadder(cov, dim, iters)
      val s = canonSign(x)
      x.zipWithIndex.map { case (v, i) => (i.toLong, v.toLong * s) }.toSeq
        .toDF("dim", "loading_ppm")
    }
  }

  /** SECOND principal component by exact integer Hotelling deflation:
    * run the PC1 ladder, coarsen the raw PC1 direction to per-mille
    * (v' = v div 1000 — magnitudes chosen so every oracle-side product
    * stays inside decimal(38)/HUGEINT), then power-iterate the deflated
    * matrix D = C − trunc(T·v'_i·v'_j / S²) where S = v'ᵀv' and
    * T = v'ᵀCv' — the integer form of C − λ·vvᵀ/(vᵀv) with per-entry
    * truncation toward zero (sign-magnitude division, identical in
    * BigInt and the oracle's CASE/abs/`//` form). The deflation is
    * approximate exactly as classical Hotelling deflation is (v' is 8
    * power steps from the true eigenvector, and the per-entry trunc
    * perturbs D by < 1 against entries ~1e17) — but bit-reproducible:
    * both engines build the SAME D and ladder it identically.
    *
    * Scale shape: same as PC1 — the one-pass distributed Gram is the
    * only data-scale work; both ladders and the deflation fold
    * driver-side in exact BigInt over the dim² matrix. */
  def pcaSecondLoadings(emb: DataFrame, iters: Int, dim: Int = 64): DataFrame = {
    require(iters >= 1)
    val spark = emb.sparkSession
    val cov = covMatrix(emb, dim)
    val x1 = powerLadder(cov, dim, iters)
    val vp = x1.map(_ / 1000) // BigInt /: truncation toward zero
    val s2 = vp.map(v => v * v).sum
    val t = (for { i <- 0 until dim; j <- 0 until dim }
      yield vp(i) * cov(i)(j) * vp(j)).sum
    val d = Array.tabulate(dim, dim)((i, j) => cov(i)(j) - (t * vp(i) * vp(j)) / (s2 * s2))
    val x2 = powerLadder(d, dim, iters)
    val s = canonSign(x2)
    import spark.implicits._
    x2.zipWithIndex.map { case (v, i) => (i.toLong, v.toLong * s) }.toSeq
      .toDF("dim", "loading_ppm")
  }

  /** Project every vector onto the top principal component and return the
    * top-k by |score| — "which documents sit furthest along the corpus'
    * main axis of variation", the outlier/diversity probe a curriculum
    * builder orders by. Loadings collect to the driver (64 rows —
    * metadata-scale, the centroid-pull contract) and ride the scan as an
    * array literal, so the scoring pass is one map + TakeOrdered. Score
    * = Σ q_i·loading_i is exact int64 (≤ 64·1e6·1e6 ≈ 6.4e13). */
  /** Greedy k-center coreset selection (Gonzalez 1985) — the diversity
    * sampler a curriculum/eval-set builder uses to pick k maximally
    * spread exemplars: seed with the min vec_id, then k−1 times pick the
    * vector FARTHEST (exact integer squared-L2 on micro-unit quantised
    * vectors — max 64·(2e6)² ≈ 2.6e14 ≪ int64) from its nearest chosen
    * center, ties to the min vec_id. Returns (rk, vec_id, d2_pick); the
    * seed's d2_pick is 0, each later d2_pick is the covering radius at
    * that step — the classic 2-approximation certificate sequence.
    *
    * Scale shape: each of the k rounds is ONE map-side pass (the ≤k
    * chosen centers ride the scan as array literals — k·dim values,
    * metadata-scale) + a TakeOrdered(1); the corpus is persisted once
    * and never shuffled. Cost k × scan — the standard trade for a
    * sequential-greedy guarantee (a tree/coreset variant batches rounds
    * at larger k). */
  def kCenterSelect(emb: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val spark = emb.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val q = emb.select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .persist(lvl)
    def d2To(center: Array[Long]) =
      aggregate(
        zip_with(col("qv"), array(center.map(lit(_)): _*),
          (x, y) => (x - y) * (x - y)),
        lit(0L), (a, v) => a + v)
    val seed = q.orderBy("vec_id").limit(1).head()
    var picks = Vector((1L, seed.getLong(0), 0L))
    var centers = Vector(seed.getSeq[Long](1).toArray)
    for (r <- 2L to k.toLong) {
      val chosen = picks.map(_._2)
      val dCols = centers.map(d2To)
      val far = q
        .filter(!col("vec_id").isInCollection(chosen))
        .withColumn("d2", if (dCols.size == 1) dCols.head else least(dCols: _*))
        .orderBy(col("d2").desc, col("vec_id"))
        .limit(1).head()
      picks :+= ((r, far.getLong(0), far.getLong(2)))
      centers :+= far.getSeq[Long](1).toArray
    }
    q.unpersist()
    import spark.implicits._
    picks.toDF("rk", "vec_id", "d2_pick")
  }

  /** Greedy MAXIMUM-COVERAGE selection over the shingle universe
    * (the facility-location / submodular data-selection greedy with the
    * classic 1−1/e guarantee): k rounds, each picking the document whose
    * shingles cover the most NOT-YET-COVERED hashes (ties to the min
    * doc_id) — "which k documents summarise the corpus' n-gram mass",
    * the coreset question [[kCenterSelect]] answers for embeddings,
    * asked of text. Returns (rk, doc_id, gain, covered) — gain is the
    * marginal coverage, covered the running total (gains are disjoint by
    * construction, so covered = Σ gains exactly).
    *
    * Scale shape: the shingle table is the only data-scale frame; each
    * of the k rounds is one anti-join against the covered set + a
    * partial-aggregatable gain count + a 1-row argmax pull (the
    * kCenterSelect contract: k × scan for a sequential-greedy
    * guarantee); the covered set is localCheckpointed per round. */
  def maxCoverageSelect(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val spark = docs.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sh = graft.operators.Dedup.shingleTable(docs).persist(lvl)
    var covered = sh.select("h").limit(0).graftCheckpoint()
    var picks = Vector.empty[(Long, Long, Long, Long)]
    var total = 0L
    var r = 1L
    var exhausted = false
    while (r <= k && !exhausted) {
      val pickedIds = picks.map(_._2)
      val gains = (if (pickedIds.isEmpty) sh
        else sh.filter(!col("doc_id").isInCollection(pickedIds)))
        .join(covered, Seq("h"), "left_anti")
        .groupBy("doc_id").agg(count(lit(1)).as("gain"))
      val top = gains
        .agg(max(struct(col("gain"), (-col("doc_id")).as("nd"))).as("b"))
        .select(col("b.gain").as("gain"), (-col("b.nd")).as("doc_id"))
        .head()
      if (top.isNullAt(0)) exhausted = true
      else {
        val (gain, id) = (top.getLong(0), top.getLong(1))
        total += gain
        picks :+= ((r, id, gain, total))
        covered = covered
          .unionByName(sh.filter(col("doc_id") === id).select("h"))
          .distinct().graftCheckpoint()
        r += 1
      }
    }
    sh.unpersist()
    import spark.implicits._
    picks.toDF("rk", "doc_id", "gain", "covered")
  }

  def pcaScoresTopK(emb: DataFrame, iters: Int, k: Int, dim: Int = 64): DataFrame = {
    val loadings = pcaPowerLoadings(emb, iters, dim)
      .orderBy("dim").collect().map(_.getLong(1))
    val lArr = array(loadings.map(lit(_)): _*)
    emb.select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("score", qdot(col("qv"), lArr))
      .orderBy(abs(col("score")).desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("score"))
  }
}
