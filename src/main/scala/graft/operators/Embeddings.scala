package graft.operators

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
  * flat-maps its 64×64 elementwise products map-side and partial
  * aggregation reduces every partition to ≤4096 rows before the single
  * shuffle (no self-join on vec_id, which would shuffle the corpus).
  * The 8 power steps run on the 4096-row covariance frame joined to a
  * 64-row vector frame — driver-negligible, data-independent cost. */
object Embeddings {

  /** (i, j, c): exact covariance numerator c = n·Σ(q_i·q_j) − Σq_i·Σq_j
    * over the micro-unit quantised corpus, all dim×dim entries. */
  private def covNumerator(emb: DataFrame, dim: Int): DataFrame = {
    val q = emb.select(quantize(col("embedding")).as("qv"))
    // per-row elementwise product fan-out: pos = i*dim + j, map-side only
    val prods = q.select(posexplode(expr(
      "flatten(transform(qv, x -> transform(qv, y -> x * y)))")))
      .select((col("pos") / dim).cast("long").as("i"),
        pmod(col("pos"), lit(dim)).cast("long").as("j"),
        col("col").as("p"))
      .groupBy("i", "j")
      .agg(sum(col("p").cast("decimal(38,0)")).as("sij"),
        count(lit(1)).as("n"))
    val sums = q.select(posexplode(col("qv")))
      .groupBy(col("pos").cast("long").as("i"))
      .agg(sum(col("col").cast("decimal(38,0)")).as("si"))
    prods
      .join(broadcast(sums), Seq("i"))
      .join(broadcast(sums.select(col("i").as("j"), col("si").as("sj"))), Seq("j"))
      .select(col("i"), col("j"),
        (col("n").cast("decimal(38,0)") * col("sij") - col("si") * col("sj"))
          .cast("decimal(38,0)").as("c"))
  }

  /** Top-principal-component loadings: (dim, loading_ppm), loading in
    * micro-units of the max-|component| (so max |loading_ppm| = 1e6
    * exactly), after `iters` power steps from the all-ones start. */
  def pcaPowerLoadings(emb: DataFrame, iters: Int, dim: Int = 64): DataFrame = {
    require(iters >= 1)
    val spark = emb.sparkSession
    val cov = covNumerator(emb, dim).localCheckpoint()
    var x: DataFrame = spark.range(dim)
      .select(col("id").as("dim"), lit(1000000L).cast("decimal(38,0)").as("v"))
    for (_ <- 1 to iters) {
      val y = cov.join(broadcast(x.select(col("dim").as("j"), col("v"))), Seq("j"))
        .groupBy(col("i").as("dim"))
        .agg(sum((col("c") * col("v")).cast("decimal(38,0)")).as("y"))
      val m = y.agg(max(abs(col("y"))).as("m"))
      x = y.crossJoin(broadcast(m))
        .select(col("dim"),
          (when(col("y") < 0, -1L).otherwise(1L) *
            expr("(CAST(1000000 AS DECIMAL(38,0)) * abs(y)) div m"))
            .cast("decimal(38,0)").as("v"))
    }
    // canonical sign: the lowest dim attaining |v| = 1e6 ends positive
    // (no global-order window — a min-dim agg + 1-row broadcast probe)
    val firstMax = x.filter(abs(col("v")) === lit(1000000L))
      .agg(min(col("dim")).as("dim"))
    val flip = x.join(broadcast(firstMax), "dim")
      .select(when(col("v") < 0, -1L).otherwise(1L).as("s"))
    x.crossJoin(broadcast(flip))
      .select(col("dim"), (col("v") * col("s")).cast("long").as("loading_ppm"))
  }

  /** Project every vector onto the top principal component and return the
    * top-k by |score| — "which documents sit furthest along the corpus'
    * main axis of variation", the outlier/diversity probe a curriculum
    * builder orders by. Loadings collect to the driver (64 rows —
    * metadata-scale, the centroid-pull contract) and ride the scan as an
    * array literal, so the scoring pass is one map + TakeOrdered. Score
    * = Σ q_i·loading_i is exact int64 (≤ 64·1e6·1e6 ≈ 6.4e13). */
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
