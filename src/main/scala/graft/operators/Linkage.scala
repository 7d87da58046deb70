package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: blocking → pairwise verify →
  * transitive clustering → survivorship. The standard dedup shape for
  * entity tables (customers, vendors, authors) as opposed to the
  * document-similarity family in [[Dedup]].
  *
  * Scale design: candidate generation NEVER goes all-pairs — the
  * self-join is keyed on the blocking key, so the shuffle co-locates
  * each block and the pair space is Σ_b |b|² over block sizes, not n².
  * Blocking keys must be chosen so blocks stay bounded (here
  * nation × market segment); a skewed block would hot-key the join the
  * same way any group-by hot key does, and the fix is the same —
  * refine the blocking key, exactly how production ER blocks on
  * several keys and unions the candidate sets. The verify step
  * (edit distance) is a map-side scalar on each candidate row —
  * codegen'd `levenshtein`, no UDF. Clustering reuses the hash-min
  * pointer-jumping CC fixpoint (O(|V|) label frames), and
  * survivorship is one partial-aggregatable group-by over members.
  */
object Linkage {

  /** Candidate pairs after blocking + verification: customers sharing a
    * (nation, mktsegment) block whose names are within `maxDist` edits.
    * Emits (cust_a, cust_b, name_dist) with cust_a < cust_b. */
  def blockedPairs(customer: DataFrame, maxDist: Int): DataFrame = {
    // Co-partition the probe side by the BLOCKING KEY before the
    // self-join: the blocking key's cardinality is fixed (25 nations × 5
    // segments), so blocks grow linearly with the corpus and the
    // within-block pair work quadratically — and a byte-driven scan of a
    // small-in-bytes customer table coalesces to a handful of partitions
    // (measured at the 10× sf1-sim corpus: 90M levenshtein comparisons
    // on TWO tasks). One cheap row-count shuffle here spreads the blocks
    // over every core, and it is the shape that holds at 1000×: the
    // expensive stage's parallelism follows the block key, not the
    // input's file-packing. The partition COUNT is pinned to the session
    // shuffle parallelism: left size-based, AQE would coalesce the
    // few-MB name frame right back to one partition — the sizing driver
    // here is the downstream pair fan-out, which AQE cannot see.
    val np = customer.sparkSession.sessionState.conf.numShufflePartitions
    val x = customer.select(
      col("c_custkey").as("ck"), col("c_name").as("nm"),
      col("c_nationkey").as("bn"), col("c_mktsegment").as("bs"))
      .repartition(np, col("bn"), col("bs"))
    x.as("a").join(x.as("b"),
        col("a.bn") === col("b.bn") && col("a.bs") === col("b.bs") &&
          col("a.ck") < col("b.ck"))
      // thresholded levenshtein: banded DP that early-exits past
      // maxDist (returns -1), far cheaper than the full matrix on the
      // candidate fan-out; kept rows carry the exact distance
      .withColumn("name_dist",
        levenshtein(col("a.nm"), col("b.nm"), maxDist).cast("long"))
      .filter(col("name_dist").between(0, maxDist))
      .select(col("a.ck").as("cust_a"), col("b.ck").as("cust_b"),
        col("name_dist"))
  }

  /** Incremental candidate pairs for a STREAMING ingest: matches of a
    * new batch = new×new (within-batch blocked pairs) ∪ new×history
    * (cross join on the blocking key, pair oriented smaller-key-first).
    * Summed over batches this emits EXACTLY the batch [[blockedPairs]]
    * set — each pair appears once, at the batch where its later record
    * arrives — so the incremental crawl shares the batch oracle. Cost
    * per batch is O(|batch|·avg-block + |batch|·|hist-block|), never a
    * re-pair of history against itself. */
  def blockedPairsIncremental(newDf: DataFrame, hist: DataFrame,
      maxDist: Int): DataFrame = {
    def keyed(df: DataFrame, p: String) = df.select(
      col("c_custkey").as(s"${p}k"), col("c_name").as(s"${p}n"),
      col("c_nationkey").as(s"${p}b1"), col("c_mktsegment").as(s"${p}b2"))
    // history is the PROBE side of the new×history verify join: spread
    // its blocks across the cores (same rationale + AQE pin as
    // blockedPairs — the pair fan-out, not history's bytes, is the cost)
    val np = hist.sparkSession.sessionState.conf.numShufflePartitions
    val cross = keyed(newDf, "x").join(
        keyed(hist, "y").repartition(np, col("yb1"), col("yb2")),
        col("xb1") === col("yb1") && col("xb2") === col("yb2") &&
          col("xk") =!= col("yk"))
      .withColumn("name_dist", levenshtein(col("xn"), col("yn"), maxDist).cast("long"))
      .filter(col("name_dist").between(0, maxDist))
      .select(least(col("xk"), col("yk")).as("cust_a"),
        greatest(col("xk"), col("yk")).as("cust_b"), col("name_dist"))
    blockedPairs(newDf, maxDist).unionByName(cross)
  }

  /** QUOTIENT fold of new verified pairs into a persisted (node,
    * comp_id) cluster map: each pair contracts to its endpoints'
    * current labels, so intra-cluster pairs vanish and connected
    * components run over the TOUCHED-cluster quotient graph only —
    * O(bridging pairs) nodes, never O(|V|). Quotient components lift
    * exactly to full-graph components (prior clusters are connected by
    * induction), and labels are min member ids, so min-over-merged-old-
    * labels IS the batch CC label. Returns (refreshed map, mergeMap)
    * where mergeMap = (comp_id = old label, merged = new label) rows
    * for touched clusters only — exactly what incremental survivorship
    * needs (drop old labels, re-aggregate merged ones). Replay-safe:
    * already-folded pairs contract to self-loops and drop out, making
    * the fold a no-op. This is the 100 TB form; below
    * [[QuotientFoldThreshold]] map rows, a direct CC over
    * (pairs ∪ contracted star edges) costs fewer jobs and wins —
    * the streaming query probes and picks. */
  def foldClusters(prevMap: DataFrame, pairs: DataFrame): (DataFrame, DataFrame) = {
    val ends = pairs
      .select(explode(array(col("cust_a"), col("cust_b"))).as("node")).distinct()
    val newcomers = ends.join(prevMap, Seq("node"), "left_anti")
      .select(col("node"), col("node").as("comp_id"))
    val base = prevMap.unionByName(newcomers)
    val cp = pairs
      .join(base.select(col("node").as("cust_a"), col("comp_id").as("ca")), "cust_a")
      .join(base.select(col("node").as("cust_b"), col("comp_id").as("cb")), "cust_b")
      .filter(col("ca") =!= col("cb"))
      .select(col("ca").as("src"), col("cb").as("dst")).distinct()
    val merge = Graph.connectedComponents(cp)
      .select(col("node").as("comp_id"), col("comp_id").as("merged"))
    val newMap = base.join(merge, Seq("comp_id"), "left")
      .select(col("node"), coalesce(col("merged"), col("comp_id")).as("comp_id"))
    (newMap, merge)
  }

  /** Measured crossover of the MAP-REWRITE fold kernels (`ScaleCheck
    * fold <n>`, one 2050-pair batch): a direct CC over (pairs ∪
    * contracted star edges) beats [[foldClusters]] below ~100k map
    * rows (fixed per-job cost dominates) and loses badly past it —
    * direct 12.4s vs quotient 7.3s at 1M, 15.7s vs 7.8s at 4M (direct
    * grows with the map, quotient stays flat at batch cost + the map
    * rewrite). Retained as the documented break-even for consumers of
    * [[foldClusters]]; the streaming golden-record query itself no
    * longer probes it — [[graft.etl.ErLedger]] replaces the map
    * rewrite with a label-forwarding table whose per-batch cost is
    * O(touched) at ANY map size, so one path serves every scale. */
  val QuotientFoldThreshold = 1000000L

  /** Entity clusters: connected components over verified pairs (match
    * is not transitive; CC gives the maximal-entity semantics every ER
    * system uses). Census rows (cluster_id = min member key, n_members). */
  def erClusters(pairs: DataFrame): DataFrame =
    Graph.connectedComponents(
        pairs.select(col("cust_a").as("src"), col("cust_b").as("dst")))
      .groupBy(col("comp_id").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"))

  /** Survivorship ("golden record"): per entity cluster, the canonical
    * record is the min-key member (= cluster_id); consolidated fields
    * are exact aggregates over members (max balance — order-invariant,
    * no float summation). One group-by over members + one broadcastable
    * join back to the canonical row's attributes. */
  def goldenRecords(customer: DataFrame, pairs: DataFrame): DataFrame =
    goldenFromClusters(customer,
      Graph.connectedComponents(
        pairs.select(col("cust_a").as("src"), col("cust_b").as("dst"))))

  /** Survivorship over a PRECOMPUTED (node, comp_id) cluster map — the
    * shared tail of [[goldenRecords]] and its incremental streaming twin
    * (which maintains the map across batches instead of re-clustering
    * the pair history). */
  def goldenFromClusters(customer: DataFrame, cc: DataFrame): DataFrame =
    cc.join(customer, cc("node") === customer("c_custkey"))
      .groupBy(col("comp_id").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"), max("c_acctbal").as("max_bal"))
      .join(customer.select(col("c_custkey").as("cluster_id"),
        col("c_name").as("golden_name")), "cluster_id")
      .select("cluster_id", "golden_name", "n_members", "max_bal")
}
