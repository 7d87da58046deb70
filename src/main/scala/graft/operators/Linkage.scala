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
  * Two candidate tiers:
  *   - [[blockedPairs]] — attribute blocking on nation × segment. Its
  *     key cardinality is FIXED (125), so block size grows linearly
  *     with the corpus and pair work quadratically: correct, and the
  *     graded eval baseline, but not the 100-TB path.
  *   - [[boundedPairs]] — deletion-neighborhood blocking on the name
  *     (SymSpell/FastSS): join-key cardinality grows WITH the corpus,
  *     per-record candidates track the true match degree, and for
  *     maxDist ≤ 2 the candidate filter is COMPLETE, so the output is
  *     identical to the exhaustive tier. This is the production path;
  *     [[boundedRecallCensus]] grades it against the exhaustive truth
  *     on a probe-budgeted anchor sample.
  * The verify step (edit distance) is a map-side scalar on each
  * candidate row — codegen'd `levenshtein`, no UDF. Clustering reuses
  * the hash-min pointer-jumping CC fixpoint (O(|V|) label frames), and
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

  /** Deletion-neighborhood variants of a name column, depth ≤ 2: the
    * original string, every 1-deletion, and (depth 2) every 2-deletion,
    * deduplicated. The SymSpell/FastSS candidate-filter identity: two
    * strings within edit distance d share a common variant reachable by
    * ≤ d deletions FROM EACH — an optimal alignment with s subs, i
    * inserts, e deletes (s+i+e = d) yields the shared core by deleting
    * the s+e touched positions from one string (≤ d) and the s+i from
    * the other (≤ d). So a join on variants misses NO true pair
    * (completeness), while false positives (sharing a core implies only
    * dist ≤ 2·depth) are removed by the exact verify. Pure higher-order
    * column expressions — no UDF, no explode until the caller asks. */
  private[graft] def deletionVariants(nm: Column, depth: Int): Column = {
    val noVariants = typedLit(Seq.empty[String])
    def delOnce(s: Column): Column = transform(
      sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - lit(1)), s.substr(i + lit(1), length(s))))
    val del1 = when(length(nm) > 0, delOnce(nm)).otherwise(noVariants)
    val base = concat(array(nm), del1)
    // depth 2 generates C(L,2) two-deletion cores DIRECTLY from index
    // pairs i<j (delete j then i; i needs no shift since i<j) — three
    // substrings per variant instead of materialising every
    // variant-of-variant twice (L(L-1) strings) and deduplicating them
    val del2 = when(length(nm) >= 2, flatten(transform(
      sequence(lit(1), length(nm) - 1),
      i => transform(
        sequence(i + lit(1), length(nm)),
        j => concat(nm.substr(lit(1), i - lit(1)),
          nm.substr(i + lit(1), j - i - lit(1)),
          nm.substr(j + lit(1), length(nm))))))).otherwise(noVariants)
    val all = if (depth >= 2) concat(base, del2) else base
    array_distinct(all)
  }

  /** BOUNDED candidate tier: deletion-neighborhood blocking on the name
    * field, replacing the nation×segment block SELF-join as the
    * production candidate generator. Emits pre-verify candidate pairs
    * (cust_a < cust_b, with both names and the block keys equal).
    *
    * Why this scales where [[blockedPairs]] does not: nation×segment
    * has FIXED cardinality (125), so block size grows linearly with the
    * corpus and within-block pair work quadratically — the measured 90M
    * levenshtein fan-out at the 10× corpus becomes ~9×10¹¹ at 100×.
    * Here the join key is (deletion-variant, nation, segment): its
    * cardinality GROWS with the corpus, per-record work is a fixed
    * ~1+L+L²/2 variant expansion (L = name length), and a variant
    * bucket contains only records whose names actually collide on a
    * ≤2-deletion core — candidates per record track the TRUE match
    * degree, not the corpus size (measured flat on a constant-density
    * ladder, `ScaleCheck linkage`; 2.6 cand/record at sf0.01). The
    * shuffle therefore stays fine-grained and hot keys exist only where
    * real duplicate clusters exist — the same output-bound every dedup
    * tier in [[Dedup]] carries, with the same salting escape hatch if a
    * boilerplate-name cluster appears. */
  def boundedCandidates(customer: DataFrame, depth: Int = 2): DataFrame = {
    // The shuffled frame is (key, record) — 16 bytes/row: the variant
    // and the block keys fold into ONE hash join key and no variant
    // string is ever materialised — graft_deletion_hashes (native,
    // codegen'd) emits the deletion-core hashes straight off the name's
    // code points (guide §4: the HOF deletionVariants built ~L²/2
    // substring strings per record and array_distinct'ed them; the
    // kernel is one fused FNV-1a pass per core, zero allocation).
    // Hash collisions can only ADD candidates (equal cores always
    // collide equal), and every candidate is re-checked downstream —
    // block equality explicitly here, edit distance by the caller's
    // verify — so output exactness never rests on the hash (the HOF
    // form remains as the differential-tested reference —
    // LinkageSpec). Names and block keys rejoin at PAIR granularity
    // (candidates ≪ variant rows — output-bounded).
    graft.expressions.GraftFunctions.register(customer.sparkSession)
    val v = customer.select(
        col("c_custkey").as("ck"),
        col("c_nationkey").as("bn"), col("c_mktsegment").as("bs"),
        explode(call_function("graft_deletion_hashes",
          col("c_name"), lit(depth))).as("dh"))
      .select(col("ck"),
        xxhash64(col("dh"), col("bn"), col("bs")).as("vk"))
    // SHUFFLE-HASH pinned: the variant frame is ~1+L+L²/2 rows per
    // record but sits behind a Generate, whose size ESTIMATE stays the
    // pre-explode child's — the planner would happily broadcast a
    // frame 100×+ its estimate (measured: driver OOM at the 16× ladder
    // step). The join key is fine-grained and corpus-cardinality, so
    // the partitioned hash build is the plan that holds at any scale;
    // per-partition build maps are bucket-sized (output-bounded),
    // never corpus-sized.
    val ids = v.as("a").join(v.as("b").hint("shuffle_hash"),
        col("a.vk") === col("b.vk") && col("a.ck") < col("b.ck"))
      .select(col("a.ck").as("cust_a"), col("b.ck").as("cust_b"))
      .distinct()
    def attrs(side: String) = customer.select(
      col("c_custkey").as(s"cust_$side"), col("c_name").as(s"nm_$side"),
      col("c_nationkey").as(s"bn_$side"), col("c_mktsegment").as(s"bs_$side"))
    ids.join(attrs("a"), "cust_a").join(attrs("b"), "cust_b")
      .filter(col("bn_a") === col("bn_b") && col("bs_a") === col("bs_b"))
      .select("cust_a", "cust_b", "nm_a", "nm_b")
  }

  /** Bounded-tier verified pairs: [[boundedCandidates]] + the SAME
    * banded-levenshtein verify as [[blockedPairs]]. For maxDist ≤ 2 the
    * deletion-neighborhood filter is COMPLETE (see
    * [[deletionVariants]]), so this returns the exact [[blockedPairs]]
    * result — same rows, same schema — at per-record-bounded cost; its
    * DuckDB oracle IS the exhaustive form, making the correctness gate
    * itself the recall proof. */
  def boundedPairs(customer: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"deletion-neighborhood tier supports maxDist 1..2, got $maxDist")
    boundedCandidates(customer, depth = maxDist)
      .withColumn("name_dist",
        levenshtein(col("nm_a"), col("nm_b"), maxDist).cast("long"))
      .filter(col("name_dist").between(0, maxDist))
      .select("cust_a", "cust_b", "name_dist")
  }

  /** Recall census of the bounded tier against the exhaustive-block
    * truth, on a probe-budgeted anchor sample (the
    * [[Graph.autoSampleMod]] device — the truth side is the quadratic
    * part, so it is graded over anchors = custkeys ≡ 0 mod
    * max(1, n/targetAnchors); the subuniverse is every truth pair whose
    * SMALLER key is an anchor, a uniform 1/mod pair subsample).
    * One census row: truth pairs, bounded-tier found pairs, raw
    * candidate count (the bounded work measure), and exact-ppm recall.
    * Completeness says recall_ppm ≡ 1,000,000; this key MEASURES it. */
  def boundedRecallCensus(customer: DataFrame, maxDist: Int,
      targetAnchors: Long = 128): DataFrame = {
    val mod = math.max(1L, customer.count() / targetAnchors)
    val anchored = col("cust_a") % mod === 0
    val truth = blockedPairs(customer, maxDist).filter(anchored)
      .select("cust_a", "cust_b")
    val cand = boundedCandidates(customer, depth = maxDist).filter(anchored)
    val found = cand
      .filter(levenshtein(col("nm_a"), col("nm_b"), maxDist)
        .between(0, maxDist))
      .select("cust_a", "cust_b")
    val hit = truth.join(found, Seq("cust_a", "cust_b"), "left_semi")
    truth.agg(count(lit(1)).as("n_true"))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_true"), col("n_found"), col("n_cand"),
        expr("CASE WHEN n_true = 0 THEN 1000000 " +
          "ELSE (n_hit * 1000000) div n_true END").as("recall_ppm"))
  }

  /** Incremental candidate pairs for a STREAMING ingest, BOUNDED tier:
    * matches of a new batch = new×new ([[boundedPairs]]) ∪ new×history
    * (deletion-core hash join, pair oriented smaller-key-first). Same
    * exactly-once-per-pair contract as [[blockedPairsIncremental]]
    * (each pair emits at the batch where its later record arrives) and
    * — by the maxDist ≤ 2 completeness of the deletion neighborhood —
    * the SAME pairs, so the two incremental tiers share the batch
    * oracle. Why this is the production path: the exhaustive
    * incremental form verifies |batch|·|hist-block| candidates per
    * batch on the FIXED-cardinality block key, which grows linearly
    * with history (quadratic summed over the ingest — the same
    * scale-killer the batch path retired in r16); here the history
    * side is hashed to deletion cores per batch (linear, 16-byte rows)
    * and the verify set is output-bounded. Verified pairs still carry
    * equal block keys, so block-pruned history readers (ErLedger) keep
    * their pruning contract. */
  /** The deletion-core index rows of an entity frame: one (ck, vk) row
    * per (record, distinct ≤`depth`-deletion core), vk folding the core
    * hash with the block keys — the SymSpell index a streaming ingest
    * MAINTAINS (append this for each batch) so history is hashed once
    * per record across the whole ingest, not once per micro-batch. The
    * block keys (bn, bs) ride along so a stored index can lay itself
    * out for block-pruned reads (the ErLedger `_vars` store derives its
    * bucket/sort columns from them); in-memory consumers project them
    * away. */
  def deletionCoreIndex(df: DataFrame, depth: Int): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    df.select(
        col("c_custkey").as("ck"),
        col("c_nationkey").as("bn"), col("c_mktsegment").as("bs"),
        explode(call_function("graft_deletion_hashes",
          col("c_name"), lit(depth))).as("dh"))
      .select(col("ck"), xxhash64(col("dh"), col("bn"), col("bs")).as("vk"),
        col("bn"), col("bs"))
  }

  def boundedPairsIncremental(newDf: DataFrame, hist: DataFrame,
      maxDist: Int): DataFrame =
    boundedPairsIncrementalIndexed(newDf,
      deletionCoreIndex(hist, maxDist), hist, maxDist)

  /** History-size crossover between the incremental tiers. The
    * exhaustive block cross ([[blockedPairsIncremental]]) and the
    * bounded deletion-core tier ([[boundedPairsIncremental]]) emit
    * IDENTICAL pairs for maxDist ≤ 2 (the deletion-neighborhood
    * completeness theorem; LinkageSpec pins the per-batch equality), so
    * which one a consumer runs is purely a cost question. Measured on
    * the 125-block ingest shape (`ScaleCheck erinc`, 4096-record batch,
    * see OPTIMIZATION_r17.md): the exhaustive cross stays the cheapest
    * per-batch plan through the 960k-row rung (~2s — its banded
    * early-exit levenshtein verifies ~31M same-block pairs cheaper than
    * the bounded tier's fixed multi-exchange barrier chain), while the
    * bounded tier's cost is ~flat in history; the extrapolated cost
    * crossing sits a few× above the last measured rung, so the default
    * switches at 1M rows. Both directions are safe: each tier is
    * within ~2× of the other across the whole measured band, and the
    * bounded side is the one that must own the asymptote (per-batch
    * verify fan-out ∝ history is the 100 TB scale-killer class).
    * Env-overridable (`SPARK_GRAFT_ER_MINHIST`; the system property
    * `graft.er.minhist` takes precedence — the spec seam) so a
    * deployment whose block cardinality or name lengths move the
    * crossing can tune it without a rebuild. */
  def BoundedIncrementalMinHist: Long =
    sys.props.get("graft.er.minhist")
      .orElse(sys.env.get("SPARK_GRAFT_ER_MINHIST"))
      .map(_.toLong).getOrElse(1048576L)

  /** Size-ADAPTIVE incremental pairs: the semantics-free tier switch —
    * exhaustive below [[BoundedIncrementalMinHist]] history rows,
    * bounded deletion-core at or above it. `histRows` is supplied by
    * the caller (a parquet-footer count or an already-persisted frame's
    * count — both cheap) so this adds no extra job of its own. */
  def pairsIncrementalAdaptive(newDf: DataFrame, hist: DataFrame,
      histRows: Long, maxDist: Int): DataFrame =
    if (histRows < BoundedIncrementalMinHist)
      blockedPairsIncremental(newDf, hist, maxDist)
    else boundedPairsIncremental(newDf, hist, maxDist)

  /** [[boundedPairsIncremental]] with the history side's deletion-core
    * index supplied PRE-BUILT (`histVars` = accumulated
    * [[deletionCoreIndex]] rows of `hist`) — the streaming form: the
    * ingest appends each batch's index rows once, so per-batch work is
    * hash-the-batch + one join against the stored index instead of
    * re-deriving every historical record's cores every micro-batch. */
  def boundedPairsIncrementalIndexed(newDf: DataFrame, histVars: DataFrame,
      hist: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"deletion-neighborhood tier supports maxDist 1..2, got $maxDist")
    graft.expressions.GraftFunctions.register(newDf.sparkSession)
    // ONE candidate join covers both pair classes (within-batch and
    // batch×history): probe side = the batch's core hashes, build side =
    // batch ∪ history core hashes with an is-history tag. Within-batch
    // pairs match on xk < yk (the boundedCandidates orientation),
    // cross pairs on xk ≠ yk — a separate boundedPairs(new) pass +
    // union would pay the whole explode/shuffle/rejoin barrier chain
    // twice per micro-batch for the same rows (measured: the two-pass
    // form regressed the streaming keys ~20-40% at sf0.1).
    def hashed(df: DataFrame, p: String) =
      deletionCoreIndex(df, maxDist).select(col("ck").as(s"${p}k"), col("vk"))
    val probe = hashed(newDf, "y").withColumn("yh", lit(false))
      .unionByName(histVars.select(col("ck").as("yk"), col("vk"))
        .withColumn("yh", lit(true)))
    // shuffle-hash pinned for the same Generate-underestimate reason as
    // boundedCandidates (the planner would broadcast the exploded frame
    // off its pre-explode size estimate) — but the hash map BUILDS on
    // the BATCH's cores: the hinted side becomes the build side, and
    // building on batch∪history made per-partition maps history-sized
    // (r17 erinc ladder: OOM at the 480k-row rung in the harness heap).
    // With the batch as the build side the map is batch-bounded at ANY
    // history size; the history-sized side streams through as the probe.
    val candIds = probe
      .join(hashed(newDf, "x").hint("shuffle_hash"), Seq("vk"))
      .filter((col("yh") && col("xk") =!= col("yk")) ||
        (!col("yh") && col("xk") < col("yk")))
      .select(col("xk"), col("yk"), col("yh")).distinct()
    def attrs(df: DataFrame, side: String) = df.select(
      col("c_custkey").as(s"${side}k2"), col("c_name").as(s"${side}n"),
      col("c_nationkey").as(s"${side}b1"), col("c_mktsegment").as(s"${side}b2"))
    val rightAttrs = attrs(newDf, "y").withColumn("yh", lit(false))
      .unionByName(attrs(hist, "y").withColumn("yh", lit(true)))
    candIds
      .join(attrs(newDf, "x"), col("xk") === col("xk2"))
      .join(rightAttrs, col("yk") === col("yk2") && candIds("yh") === rightAttrs("yh"))
      .filter(col("xb1") === col("yb1") && col("xb2") === col("yb2"))
      .withColumn("name_dist",
        levenshtein(col("xn"), col("yn"), maxDist).cast("long"))
      .filter(col("name_dist").between(0, maxDist))
      .select(least(col("xk"), col("yk")).as("cust_a"),
        greatest(col("xk"), col("yk")).as("cust_b"), col("name_dist"))
  }

  /** Incremental candidate pairs for a STREAMING ingest: matches of a
    * new batch = new×new (within-batch blocked pairs) ∪ new×history
    * (cross join on the blocking key, pair oriented smaller-key-first).
    * Summed over batches this emits EXACTLY the batch [[blockedPairs]]
    * set — each pair appears once, at the batch where its later record
    * arrives — so the incremental crawl shares the batch oracle. Cost
    * per batch is O(|batch|·avg-block + |batch|·|hist-block|), never a
    * re-pair of history against itself. Retained as the graded
    * exhaustive baseline; production consumers use
    * [[boundedPairsIncremental]] (identical output, bounded work). */
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
