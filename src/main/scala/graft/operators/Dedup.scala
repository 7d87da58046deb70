package graft.operators

import graft.Ckpt.Ops
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.CrossFns._

/** Deduplication operators for a large-scale training-data pipeline.
  *
  * All hashing uses the cross-engine polynomial hash (CrossFns.charHash),
  * never Spark's murmur3 `hash()` — results must be reproducible outside
  * Spark (and oracle-checkable in DuckDB).
  *
  * Scale design: every step is explode -> hash-partition groupBy; no
  * driver-side state, no O(n^2) all-pairs stage. Candidate generation is
  * LSH-banded so the only pairwise work happens inside buckets.
  */
object Dedup {

  val NumHashes = 16
  val Bands = 4 // 4 rows per band

  /** Exact duplicate groups by content digest. At 100 TB this is one
    * hash-partitioned shuffle on a 16-byte digest rather than the full
    * text. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("digest"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
      .select(col("doc_id"), col("n_dups"), col("digest"))

  /** Duplicate k-token windows merged to maximal per-document spans —
    * the relational re-expression of suffix-array exact-substring dedup
    * (Lee et al. 2022, arXiv:2107.06499): any k-token window whose hash
    * occurs >= 2 times ANYWHERE in the corpus marks its positions as
    * duplicated text; overlapping/adjacent marked windows coalesce into
    * the maximal spans a substring-level scrubber would cut.
    *
    * Scale shape (a suffix array itself doesn't distribute; this does):
    * one generator pass streams (pos, hash) rows; the duplicated-hash
    * dictionary is a hash-partitioned `count >= 2` — partial-aggregatable
    * map-side, the only corpus-wide shuffle; the semi-join back keys on
    * the same hash; span merging is one per-document window
    * (gaps-and-islands). No stage is pairwise in documents. Returns
    * (doc_id, span_start, span_end-exclusive) in 1-based token positions. */
  def substringSpans(spark: SparkSession, docs: DataFrame, k: Int): DataFrame =
    mergeSpans(dupWindows(spark, docs, k, keepOne = false), k)

  /** [[substringSpans]] under Lee et al.'s keep-one rule: for every
    * duplicated window hash the corpus-wide CANONICAL occurrence — the
    * (doc_id, pos)-minimal one — is NOT marked, so exactly one copy of
    * each duplicated substring survives a scrub. Canonical election is
    * one more agg on the same hash key (min struct — still
    * partial-aggregatable); everything else is shared. A canonical
    * window's tokens can still fall to a DIFFERENT overlapping duplicated
    * window's span — span semantics, documented. */
  def substringSpansKeepOne(spark: SparkSession, docs: DataFrame, k: Int): DataFrame =
    mergeSpans(dupWindows(spark, docs, k, keepOne = true), k)

  /** Duplicated k-token windows as (doc_id, pos) rows. keepOne excludes
    * each hash's canonical (minimal) occurrence from the marking. */
  private def dupWindows(spark: SparkSession, docs: DataFrame, k: Int,
      keepOne: Boolean): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    def grams = docs
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), call_function("graft_shingle_gen", col("w"), lit(k)))
    if (!keepOne) {
      val dup = grams.groupBy("sh").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2).select("sh")
      grams.join(dup, Seq("sh"), "left_semi").select("doc_id", "pos")
    } else {
      val dup = grams.groupBy("sh").agg(count(lit(1)).as("n"),
          min(struct(col("doc_id"), col("pos"))).as("canon"))
        .filter(col("n") >= 2)
        .select(col("sh"), col("canon.doc_id").as("c_doc"), col("canon.pos").as("c_pos"))
      grams.join(dup, Seq("sh"))
        .filter(col("doc_id") =!= col("c_doc") || col("pos") =!= col("c_pos"))
        .select("doc_id", "pos")
    }
  }

  /** Gaps-and-islands merge of marked k-windows into maximal per-doc
    * spans: a window opens a new span iff its start clears every earlier
    * window's end. One per-document window function, no joins. */
  private def mergeSpans(marked: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    marked
      .withColumn("prev_end",
        max(col("pos") + lit(k)).over(byPos.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("isl",
        sum(when(col("prev_end").isNull || col("pos") > col("prev_end"), 1).otherwise(0))
          .over(byPos))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min("pos").as("span_start"), (max(col("pos")) + lit(k)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"))
  }

  /** Train/eval DECONTAMINATION census — the n-gram collision rule
    * every serious pretraining pipeline runs before training (GPT-3's
    * 13-gram / PaLM's 8-gram overlap screens, Brown et al. 2020 app. C;
    * here k = 8 to share the substring-span window length): a training
    * document is CONTAMINATED if any of its k-token windows also occurs
    * in the held-out benchmark set (stand-in: doc_id ≡ 7 mod 10 — the
    * eval split a real deployment would load as its benchmark table).
    * Output: per-source census (n_train, n_contaminated, exact ppm
    * rate) — the number that decides whether a source is quarantined.
    *
    * Scale shape: one generator pass streams (doc, window-hash) rows
    * for BOTH splits (graft_shingle_gen — no gram strings materialise);
    * the eval window set is a distinct on the hash key; membership is
    * one hash-partitioned left-semi join; the census is a partial agg.
    * Nothing is pairwise in documents, and the eval set (benchmarks are
    * small) broadcasts under AQE when it fits. */
  def decontaminationCensus(spark: SparkSession, docs: DataFrame,
      k: Int = 8): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    val grams = docs.select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), call_function("graft_shingle_gen", col("w"), lit(k)))
    val evalGrams = grams.filter(col("doc_id") % 10 === 7)
      .select("sh").distinct()
    val contaminated = grams.filter(col("doc_id") % 10 =!= 7)
      .join(evalGrams, Seq("sh"), "left_semi")
      .select("doc_id").distinct()
      .withColumn("hit", lit(1L))
    docs.filter(col("doc_id") % 10 =!= 7)
      .join(contaminated, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_train"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
      .select(col("source"), col("n_train"), col("n_contaminated"),
        expr("(n_contaminated * 1000000) div n_train").as("contam_ppm"))
  }

  /** doc_id -> distinct word-3-gram shingle hash SET (array form). */
  def shingleSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), shingleHashes(col("text"), 3).as("hs"))
      .filter(size(col("hs")) > 0)

  /** doc_id -> distinct word-3-gram shingle hashes, exploded. */
  def shingleTable(docs: DataFrame): DataFrame =
    shingleSets(docs).select(col("doc_id"), explode(col("hs")).as("h"))

  /** MinHash signatures banded for LSH: (doc_id, band, sig).
    *
    * The whole signature is computed per document in one narrow pass
    * (MinHashSigExpr — all NumHashes mins in a single scan of the shingle
    * set), then sliced into Bands signature strings. No explode, no
    * shuffle: at 100 TB the per-doc work stays map-side and the only
    * shuffle in the dedup pipeline is the final bucket self-join. */
  def bandedSignatures(spark: SparkSession, docs: DataFrame): DataFrame =
    bandedSignaturesFromSets(shingleSets(docs))

  /** doc_id -> full NumHashes minhash signature array (one narrow scan
    * of the shingle set per doc). Split out so a multi-tier consumer
    * (pipeline_dedup_report) can compute the signature ONCE and feed
    * both the per-signature census and the banded contraction. */
  def sigsFromSets(hsDf: DataFrame): DataFrame =
    hsDf.select(col("doc_id"), minhashSig(col("hs"), NumHashes).as("sig"))

  def bandedSignaturesFromSets(hsDf: DataFrame): DataFrame =
    bandedSignaturesFromSigs(sigsFromSets(hsDf))

  /** LSH banding-knob sweep — the candidate-volume curve a user reads
    * BEFORE committing a (bands × rows) configuration (the
    * minhash-accuracy / semantic-sweep pattern applied to the banding
    * knob): for each config b ∈ {2,4,8,16} bands over the same 16-hash
    * signature, the bucket census and the EXACT candidate-pair count
    * Σ C(bucket,2) — computed from bucket sizes alone, never by
    * materializing pairs, so the sweep stays bucket-count-sized even
    * where a config would explode quadratically (that blowup is
    * precisely what the number warns about). More bands (fewer rows
    * each) = a lower effective Jaccard threshold = more candidates.
    *
    * One signature pass, one exploded (config, band, bandsig) shuffle
    * (Σ b = 30 rows/doc across all four configs), one 4-row rollup. */
  def lshBandSweep(docs: DataFrame): DataFrame = {
    val sigs = sigsFromSets(shingleSets(docs))
    sigs.select(explode(expr(
        s"""flatten(transform(array(2, 4, 8, 16), b ->
           |  transform(sequence(0, b - 1), i -> named_struct(
           |    'b', b, 'band', i,
           |    'key', array_join(transform(
           |      slice(sig, i * ($NumHashes div b) + 1, $NumHashes div b),
           |      v -> CAST(v AS STRING)), ',')))))""".stripMargin)).as("x"))
      .groupBy(col("x.b").as("n_bands"), col("x.band"), col("x.key"))
      .agg(count(lit(1)).as("bs"))
      .groupBy("n_bands")
      .agg(
        count(lit(1)).as("n_buckets"),
        count(when(col("bs") >= 2, lit(1))).as("n_buckets_multi"),
        sum(expr("bs * (bs - 1) div 2")).as("candidate_pairs"))
      .select(col("n_bands").cast("long").as("n_bands"),
        lit(NumHashes.toLong).as("n_hashes"),
        (lit(NumHashes.toLong) / col("n_bands")).cast("long").as("rows_per_band"),
        col("n_buckets"), col("n_buckets_multi"), col("candidate_pairs"))
  }

  def bandedSignaturesFromSigs(sigs: DataFrame): DataFrame = {
    val rowsPerBand = NumHashes / Bands
    sigs.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(Bands - 1)), b =>
        struct(
          b.cast("int").as("band"),
          array_join(
            transform(slice(col("sig"), b * lit(rowsPerBand) + 1, lit(rowsPerBand)),
              v => v.cast("string")), ",").as("sig")))).as("x"))
      .select(col("doc_id"), col("x.band").as("band"), col("x.sig").as("sig"))
  }

  /** MinHash+LSH candidate near-duplicate pairs: docs sharing any full band
    * signature. Self-join on (band, sig) — the shuffle key is the banded
    * signature, so work is proportional to bucket sizes, not n^2. */
  def minhashCandidates(spark: SparkSession, docs: DataFrame): DataFrame =
    pairsFromBands(bandedSignatures(spark, docs))

  /** BUILD a persistent LSH band index: compute the banded MinHash
    * signatures ONCE and write them as a parquet table under `indexDir` —
    * (doc_id, band, sig), the dedup twin of [[graft.operators.Similarity]]'s
    * persisted IVF index. A 100 TB crawl-dedup deployment shingles its
    * historical corpus once, persists the bands, and then every new crawl
    * increment probes + appends against the index without ever re-reading
    * (or re-hashing) history. Index size is O(docs × Bands) small rows —
    * document text never enters the index. */
  def lshIndexBuild(docs: DataFrame, indexDir: String): Unit =
    bandedSignatures(docs.sparkSession, docs)
      .write.mode("overwrite").parquet(s"$indexDir/bands")

  /** Candidate pairs from a persisted band index: the same (band, sig)
    * bucket self-join as [[minhashCandidates]], but both sides scan the
    * LOADED index table — zero tokenisation/minhash jobs. One oracle, two
    * paths: output is bit-identical to the in-memory form because the
    * index stores exactly the banded signatures. */
  def lshIndexPairs(spark: SparkSession, indexDir: String): DataFrame =
    pairsFromBands(spark.read.parquet(s"$indexDir/bands"))

  /** PROBE a new document batch against a persisted band index built from
    * the historical corpus: per new doc, how many distinct historical docs
    * share at least one band bucket (the near-dup verdict an incremental
    * crawl ingest gates on). Work is one minhash pass over the INCREMENT
    * plus a bucket equi-join against the index — history is touched only
    * through its (band, sig) rows, and the join key is the banded
    * signature, so cost tracks bucket sizes, not |history| × |batch|.
    * Docs whose shingle set is empty never enter a band and report 0
    * matches (left join back to the batch). */
  def lshIndexProbe(newDocs: DataFrame, indexDir: String): DataFrame = {
    val spark = newDocs.sparkSession
    val idx = spark.read.parquet(s"$indexDir/bands")
      .select(col("band"), col("sig"), col("doc_id").as("old_doc"))
    val probes = bandedSignatures(spark, newDocs)
    val matched = probes.join(idx, Seq("band", "sig"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("old_doc")).as("n_matched"))
    newDocs.select(col("doc_id"))
      .join(matched, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        (coalesce(col("n_matched"), lit(0L)) > 0L).as("is_dup"))
  }

  /** APPEND an increment to a persisted band index: one minhash pass over
    * the new docs, parquet append — cost linear in the increment, history
    * untouched. After the append the index answers [[lshIndexPairs]] /
    * [[lshIndexProbe]] for the grown corpus. */
  def lshIndexAppend(newDocs: DataFrame, indexDir: String): Unit =
    bandedSignatures(newDocs.sparkSession, newDocs)
      .write.mode("append").parquet(s"$indexDir/bands")

  /** Cluster form of minhash dedup: docs sharing the FULL signature
    * (all NumHashes mins identical — near-certain dups) collapse to one
    * representative. Unlike the pair-emitting candidates, output stays
    * flat under heavy duplication (see docs/SCALING.md takeaway 1). */
  def minhashSigClusters(spark: SparkSession, docs: DataFrame): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // collapse-first like the other structural tiers — output-preserving
    // (exact copies share every shingle hence the full signature; the
    // kept min copy id IS the group min; n_copies reweights the census)
    // — and persist the SHARED prefix frames: the dedup-report pipeline
    // unions tiers 3/4/5, and Spark's cache manager substitutes any
    // matching plan fragment, so the collapse + shingle pass runs once
    // across all three tiers instead of once per tier (the r7→r8
    // pipeline_dedup_report regression was exactly this lost sharing)
    val c = collapseExact(docs).persist(lvl)
    val hsDf = shingleSets(c).persist(lvl)
    hsDf
      .select(col("doc_id"),
        array_join(transform(minhashSig(col("hs"), NumHashes), v => v.cast("string")), ",").as("sig"))
      .join(c.select(col("doc_id"), col("n_copies")), Seq("doc_id"))
      .groupBy("sig")
      .agg(min(col("doc_id")).as("rep"), sum(col("n_copies")).as("n_docs"))
      .select(col("rep"), col("n_docs"))
  }

  /** Cluster-emitting LSH dedup — the scale-safe output shape: instead of
    * emitting candidate PAIRS (quadratic in duplicate multiplicity: a
    * 1000-copy document yields ~500k pairs), emit one row per cluster
    * representative. Connected-components-lite: each (band, sig) bucket
    * gets a group representative (min doc_id); each doc collapses to the
    * min representative over its Bands buckets; clusters = docs sharing
    * that one-hop representative. Rows out is bounded by distinct docs —
    * flat under any duplication level (docs/SCALING.md takeaway 1).
    *
    * All three steps are hash-partitioned groupBys on small keys
    * ((band,sig), doc_id, rep) — no driver state, no pair blow-up; the
    * transitive-closure refinement (full connected components) would
    * iterate the doc->rep contraction, but one hop already merges every
    * bucket overlap the pair form reports. */
  /** Per-document cluster representative: (doc_id, rep). Docs with an
    * empty shingle set never enter a band and are absent — callers treat
    * them as their own representative. */
  def lshDocReps(spark: SparkSession, docs: DataFrame): DataFrame =
    lshDocRepsFromSets(shingleSets(docs))

  /** Exact-duplicate collapse — the hot-cluster guard's FIRST stage for
    * the structural cluster tiers: byte-identical content groups to its
    * min-id representative carrying the copy count, so a pathological
    * N-copy duplicate (crawl boilerplate) shrinks to ONE row before any
    * shingle work. Map-side combine reduces copies inside each input
    * partition, so not even this collapse's shuffle carries the hot
    * cluster's full multiplicity to one reducer. Output-preserving for
    * the contraction tiers: exact copies share every band, so the bucket
    * min-id and the per-content rep are unchanged by dropping copy rows
    * (the min copy id is exactly the row kept). */
  def collapseExact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("text"), col("n_copies"))

  def lshClusters(spark: SparkSession, docs: DataFrame): DataFrame = {
    // collapse first (see collapseExact): cluster membership of an exact
    // copy is its content rep's membership, so reps are computed on
    // distinct content only and counts re-weighted by multiplicity —
    // identical output, hot-cluster volume gone before the shingle pass
    // persist the collapsed frame: it feeds BOTH the shingle pass and the
    // n_copies re-weighting join — uncached, the full-text group-by
    // shuffle would run twice (released by the catalog runners'
    // clearCache, like the other tier-scoped persists)
    val c = collapseExact(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the shingle frame persists too: identical fragments in the other
    // structural tiers (minhashSigClusters, ccClusters) then share one
    // tokenize+hash pass through the cache manager
    val hsDf = shingleSets(c)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lshDocRepsFromSets(hsDf)
      .join(c.select(col("doc_id"), col("n_copies")), Seq("doc_id"))
      .groupBy("rep").agg(sum(col("n_copies")).as("n_docs"))
  }

  /** Connected-components dedup clusters: the [[lshClusters]] one-hop
    * contraction followed by `rounds` POINTER-JUMPING steps
    * (rep <- rep(rep)) — each round doubles the resolved chain length, so
    * r rounds merge transitive near-dup chains up to 2^r hops (a-b share
    * band 1, b-c share band 2, ... — the case the one-hop form splits).
    * Exact CC for any corpus whose chains are shorter; bounded-iteration
    * label contraction is the standard big-data CC scheme. Every round is
    * a join on the tiny (doc, rep) mapping — document payloads are never
    * touched after the first shingle pass. */
  def ccClusters(spark: SparkSession, docs: DataFrame, rounds: Int = 3): DataFrame = {
    // exact-collapse first (output-preserving — see collapseExact/
    // lshClusters); persisted for the same two-consumer reason as there,
    // and the shingle frame likewise for cross-tier cache sharing
    val c = collapseExact(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hsDf = shingleSets(c)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the (doc, rep) mapping MUST be lineage-truncated before and inside
    // the pointer-jumping loop: each round joins m against ITSELF, so an
    // un-truncated m re-executes the banded-LSH tail 2^rounds times
    // (measured 7.0s -> 1.5s at sf0.1 for 3 rounds; the frame is
    // doc-count-sized, so the checkpoint itself is trivial)
    var m = lshDocRepsFromSets(hsDf).graftCheckpoint()
    for (_ <- 1 to rounds) {
      val parent = m.select(col("doc_id").as("rep"), col("rep").as("rep2"))
      m = m.join(parent, Seq("rep"), "left")
        .select(col("doc_id"), coalesce(col("rep2"), col("rep")).as("rep"))
        .graftCheckpoint()
    }
    m.join(c.select(col("doc_id"), col("n_copies")), Seq("doc_id"))
      .groupBy("rep").agg(sum(col("n_copies")).as("n_docs"))
  }

  /** VERIFIED cluster dedup — the exactness tier of [[lshClusters]], still
    * O(total shingles) with no pair blow-up: each doc's n-gram Jaccard is
    * computed against its cluster REPRESENTATIVE only (star verification,
    * one intersection per doc via a co-partitioned shingle join — never
    * all bucket pairs). Docs failing the threshold fall back to singleton
    * clusters. The text analog of Similarity.lshCosineClusters. */
  def jaccardClusters(spark: SparkSession, docs: DataFrame, threshold: Double): DataFrame = {
    val hsDf = shingleSets(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // docRep now feeds THREE consumers (member side, rep reduction, the
    // final verify join) — persist the doc-scale mapping so the banded
    // contraction runs once (cache contract: catalog runners clearCache
    // between queries, like hsDf above).
    val docRep = lshDocRepsFromSets(hsDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sh = hsDf.select(col("doc_id"), explode(col("hs")).as("h"))
    val sizes = hsDf.select(col("doc_id"), size(col("hs")).cast("long").as("n"))
    // Star-verify join keys on (rep, h): every member of one cluster
    // shares `rep`, so a hot cluster concentrates on as few reducers as
    // its rep has shingles. Salt guard, capped (see HotKeyCap): members
    // of clusters at/above the cap salt by doc-id hash; those clusters'
    // rep shingles (built from the COMPACT per-doc set frame) fan
    // SaltBuckets-fold; everything else joins on salt 0 unreplicated.
    // The guard is GATED on a driver-side max-cluster-size probe (see
    // maxKeyCount) — a cold corpus takes the plain unsalted star join.
    val census = docRep.groupBy("rep").agg(count(lit(1)).as("cs"))
    val inter =
      if (maxKeyCount(census, "cs") < HotKeyCap) {
        val repSh = docRep.select(col("rep")).distinct()
          .join(hsDf.select(col("doc_id").as("rep"), col("hs")), Seq("rep"))
          .select(col("rep"), explode(col("hs")).as("h"))
        docRep.filter(col("doc_id") =!= col("rep"))
          .join(sh, Seq("doc_id"))
          .join(repSh, Seq("rep", "h"))
          .groupBy("doc_id", "rep").agg(count(lit(1)).as("inter"))
      } else {
        val hotReps = census.filter(col("cs") >= HotKeyCap)
          .select(col("rep"), lit(true).as("is_hot"))
        val repSh = docRep.select(col("rep")).distinct()
          .join(hsDf.select(col("doc_id").as("rep"), col("hs")), Seq("rep"))
          .join(broadcast(hotReps), Seq("rep"), "left")
          .withColumn("salt", saltFan(coalesce(col("is_hot"), lit(false))))
          .select(col("rep"), col("salt"), explode(col("hs")).as("h"))
        docRep.filter(col("doc_id") =!= col("rep"))
          .join(sh, Seq("doc_id"))
          .join(broadcast(hotReps), Seq("rep"), "left")
          .withColumn("salt",
            when(coalesce(col("is_hot"), lit(false)), saltOf(col("doc_id"))).otherwise(lit(0)))
          .join(repSh, Seq("rep", "h", "salt"))
          .groupBy("doc_id", "rep").agg(count(lit(1)).as("inter"))
      }
    val verified = docRep
      .join(inter, Seq("doc_id", "rep"), "left_outer")
      .join(sizes, Seq("doc_id"))
      .join(sizes.select(col("doc_id").as("rep"), col("n").as("rn")), Seq("rep"))
      .withColumn("jaccard",
        coalesce(col("inter"), lit(0L)).cast("double") /
          (col("n") + col("rn") - coalesce(col("inter"), lit(0L))))
      .withColumn("cluster",
        when(col("doc_id") === col("rep") || col("jaccard") >= threshold, col("rep"))
          .otherwise(col("doc_id")))
    verified.groupBy("cluster").agg(count(lit(1)).as("n_docs"))
      .select(col("cluster").as("rep"), col("n_docs"))
  }

  /** Salt fan-out width for the hot-key joins below. A join key shared by
    * a pathological N-member cluster (every copy of a duplicated page
    * lands in the same LSH bucket / behind the same representative) is
    * split across `SaltBuckets` reducers: the FAT side salts by doc-id
    * hash, the small side replicates SaltBuckets-fold. Deterministic —
    * no reliance on AQE skew splitting being on or triggered. */
  val SaltBuckets = 16

  /** Size cap above which a join key counts as hot and gets salted.
    * ONLY keys at/above the cap fan out — unconditional salting would
    * replicate the whole small side SaltBuckets-fold and tax the common
    * sparse-duplication case 16× to protect the rare hot key (measured:
    * 9.2s → 42.7s on the 100k-hot-cluster corpus when every rep was
    * replicated; conditional salting restores the baseline while still
    * splitting the hot key). The hot-key set is cluster-count-scale and
    * rides a broadcast. */
  val HotKeyCap = 1024

  private def saltOf(c: Column): Column =
    pmod(hash(c), lit(SaltBuckets)).cast("int")

  /** Driver-side hot-key probe: the max value of count column `c` in an
    * already-grouped frame, as one scalar (0 on empty input). The salted
    * join shape costs real work even when NOTHING is hot — the salt
    * column rides every shuffle row, the small side is fanned, and the
    * broadcast census is an extra job — so the tiers branch on this
    * bound and keep the PLAIN r6-shape plan unless a key at/above
    * [[HotKeyCap]] actually exists (the r7 regression: an always-on
    * census + salted plan taxed every cold corpus ~2-3×). The probe
    * itself is map-side-combined (partial max) over a frame the tier
    * computes anyway, returning one row — metadata-scale. */
  private[graft] def maxKeyCount(grouped: DataFrame, c: String): Long =
    grouped.agg(coalesce(max(col(c)), lit(0L)).as("m")).head().getLong(0)

  /** Fan-out generator: hot keys replicate SaltBuckets-fold, cold keys
    * emit the single salt 0 (matching the fat side's cold salt). */
  private def saltFan(isHot: Column): Column =
    explode(when(isHot, sequence(lit(0), lit(SaltBuckets - 1)))
      .otherwise(sequence(lit(0), lit(0))))

  /** [[lshDocReps]] over pre-computed shingle sets. The banded frame feeds
    * the group-rep side and the join probe side: persist so the minhash
    * pass runs once (released by the catalog runners' clearCache).
    *
    * Hot-cluster guard: the bucket-rep JOIN-BACK keys on (band, sig) —
    * one key per bucket, so an N-copy duplicate cluster would funnel N
    * rows through one reducer. Buckets at/above [[HotKeyCap]] members
    * (a broadcast-scale set) are salted: their members spread by doc-id
    * hash and their one-row rep fans [[SaltBuckets]]-fold; cold buckets
    * join on salt 0 and pay nothing. (The min aggregations were never
    * the hazard — partial aggregation combines map-side.) */
  def lshDocRepsFromSets(hsDf: DataFrame): DataFrame =
    lshDocRepsFromSigs(sigsFromSets(hsDf))

  def lshDocRepsFromSigs(sigs: DataFrame): DataFrame =
    lshDocRepsFromSigs(sigs, cacheBands = true)

  /** As above; `cacheBands = false` skips the banded frame's cache layer —
    * for callers whose sigs frame is ALREADY cached (the dedup-report
    * path): re-deriving the explode from that cache is a cheap map, and
    * dropping the second layer saves its write+read round trip. A cold
    * sigs frame (standalone keys: full text shingle+minhash upstream)
    * must keep the default so the text pipeline never runs twice. */
  def lshDocRepsFromSigs(sigs: DataFrame, cacheBands: Boolean): DataFrame = {
    val bands0 = bandedSignaturesFromSigs(sigs)
    val bands =
      if (!cacheBands) bands0
      else bands0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the bucket census is bucket-count-sized: checkpoint it eagerly so
    // the ONE job that computes it (warming the bands cache on the way)
    // serves the hot probe, the rep frame, and the hot set — the census
    // group-by never runs twice
    val stats = bands.groupBy("band", "sig")
      .agg(min(col("doc_id")).as("grp_rep"), count(lit(1)).as("bs"))
      .graftCheckpoint()
    // hot probe over the checkpointed census (a trivial scalar job);
    // cold corpora take the plain r6-shape plan
    if (maxKeyCount(stats, "bs") < HotKeyCap) {
      bands.join(stats.select("band", "sig", "grp_rep"), Seq("band", "sig"))
        .groupBy("doc_id").agg(min(col("grp_rep")).as("rep"))
    } else {
      val hot = stats.filter(col("bs") >= HotKeyCap)
        .select(col("band"), col("sig"), lit(true).as("is_hot"))
      val grpRep = stats
        .withColumn("salt", saltFan(col("bs") >= HotKeyCap))
        .select(col("band"), col("sig"), col("salt"), col("grp_rep"))
      bands.join(broadcast(hot), Seq("band", "sig"), "left")
        .withColumn("salt",
          when(coalesce(col("is_hot"), lit(false)), saltOf(col("doc_id"))).otherwise(lit(0)))
        .join(grpRep, Seq("band", "sig", "salt"))
        .groupBy("doc_id").agg(min(col("grp_rep")).as("rep"))
    }
  }

  private def pairsFromBands(bands0: DataFrame): DataFrame = {
    // both self-join sides consume the banded-signature frame: persist so
    // the tokenize+minhash pass runs once (the aliased subtrees differ, so
    // Catalyst's ReusedExchange cannot dedupe them); released by the
    // catalog runners' clearCache
    val bands = bands0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = bands.select(col("band"), col("sig"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band"), col("sig"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Exact n-gram Jaccard verification of the LSH candidates: intersection
    * via a co-partitioned equi-join of the shingle tables; |A|,|B| from the
    * set sizes. Integer counts -> one double division.
    *
    * The shingle-set frame feeds four consumers (signatures, both join
    * sides, sizes); it is persisted once so the text is tokenised+hashed a
    * single time instead of four (at 100 TB: spill-able MEMORY_AND_DISK,
    * or a materialised intermediate table between pipeline stages). The
    * cache lives until the consuming action finishes; catalog runners
    * (Bench/Verify/AllQueriesSpec) call spark.catalog.clearCache() between
    * queries so a long-lived session doesn't accumulate blocks. */
  def jaccardVerified(spark: SparkSession, docs: DataFrame, threshold: Double): DataFrame = {
    val hsDf = shingleSets(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = pairsFromBands(bandedSignaturesFromSets(hsDf))
    val sh = hsDf.select(col("doc_id"), explode(col("hs")).as("h"))
    val sizes = hsDf.select(col("doc_id"), size(col("hs")).cast("long").as("n"))
    val inter = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("h")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("h")), Seq("doc_b", "h"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** CONTAINMENT-verified pairs: the asymmetric cousin of
    * [[jaccardVerified]] — C(A,B) = |A∩B| / |A| — which catches
    * SUB-document duplication Jaccard misses: a quote, a boilerplate
    * block, or a full document embedded in a larger one scores near 1.0
    * on the contained side while Jaccard stays low (the union is
    * dominated by the big doc). Same plan shape: LSH candidates, one
    * exploded shingle equi-join for the intersection, sizes joined back;
    * emits both directions' containments and keeps pairs where either
    * reaches the threshold. Candidate recall is LSH-bounded as for the
    * Jaccard tier (a tiny snippet inside a huge doc may not share a
    * band); the deliberate tradeoff that keeps the pair space O(bucket). */
  def containmentVerified(spark: SparkSession, docs: DataFrame, threshold: Double): DataFrame = {
    val hsDf = shingleSets(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = pairsFromBands(bandedSignaturesFromSets(hsDf))
    val sh = hsDf.select(col("doc_id"), explode(col("hs")).as("h"))
    val sizes = hsDf.select(col("doc_id"), size(col("hs")).cast("long").as("n"))
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("h")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("h")), Seq("doc_b", "h"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .withColumn("c_a_in_b", col("inter") / col("na"))
      .withColumn("c_b_in_a", col("inter") / col("nb"))
      .filter(col("c_a_in_b") >= threshold || col("c_b_in_a") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("c_a_in_b"), col("c_b_in_a"))
  }

  /** SimHash near-dup CLUSTER pairs: docs collapse to their exact
    * fingerprint cluster first (identical fingerprints = one cluster), then
    * clusters sharing a 16-bit fingerprint half (pigeonhole blocking;
    * recall partial for spread-out bit flips — the standard tradeoff) are
    * verified by exact popcount(xor) <= maxHamming INSIDE the bucket join.
    * Working at cluster granularity shrinks the self-join quadratically on
    * duplicate-heavy corpora and is the unit a dedup pipeline merges
    * anyway. Output: representative doc ids, cluster sizes, distance. */
  def simhashPairs(spark: SparkSession, docs: DataFrame, maxHamming: Int): DataFrame = {
    // four consumers (a/b sides x two halves): persist the tiny cluster
    // frame so the token-explode simhash pipeline runs once, not 4x
    val clusters = simhash(spark, docs)
      .groupBy("simhash")
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n_docs"))
      .withColumn("lo", col("simhash") % 1073741824L)
      .withColumn("hi", expr("shiftright(simhash, 30)"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def half(c: String) = {
      val a = clusters.select(col(c).as("k"), col("simhash").as("sa"),
        col("rep").as("rep_a"), col("n_docs").as("docs_a"))
      val b = clusters.select(col(c).as("k"), col("simhash").as("sb"),
        col("rep").as("rep_b"), col("n_docs").as("docs_b"))
      a.join(b, Seq("k")).filter(col("sa") < col("sb")).drop("k")
        .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
        .filter(col("hamming") <= maxHamming)
    }
    half("lo").unionByName(half("hi"))
      .select(col("rep_a"), col("rep_b"), col("docs_a"), col("docs_b"), col("hamming"))
      .distinct()
  }

  /** Character-level verification of the LSH candidates: classical
    * unit-cost Levenshtein (built-in, identical definition in DuckDB) and
    * a normalized similarity 1 - d/max(len). Candidates come from the
    * banded minhash join, so the quadratic DP only runs on pairs already
    * suspected — never all-pairs.
    *
    * EXACT-duplicate collapse (round 15, found at the 10× sf1-sim pass):
    * a corpus with multiplicity-m exact copies makes every candidate
    * cluster's pair count grow m² — the DP bill went ×199 at m=10 — yet
    * identical texts contribute exactly one distinct DP result. So the
    * verify runs on one REPRESENTATIVE per distinct text (min doc_id),
    * and results expand back to member pairs: cross-group pairs inherit
    * the rep pair's (dist, sim); within-group pairs are (0, 1.0) by
    * definition and never candidates to re-derive. Output is
    * bit-identical to verifying every pair (identical texts ⇒ identical
    * signatures ⇒ identical banding ⇒ identical candidacy), but the DP
    * and the LSH join run at distinct-text scale — rows-out stays the
    * corpus's own pair count, which is the operator's contract. */
  def editDistanceVerified(spark: SparkSession, docs: DataFrame, minSim: Double): DataFrame = {
    val d = docs.select(col("doc_id"), col("text"))
    val groups = d.groupBy("text")
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("nmem"))
    val reps = groups.select(col("rep").as("doc_id"), col("text"))
    val members = d.join(groups.select(col("text"), col("rep")), Seq("text"))
      .select(col("rep"), col("doc_id"))

    val cand = minhashCandidates(spark, reps)
    val a = reps.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
    val b = reps.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
    val la = length(col("text_a"))
    val lb = length(col("text_b"))
    // sim >= minSim  ⟺  dist <= (1-minSim)·max(len). cutoff rounds UP so no
    // boundary row is lost to float rounding; the exactness filter below
    // stays the double `sim >= minSim` the oracle uses.
    val cutoff = ceil(greatest(la, lb).cast("double") * lit(1.0d - minSim)).cast("int")
    val repPairs = cand.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      // length prefilter: dist >= |la-lb| always, so a length gap past the
      // cutoff can never reach minSim — zero DP work for those pairs
      .filter(abs(la - lb) <= cutoff)
      // thresholded Levenshtein: the DP early-exits once distance provably
      // exceeds cutoff+1 and returns -1 — O(cutoff·len) instead of O(len²)
      // for wildly-different candidate pairs
      .withColumn("dist",
        call_function("levenshtein", col("text_a"), col("text_b"), cutoff + lit(1))
          .cast("long"))
      .withColumn("sim",
        lit(1.0d) - col("dist").cast("double") /
          greatest(la, lb).cast("double"))
      .filter(col("dist") >= 0 && col("sim") >= minSim)
      .select(col("doc_a"), col("doc_b"), col("dist"), col("sim"))

    // expand rep pairs to member pairs, re-oriented doc_a < doc_b
    val ma = members.select(col("rep").as("doc_a"), col("doc_id").as("ma"))
    val mb = members.select(col("rep").as("doc_b"), col("doc_id").as("mb"))
    val cross = repPairs.join(ma, Seq("doc_a")).join(mb, Seq("doc_b"))
      .select(least(col("ma"), col("mb")).as("doc_a"),
        greatest(col("ma"), col("mb")).as("doc_b"), col("dist"), col("sim"))
    // identical-text pairs: dist 0, sim 1.0 — but ONLY for texts that
    // actually produce a banded signature. shingleSets drops docs with no
    // word-3-gram shingles (empty / <3-word texts), so the naive pair path
    // never emits pairs for duplicated degenerate texts; the collapse must
    // not either (the bit-identical contract). Semi-join the groups against
    // the reps that shingle before expanding within-group pairs.
    val bandedReps = shingleSets(reps).select(col("doc_id").as("rep"))
    val bandedMembers = members.join(bandedReps, Seq("rep"), "left_semi")
    val within = bandedMembers.as("x").join(bandedMembers.as("y"),
        col("x.rep") === col("y.rep") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        lit(0L).as("dist"), lit(1.0d).as("sim"))
    cross.unionByName(within)
  }

  /** SimHash bit width. 60 bits: per-token hash = charHash(t) (bits 0..29)
    * ++ charHash(reverse(t)) (bits 30..59) — two independent 30-bit
    * polynomial folds, both cross-engine reproducible. 32 bits proved too
    * coarse on same-vocabulary corpora (everything within hamming 3). */
  val SimhashBits = 60

  /** SimHash fingerprint: per-token hashes vote per bit position; bit j of
    * the fingerprint is set when the weighted vote is positive. One fused
    * native-expression pass per document (SimHash60Expr) — no explode, no
    * per-bit crossJoin, no shuffle. Near-dups land on close fingerprints;
    * bucketing on fingerprint halves gives an O(n) candidate pass at
    * scale. */
  def simhash(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      call_function("graft_simhash60", tokens(col("text"))).as("simhash"))

  /** Content-defined chunking (CDC) dedup census, the storage-dedup
    * primitive behind LBFS-style systems (Muthitacharoen et al., SOSP
    * 2001): a chunk boundary falls wherever the rolling hash of the
    * trailing `window`-char substring ≡ 0 (mod `divisor`), so chunk
    * boundaries survive insertions/deletions — unlike fixed-size blocks,
    * a one-char edit only reshapes the chunks it touches. Per-source
    * census: chunk count, distinct chunks (identity = the cross-engine
    * polynomial char hash; collisions are counted as dups identically by
    * both engines, which is what makes the census oracle-exact), chars
    * covered, chars saved by storing each distinct chunk once, dup ppm.
    *
    * Scale: chunking + hashing is PURE map-side per-row work (O(n·w)
    * scalar hashing inside codegen, no explode of positions survives the
    * projection); the only shuffles are the two partial-aggregatable
    * group-bys on (source, chunk-hash) then (source) — the same shape as
    * exact dedup. Expected chunk length = divisor chars. */
  def cdcChunkStats(docs: DataFrame, window: Int = 8, divisor: Int = 64): DataFrame =
    cdcCensus(cdcChunkHashes(docs, window, divisor))

  /** Per-chunk rows (source, h, l) of the CDC chunking — the map-side
    * half of [[cdcChunkStats]], exposed so a streaming ingest can chunk
    * each micro-batch independently (chunking is per-row, so batch
    * splits cannot change the chunk set) and defer the census. */
  def cdcChunkHashes(docs: DataFrame, window: Int = 8, divisor: Int = 64): DataFrame = {
    val w1 = window - 1
    val t = docs.filter(length(col("text")) >= 1)
      .select(col("source"), col("text"),
        length(col("text")).cast("long").as("n"))
    // interior boundary positions: i in [window, n) with window-hash % divisor = 0
    val bs = t.withColumn("bs", expr(
      s"""CASE WHEN n >= $window THEN
         |  filter(sequence(CAST($window AS BIGINT), n),
         |    i -> i < n AND graft_char_hash(substr(text, CAST(i - $w1 AS INT), $window)) % $divisor = 0)
         |ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin))
    val chunks = bs.select(col("source"), explode(expr(
      s"""transform(sequence(1, size(bs) + 1),
         |  k -> substr(text,
         |    CAST(CASE WHEN k = 1 THEN 1 ELSE element_at(bs, k - 1) + 1 END AS INT),
         |    CAST((CASE WHEN k <= size(bs) THEN element_at(bs, k) ELSE n END)
         |       - (CASE WHEN k = 1 THEN 1 ELSE element_at(bs, k - 1) + 1 END) + 1 AS INT)))""".stripMargin))
      .as("chunk"))
    chunks.select(col("source"), expr("graft_char_hash(chunk)").as("h"),
      length(col("chunk")).cast("long").as("l"))
  }

  /** Census half of [[cdcChunkStats]] over (source, h, l) chunk rows:
    * two partial-aggregatable group-bys, batch-split-invariant. */
  def cdcCensus(chunkRows: DataFrame): DataFrame =
    chunkRows
      .groupBy("source", "h")
      .agg(count(lit(1)).as("c"), min("l").as("l"))
      .groupBy("source")
      .agg(sum("c").as("n_chunks"), count(lit(1)).as("n_distinct"),
        sum(col("c") * col("l")).as("total_chars"),
        (sum(col("c") * col("l")) - sum("l")).as("saved_chars"))
      .withColumn("dup_ppm",
        expr("(1000000 * (n_chunks - n_distinct)) div n_chunks"))
}
