package graft.operators

import graft.Ckpt.Ops
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.CrossFns._

/** Text-analysis operators over the `documents` table: language-ID
  * heuristic, quality scoring, token counting, document fingerprinting.
  * Pure Catalyst higher-order functions — per-doc work, narrow plan, no
  * shuffle except the caller's final ordering.
  */
object TextOps {

  /** CCNet-style LM quality filter (Wenzek et al. 2020): score documents
    * by a bigram language model trained on a reference split, bucket each
    * language's docs into head/middle/tail, keep the head. The classic
    * log-perplexity is a float sum; for cross-engine exactness the score
    * here is the MEAN INVERSE Laplace-smoothed bigram probability in ppm —
    * per position, inv_p = (C(prev)+V)·10^6 div (C(prev,cur)+1), all
    * exact int64 (same ordering intent: rare transitions ⇒ large inverse
    * probability ⇒ tail). Train split = even doc_id (the stand-in for
    * CCNet's trusted Wikipedia LM corpus), scored split = odd doc_id.
    *
    * Scale shape: LM training is two partial-aggregatable count passes
    * keyed by (prev,cur)/prev; scoring is the bigram stream joined
    * against the model on those keys — a hash join that distributes with
    * the vocabulary (the model is corpus-scale, NOT broadcast); V rides a
    * 1-row crossJoin (audited scalar pattern). Per-doc rollup is one
    * partial agg. The head/middle/tail split is a per-lang ntile over
    * DOC-level rows (1 row per doc); at 100 TB swap that window for the
    * 2-pass histogram split (agg_quantile_2pass) — the scores are already
    * exact integers. Int64 bound: (C(prev)+V)·10^6 needs C(prev) < 9e12 —
    * fine to ~10^12 training tokens, then drop to ppb scaling. */
  def perplexityScores(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("w"))
      .filter(size(col("w")) > 0)
    val bi = toks.select(col("doc_id"), col("lang"),
      explode(transform(sequence(lit(1), size(col("w"))), i =>
        struct(
          when(i === 1, lit("<s>"))
            .otherwise(element_at(col("w"), i - 1)).as("prev"),
          element_at(col("w"), i).as("cur")))).as("b"))
      .select(col("doc_id"), col("lang"),
        col("b.prev").as("prev"), col("b.cur").as("cur"))
    val train = bi.filter(col("doc_id") % 2 === 0)
    val cBi = train.groupBy("prev", "cur").agg(count(lit(1)).as("c_bi"))
    val cPrev = train.groupBy("prev").agg(count(lit(1)).as("c_prev"))
    val vocab = train.agg(countDistinct(col("cur")).as("v"))
    bi.filter(col("doc_id") % 2 === 1)
      .join(cBi, Seq("prev", "cur"), "left_outer")
      .join(cPrev, Seq("prev"), "left_outer")
      .crossJoin(vocab)
      .select(col("doc_id"), col("lang"),
        expr("((coalesce(c_prev, 0) + v) * 1000000) div (coalesce(c_bi, 0) + 1)")
          .as("inv_ppm"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_toks"), sum(col("inv_ppm")).as("sppm"))
      .withColumn("ppx_ppm", expr("sppm div n_toks"))
      .withColumn("bucket",
        when(ntile(3).over(
          Window.partitionBy("lang").orderBy(col("ppx_ppm"), col("doc_id"))) === 1, "head")
          .when(ntile(3).over(
            Window.partitionBy("lang").orderBy(col("ppx_ppm"), col("doc_id"))) === 2, "middle")
          .otherwise("tail"))
      .select(col("doc_id"), col("lang"), col("n_toks"), col("ppx_ppm"), col("bucket"))
  }

  /** Kneser-Ney-smoothed bigram LM scoring — the standard perplexity
    * filter [[perplexityScores]]'s Laplace smoothing is too blunt for:
    * interpolated KN discounts every SEEN bigram by the absolute
    * constant D = 3/4 and redistributes that mass over the CONTINUATION
    * distribution (how many distinct contexts a word follows — "Francisco"
    * is frequent but continues nothing, so it backs off to ~nothing),
    * keeping unseen bigrams finite without flattening the head.
    *
    * Integer-exact form (D = 3/4 enters as ×4 rationals; no floats
    * anywhere, so scores are bit-identical across engines). Per scored
    * position with train counts c_bi = c(prev,cur), c_prev = c(prev),
    * n_follow = |{w : c(prev,w)>0}|, n_cont = |{v : c(v,cur)>0}|,
    * Nb = distinct train bigram types:
    *
    *   seen context:  p = [max(4·c_bi − 3, 0)·Nb + 3·n_follow·(n_cont+1)]
    *                      / (4·c_prev·Nb)
    *   unseen context: p = (n_cont + 1) / (Nb + 1)
    *
    * The +1 continuation floor keeps every position finite (unseen CUR
    * has n_cont = 0 — without the floor the interpolated term vanishes
    * and the inverse blows up); a seen context always has n_follow ≥ 1,
    * so the numerator is ≥ 3 and the reported INVERSE probability
    * inv = den·10⁶ div num is always defined. Per-doc score = mean
    * inverse in ppm (the [[perplexityScores]] convention: rare
    * transitions ⇒ large inverse ⇒ tail). Train split = even doc_id,
    * scored split = odd.
    *
    * Scale shape: identical to [[perplexityScores]] — three
    * partial-aggregatable count passes (bigram, context, continuation)
    * plus a 1-row Nb crossJoin; scoring joins the scored bigram stream
    * against the model on its keys (corpus-scale model, NOT broadcast).
    * The seen-context numerator 4·c_prev·Nb·10⁶ is computed in
    * decimal(38,0) (HUGEINT in the oracle) — at web scale c_prev·Nb
    * crosses 2.3e11 (≈10⁶ context count × 10⁵ bigram types) and an
    * int64 product would fail there; the decimal form is exact to
    * 1e38 and the `div` result (bounded by 4/3·c_prev·10⁶) stays well
    * inside int64 for any real corpus. */
  def knPerplexityScores(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("w"))
      .filter(size(col("w")) > 0)
    val bi = toks.select(col("doc_id"), col("lang"),
      explode(transform(sequence(lit(1), size(col("w"))), i =>
        struct(
          when(i === 1, lit("<s>"))
            .otherwise(element_at(col("w"), i - 1)).as("prev"),
          element_at(col("w"), i).as("cur")))).as("b"))
      .select(col("doc_id"), col("lang"),
        col("b.prev").as("prev"), col("b.cur").as("cur"))
    val train = bi.filter(col("doc_id") % 2 === 0)
    val cBi = train.groupBy("prev", "cur").agg(count(lit(1)).as("c_bi"))
    val cPrev = train.groupBy("prev").agg(count(lit(1)).as("c_prev"),
      countDistinct(col("cur")).as("n_follow"))
    val cont = cBi.groupBy("cur").agg(count(lit(1)).as("n_cont"))
    val nb = cBi.agg(count(lit(1)).as("nb"))
    bi.filter(col("doc_id") % 2 === 1)
      .join(cBi, Seq("prev", "cur"), "left_outer")
      .join(cPrev, Seq("prev"), "left_outer")
      .join(cont, Seq("cur"), "left_outer")
      .crossJoin(nb)
      .select(col("doc_id"), col("lang"),
        expr("""CASE WHEN c_prev IS NULL
               | THEN ((nb + 1) * 1000000) div (coalesce(n_cont, 0L) + 1)
               | ELSE (CAST(4 AS DECIMAL(38,0)) * c_prev * nb * 1000000) div
               |   (CAST(greatest(4 * coalesce(c_bi, 0L) - 3, 0L) AS DECIMAL(38,0)) * nb
               |    + CAST(3 AS DECIMAL(38,0)) * n_follow * (coalesce(n_cont, 0L) + 1))
               |END""".stripMargin).as("inv_ppm"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_big"), sum(col("inv_ppm")).as("sppm"))
      .select(col("doc_id"), col("lang"), col("n_big"),
        expr("sppm div n_big").as("kn_ppm"))
  }

  /** Flesch reading-ease readability in exact milli-units. Counting
    * rules chosen for cross-engine reproducibility, not linguistic
    * fidelity: sentences = maximal runs of [.!?], syllables = maximal
    * vowel runs (the classic cheap approximation), words = whitespace
    * tokens. fre_milli = 206835 − (1015·W) div max(S,1) − (84600·Y) div
    * max(W,1) — floor division on non-negative numerators, so the score
    * is bit-identical in Spark and DuckDB.
    *
    * Scale: pure per-row scalar work (regexp_extract_all + size), fully
    * codegen'd, no shuffle at all — the best possible 100 TB shape. */
  def readabilityScores(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_words"),
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
          .cast("long").as("n_sents"),
        size(regexp_extract_all(lower(col("text")), lit("[aeiou]+"), lit(0)))
          .cast("long").as("n_sylls"))
      .withColumn("fre_milli",
        lit(206835L) - expr("(1015 * n_words) div greatest(n_sents, 1L)")
          - expr("(84600 * n_sylls) div greatest(n_words, 1L)"))

  /** Stopword lexicons for the n-gram/stopword language heuristic. Only
    * Latin-script languages are detectable this way; docs with no hits get
    * 'unk' (covers the corpus's 'zh' label, which the synthetic generator
    * writes with ASCII words anyway). Keep in sync with Oracles.langLex. */
  val langLexicons: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ein", "nicht"),
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
  )

  val enStopwords: Seq[String] = langLexicons.toMap.apply("en")

  private def lexScore(toks: Column, lex: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(lex))).cast("long")

  /** Character trigrams of a string (overlapping, positions 1..len-2). */
  def charTrigrams(s: Column): Column =
    when(length(s) >= 3,
      array_distinct(transform(sequence(lit(1), length(s) - 2), i => substr(s, i, lit(3)))))
      .otherwise(array().cast("array<string>"))

  /** Per-language char-trigram profiles derived deterministically from the
    * stopword lexicons (trigrams of the space-joined lexicon) — the
    * same-in-both-engines reference profile for the n-gram language
    * heuristic. */
  val langTrigramProfiles: Seq[(String, Seq[String])] = langLexicons.map {
    case (lang, lex) =>
      val joined = lex.mkString(" ")
      lang -> joined.sliding(3).toSeq.distinct
  }

  /** Language ID via char-trigram profile overlap: score = |doc trigrams ∩
    * language profile|, argmax with alphabetical tie-break, zero -> 'unk'.
    * The n-gram flavor of [[langId]] (which is word/stopword based). */
  def langIdNgram(docs: DataFrame): DataFrame = {
    // per-language score columns + a greatest/when argmax: stays one
    // narrow projection per row — no explode, no window shuffle (the
    // explode+row_number formulation cost 4s at sf0.1; this is ~1s).
    // Ties resolve to the alphabetically-first language (profiles are
    // sorted), matching the oracle's ORDER BY score DESC, lang.
    val scoredCols = langTrigramProfiles.map { case (lang, prof) =>
      lang -> size(array_intersect(col("tri"), array(prof.map(lit): _*))).cast("long")
    }
    val base = docs
      .select(col("doc_id"), charTrigrams(col("text")).as("tri"))
      .select(col("doc_id") +: scoredCols.map { case (l, c) => c.as(s"s_$l") }: _*)
    val m = greatest(scoredCols.map { case (l, _) => col(s"s_$l") }: _*)
    val guess = scoredCols.foldLeft(when(m === 0, lit("unk"))) {
      case (acc, (l, _)) => acc.when(col(s"s_$l") === m, lit(l))
    }
    base.select(col("doc_id"), guess.as("lang_guess"), m.as("score"))
  }

  /** (doc_id, lang_guess, score): argmax of lexicon hit counts, ties broken
    * alphabetically, zero hits -> 'unk'.
    *
    * Same greatest/when argmax projection as [[langIdNgram]]: one narrow
    * map-side pass per row — no explode fan-out, no per-doc row_number
    * window shuffle (the explode+window formulation cost 1.86s at sf0.1 vs
    * ~0.2s for this shape). langLexicons is alphabetically ordered, so the
    * first `when` branch that matches the max IS the alphabetical
    * tie-break the oracle's ORDER BY score DESC, lang expresses. */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val base = docs.select(
      col("doc_id") +: langLexicons.map { case (lang, lex) =>
        lexScore(toks, lex).as(s"s_$lang")
      }: _*)
    val m = greatest(langLexicons.map { case (l, _) => col(s"s_$l") }: _*)
    val guess = langLexicons.foldLeft(when(m === 0, lit("unk"))) {
      case (acc, (l, _)) => acc.when(col(s"s_$l") === m, lit(l))
    }
    base.select(col("doc_id"), guess.as("lang_guess"), m.as("score"))
  }

  /** Quality components + composite score. All ratios derive from integer
    * counts, so the doubles are bit-identical across engines. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(toks).cast("long").as("n_toks"),
      aggregate(transform(toks, t => length(t).cast("long")), lit(0L), _ + _).as("sum_len"),
      lexScore(toks, enStopwords).as("stop_hits"))
      .select(
        col("doc_id"), col("n_toks"),
        when(col("n_toks") === 0, lit(0.0d))
          .otherwise(col("sum_len").cast("double") / col("n_toks")).as("avg_tok_len"),
        when(col("n_toks") === 0, lit(0.0d))
          .otherwise(col("stop_hits").cast("double") / col("n_toks")).as("stop_ratio"))
      .withColumn("quality",
        col("stop_ratio") * 0.5 + least(lit(1.0d), col("n_toks").cast("double") / 100.0d) * 0.5)
  }

  /** Gopher-style repetition/quality signals (public heuristics from the
    * Gopher/MassiveText filtering rules): token count, mean token length,
    * top-unigram mass fraction, duplicate-bigram fraction, stopword
    * fraction, and the composite pass/fail gate.
    *
    * Every signal is an explode → partial-aggregate reduction, not per-row
    * array math, for two reasons. Scale: map-side combine does the heavy
    * counting before any shuffle, and no giant per-doc arrays are
    * materialised. Optimizer safety: a downstream `filter($"passes")`
    * (pipeline_quality_gate) is rewritten by predicate pushdown, which
    * INLINES referenced projection aliases into the pushed filter — with
    * per-row array expressions that re-evaluated the bigram construction
    * several times per row (measured 2.5s → 18.5s at sf0.1); pushdown
    * stops at an Aggregate, so aggregated signals can only be inlined as
    * cheap arithmetic over the agg's outputs.
    *
    * The (doc, token) frequency frame yields ALL unigram signals in one
    * pass: n_toks = Σn, weighted length Σ(n·len), top_n = max n, stopword
    * hits = Σ(n · 1[t ∈ lexicon]) — lexicon membership tested once per
    * DISTINCT token, not per occurrence. All ratios derive from integer
    * counts, and the gate compares the ROUNDED ratios, so flags are
    * bit-identical across engines. */
  def gopherSignals(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), tokens(col("text")).as("w"))
    val uni = base.select(col("doc_id"), explode(col("w")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("n"))
      .groupBy("doc_id").agg(
        max("n").as("top_n"),
        sum(col("n") * length(col("t"))).as("sum_len"),
        sum(when(col("t").isInCollection(enStopwords), col("n")).otherwise(0L))
          .as("stop_hits"))
    val bg = base.filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(transform(sequence(lit(1), size(col("w")) - 1),
        i => concat(element_at(col("w"), i), lit(" "), element_at(col("w"), i + 1)))).as("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bg"), countDistinct("b").as("n_bg_d"))
    base.select(col("doc_id"), size(col("w")).cast("long").as("n_toks"))
      .join(uni, Seq("doc_id"), "left")
      .join(bg, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_toks"),
        when(col("n_toks") === 0, lit(0.0d))
          .otherwise(round(coalesce(col("sum_len"), lit(0L)).cast("double") / col("n_toks"), 6))
          .as("mean_tok_len"),
        when(col("n_toks") === 0, lit(0.0d))
          .otherwise(round(coalesce(col("top_n"), lit(0L)).cast("double") / col("n_toks"), 6))
          .as("top_unigram_frac"),
        when(coalesce(col("n_bg"), lit(0L)) === 0, lit(0.0d))
          .otherwise(round(lit(1.0d) -
            col("n_bg_d").cast("double") / col("n_bg"), 6))
          .as("dup_bigram_frac"),
        when(col("n_toks") === 0, lit(0.0d))
          .otherwise(round(coalesce(col("stop_hits"), lit(0L)).cast("double") / col("n_toks"), 6))
          .as("stop_frac"))
      .withColumn("passes",
        col("n_toks") >= 10 && col("n_toks") <= 100000 &&
          col("mean_tok_len") >= 2.0 && col("mean_tok_len") <= 10.0 &&
          col("top_unigram_frac") <= 0.2 &&
          col("dup_bigram_frac") <= 0.3)
  }

  /** (doc_id, n_tokens, n_unique). */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_unique"))
  }

  /** Simpson token-concentration index per document, EXACT integer ppm:
    * simpson_ppm = 1e6·Σc² div n² over the doc's token counts c — the
    * log-free diversity/repetition quality signal (entropy's rational
    * sibling: a doc repeating one token scores 1e6, a doc of n distinct
    * tokens scores ~1e6/n). Also the inverse form in milli —
    * inv_simpson_milli = 1000·n² div Σc², the "effective vocabulary
    * size" a repetition filter thresholds on. Repetitious docs (high
    * simpson / low effective vocab) are the classic low-quality LLM
    * training text the Gopher rules also target, caught here by one
    * scalar instead of per-n-gram fractions.
    *
    * Per-doc HOF only — Σc² comes from a run-length fold over the
    * SORTED token array (state (prev, run, acc); runs close on token
    * change, the finisher closes the last run), so the plan is narrow:
    * no token-level explode, no shuffle beyond the caller's ordering.
    * Int64 bound: 1e6·Σc² ≤ 1e6·n² — fine to ~3e6 tokens per doc. */
  def simpsonDiversity(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("w"))
      .filter(size(col("w")) > 0)
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_toks"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"),
        expr("""aggregate(
            sort_array(w),
            named_struct('prev', '', 'run', CAST(0 AS BIGINT), 'acc', CAST(0 AS BIGINT)),
            (s, x) -> CASE WHEN x = s.prev
              THEN named_struct('prev', x, 'run', s.run + CAST(1 AS BIGINT), 'acc', s.acc)
              ELSE named_struct('prev', x, 'run', CAST(1 AS BIGINT),
                'acc', s.acc + s.run * s.run) END,
            s -> s.acc + s.run * s.run)""").as("sum_c2"))
      .select(col("doc_id"), col("n_toks"), col("n_distinct"),
        expr("(1000000 * sum_c2) div (n_toks * n_toks)").as("simpson_ppm"),
        expr("(1000 * n_toks * n_toks) div sum_c2").as("inv_simpson_milli"))

  /** BPE-ish pre-tokenizer regex (GPT-2 style classes without lookarounds,
    * so it runs identically in Spark and DuckDB): letter runs, digit runs,
    * single punctuation marks. */
  val bpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  /** Token statistics under the BPE-ish segmentation — the token-count
    * estimator a training pipeline budgets with. */
  def bpeishCounts(docs: DataFrame): DataFrame = {
    val toks = regexp_extract_all(col("text"), lit(bpeishPattern), lit(0))
    docs.select(
      col("doc_id"),
      size(toks).cast("long").as("n_bpe_tokens"),
      size(array_distinct(toks)).cast("long").as("n_bpe_unique"))
  }

  /** Order-sensitive document fingerprint: polynomial fold of per-token
    * hashes — fp = fold((acc*1000003 + charHash(tok)) mod P) — a rolling
    * content hash reproducible in any engine. */
  def fingerprint(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      aggregate(transform(toks, t => charHash(t)), lit(0L),
        (acc, h) => (acc * 1000003L + h) % HashP).as("fp"))
  }

  /** Iterative BPE training (the first `iterations` merges): each round
    * counts adjacent symbol pairs corpus-wide, picks the most frequent
    * (deterministic count-desc/lexicographic tiebreak), and applies the
    * merge everywhere before recounting — the actual tokenizer-training
    * loop, not just one round. Returns one row per merge:
    * (iter, tok_a, tok_b, n).
    *
    * The corpus rides between rounds as a STRING encoding — tokens
    * joined with two spaces, one space at each end — so applying a merge
    * is a single built-in `replace` of " a  b " with " a<J>b ": plain
    * left-to-right non-overlapping replacement is exactly BPE's greedy
    * application order (for pair (a,a) on "a a a" it merges once, like
    * BPE), the double-space gaps keep token boundaries exact, and the
    * whole round stays codegen'd with no UDF. Merged symbols join with
    * a \u0001 joiner <J> (so "a"+"b" never collides with a literal token
    * "ab") and participate in later rounds as single tokens.
    * Per round: one explode + one partial-agg shuffle + a 1-row
    * collect (the vocab lives on the driver in real tokenizer training);
    * corpus work is scan-linear per round. */
  def bpeTrain(docs: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    var repr = docs
      .select(concat(lit(" "), concat_ws("  ", tokens(col("text"))), lit(" ")).as("s"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (i <- 1 to iterations) {
      val top = repr
        .select(split(trim(col("s")), "  ").as("t"))
        .filter(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS a, t[i] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()(0)
      val (a, b, n) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((i.toLong, a, b, n))
      repr = repr.withColumn("s", call_function("replace",
        col("s"), lit(s" $a  $b "), lit(s" $a\u0001$b ")))
    }
    merges.toSeq.toDF("iter", "tok_a", "tok_b", "n")
  }

  /** BATCHED BPE training — the scale path for real vocabulary sizes.
    * [[bpeTrain]] is one Spark job PER MERGE with an ever-deepening
    * replace chain: correct, but a 32k-merge tokenizer train would be 32k
    * sequential jobs. Here each JOB takes the top-`batchSize` MUTUALLY
    * TOKEN-DISJOINT pairs from one corpus-wide count (greedy in
    * (count desc, a, b) order over a deterministic `pool`-sized candidate
    * ranking, skipping any pair that shares a symbol with an already-kept
    * pair) and applies the whole batch in ONE generated projection — a
    * bounded chain of `batchSize` codegen'd replaces — then truncates
    * lineage, so plan depth never exceeds the batch size.
    *
    * Disjointness makes the batch EXACT, not approximate, merge-by-merge:
    * merging (a,b) can change neither the occurrences nor the count of a
    * token-disjoint (c,d) (adjacencies " c  d " don't contain a or b), so
    * every kept merge applies to exactly the corpus state its count was
    * measured on, and in-batch application order is irrelevant. The one
    * documented divergence from the strictly-sequential rule: a symbol
    * CREATED by a batch can't participate in another merge until the next
    * batch — the standard batched-BPE contract. 32k merges at batch 256 =
    * 128 jobs with bounded plans instead of 32k jobs.
    *
    * Returns one row per accepted merge: (rank, batch, tok_a, tok_b, n)
    * with n the pair count in the corpus state the batch was counted on. */
  def bpeTrainBatched(docs: DataFrame, merges: Int, batchSize: Int): DataFrame = {
    require(merges >= 1 && batchSize >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    var repr = docs
      .select(concat(lit(" "), concat_ws("  ", tokens(col("text"))), lit(" ")).as("s"))
      .graftCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, String, Long)]
    var batch = 0L
    var exhausted = false
    while (out.size < merges && !exhausted) {
      batch += 1
      val want = math.min(batchSize, merges - out.size)
      // Deterministic candidate pool: large enough that the disjointness
      // filter almost never starves a batch (each kept pair only excludes
      // candidates sharing its two symbols); the pool bound is part of the
      // algorithm's contract so the oracle can mirror it exactly.
      val pool = want * 16 + 64
      val cand = repr
        .select(split(trim(col("s")), "  ").as("t"))
        .filter(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS a, t[i] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(pool)
        .collect()
      if (cand.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val kept = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val it = cand.iterator
        while (kept.size < want && it.hasNext) {
          val r = it.next()
          val (a, b, n) = (r.getString(0), r.getString(1), r.getLong(2))
          if (!used(a) && !used(b)) { used += a; used += b; kept += ((a, b, n)) }
        }
        for ((a, b, n) <- kept) out += ((out.size + 1L, batch, a, b, n))
        val applied = kept.foldLeft(col("s")) { case (c, (a, b, _)) =>
          call_function("replace", c, lit(s" $a  $b "), lit(s" $a\u0001$b ")) }
        repr = repr.withColumn("s", applied).graftCheckpoint()
      }
    }
    out.toSeq.toDF("rank", "batch", "tok_a", "tok_b", "n")
  }

  /** The OTHER half of the tokenizer loop: train `iterations` BPE merges
    * ([[bpeTrain]]), then APPLY the learned merge table to every document
    * and report its token count before and after — the compression
    * measurement a tokenizer pipeline tracks per corpus slice. The merge
    * table is driver-held (as in any real tokenizer); application is the
    * same codegen'd `replace` chain as training, one pass per merge,
    * map-side only — no shuffle at all after training. */
  def bpeApplyCounts(docs: DataFrame, iterations: Int): DataFrame = {
    val merges = bpeTrain(docs, iterations).collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2)))
    var df = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("s", concat(lit(" "), concat_ws("  ", col("toks")), lit(" ")))
    for ((a, b) <- merges)
      df = df.withColumn("s", call_function("replace",
        col("s"), lit(s" $a  $b "), lit(s" $a\u0001$b ")))
    df.select(col("doc_id"),
      size(col("toks")).cast("long").as("n_tokens_raw"),
      when(length(trim(col("s"))) === 0, 0L)
        .otherwise(size(split(trim(col("s")), "  ")).cast("long")).as("n_tokens_bpe"))
  }

  /** Training-sequence packing (offset chunking): lay each shard's
    * documents end to end in deterministic (doc_id) order and cut the
    * token stream into fixed `seqLen` windows — every doc gets the
    * sequence id and in-sequence offset where it starts, plus a flag for
    * docs that span a window boundary (they'd be split or truncated by
    * the loader). Packing runs PER SHARD (`source`), one window pass per
    * partition key: shards pack in parallel and the operator scales with
    * shard count — a single global stream would serialize the whole
    * corpus through one task, which is why cross-shard packing is
    * deliberately not offered. */
  def packSequences(docs: DataFrame, seqLen: Int): DataFrame = {
    require(seqLen >= 1)
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("start_off",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col("doc_id"), col("source"), col("n_tokens"),
        floor(col("start_off") / seqLen).as("seq_id"),
        (col("start_off") % seqLen).as("seq_off"),
        (col("start_off") % seqLen + col("n_tokens") > seqLen).as("spans"))
  }

  /** Feature-hash bucket count for the learned quality classifier — the
    * fastText/CCNet "hashing trick" dimension. 1024 buckets keep the
    * model a broadcastable dimension-scale table (the whole point of a
    * learned filter at 100 TB: training is ONE partial-aggregatable
    * count pass, scoring is a map-side broadcast join) while giving the
    * fixture vocabulary (~100 distinct words) a collision-light code
    * space. */
  val NbBuckets = 1024L

  /** TRAIN a hashed-unigram count-ratio quality classifier (the
    * integer-exact Naive-Bayes-style member of the fastText/CCNet
    * model-filter lineage): labels come from the rule-based Gopher gate
    * over the TRAIN split (even doc_id — the stand-in for "a human/LLM
    * labelled a sample"), features are charHash(token) mod
    * [[NbBuckets]], and each bucket's weight is the Laplace-smoothed
    * positive-class rate in exact ppm:
    *   w_ppm = (c_pos + 1)·10⁶ div (c_pos + c_neg + 2)
    * — no logs, so the model is bit-identical across engines (an
    * unseen bucket scores exactly the 500000 prior). The learned model
    * GENERALISES the gate: it scores documents the rules never saw, at
    * a per-doc cost of one hash per token + one broadcast probe.
    *
    * Scale shape: label pass = the Gopher signal aggregation
    * (doc-scale, partial-aggregatable); training = one token-scale
    * count pass keyed by ≤[[NbBuckets]] buckets — the ideal reduce; the
    * model (≤1024 rows) is metadata-scale. */
  def nbQualityModel(docs: DataFrame): DataFrame = {
    val labels = gopherSignals(docs).select(col("doc_id"), col("passes"))
    docs.filter(col("doc_id") % 2 === 0)
      .join(labels, Seq("doc_id"))
      .select(col("passes"), explode(tokens(col("text"))).as("t"))
      .select(col("passes"), (charHash(col("t")) % NbBuckets).as("bucket"))
      .groupBy("bucket")
      .agg(sum(when(col("passes"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(col("passes"), 0L).otherwise(1L)).as("c_neg"))
      .select(col("bucket"), col("c_pos"), col("c_neg"),
        expr("((c_pos + 1) * 1000000) div (c_pos + c_neg + 2)").as("w_ppm"))
  }

  /** SCORE the held-out split (odd doc_id) with a trained
    * [[nbQualityModel]]: per document, the mean bucket weight over its
    * token OCCURRENCES (multinomial evidence — a doc repeating junk
    * tokens scores like junk), score_ppm = Σw div n_toks, predicted
    * quality = score ≥ the 500000 prior. Unseen buckets contribute the
    * exact smoothed prior via the left-join coalesce. Empty-token docs
    * carry no evidence and are excluded (the gopher gate already fails
    * them on n_toks — a scorer returning the bare prior would launder
    * them into coin flips).
    *
    * Scale shape: the model broadcasts (≤1024 rows); scoring is one
    * map-side probe per token + one per-doc partial agg — zero
    * data-scale shuffles beyond the rollup. */
  def nbQualityScores(docs: DataFrame, model: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"), explode(col("w")).as("t"))
      .select(col("doc_id"), (charHash(col("t")) % NbBuckets).as("bucket"))
      .join(broadcast(model.select(col("bucket"), col("w_ppm"))),
        Seq("bucket"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        sum(coalesce(col("w_ppm"), lit(500000L))).as("sw"))
      .select(col("doc_id"), col("n_toks"),
        expr("sw div n_toks").as("score_ppm"),
        (expr("sw div n_toks") >= 500000L).as("predicted"))

  /** HELD-OUT evaluation of the learned classifier against the Gopher
    * labels on the odd split (docs the trainer never saw) — the
    * dedup_lsh_eval census applied to quality: one row of
    * n_docs / n_label_pos / n_pred_pos / n_hit and exact-rational ppm
    * precision, recall, F1. This is the number a pipeline publishes
    * before swapping the rule gate for the model. */
  def nbQualityEval(docs: DataFrame): DataFrame = {
    val labels = gopherSignals(docs).select(col("doc_id"), col("passes"))
    nbQualityScores(docs, nbQualityModel(docs))
      .join(labels, Seq("doc_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("passes"), 1L).otherwise(0L)).as("n_label_pos"),
        sum(when(col("predicted"), 1L).otherwise(0L)).as("n_pred_pos"),
        sum(when(col("passes") && col("predicted"), 1L).otherwise(0L)).as("n_hit"))
      .select(col("n_docs"), col("n_label_pos"), col("n_pred_pos"), col("n_hit"),
        expr("CASE WHEN n_pred_pos = 0 THEN 0 ELSE (n_hit * 1000000) div n_pred_pos END")
          .as("precision_ppm"),
        expr("CASE WHEN n_label_pos = 0 THEN 0 ELSE (n_hit * 1000000) div n_label_pos END")
          .as("recall_ppm"),
        expr("CASE WHEN n_label_pos + n_pred_pos = 0 THEN 0 " +
          "ELSE (2 * n_hit * 1000000) div (n_label_pos + n_pred_pos) END").as("f1_ppm"))
  }

  /** Multimodal plumbing: treat content as an opaque binary column with
    * typed metadata. The byte length and digest are real; at 100 TB the
    * binary payload would be image/audio bytes and the decode step a
    * vectorised batch UDF — here content derives from text (the container
    * ships no codec libs; see graft.operators.Multimodal for the stubbed
    * decode path). */
  def binaryMeta(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("digest"))
}
