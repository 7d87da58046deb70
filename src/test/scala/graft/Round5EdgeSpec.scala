package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the exact-substring dedup family (Lee et al. 2022
  * re-expression): span extent, window merging, within-document repeats,
  * and the scrub rollup's accounting — on constructed corpora where the
  * correct spans are known by hand, not just oracle-mirrored. */
class Round5EdgeSpec extends SparkSpec {
  import spark.implicits._

  private def stage(docs: Seq[(Long, String, String)]): String = {
    val dir = graft.queries.Staging.tmpDir("sub")
    docs.toDF("doc_id", "text", "source")
      .withColumn("lang", col("source")) // lang-keyed ops group identically
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val uniq = (1 to 40).map(i => s"u$i")

  test("substring spans: an 8-token run shared across docs spans exactly those positions") {
    val run = "s1 s2 s3 s4 s5 s6 s7 s8"
    val dir = stage(Seq(
      (1L, s"${uniq.slice(0, 3).mkString(" ")} $run ${uniq.slice(3, 6).mkString(" ")}", "a"),
      (2L, s"${uniq.slice(6, 11).mkString(" ")} $run", "a")))
    val rows = graft.queries.ExtQueries.dedupSubstringSpans(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 1: tokens 4..11 duplicated -> one span [4, 12); doc 2: [6, 14)
    assert(rows.toSet === Set((1L, 1L, 8L, 4L, 12L), (2L, 1L, 8L, 6L, 14L)))
  }

  test("substring spans: a 9-token shared run merges two overlapping windows into one span") {
    val run = "m1 m2 m3 m4 m5 m6 m7 m8 m9"
    val dir = stage(Seq(
      (1L, s"${uniq.slice(0, 2).mkString(" ")} $run ${uniq.slice(2, 4).mkString(" ")}", "a"),
      (2L, run, "a")))
    val d1 = graft.queries.ExtQueries.dedupSubstringSpans(spark, dir)
      .filter(col("doc_id") === 1L).head()
    // windows at pos 3 and 4 coalesce: one span [3, 12), 9 dup tokens
    assert((d1.getLong(1), d1.getLong(2), d1.getLong(3), d1.getLong(4)) === ((1L, 9L, 3L, 12L)))
  }

  test("substring spans: a run repeated within ONE document yields two disjoint spans") {
    val run = "r1 r2 r3 r4 r5 r6 r7 r8"
    val gap = uniq.slice(0, 10).mkString(" ")
    val dir = stage(Seq((1L, s"$run $gap $run", "a")))
    val d1 = graft.queries.ExtQueries.dedupSubstringSpans(spark, dir).head()
    // spans [1,9) and [19,27): 2 spans, 16 dup tokens
    assert((d1.getLong(1), d1.getLong(2), d1.getLong(3), d1.getLong(4)) === ((2L, 16L, 1L, 27L)))
  }

  test("substring spans: corpus with no duplicated window emits zero rows") {
    val dir = stage(Seq(
      (1L, uniq.slice(0, 12).mkString(" "), "a"),
      (2L, uniq.slice(12, 24).mkString(" "), "a")))
    assert(graft.queries.ExtQueries.dedupSubstringSpans(spark, dir).count() === 0L)
  }

  test("scrub apply: duplicated spans cut, clean docs verbatim, full dups come out empty") {
    val run = "p1 p2 p3 p4 p5 p6 p7 p8"
    val dir = stage(Seq(
      (1L, s"$run ${uniq.slice(0, 2).mkString(" ")}", "a"), // partial: tail survives
      (2L, run, "a"),                                       // fully duplicated -> empty
      (3L, uniq.slice(2, 12).mkString(" "), "a")))          // clean -> verbatim
    val rows = graft.queries.ExtQueries.pipelineScrubApply(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.toSet === Set(
      (1L, 10L, 2L, "u1 u2"),
      (2L, 8L, 0L, ""),
      (3L, 10L, 10L, uniq.slice(2, 12).mkString(" "))))
  }

  test("keep-one scrub: the canonical (lowest doc_id, pos) occurrence survives, repeats are cut") {
    val run = "q1 q2 q3 q4 q5 q6 q7 q8"
    val dir = stage(Seq(
      (1L, run, "a"),                                       // canonical copy: untouched
      (2L, s"$run ${uniq.slice(0, 2).mkString(" ")}", "a"), // repeat: run cut, tail stays
      (3L, run, "a")))                                      // repeat: emptied
    val rows = graft.queries.ExtQueries.pipelineScrubKeepOne(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(rows.toSet === Set(
      (1L, 8L, run),
      (2L, 2L, "u1 u2"),
      (3L, 0L, "")))
  }

  test("temperature sampling: equal-sized groups all keep rate 1e6 (nothing dropped)") {
    val dir = stage(Seq(
      (1L, "a b", "s1"), (2L, "c d", "s1"),
      (3L, "e f", "s2"), (4L, "g h", "s2")))
    val rows = graft.queries.ExtQueries.sampleTemperature(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSet === Set(("s1", 2L, 1000000L, 2L), ("s2", 2L, 1000000L, 2L)))
  }

  test("temperature sampling: a 16x-larger group is down-sampled at w_min/w of the rate") {
    // 64 docs vs 4 docs: w = 8 vs 2, so big keeps 250000 ppm, small keeps all
    val docs = (0L until 64L).map(i => (i, s"d$i x", "big")) ++
      (100L until 104L).map(i => (i, s"d$i y", "small"))
    val rows = graft.queries.ExtQueries.sampleTemperature(spark, stage(docs))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    val byLang = rows.map(r => r._1 -> r).toMap
    assert(byLang("big")._2 === 250000L)
    assert(byLang("small") === (("small", 1000000L, 4L)))
    // the deterministic coin keeps roughly rate*n of the big group
    assert(byLang("big")._3 > 4L && byLang("big")._3 < 32L)
  }

  test("dedup_normalized: case/punct/space mutations collapse, word edits do not") {
    val dir = stage(Seq(
      (1L, "Hello, World!", "a"),
      (2L, "hello   world", "a"),     // same canonical form as 1
      (3L, "HELLO ... WORLD", "a"),   // same canonical form as 1
      (4L, "hello there world", "a"), // word inserted -> distinct
      (5L, "", "a")))                 // empty canonicalises to ""
    val rows = graft.queries.ExtQueries.dedupNormalized(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet === Set(
      (1L, 3L, 3L),   // rep 1 absorbs 2,3; all three raw-distinct
      (4L, 1L, 1L),
      (5L, 1L, 1L)))
  }

  test("RAKE: leading/trailing/multiple stopwords split phrases correctly") {
    val dir = stage(Seq(
      (1L, "the quick brown fox and the lazy dog", "a"),
      (2L, "quick brown fox in a lazy dog den", "a")))
    val phrases = graft.queries.AnalyticsQueries.textKeywordsRake(spark, dir)
      .collect().map(_.getString(0)).toSet
    // islands: stopwords {the, and, a, in} never appear inside a phrase
    assert(phrases.contains("quick brown fox"))
    assert(phrases.contains("lazy dog") || phrases.contains("lazy dog den"))
    assert(phrases.forall(p => !p.split(" ").exists(
      Set("the", "and", "of", "to", "a", "in", "is"))))
  }

  test("aHash: equal-dimension gradient images hash identically; different dims differ") {
    // payload length (bytes of text) drives the raster dims: same length
    // -> same (w,h) -> same gradient pattern -> identical aHash even
    // with different content bytes; different length -> different dims
    val dir = stage(Seq(
      (1L, "aaaa", "x"), (2L, "bbbb", "x"),    // len 4 each
      (3L, "cccccccccc", "x")))                // len 10
    val rows = graft.queries.ExtQueries.multimodalAhashDedup(spark, dir)
      .collect().map(r => (r.getAs[Long]("rep"), r.getAs[Long]("n_docs")))
    assert(rows.toSet === Set((1L, 2L), (3L, 1L)))
  }

  test("benford digits cover 1..9 and deviations sum to ~0 (shares sum to total)") {
    val rows = graft.queries.ExtQueries.profileBenford(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getAs[Long]("digit")).toSeq.sorted === (1L to 9L))
    val obsSum = rows.map(_.getAs[Long]("obs_ppm")).sum
    // floor division loses < 9 ppm total
    assert(obsSum > 999990L && obsSum <= 1000000L)
  }

  test("substring scrub rollup: per-source totals account clean docs as zero") {
    val run = "c1 c2 c3 c4 c5 c6 c7 c8"
    val dir = stage(Seq(
      (1L, s"$run ${uniq.slice(0, 2).mkString(" ")}", "web"),
      (2L, run, "web"),
      (3L, uniq.slice(2, 12).mkString(" "), "books")))
    val rows = graft.queries.ExtQueries.pipelineSubstringScrub(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSet === Set(
      ("books", 1L, 10L, 0L, 0L),   // clean source: zero dup tokens, zero affected
      ("web", 2L, 18L, 16L, 2L)))   // both docs fully/partly duplicated
  }
}
