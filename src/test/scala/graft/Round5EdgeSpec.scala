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
