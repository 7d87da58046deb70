package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.queries.Staging

/** The exact-duplicate collapse inside
  * [[graft.operators.Dedup.editDistanceVerified]] (verify one
  * representative per distinct text, expand back) must be OUTPUT-
  * INVISIBLE: on a corpus with real duplicate multiplicity the result
  * equals pair-level verification over every document. The testdata
  * corpus has no exact duplicates (the driver oracle can't pin this
  * branch), so the fixture builds multiplicity here. */
class EditDistanceCollapseSpec extends SparkSpec {

  test("collapsed verify ≡ naive pair-level verify on a duplicated corpus") {
    val minSim = 0.4
    val base = Staging.tbl(spark, sf, "documents")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 40)
    // multiplicity: two extra exact copies of every 2nd doc, one near-dup
    // (single-char prefix edit) of every 3rd — clusters AND cross pairs
    val dup1 = base.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 1000L).as("doc_id"), col("text"))
    val dup2 = base.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 2000L).as("doc_id"), col("text"))
    val near = base.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 3000L).as("doc_id"),
        concat(lit("x"), substring(col("text"), 2, 1000000)).as("text"))
    // degenerate duplicated texts (<3 words ⇒ no word-3-gram shingles ⇒
    // never banded ⇒ the naive path emits NO pair for them): the collapse
    // must not invent within-group (0, 1.0) pairs for these
    val short1 = spark.createDataFrame(Seq(
      (9001L, "tiny doc"), (9002L, "tiny doc"), (9003L, "tiny doc"),
      (9004L, ""), (9005L, ""))).toDF("doc_id", "text")
    val docs = base.union(dup1).union(dup2).union(near).union(short1)

    // the naive reference: the pre-collapse implementation verbatim —
    // candidates over EVERY doc, the DP on every candidate pair
    val cand = Dedup.minhashCandidates(spark, docs)
    val a = docs.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
    val la = length(col("text_a"))
    val lb = length(col("text_b"))
    val cutoff = ceil(greatest(la, lb).cast("double") * lit(1.0d - minSim)).cast("int")
    val naive = cand.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .filter(abs(la - lb) <= cutoff)
      .withColumn("dist",
        call_function("levenshtein", col("text_a"), col("text_b"), cutoff + lit(1))
          .cast("long"))
      .withColumn("sim", lit(1.0d) - col("dist").cast("double") / greatest(la, lb).cast("double"))
      .filter(col("dist") >= 0 && col("sim") >= minSim)
      .select(col("doc_a"), col("doc_b"), col("dist"), col("sim"))

    val naiveSet = naive.collect().map(_.toString).sorted.toSeq
    val collapsed = Dedup.editDistanceVerified(spark, docs, minSim)
      .collect().map(_.toString).sorted.toSeq
    assert(naiveSet.nonEmpty, "fixture must produce verified pairs")
    // duplicates must actually create within-cluster AND cross-cluster work
    assert(naiveSet.exists(_.contains(",0,1.0")), "fixture must contain exact-dup pairs")
    assert(collapsed == naiveSet,
      s"collapse changed the output: ${collapsed.size} vs ${naiveSet.size} rows")
  }
}
