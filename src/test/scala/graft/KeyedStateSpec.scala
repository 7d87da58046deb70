package graft

import org.apache.spark.sql.functions._
import graft.streaming.KeyedStateSink
import java.nio.file.Files

/** The streaming state-merge kernel in isolation: cross-batch exact-decimal
  * merging and foreachBatch replay semantics. */
class KeyedStateSpec extends SparkSpec {
  import spark.implicits._

  private def partial(rows: Seq[(String, Long, BigDecimal)]) =
    rows.toDF("k", "n", "sum_dec")
      .select(col("k"), col("n"), col("sum_dec").cast("decimal(38,2)").as("sum_dec"))

  test("decimal merge across batches equals one-shot aggregate; replay is idempotent") {
    val root = Files.createTempDirectory("graft-kss-").toString
    val b0 = Seq(("a", 2L, BigDecimal("10.25")), ("b", 1L, BigDecimal("0.75")))
    val b1 = Seq(("a", 3L, BigDecimal("5.50")), ("c", 1L, BigDecimal("1.00")))
    KeyedStateSink.merge(root, Seq("k"), Nil, Seq("n", "sum_dec"))(partial(b0), 0L)
    KeyedStateSink.merge(root, Seq("k"), Nil, Seq("n", "sum_dec"))(partial(b1), 1L)
    // crash replay of batch 1: re-merges against version 0 and OVERWRITES
    // its own version — must not double-count
    KeyedStateSink.merge(root, Seq("k"), Nil, Seq("n", "sum_dec"))(partial(b1), 1L)
    val got = KeyedStateSink.read(spark, root).get.orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toPlainString)).toSeq
    assert(got === Seq(("a", 5L, "15.75"), ("b", 1L, "0.75"), ("c", 1L, "1.00")))
  }

  test("min-combined columns and schema stability across versions") {
    val root = Files.createTempDirectory("graft-kss-min-").toString
    def p(rows: Seq[(String, Long, Long)]) = rows.toDF("sig", "rep", "n_docs")
    KeyedStateSink.merge(root, Seq("sig"), Seq("rep"), Seq("n_docs"))(
      p(Seq(("s1", 7L, 2L), ("s2", 9L, 1L))), 0L)
    KeyedStateSink.merge(root, Seq("sig"), Seq("rep"), Seq("n_docs"))(
      p(Seq(("s1", 3L, 4L))), 1L)
    val st = KeyedStateSink.read(spark, root).get
    assert(st.schema.fieldNames.toSeq === Seq("sig", "rep", "n_docs"))
    val got = st.orderBy("sig").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("s1", 3L, 6L), ("s2", 9L, 1L)))
  }
}
