package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap (range) join without a cartesian product.
  *
  * Spark has no native interval join: the naive form
  * `a JOIN b ON a.s < b.e AND b.s < a.e` plans as a broadcast/cartesian
  * nested loop — O(|A|·|B|) predicate evaluations, a non-starter at
  * scale. The standard decomposition turns it into an EQUI-join:
  * explode each interval over the fixed-width time buckets it covers,
  * hash-join on the bucket, then apply the exact predicate as a
  * residual filter. An overlapping pair meets in every bucket both
  * cover, so duplicates are eliminated WITHOUT a distinct: a pair is
  * kept only in the bucket containing the overlap's start
  * (greatest(a.s, b.s)) — exactly one surviving copy per true pair,
  * decided by a stateless scalar predicate.
  *
  * Scale: bucket width should be chosen ≈ typical interval length so
  * each interval explodes to O(1) buckets; the shuffle keys on the
  * bucket (add the natural partition key — user, device, region — to
  * the join key when one exists and the bucket timeline is hot). This
  * is the same decomposition Spark's own range-join hints and the
  * published interval-join literature use. */
object RangeJoin {

  /** Overlap-join two interval frames (id, s, e) in epoch µs (end
    * exclusive), bucketing by `bucketUs`. Emits (a_id, b_id,
    * overlap_us) for every strictly-overlapping pair. */
  def intervalOverlap(a: DataFrame, b: DataFrame, bucketUs: Long): DataFrame = {
    def burst(df: DataFrame, idOut: String): DataFrame = df
      .select(col("id").as(idOut), col("s").as(s"${idOut}_s"), col("e").as(s"${idOut}_e"))
      // integer div (not /): epochs are non-negative, so div == floor
      .withColumn("bkt", explode(sequence(
        expr(s"${idOut}_s div ${bucketUs}L"),
        expr(s"(${idOut}_e - 1) div ${bucketUs}L"))))
    burst(a, "a_id").join(burst(b, "b_id"), "bkt")
      .filter(col("a_id_s") < col("b_id_e") && col("b_id_s") < col("a_id_e"))
      .filter(col("bkt") === expr(s"greatest(a_id_s, b_id_s) div ${bucketUs}L"))
      .select(col("a_id"), col("b_id"),
        (least(col("a_id_e"), col("b_id_e")) -
          greatest(col("a_id_s"), col("b_id_s"))).as("overlap_us"))
  }
}
