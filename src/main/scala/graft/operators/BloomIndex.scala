package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.CrossFns

/** File-level bloom-filter secondary index over a partitioned parquet
  * table — the skipping structure for POINT lookups on a high-cardinality
  * column that the layout is NOT clustered by, where footer min/max
  * (ddl_zorder's tool) is useless because every file spans the full key
  * range.
  *
  * The index is a tiny table: one row per (partition dir, bloom word) —
  * `bits/64` longs per file, built with one column-pruned scan and a
  * `bit_or` aggregation (partial-aggregated map-side, so the shuffle
  * carries at most files x words rows). A 100 TB table with 100k files
  * and 4096-bit blooms indexes into 100k x 64 longs ≈ 50 MB — metadata
  * scale, consulted on the driver exactly like partition listings.
  *
  * Lookup semantics: bloom yields candidate files (no false negatives by
  * construction — every inserted key set all k of its bits, so a file
  * containing the key always matches); the exact predicate after the
  * pruned scan removes false positives. Results are identical to a full
  * scan by construction; only I/O changes.
  */
object BloomIndex {

  val Bits = 4096
  val Words: Int = Bits / 64
  val NumHashes = 3

  /** The i-th bloom bit position for a key's scrambled hash — affine
    * family over the shared polynomial hash (CrossFns.HashP keeps every
    * product in int64). Column form (index build). */
  private def position(hv: Column, i: Int): Column =
    ((hv * (31 + i) + 17 * i) % CrossFns.HashP) % Bits

  /** Driver-side mirror of [[position]] for lookups (plain long math —
    * identical arithmetic, so lookup bits always match build bits). */
  private def positionOf(hv: Long, i: Int): Long =
    ((hv * (31 + i) + 17 * i) % CrossFns.HashP) % Bits

  private def scrambledOf(key: Long): Long = {
    // mirrors CrossFns.scrambledHash(cast(key as string)): polynomial char
    // fold of the decimal string, then the Knuth multiplicative scramble
    val h = key.toString.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % CrossFns.HashP)
    (h * 2654435761L) % CrossFns.HashP
  }

  /** Build the index frame `(part, word, bits)` for `df`'s `keyCol`,
    * grouped by the partition column `partCol`. One narrow scan of
    * (partCol, keyCol); NumHashes one-hot masks per row; `bit_or`
    * partial-aggregates before the (files x words)-row shuffle. */
  def build(df: DataFrame, keyCol: String, partCol: String): DataFrame = {
    val hv = CrossFns.scrambledHash(col(keyCol).cast("string"))
    val posStructs = array((0 until NumHashes).map { i =>
      val p = position(hv, i)
      struct((p / 64).cast("int").as("word"),
        call_function("shiftleft", lit(1L), (p % 64).cast("int")).as("mask"))
    }: _*)
    df.select(col(partCol).as("part"), explode(posStructs).as("pm"))
      .select(col("part"), col("pm.word").as("word"), col("pm.mask").as("mask"))
      .groupBy("part", "word").agg(expr("bit_or(mask)").as("bits"))
  }

  /** Candidate partition values for `key`: parts whose bloom has ALL of
    * the key's bits set. The index is metadata-scale, so this consults it
    * on the driver (same move as LakeOps' touched-partition listing). */
  def candidates(index: DataFrame, key: Long): Seq[Any] = {
    val hv = scrambledOf(key)
    // distinct (word, mask) requirements — two hash positions may collide
    val need = (0 until NumHashes).map(i => positionOf(hv, i))
      .distinct.groupBy(_ / 64)
      .map { case (w, ps) => w.toInt -> ps.map(p => 1L << (p % 64)).reduce(_ | _) }
    val needed = lit(need.size)
    val checks = need.map { case (w, m) =>
      (col("word") === w) && (expr(s"bits & ${m}L") === m)
    }.reduce(_ || _)
    index.filter(checks)
      .groupBy("part").agg(count(lit(1)).as("hits"))
      .filter(col("hits") === needed)
      .select("part").collect().map(_.get(0)).toSeq
  }
}
