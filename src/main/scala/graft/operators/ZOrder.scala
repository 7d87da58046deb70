package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Z-order (Morton) data layout with real file-level data skipping.
  *
  * The lake feature a 100 TB store runs on: lay the table out so that a
  * multi-dimensional predicate touches few FILES, then prune files from
  * parquet footer min/max statistics without reading any data. This module
  * does the real thing end-to-end:
  *
  *   1. [[mortonKey]] interleaves the bits of the query dimensions into a
  *      single sort key (locality in all dimensions at once).
  *   2. [[writeLayout]] range-partitions rows into fixed-width key buckets
  *      and writes one parquet file per bucket — an actual multi-file
  *      layout, not a simulated one. Fixed-width bucket boundaries (key >>
  *      shift) are used instead of `repartitionByRange`'s sampled
  *      boundaries so the file assignment is deterministic and mirrorable
  *      by the DuckDB oracle; the Morton key over near-uniform dimensions
  *      makes the widths near-balanced. At production scale the same write
  *      shape works with `repartitionByRange(k, zkey)` — sampled
  *      boundaries, identical skipping math.
  *   3. [[fileStats]] reads each file's FOOTER (metadata only — the same
  *      bytes a Delta/Iceberg manifest caches) and extracts per-column
  *      min/max.
  *   4. [[prunedFiles]] evaluates a rectangle predicate against the
  *      footer ranges: a file whose [min,max] box misses the rectangle is
  *      never opened.
  *
  * Footer listing happens on the driver: it is metadata-scale (one footer
  * per file, ~KB each), exactly what table-format manifests store; a
  * 100 TB lake parallelizes the same loop over a manifest table.
  */
object ZOrder {

  /** Bit-interleaved Morton key of two `bits`-bit dimensions; `x` occupies
    * even bits, `y` odd bits. Pure column arithmetic — codegen'd, no UDF. */
  def mortonKey(x: Column, y: Column, bits: Int): Column =
    mortonKey(Seq(x, y), bits)

  /** N-dimensional Morton key: bit i of dimension j lands at position
    * `dims.size * i + j`, so any number of query dimensions interleave
    * (a lake commonly z-orders 3-4 columns). Total key width is
    * `dims.size * bits` bits — keep it ≤ 62. */
  def mortonKey(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && dims.size * bits <= 62, s"${dims.size} dims x $bits bits")
    (0 until bits).flatMap(i => dims.zipWithIndex.map { case (d, j) =>
      shiftleft(shiftright(d, i).bitwiseAND(lit(1)), dims.size * i + j)
    }).reduce(_ + _)
  }

  /** Per-file column statistics harvested from a parquet footer. */
  final case class FileStat(file: String, mins: Map[String, Long], maxs: Map[String, Long])

  /** Write `df` as one parquet file per `key >> shift` bucket under `out`.
    *
    * The bucket column is range semantics (contiguous key intervals), the
    * shuffle is a single hash exchange on the bucket id, and
    * `partitionBy("bucket")` makes every task emit one file per bucket it
    * owns — so each FILE covers one contiguous key range and its footer
    * min/max are tight. No global window, no single-task funnel; every
    * stage is fully parallel. */
  def writeLayout(df: DataFrame, key: Column, shift: Int, out: String): Unit =
    df.withColumn("bucket", shiftright(key, shift))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(out)

  /** Min/max of integer columns `cols` per data file, from parquet footers
    * only. Merges row-group stats within a file (multi-row-group safe). */
  def fileStats(spark: SparkSession, path: String, cols: Seq[String]): Seq[FileStat] = {
    val conf = spark.sparkContext.hadoopConfiguration
    spark.read.parquet(path).inputFiles.toSeq.sorted.map { f =>
      val in = HadoopInputFile.fromPath(new Path(f), conf)
      val reader = ParquetFileReader.open(in)
      try {
        val chunks = reader.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .filter(c => cols.contains(c.getPath.toDotString))
        val byCol = chunks.groupBy(_.getPath.toDotString)
        val mins = byCol.map { case (c, cs) =>
          c -> cs.map(_.getStatistics.genericGetMin.asInstanceOf[Number].longValue).min
        }
        val maxs = byCol.map { case (c, cs) =>
          c -> cs.map(_.getStatistics.genericGetMax.asInstanceOf[Number].longValue).max
        }
        FileStat(f, mins, maxs)
      } finally reader.close()
    }
  }

  /** Files whose footer box intersects the half-open rectangle
    * {col < upper(col) for each bound} — i.e. the files a reader must
    * open. Everything else is skipped without any data I/O. */
  def touchedFiles(stats: Seq[FileStat], upperBounds: Map[String, Long]): Seq[FileStat] =
    stats.filter(s => upperBounds.forall { case (c, ub) => s.mins(c) < ub })
}
