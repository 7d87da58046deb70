package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video content travels as an
  * opaque `binary` column with typed metadata; decode / feature-extract run
  * as batch functions over partitions (the Scala analog of a vectorised
  * Pandas UDF: one JVM call per partition iterator, not per row).
  *
  * The container ships no codec libraries, so the actual byte decoding is
  * STUBBED (`decodeImage` below is `???`); `decodeImageStub` is the
  * deterministic fake used by the pipeline and the oracle. Everything
  * around the stub — binary schema, typed Dataset plumbing, partition-wise
  * batch shape, null/empty handling — is real and tested.
  */
object Multimodal {

  /** A binary payload row: what an image/audio ingestion table looks like. */
  case class Payload(doc_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)

  /** Decoded per-item features (fake dims/brightness for the stub). */
  case class Features(doc_id: Long, width: Long, height: Long, channels: Long, brightness: Long)

  /** REAL decode — requires an image codec; intentionally unimplemented in
    * this container. The pipeline wires [[decodeImageStub]] instead. */
  def decodeImage(bytes: Array[Byte]): Features = ???

  /** Deterministic fake decode: features derived only from byte length and
    * first/last byte, so the DuckDB oracle can reproduce them exactly. */
  def decodeImageStub(docId: Long, bytes: Array[Byte]): Features = {
    val n = bytes.length.toLong
    val first = if (n > 0) bytes(0) & 0xffL else 0L
    val last = if (n > 0) bytes(bytes.length - 1) & 0xffL else 0L
    Features(docId, 16L + n % 32L, 16L + (n * 7L) % 32L, 3L, (first + last) % 256L)
  }

  /** documents -> payload table: binary column + typed metadata. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("text/plain").as("mime"),
      octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))

  /** Partition-wise batch decode (mapPartitions = the Pandas-UDF batch
    * shape: amortised per-batch setup, streaming iterator, no per-row
    * closure dispatch). */
  def decodeAll(spark: SparkSession, docs: DataFrame): Dataset[Features] = {
    import spark.implicits._
    withPayload(docs).as[Payload].mapPartitions { it =>
      // per-partition setup would open the codec once here
      it.map(p => decodeImageStub(p.doc_id, p.payload))
    }
  }

  /** Resize stub: fit the (fake-decoded) dimensions into a bounding box
    * preserving aspect ratio — integer math (scale by the limiting axis via
    * exact rational arithmetic) so the oracle reproduces it. The real
    * implementation would resample pixels inside the same mapPartitions
    * batch; dims logic is what the pipeline schema depends on. */
  def resizeTo(spark: SparkSession, docs: DataFrame, box: Int): DataFrame = {
    import spark.implicits._
    decodeAll(spark, docs).map { f =>
      val (w, h) = (f.width, f.height)
      val (rw, rh) =
        if (w <= box && h <= box) (w, h)
        else if (w >= h) (box.toLong, (h * box) / w) // integer floor division
        else ((w * box) / h, box.toLong)
      (f.doc_id, w, h, rw, rh)
    }.toDF("doc_id", "width", "height", "rw", "rh")
  }

  /** Frame-sampling stub for video-like payloads: every k-th byte stands in
    * for every k-th frame; keeps the explode/array plumbing honest. */
  def frameSample(spark: SparkSession, docs: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    withPayload(docs).as[Payload].mapPartitions { it =>
      it.flatMap { p =>
        p.payload.indices.by(k).map(i => (p.doc_id, i.toLong, p.payload(i) & 0xffL))
      }
    }.toDF("doc_id", "frame_idx", "sample")
  }
}
