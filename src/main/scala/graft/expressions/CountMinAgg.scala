package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Count-Min sketch support. Sketch byte layout:
  * [depth:int][width:int][counts: depth*width big-endian longs].
  *
  * The estimate for key x is min over rows i of counts(i, h_i(x)) — it
  * can only OVERcount (hash collisions add, never subtract), so
  * `estimate(x) >= true_count(x)` always: a threshold filter on the
  * estimate has no false negatives, which is what lets
  * [[graft.operators.Sketches.heavyHitters]] produce EXACT results from
  * an approximate sketch. Hashes are splitmix64 with fixed per-row seeds
  * — deterministic everywhere, merge is elementwise add (order-free). */
object GraftCmsHash {
  private val Seeds = Array(
    0x9E3779B97F4A7C15L, 0xBF58476D1CE4E5B9L, 0x94D049BB133111EBL,
    0xD6E8FEB86659FD93L, 0xA5A5A5A5A5A5A5A5L, 0xC2B2AE3D27D4EB4FL)

  val maxDepth: Int = Seeds.length

  /** Row i's bucket for key x: finalized splitmix64, top bits, mod width. */
  def idx(i: Int, x: Long, width: Int): Int = {
    var z = x + Seeds(i)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    ((z >>> 1) % width).toInt
  }
}

/** Deserialized sketch for probe-side lookups; ships to executors once
  * per stage via addReferenceObj (same pattern as [[GraftBloom]] /
  * [[IvfIndex]] — plan size independent of sketch width). */
final class GraftCms(val bytes: Array[Byte]) extends Serializable {
  @transient private lazy val parsed: (Int, Int, Array[Long]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val depth = bb.getInt; val width = bb.getInt
    val counts = new Array[Long](depth * width)
    var i = 0
    while (i < counts.length) { counts(i) = bb.getLong; i += 1 }
    (depth, width, counts)
  }

  def estimate(x: Long): Long = {
    val (depth, width, counts) = parsed
    var min = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = counts(i * width + GraftCmsHash.idx(i, x, width))
      if (c < min) min = c
      i += 1
    }
    min
  }
}

object GraftCms {
  /** Merge two serialized sketches of identical shape: a pure vector add,
    * so CMS(A ⊎ B) = merge(CMS(A), CMS(B)) bit for bit — the property
    * that lets per-micro-batch (or per-day, per-source) sketches combine
    * into the stream-lifetime sketch with no rescan. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ba = java.nio.ByteBuffer.wrap(a)
    val bb = java.nio.ByteBuffer.wrap(b)
    val (da, wa) = (ba.getInt, ba.getInt)
    val (db, wb) = (bb.getInt, bb.getInt)
    require(da == db && wa == wb, s"sketch shapes differ: ${da}x$wa vs ${db}x$wb")
    val out = java.nio.ByteBuffer.allocate(a.length)
    out.putInt(da); out.putInt(wa)
    var i = 0
    val n = da * wa
    while (i < n) { out.putLong(ba.getLong + bb.getLong); i += 1 }
    out.array()
  }
}

/** `graft_cms_sketch(key, depth, width)`: one-pass mergeable Count-Min
  * sketch over a bigint key column. Partial aggregation applies — each
  * task builds a local sketch, merge is a vector add — so the full pass
  * shuffles only `depth*width` longs per task, never rows. */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= GraftCmsHash.maxDepth,
    s"depth must be 1..${GraftCmsHash.maxDepth}")
  require(width >= 16, "width must be >= 16")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cms_sketch needs a bigint key column, got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < depth) { buf(i * width + GraftCmsHash.idx(i, x, width)) += 1; i += 1 }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * buf.length)
    bb.putInt(depth); bb.putInt(width)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_cms_sketch"
}
