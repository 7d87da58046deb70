package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot inner loops of the dedup /
  * similarity operators. Each is semantically identical to a composition of
  * built-in higher-order functions (kept in CrossFns as `*Hof` reference
  * implementations and differential-tested in CrossFnsSpec) but runs as a
  * single codegen'd static call per row instead of one interpreted lambda
  * frame per element — ~20-40× less per-row overhead, and the whole-stage
  * codegen span stays unbroken.
  *
  * All arithmetic is the cross-engine deterministic form (see CrossFns):
  * polynomial fold mod 1e9+7 over codepoints, affine minhash family,
  * int64 dot products. DuckDB oracles reproduce it exactly.
  */
object GraftHash {
  final val P = 1000000007L

  /** charHash: fold h = (h*31 + codepoint) mod P. Matches
    * aggregate(transform(...ascii(substr)...)) exactly (ascii = codepoint). */
  def charHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  private def foldToken(h0: Long, str: String): Long = {
    var h = h0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Rolling hash of each word n-gram (tokens joined by ' '), without
    * materialising the shingle strings: charHash(t1 + ' ' + t2 + ...) =
    * fold over t1 chars, then 32 (space), then t2 chars, ...
    *
    * Null array elements are SKIPPED (a user-supplied transform(...) can
    * produce them even though CrossFns.tokens never does) — same result as
    * filtering nulls before shingling. */
  def shingleHashes(tokens: ArrayData, n: Int): ArrayData = {
    val mAll = tokens.numElements()
    val strs = new Array[String](mAll)
    var m = 0
    var j = 0
    while (j < mAll) {
      if (!tokens.isNullAt(j)) { strs(m) = tokens.getUTF8String(j).toString; m += 1 }
      j += 1
    }
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) {
      var h = 0L
      var k = 0
      while (k < n) {
        h = foldToken(h, strs(i + k))
        if (k < n - 1) h = (h * 31 + 32) % P
        k += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Positional shingle rows for [[ShingleGen]]: (pos, hash) per n-gram
    * window over the null-filtered token sequence, 1-based positions —
    * the same rolling fold as [[shingleHashes]], emitted as rows instead
    * of one array. */
  def shinglePositionRows(tokens: ArrayData, n: Int): Iterator[InternalRow] = {
    val mAll = tokens.numElements()
    val strs = new Array[String](mAll)
    var m = 0
    var j = 0
    while (j < mAll) {
      if (!tokens.isNullAt(j)) { strs(m) = tokens.getUTF8String(j).toString; m += 1 }
      j += 1
    }
    if (m < n) return Iterator.empty
    val cnt = m - n + 1
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i < cnt
      override def next(): InternalRow = {
        var h = 0L
        var k = 0
        while (k < n) {
          h = foldToken(h, strs(i + k))
          if (k < n - 1) h = (h * 31 + 32) % P
          k += 1
        }
        i += 1
        new GenericInternalRow(Array[Any](i, h))
      }
    }
  }

  /** MinHash signature: numHashes mins of (a_s*h + b_s) mod P over the hash
    * set, a_s = 31s+17, b_s = 97s+11 — one pass over the input, no
    * explode/shuffle. Empty input -> empty signature. */
  def minHashSig(hashes: ArrayData, numHashes: Int): ArrayData = {
    val m = hashes.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var seen = 0
    var i = 0
    while (i < m) {
      // null elements skipped, as in shingleHashes
      if (!hashes.isNullAt(i)) {
        seen += 1
        val h = hashes.getLong(i)
        var s = 0
        while (s < numHashes) {
          val v = ((31L * s + 17L) * h + 97L * s + 11L) % P
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(if (seen == 0) Array.emptyLongArray else mins)
  }

  /** 60-bit SimHash over a token array in ONE pass: per token
    * h = (charHash(reverse(t)) << 30) + charHash(t); each bit votes ±1;
    * fingerprint sets bit j when votes[j] > 0. Replaces an explode ×
    * 60-bit crossJoin × two shuffles with a per-row loop. Exactly matches
    * the vote/mask SQL formulation in the oracle. */
  def simhash60(tokens: ArrayData): Long = {
    val votes = new Array[Int](60)
    val m = tokens.numElements()
    var i = 0
    while (i < m) {
      if (tokens.isNullAt(i)) { i += 1 } // null tokens skipped
      else {
      val str = tokens.getUTF8String(i).toString
      val h1 = foldToken(0L, str)
      // charHash of the codepoint-reversed token, without materialising it
      var h2 = 0L
      var k = str.length
      while (k > 0) {
        val cp = str.codePointBefore(k)
        h2 = (h2 * 31 + cp) % P
        k -= Character.charCount(cp)
      }
      val h = (h2 << 30) + h1
      var j = 0
      while (j < 60) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
      }
    }
    var fp = 0L
    var j = 0
    while (j < 60) { if (votes(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  /** Integer dot product over the common prefix of two long arrays.
    * Null elements contribute 0 (the term is skipped). */
  /** Merge-walk |a ∩ b| over ascending-sorted long arrays: O(n+m),
    * zero allocation (vs array_intersect's hash set + result array). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Unreachable-cell sentinel for [[dtwBand]]: any result ≥ this means
    * the band was too narrow to connect (1,1) to (n,m) (band < |n−m|). */
  val DtwInf: Long = Long.MaxValue / 4

  /** Banded dynamic-time-warping distance between two int64 series:
    * min-cost monotone path cost Σ|a_i − b_j| under the Sakoe-Chiba
    * constraint |i − j| ≤ band. Two-row DP, zero per-cell allocation —
    * O(min(n·band, n·m)) time, O(m) space per call. band ≥ max(n, m)
    * degenerates to full (unconstrained) DTW; band = 0 forces the
    * diagonal (pointwise L1). Overflow-safe: cell costs ≤ ~2e12 cents
    * and path length ≤ n+m, so real costs stay ≪ [[DtwInf]]. */
  def dtwBand(a: ArrayData, b: ArrayData, band: Int): Long = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return if (n == m) 0L else DtwInf
    var prev = new Array[Long](m + 1)
    var cur = new Array[Long](m + 1)
    java.util.Arrays.fill(prev, DtwInf)
    prev(0) = 0L
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, DtwInf)
      val ai = a.getLong(i - 1)
      var j = math.max(1, i - band)
      val hi = math.min(m, i.toLong + band).toInt
      while (j <= hi) {
        val c = math.abs(ai - b.getLong(j - 1))
        var best = prev(j)
        if (cur(j - 1) < best) best = cur(j - 1)
        if (prev(j - 1) < best) best = prev(j - 1)
        val v = c + best
        cur(j) = if (v >= DtwInf) DtwInf else v
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  /** Distinct 64-bit hashes of the ≤`depth`-deletion neighborhood of s —
    * the SymSpell/FastSS candidate cores behind
    * [[graft.operators.Linkage.boundedCandidates]] — produced WITHOUT
    * materialising any variant string: one fused FNV-1a pass over the
    * retained code points per core (O(L) each, O(L³) worst-case char
    * ops per record, zero allocation beyond the output array) instead
    * of the HOF form's O(L²) substring builds + array_distinct over
    * ~L²/2 strings. Deletions are CODE-POINT level, matching the
    * char-based `substr` semantics of the HOF `deletionVariants` (and
    * the char-based `levenshtein` verify the caller applies).
    *
    * Join-key property: equal cores always hash equal (deterministic
    * content hash), so the SymSpell completeness argument is untouched;
    * distinct cores colliding (~2⁻⁶⁴) can only ADD candidate pairs,
    * which the caller's exact verify removes — exactness never rests on
    * this hash (same contract the previous xxhash64-over-strings form
    * carried). Output sorted ascending + deduplicated (the
    * array_distinct contract; order is irrelevant to the join). */
  def deletionHashes(s: UTF8String, depth: Int): ArrayData = {
    val str = s.toString
    // code points once; most names are ASCII so this is one pass
    val nchars = str.length
    var n = 0
    val cps = new Array[Int](nchars)
    var ci = 0
    while (ci < nchars) {
      val cp = str.codePointAt(ci)
      cps(n) = cp; n += 1
      ci += Character.charCount(cp)
    }
    // FNV-1a 64 over code points, skipping up to two positions
    def hashSkip(skip1: Int, skip2: Int): Long = {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < n) {
        if (j != skip1 && j != skip2) { h = (h ^ cps(j)) * 0x100000001b3L }
        j += 1
      }
      h
    }
    val cnt = 1 + n + (if (depth >= 2 && n >= 2) n * (n - 1) / 2 else 0)
    val out = new Array[Long](cnt)
    var c = 0
    out(c) = hashSkip(-1, -1); c += 1
    var i = 0
    while (i < n) { out(c) = hashSkip(i, -1); c += 1; i += 1 }
    if (depth >= 2) {
      i = 0
      while (i < n - 1) {
        var j = i + 1
        while (j < n) { out(c) = hashSkip(i, j); c += 1; j += 1 }
        i += 1
      }
    }
    java.util.Arrays.sort(out, 0, c)
    var w = 0
    var r = 0
    while (r < c) {
      if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val m = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < m) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** floor(x*1e6) quantisation of a float/double array (CrossFns.quantize).
    * Null elements quantise to 0 (vector length preserved). */
  def quantizeFloat(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      out(i) = if (arr.isNullAt(i)) 0L
        else math.floor(arr.getFloat(i).toDouble * 1000000.0d).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  def quantizeDouble(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      out(i) = if (arr.isNullAt(i)) 0L
        else math.floor(arr.getDouble(i) * 1000000.0d).toLong
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Driver-built IVF centroid index: K cell ids + quantised centroid vectors
  * + centroid norms. Shipped to executors ONCE per stage inside the task
  * binary (codegen references it via addReferenceObj), so plan size,
  * analysis time and generated code are all independent of K — unlike
  * inlining K struct literals into the expression tree, which collapses at
  * the K≈10⁴⁺ a 100 TB corpus needs. */
final class IvfIndex(
    val cids: Array[Long],
    val cqvs: Array[Array[Long]],
    val cnrms: Array[Long]) extends Serializable {
  require(cids.length == cqvs.length && cids.length == cnrms.length)

  /** Top-n cell ids by (cosine desc, cid asc) — the same double dag as
    * CrossFns.qcosine (dot / (sqrt(nrm) * sqrt(cnrm))) on int64-exact
    * operands, so ordering is bit-identical to the SQL oracle's
    * row_number() OVER (ORDER BY ccos DESC, cid). */
  def topCells(qv: ArrayData, nrm: Long, n: Int): ArrayData = {
    val k = cids.length
    val cos = new Array[Double](k)
    var i = 0
    while (i < k) {
      val cq = cqvs(i)
      val m = math.min(cq.length, qv.numElements())
      var dot = 0L
      var j = 0
      while (j < m) {
        if (!qv.isNullAt(j)) dot += qv.getLong(j) * cq(j)
        j += 1
      }
      // zero-norm query or centroid (all-zero embedding, or truncated
      // integer means collapsing a cell) -> define cosine as 0, not 0/0=NaN
      cos(i) =
        if (nrm == 0L || cnrms(i) == 0L) 0.0
        else dot.toDouble / (math.sqrt(nrm.toDouble) * math.sqrt(cnrms(i).toDouble))
      i += 1
    }
    // total order (Double.compare, cid tiebreak): a `!=`/`>` comparator is
    // inconsistent under NaN and TimSort may throw or order nondeterministically
    val idx = Array.range(0, k).sortWith { (a, b) =>
      val c = java.lang.Double.compare(cos(b), cos(a))
      if (c != 0) c < 0 else cids(a) < cids(b)
    }
    val out = new Array[Long](math.min(n, k))
    i = 0
    while (i < out.length) { out(i) = cids(idx(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** (qv, nrm) -> array of the index's top-`topn` cell ids for that vector.
  * One codegen'd static call per row; the index rides the task binary, not
  * the expression tree. */
case class IvfCellsExpr(left: Expression, right: Expression, index: IvfIndex, topn: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_ivf_cells needs (array<bigint>, bigint), got ${l.sql}, ${r.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(qv: Any, nrm: Any): Any =
    index.topCells(qv.asInstanceOf[ArrayData], nrm.asInstanceOf[Long], topn)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftIvfIndex", index, classOf[IvfIndex].getName)
    defineCodeGen(ctx, ev, (q, m) => s"$ref.topCells($q, $m, $topn)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_ivf_cells"
}

/** Product-quantization codebooks: `numSub` subspaces of `subDim` dims,
  * each with `codebooks(m)` = array of codewords (quantised-int
  * subvectors). Rides to executors as ONE referenced object, same
  * [[IvfIndex]] pattern — plan and codegen independent of codebook size.
  * All arithmetic is exact int64 so encode/decode reproduce bit-identically
  * in the DuckDB oracle. */
final class PqCodebooks(
    val numSub: Int,
    val subDim: Int,
    val codebooks: Array[Array[Array[Long]]]) extends Serializable {
  require(codebooks.length == numSub)

  /** Per-subspace argmin-L2 code of a residual vector; ties take the
    * smaller code index (mirrors the oracle's row_number ORDER BY dist,
    * code). Null elements read as 0. */
  def encode(rv: ArrayData): ArrayData = {
    val codes = new Array[Int](numSub)
    var m = 0
    while (m < numSub) {
      val cb = codebooks(m)
      var best = 0
      var bestDist = Long.MaxValue
      var c = 0
      while (c < cb.length) {
        val cw = cb(c)
        var dist = 0L
        var i = 0
        while (i < subDim) {
          val idx = m * subDim + i
          val v = if (idx < rv.numElements() && !rv.isNullAt(idx)) rv.getLong(idx) else 0L
          val d = v - cw(i)
          dist += d * d
          i += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      codes(m) = best
      m += 1
    }
    new GenericArrayData(codes)
  }

  /** Concatenated codewords for a code vector — the reconstructed
    * residual. */
  def decode(codes: ArrayData): ArrayData = {
    val out = new Array[Long](numSub * subDim)
    var m = 0
    while (m < numSub) {
      val cw = codebooks(m)(codes.getInt(m))
      var i = 0
      while (i < subDim) { out(m * subDim + i) = cw(i); i += 1 }
      m += 1
    }
    new GenericArrayData(out)
  }
}

/** residual array<bigint> -> array<int> PQ codes (see [[PqCodebooks]]). */
case class PqEncodeExpr(child: Expression, cb: PqCodebooks)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode needs array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any = cb.encode(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqCb", cb, classOf[PqCodebooks].getName)
    defineCodeGen(ctx, ev, v => s"$ref.encode($v)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "graft_pq_encode"
}

/** array<int> PQ codes -> reconstructed residual array<bigint>. */
case class PqDecodeExpr(child: Expression, cb: PqCodebooks)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_decode needs array<int>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = cb.decode(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqCb", cb, classOf[PqCodebooks].getName)
    defineCodeGen(ctx, ev, v => s"$ref.decode($v)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "graft_pq_decode"
}

/** Driver-built bloom filter over a join key set, held SERIALIZED so the
  * object ships to executors once per stage inside the task binary (same
  * addReferenceObj pattern as [[IvfIndex]] — plan size independent of the
  * filter's bit width). Deserialization is per-JVM lazy. The underlying
  * sketch is Spark's own `org.apache.spark.util.sketch.BloomFilter`
  * (bit-OR merge is order-independent, so the built filter is
  * deterministic for a given key set regardless of partitioning). */
final class GraftBloom(val bytes: Array[Byte]) extends Serializable {
  @transient private lazy val bf =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  def mightContainLong(v: Long): Boolean = bf.mightContainLong(v)
}

object GraftBloom {
  def apply(bf: org.apache.spark.util.sketch.BloomFilter): GraftBloom = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    new GraftBloom(bos.toByteArray)
  }
}

/** key -> bloom.mightContainLong(key): the probe side of a runtime join
  * filter. False positives possible (the exact join after removes them),
  * false negatives never — so prefiltering with it preserves join results
  * while cutting the probe side's shuffle volume to ~|matching keys|. */
case class BloomMightContainExpr(child: Expression, bloom: GraftBloom)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain needs bigint key, got ${child.dataType.sql}")
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[GraftBloom].getName)
    defineCodeGen(ctx, ev, k => s"$ref.mightContainLong($k)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "graft_bloom_might_contain"
}

/** key -> Count-Min estimate of the key's count (always >= the true
  * count; see [[GraftCmsHash]]). The probe side of the sketch-prefiltered
  * heavy-hitters aggregation. */
case class CmsLookupExpr(child: Expression, cms: GraftCms)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms_lookup needs bigint key, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    cms.estimate(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCms", cms, classOf[GraftCms].getName)
    defineCodeGen(ctx, ev, k => s"$ref.estimate($k)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "graft_cms_lookup"
}

case class CharHashExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_char_hash needs string, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    GraftHash.charHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.GraftHash.charHash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "graft_char_hash"
}

case class DeletionHashesExpr(child: Expression, depth: Int) extends UnaryExpression {
  require(depth >= 1 && depth <= 2, s"deletion depth must be 1..2, got $depth")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_deletion_hashes needs string, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    GraftHash.deletionHashes(input.asInstanceOf[UTF8String], depth)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.GraftHash.deletionHashes($c, $depth)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "graft_deletion_hashes"
}

case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"graft_shingle_hashes needs array<string>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    GraftHash.shingleHashes(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.GraftHash.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "graft_shingle_hashes"
}

/** Native UDTF tier — a Catalyst GENERATOR (the extension point behind
  * explode/inline): one (pos, sh) row per word n-gram, streamed straight
  * off the token array with no per-document hash array materialised
  * first. The array expression [[ShingleHashesExpr]] + explode remains
  * the codegen'd hot path (custom generators run in GenerateExec's row
  * pipeline, outside whole-stage codegen); the generator exists for the
  * positional decomposition (containment/winnowing want window offsets)
  * and to complete the extension-point matrix: scalar Expression,
  * TypedImperativeAggregate, Aggregator, LogicalPlan/SparkPlan, and now
  * Generator. Rows match the HOF form bit-for-bit (CrossFnsSpec). */
case class ShingleGen(child: Expression, n: Int) extends Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n >= 1, "shingle width must be >= 1")
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_gen needs array<string>, got ${other.sql}")
  }
  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("sh", LongType, nullable = false)))
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) Iterator.empty
    else GraftHash.shinglePositionRows(arr, n)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
  override def prettyName: String = "graft_shingle_gen"
}

case class MinHashSigExpr(child: Expression, numHashes: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"graft_minhash_sig needs array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    GraftHash.minHashSig(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.GraftHash.minHashSig($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "graft_minhash_sig"
}

case class SimHash60Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"graft_simhash60 needs array<string>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    GraftHash.simhash60(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.GraftHash.simhash60($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "graft_simhash60"
}

/** |a ∩ b| of two SORTED long arrays by a zero-allocation merge walk —
  * the adjacency-intersection kernel of triangle/truss support counting.
  * `size(array_intersect(a, b))` builds a hash set AND materialises the
  * intersection array per row; on a support count over millions of edges
  * with ~100-element adjacency lists the allocation dominates. Inputs
  * MUST be ascending-sorted (sort_array on the adjacency aggregate);
  * null elements are not expected (adjacency of non-null node ids). */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"graft_sorted_intersect_count needs array<bigint> x2, got ${l.sql}, ${r.sql}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftHash.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.GraftHash.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_sorted_intersect_count"
}

/** Banded DTW distance of two int64 series (see [[GraftHash.dtwBand]]):
  * the series-shape-similarity kernel. A DP is inherently sequential per
  * pair, so it runs as a scalar expression over series ARRAYS (series
  * are time-bounded — the caller's per-key collect_list stays small);
  * `band` is a literal captured at plan time. Results ≥
  * [[GraftHash.DtwInf]] mean the band was too narrow (band < |n−m|). */
case class DtwBandExpr(left: Expression, right: Expression, band: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"graft_dtw_band needs array<bigint> x2, got ${l.sql}, ${r.sql}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftHash.dtwBand(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], band)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.GraftHash.dtwBand($a, $b, $band)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dtw_band"
}

case class DotLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"graft_dot_long needs array<bigint> x2, got ${l.sql}, ${r.sql}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftHash.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.GraftHash.dotLong($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot_long"
}

/** Quantise array<float>/array<double> to array<long> via floor(x*1e6). */
case class QuantizeExpr(child: Expression) extends UnaryExpression {
  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }
  override def checkInputDataTypes(): TypeCheckResult =
    elemType match {
      case FloatType | DoubleType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_quantize needs array<float|double>, got ${child.dataType.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = elemType match {
    case FloatType => GraftHash.quantizeFloat(input.asInstanceOf[ArrayData])
    case DoubleType => GraftHash.quantizeDouble(input.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (elemType == FloatType) "quantizeFloat" else "quantizeDouble"
    defineCodeGen(ctx, ev, c => s"graft.expressions.GraftHash.$fn($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "graft_quantize"
}
