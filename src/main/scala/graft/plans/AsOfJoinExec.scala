package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BoundReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Sort-merge as-of join. Each side is hash-clustered by its key (one
  * shuffle each — EnsureRequirements inserts the exchanges and sorts from
  * the declared requirements, and AQE still re-plans those exchanges) and
  * sorted by (key, ts[, tie]); a single forward merge pass per partition
  * then carries the latest right row per key (`backward` candidate) and
  * peeks the buffered head for the earliest not-yet-consumed right row
  * (`forward` candidate) — `nearest` picks whichever is closer, exact
  * ties preferring backward. All three directions stay O(|L| + |R|) with
  * two small row copies per right row as the only allocation; compared
  * to the composed union+window form this never widens left rows to the
  * union schema, never emits right rows through the window, and needs no
  * filter-back-to-left step.
  *
  * Null grouping matches the window formulation: null keys cluster
  * together, null ts sorts first (so a null-ts left row can only match a
  * null-ts right row of the same key; under `nearest` a null-ts
  * candidate loses to a timestamped one).
  *
  * Skew: distribution is hash-by-key, so one pathological key lands in
  * one task — the same exposure as any keyed window/SMJ. The merge is a
  * streaming two-pointer pass (no per-key buffering beyond one row), so
  * a hot key costs linear time, not memory; for extreme cases, pre-split
  * the hot key by time range and union, as with salted joins. */
case class AsOfJoinExec(
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightTie: Attribute,
    matched: Seq[Attribute],
    matchedOut: Seq[Attribute],
    toleranceUs: Option[Long],
    direction: String,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  // the tolerance gap is computed on raw long values (µs for timestamps);
  // both sides checked — the merge reads getLong on each
  require(toleranceUs.isEmpty || (
    Seq(leftTs.dataType, rightTs.dataType).forall(t =>
      t == org.apache.spark.sql.types.TimestampType ||
        t == org.apache.spark.sql.types.LongType)),
    "as-of tolerance requires timestamp or long event-time columns on both sides")

  override def output: Seq[Attribute] = left.output ++ matchedOut

  override def producedAttributes: AttributeSet = AttributeSet(matchedOut)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  private def leftOrdering: Seq[SortOrder] =
    SortOrder(leftKey, Ascending) :: SortOrder(leftTs, Ascending) :: Nil

  // tie is in the right sort so the merge's "last consumed" row is the
  // max-tie row among equal timestamps — the deterministic tie rule
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftOrdering,
    SortOrder(rightKey, Ascending) :: SortOrder(rightTs, Ascending) ::
      SortOrder(rightTie, Ascending) :: Nil)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = leftOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKey = leftKey; val lTs = leftTs
    val rKey = rightKey; val rTs = rightTs
    val m = matched; val mOut = matchedOut
    val out = output
    val tol = toleranceUs.getOrElse(-1L) // -1 = unbounded lookback
    val dir = direction
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lPairProj = UnsafeProjection.create(Seq(lKey, lTs), lOut)
      val rPairProj = UnsafeProjection.create(Seq(rKey, rTs), rOut)
      val lKeyProj = UnsafeProjection.create(Seq(lKey), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKey), rOut)
      val rMatchProj = UnsafeProjection.create(m, rOut)
      // codegen'd comparators (same null-first ascending semantics the
      // required child ordering sorts by)
      val pairOrd = GenerateOrdering.generate(Seq(
        SortOrder(BoundReference(0, lKey.dataType, nullable = true), Ascending),
        SortOrder(BoundReference(1, lTs.dataType, nullable = true), Ascending)))
      val keyOrd = GenerateOrdering.generate(Seq(
        SortOrder(BoundReference(0, lKey.dataType, nullable = true), Ascending)))
      val resultProj = UnsafeProjection.create(out, lOut ++ mOut)
      val joined = new JoinedRow
      val nullMatch = new GenericInternalRow(m.size)
      val tolUs = tol
      // backward/nearest consume right rows AT the probe ts (<=); forward
      // leaves them at the head so they can match as forward candidates
      val wantBack = dir != "forward"
      val wantFwd = dir != "backward"
      val rBuf = rIter.buffered
      // latest right row consumed, valid only while its key equals the
      // current left key; copied because unsafe rows are reused
      var lastKey: UnsafeRow = null
      var lastMatch: UnsafeRow = null
      var lastTs = 0L
      var lastTsSet = false
      lIter.map { l =>
        val lp = lPairProj(l)
        while (rBuf.hasNext && {
          val c = pairOrd.compare(rPairProj(rBuf.head), lp)
          c < 0 || (wantBack && c == 0)
        }) {
          val r = rBuf.next()
          if (wantBack) {
            val rp = rPairProj(r)
            lastTsSet = !rp.isNullAt(1)
            if (lastTsSet) lastTs = rp.getLong(1)
            lastKey = rKeyProj(r).copy()
            lastMatch = rMatchProj(r).copy()
          }
        }
        val lk = lKeyProj(l)
        val lTsNull = lp.isNullAt(1)
        val lTsVal = if (lTsNull) 0L else lp.getLong(1)
        // backward candidate: last consumed right row of the same key
        var backOk = wantBack && lastKey != null && keyOrd.compare(lastKey, lk) == 0
        if (backOk && tolUs >= 0L)
          // a match farther back than the tolerance is no match — and no
          // older right row could be closer, so null is correct
          backOk = lastTsSet && !lTsNull && lTsVal - lastTs <= tolUs
        // forward candidate: buffered head (NOT consumed — later left rows
        // probe at later ts and may still match it) of the same key
        var fwdOk = false
        var fwdTsSet = false
        var fwdTs = 0L
        if (wantFwd && rBuf.hasNext &&
            keyOrd.compare(rKeyProj(rBuf.head), lk) == 0) {
          val hp = rPairProj(rBuf.head)
          fwdTsSet = !hp.isNullAt(1)
          if (fwdTsSet) fwdTs = hp.getLong(1)
          fwdOk = true
          if (tolUs >= 0L) fwdOk = fwdTsSet && !lTsNull && fwdTs - lTsVal <= tolUs
        }
        val chosen =
          if (backOk && fwdOk) {
            // |delta| per side; both-null ties count as exact (-1 so they
            // also beat a real 0-delta forward), one-sided nulls lose to
            // any timestamped candidate
            val db = if (!lTsNull && lastTsSet) lTsVal - lastTs
              else if (lTsNull && !lastTsSet) -1L else Long.MaxValue
            val df = if (!lTsNull && fwdTsSet) fwdTs - lTsVal
              else if (lTsNull && !fwdTsSet) -1L else Long.MaxValue
            if (db <= df) lastMatch else rMatchProj(rBuf.head)
          }
          else if (backOk) lastMatch
          else if (fwdOk) rMatchProj(rBuf.head)
          else nullMatch
        resultProj(joined(l, chosen))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; everything under the node
  * is handed back to the planner via planLater. */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(j.leftKey, j.leftTs, j.rightKey, j.rightTs, j.rightTie,
        j.matched, j.matchedOut, j.toleranceUs, j.direction,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}
