package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSeq, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Physical as-of join: a single merge pass over two inputs that
  * EnsureRequirements has co-partitioned on the key and sorted by
  * (key, time) — the escalation-tier-(c) physical form of
  * [[graft.operators.AsOf]] (whose union + running-`last` composition
  * is tier (a); reference analog: the one-sided unbounded-lower limit
  * of gmall-time/.../app/dwm2/OrderWideApp2.java:171-185's interval
  * join).
  *
  * Scale shape: identical shuffle volume to the composition — one hash
  * exchange per side on the key — but the merge emits exactly |left|
  * rows with NO union widening (the composition carries every left
  * column as null through the right rows and vice versa, 2× the
  * shuffled width) and no window buffering: per partition it holds ONE
  * candidate right row, not the window frame. Both inputs keep their
  * columnar scans and whole-stage codegen below the exchange; only the
  * merge itself is interpreted row-at-a-time.
  *
  * Contract (same as the composition): key and time are LONG; ties
  * (right.time == left.time) match; right rows with a null key or
  * null time never match; left rows with a null key or time survive
  * with a null payload; the right side is unique per (key, time) or
  * the winner among exact ties is undefined.
  */
case class AsOfJoinExec(
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan)
  extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  /** Both children clustered on their key — EnsureRequirements aligns
    * the two single-expression clusterings into compatible
    * HashPartitionings (the SortMergeJoinExec device), inserting at
    * most one exchange per side. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  /** (key ASC NULLS FIRST, time ASC NULLS FIRST) on both sides — the
    * merge relies on null keys/times sorting before every real value
    * so it can skip them at the front of each key group. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  /** Left rows pass through in order, one output row each. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val projList = output
    val lk = BindReferences.bindReference(leftKey: Expression, AttributeSeq(lOut))
    val lt = BindReferences.bindReference(leftTime: Expression, AttributeSeq(lOut))
    val rk = BindReferences.bindReference(rightKey: Expression, AttributeSeq(rOut))
    val rt = BindReferences.bindReference(rightTime: Expression, AttributeSeq(rOut))
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // Bind against a NULLABLE view of the right side (the outer-join
      // device): unmatched left rows pair with an all-null row, and a
      // projection bound at the right side's original nullability would
      // skip the null check on a non-nullable payload attribute and
      // emit 0/garbage instead of NULL.
      val proj = UnsafeProjection.create(projList,
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight: InternalRow = new GenericInternalRow(rOut.size)
      new Iterator[InternalRow] {
        // Lookahead right row — NOT copied: it is re-read before any
        // further rIter.next() overwrites the backing UnsafeRow.
        private var rRow: InternalRow = fetch()
        // Best match so far — a copy, it outlives arbitrarily many
        // lookahead advances. At most one copy per right row total.
        private var cand: InternalRow = null
        private var candKey: Long = 0L
        private def fetch(): InternalRow =
          if (rIter.hasNext) rIter.next() else null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lkAny = lk.eval(l)
          val ltAny = lt.eval(l)
          var matched: InternalRow = nullRight
          if (lkAny != null && ltAny != null) {
            val lKey = lkAny.asInstanceOf[Long]
            val lTime = ltAny.asInstanceOf[Long]
            // Advance the right side past everything at-or-before
            // (lKey, lTime). Left keys are non-decreasing, so a right
            // row with key < lKey can never match a later left row —
            // consuming it is safe, not just convenient.
            var scan = true
            while (scan && rRow != null) {
              val rkAny = rk.eval(rRow)
              if (rkAny == null) rRow = fetch() // nulls-first prefix
              else {
                val rKey = rkAny.asInstanceOf[Long]
                if (rKey < lKey) rRow = fetch()
                else if (rKey > lKey) scan = false
                else {
                  val rtAny = rt.eval(rRow)
                  if (rtAny == null) rRow = fetch() // nulls-first in key
                  else if (rtAny.asInstanceOf[Long] <= lTime) {
                    cand = rRow.copy()
                    candKey = rKey
                    rRow = fetch()
                  } else scan = false
                }
              }
            }
            if (cand != null && candKey == lKey) matched = cand
          }
          numOutputRows += 1
          proj(joined(l, matched))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
