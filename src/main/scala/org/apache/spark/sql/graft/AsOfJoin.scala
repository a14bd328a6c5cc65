package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, ExprId, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst integration for the as-of join — the (c)-tier
  * extension path: a custom LogicalPlan + SparkStrategy + physical merge
  * operator, registered through `GraftExtensions.injectPlannerStrategy`.
  *
  * The declarative form (`TimeSeries.asOfJoinTables`, the union + window
  * pattern — flightdb's metar.Archive.Lookup semantics, metar/metar.go) is
  * linear and correct, but pays for generality: it materializes a unioned
  * row set twice the payload width, runs a window over |L|+|R| rows, and
  * filters half of them back out. This operator expresses as-of DIRECTLY to
  * the planner: each side shuffles ONCE on its key (EnsureRequirements
  * co-partitions the two ClusteredDistributions exactly as it does for a
  * sort-merge join), each partition arrives (key, time)-sorted via the
  * standard SortExec insertion, and a single O(|L|+|R|) streaming merge emits
  * left rows decorated with the latest right payload at or before their
  * timestamp. No union, no window buffer, no post-filter; AQE still
  * re-plans the exchanges (skew split, partition coalescing) because the
  * operator only states standard distribution/ordering requirements.
  *
  * Semantics (identical to `asOfJoinTables`, spec-asserted): for each left
  * row, the right row with the greatest (rightTime, rightTie) such that
  * rightTime <= leftTime on the same key; payload columns come back as
  * `asof_<name>`, null when no such row exists. Like the window form (which
  * groups null keys into one window partition), null keys match null keys.
  * Times must be mutually comparable (same type on both sides).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTie: Expression,
    payload: Seq[Expression],
    payloadOut: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)
  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] to [[AsOfJoinExec]]. Injected once per session via
  * `GraftExtensions`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKeys, n.rightKeys, n.leftTime, n.rightTime,
        n.rightTie, n.payload, n.payloadOut,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join.
  *
  * Requirements handed to EnsureRequirements: both children clustered on
  * their keys (co-partitioned hash exchange, exactly like SortMergeJoin) and
  * sorted by (key, time) — right additionally by the tie column so "latest"
  * is a deterministic total order. Execution zips co-partitions and runs a
  * forward-only merge: the right cursor never rewinds because left times are
  * non-decreasing within a key and keys are non-decreasing across the
  * partition. O(1) state (one held payload row), no buffering of either
  * side — a 100 TB-safe plan whose only memory term is the sort, which Spark
  * spills.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTie: Expression,
    payload: Seq[Expression],
    payloadOut: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTime, Ascending), SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val pay = payload
    val outAttrs = output
    val pOut = payloadOut
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val payProj = UnsafeProjection.create(pay, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ pOut)
      val joined = new JoinedRow
      val nullPayload: InternalRow = new GenericInternalRow(pay.length)

      new Iterator[InternalRow] {
        private var rRow: InternalRow = if (ri.hasNext) ri.next() else null
        private var heldKey: InternalRow = _   // copy; key of heldPayload
        private var heldPayload: InternalRow = _
        override def hasNext: Boolean = li.hasNext
        override def next(): InternalRow = {
          val l = li.next()
          val lk = lKeyProj(l)
          var done = rRow == null
          while (!done) {
            val rk = rKeyProj(rRow)
            val c = keyOrd.compare(rk, lk)
            if (c < 0) {
              // right rows for keys already passed — skip
              rRow = if (ri.hasNext) ri.next() else null
            } else if (c == 0 &&
                timeOrd.compare(rTimeProj(rRow), lTimeProj(l)) <= 0) {
              // eligible: remember it (later eligible rows overwrite —
              // right side is (time, tie)-sorted so the last one wins)
              heldKey = rk.copy()
              heldPayload = payProj(rRow).copy()
              rRow = if (ri.hasNext) ri.next() else null
            } else done = true
            if (rRow == null) done = true
          }
          val p =
            if (heldKey != null && keyOrd.compare(heldKey, lk) == 0) heldPayload
            else nullPayload
          resultProj(joined(l, p))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level builder for [[AsOfJoinNode]] — same contract as
  * `TimeSeries.asOfJoinTables(left, right, key, leftTime, rightTime,
  * payload, rightTie)`.
  */
object AsOfJoin {

  /** Re-instance any leaf relation the right plan shares with the left plan
    * (same attribute ids), remapping the right plan's references — the
    * self-join dedup the analyzer performs for `Join`, done here at
    * construction time so the node's left/right expressions are never
    * ambiguous (both sides of an as-of join typically derive from the same
    * scan: events vs. an aggregate of events).
    */
  private def dedupRight(leftPlan: LogicalPlan, rightPlan: LogicalPlan): LogicalPlan = {
    val leftIds: Set[ExprId] =
      leftPlan.collectLeaves().flatMap(_.output.map(_.exprId)).toSet
    val attrMap = new java.util.HashMap[ExprId, ExprId]()
    val replaced = rightPlan.transformUp {
      case m: MultiInstanceRelation
          if m.asInstanceOf[LogicalPlan].output.exists(a => leftIds.contains(a.exprId)) =>
        val old = m.asInstanceOf[LogicalPlan]
        val fresh = m.newInstance().asInstanceOf[LogicalPlan]
        old.output.zip(fresh.output).foreach { case (o, n) =>
          attrMap.put(o.exprId, n.exprId)
        }
        fresh
    }
    if (attrMap.isEmpty) rightPlan
    else replaced.transformAllExpressions {
      case a: AttributeReference if attrMap.containsKey(a.exprId) =>
        a.withExprId(attrMap.get(a.exprId))
    }
  }

  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String, payload: Seq[String],
           rightTie: Option[String] = None): DataFrame = {
    val session = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val leftPlan = left.queryExecution.analyzed
    val rightPlan = dedupRight(leftPlan, right.queryExecution.analyzed)
    def resolve(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"asOfJoin: column '$name' not found on $side side " +
            s"(${plan.output.map(_.name).mkString(", ")})"))
    val lKey = resolve(leftPlan, key, "left")
    val rKey = resolve(rightPlan, key, "right")
    val lT = resolve(leftPlan, leftTime, "left")
    val rT = resolve(rightPlan, rightTime, "right")
    require(lT.dataType == rT.dataType,
      s"asOfJoin: time types differ (${lT.dataType} vs ${rT.dataType})")
    require(lKey.dataType == rKey.dataType,
      s"asOfJoin: key types differ (${lKey.dataType} vs ${rKey.dataType})")
    val tie: Expression = rightTie.map(resolve(rightPlan, _, "right"))
      .getOrElse(org.apache.spark.sql.catalyst.expressions.Literal(0L))
    val payAttrs = payload.map(resolve(rightPlan, _, "right"))
    val payloadOut = payAttrs.map(a =>
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    val node = AsOfJoinNode(leftPlan, rightPlan, Seq(lKey), Seq(rKey),
      lT, rT, tie, payAttrs, payloadOut)
    Dataset.ofRows(session, node)
  }
}
