package org.apache.spark.sql.graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{count => fCount, lit, max => fMax, min => fMin, sum => fSum}

/** Materialized-view rollup rewrite (the Calcite/warehouse "aggregate MV
  * matching" capability, Spark-first): a registered per-group summary serves
  * any aggregate over the base table whose grouping keys are a SUBSET of the
  * summary's and whose aggregates decompose over partials —
  *
  *   sum(m)   = sum(m_sum)       count(*) = sum(cnt)
  *   min(m)   = min(m_min)       max(m)   = max(m_max)
  *
  * At 100 TB this is the difference between re-scanning the fact table for
  * every dashboard rollup and reading a group-cardinality-sized summary: the
  * rewrite preserves results EXACTLY (sums of integer-valued doubles are
  * associative; min/max/count trivially so) while the scan drops by the
  * compression ratio of the grouping.
  *
  * Matching is deliberately conservative (a rewrite must never fire on a
  * plan it can't prove):
  *   - the aggregate child must be the registered table handle's scan
  *     (same HadoopFsRelation instance — the analog of catalog-table
  *     identity in a metastore deployment), optionally under
  *     column-pruning Projects and Filters whose predicates reference
  *     ONLY grouping columns (group-granular predicates select whole
  *     groups, so they commute with the rollup and re-apply on the
  *     summary — the "WHERE day BETWEEN …" dashboard shape); a filter
  *     touching any other column disqualifies;
  *   - every grouping expression must be a bare column in the summary's
  *     grouping set;
  *   - every aggregate must be one of the four decomposable forms above
  *     (no DISTINCT, no FILTER clauses), over a registered measure;
  *     arbitrary scalar expressions AROUND the aggregates (round(sum(x)))
  *     rewrite transparently.
  *
  * Output attribute ids/names are preserved exactly (grouping columns are
  * re-aliased under their original exprIds), so parent operators never see
  * the substitution.
  */
object MvRegistry {

  /** Equi-join shape a join-MV serves: fact.factKey = dim.dimKey, inner. */
  final case class JoinSpec(dimRelation: HadoopFsRelation,
                            factKey: String, dimKey: String)

  final case class MvDef(
      factRelation: HadoopFsRelation,
      groupCols: Seq[String],
      measureCols: Seq[String],
      summaryPlan: LogicalPlan,
      join: Option[JoinSpec] = None)

  private val defs = TrieMap.empty[Long, MvDef]
  private val nextId = new java.util.concurrent.atomic.AtomicLong(0)

  /** The canonical summary for (groupCols, measureCols): per group, `cnt`
    * plus `<m>_sum` / `<m>_min` / `<m>_max` per measure. Write it to
    * storage, read it back, and [[register]] the read frame — the summary
    * must be DATA for the rewrite to pay (serving a rollup from an
    * unmaterialized lineage would just re-run the base aggregation).
    */
  def buildSummary(fact: DataFrame, groupCols: Seq[String],
                   measureCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val aggs = fCount(lit(1)).as("cnt") +: measureCols.flatMap { m =>
      Seq(fSum(col(m)).as(s"${m}_sum"), fMin(col(m)).as(s"${m}_min"),
        fMax(col(m)).as(s"${m}_max")) }
    fact.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental summary maintenance: merge an existing summary with the
    * [[buildSummary]] partials of a NEW data batch. Every partial is a
    * semilattice/commutative-monoid element (cnt/sum add, min/max meet),
    * so the merge is one summary-sized groupBy — a streaming ingest keeps
    * the MV fresh per micro-batch without ever re-touching the fact table
    * (see MvStreamSpec for the foreachBatch loop).
    */
  def mergeSummaries(existing: DataFrame, delta: DataFrame,
                     groupCols: Seq[String],
                     measureCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val u = existing.unionByName(delta)
    val aggs = fSum(col("cnt")).as("cnt") +: measureCols.flatMap { m =>
      Seq(fSum(col(s"${m}_sum")).as(s"${m}_sum"),
        fMin(col(s"${m}_min")).as(s"${m}_min"),
        fMax(col(s"${m}_max")).as(s"${m}_max")) }
    u.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Register `summary` (typically a parquet read-back of [[buildSummary]]'s
    * output) as serving aggregates over `fact`. Returns a handle for
    * [[unregister]]. The summary must expose the [[buildSummary]] column
    * contract; violations fail here, not mid-rewrite.
    */
  def register(fact: DataFrame, groupCols: Seq[String],
               measureCols: Seq[String], summary: DataFrame): Long = {
    val rel = fact.queryExecution.analyzed.collectFirst {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) => fs
    }.getOrElse(throw new IllegalArgumentException(
      "MvRegistry.register: fact must be a file-source scan"))
    val sOut = summary.queryExecution.analyzed.output.map(_.name).toSet
    val needed = Seq("cnt") ++ groupCols ++
      measureCols.flatMap(m => Seq(s"${m}_sum", s"${m}_min", s"${m}_max"))
    val missing = needed.filterNot(sOut)
    require(missing.isEmpty,
      s"MvRegistry.register: summary is missing columns $missing")
    // DECIMAL measures are rejected at the door: rewriting sum(m) to
    // Sum(m_sum) widens the result type a second time (p+10 → p+20), so
    // the served plan's output schema would silently differ from the base
    // aggregate's under the kept exprId — long/double measures decompose
    // with identical types.
    val decimals = fact.schema.fields
      .filter(f => measureCols.contains(f.name))
      .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType])
      .map(_.name)
    require(decimals.isEmpty,
      s"MvRegistry.register: DECIMAL measures $decimals would change the " +
        "rewritten aggregate's result type (sum-of-sums widens precision)")
    val id = nextId.incrementAndGet()
    defs.put(id, MvDef(rel, groupCols, measureCols,
      summary.queryExecution.analyzed))
    id
  }

  /** The canonical summary for the star shape fact ⋈ dim: the join runs
    * ONCE at build time, then [[buildSummary]] partials over the joined
    * frame — grouping columns may come from either side (the denormalized
    * dashboard dimension table).
    */
  def buildJoinSummary(fact: DataFrame, dim: DataFrame,
                       factKey: String, dimKey: String,
                       groupCols: Seq[String],
                       measureCols: Seq[String]): DataFrame =
    buildSummary(fact.join(dim, fact(factKey) === dim(dimKey), "inner"),
      groupCols, measureCols)

  /** Register a join-MV: aggregates over `fact ⋈ dim` on exactly the
    * registered equi-key (both handles instance-matched, either join order)
    * are served from `summary`. Same conservative serving rules as the
    * single-table form; group-granular filters on either side commute.
    */
  def registerJoin(fact: DataFrame, dim: DataFrame,
                   factKey: String, dimKey: String,
                   groupCols: Seq[String], measureCols: Seq[String],
                   summary: DataFrame): Long = {
    def relOf(df: DataFrame, what: String): HadoopFsRelation =
      df.queryExecution.analyzed.collectFirst {
        case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) => fs
      }.getOrElse(throw new IllegalArgumentException(
        s"MvRegistry.registerJoin: $what must be a file-source scan"))
    val id = register(fact, groupCols, measureCols, summary)
    defs.put(id, defs(id).copy(
      join = Some(JoinSpec(relOf(dim, "dim"), factKey, dimKey))))
    id
  }

  def unregister(id: Long): Unit = defs.remove(id)
  def clear(): Unit = defs.clear()
  private[graft] def isEmpty: Boolean = defs.isEmpty
  private[graft] def all: Iterator[MvDef] = defs.values.iterator
}

/** The optimizer rule — injected by graft.plans.GraftExtensions, runs in the
  * user-provided batch after operator optimization (so the aggregate child
  * is at most a pruning Project over the scan).
  */
case class MvRewriteRule() extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MvRegistry.isEmpty) plan
    else plan.transformDown {
      case agg: Aggregate =>
        tryRewrite(agg).orElse(tryRewriteJoin(agg)).getOrElse(agg)
    }
  }

  /** The aggregate's scan plus any Filter conditions between it and the
    * aggregate, if the child is only {attribute-pruning Projects, Filters}
    * over a file relation — computed Projects, joins etc. disqualify.
    * Filters are legal when their predicate references ONLY the summary's
    * grouping columns (checked by the caller): a group-granular predicate
    * selects whole groups, so it commutes with the rollup.
    */
  private def stripToScan(p: LogicalPlan)
      : Option[(HadoopFsRelation, Seq[Expression])] = p match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) => Some((fs, Nil))
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      stripToScan(child)
    case Filter(cond, child) =>
      stripToScan(child).map { case (fs, cs) => (fs, cond +: cs) }
    case _ => None
  }

  private def tryRewrite(agg: Aggregate): Option[Aggregate] = {
    val (fs, filterConds) = stripToScan(agg.child).getOrElse(return None)
    // join MVs aggregate the JOINED rows — they must never serve a plain
    // fact-scan aggregate (counts would differ)
    val mv = MvRegistry.all
      .find(d => d.join.isEmpty && (d.factRelation eq fs))
      .getOrElse(return None)
    serveFrom(agg, mv, filterConds)
  }

  /** Join-MV matching: Aggregate over {pruning Projects / Filters} over an
    * INNER equi-join of the registered fact and dim handles on exactly the
    * registered key pair (either join order); filters above or below the
    * join must be group-granular. The served plan is the same rollup over
    * the denormalized summary.
    */
  private def tryRewriteJoin(agg: Aggregate): Option[Aggregate] = {
    def stripToJoin(p: LogicalPlan): Option[(Join, Seq[Expression])] = p match {
      case j: Join => Some((j, Nil))
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        stripToJoin(c)
      case Filter(cond, c) =>
        stripToJoin(c).map { case (j, cs) => (j, cond +: cs) }
      case _ => None
    }
    val (j, outerConds) = stripToJoin(agg.child).getOrElse(return None)
    j match {
      case Join(l, r, org.apache.spark.sql.catalyst.plans.Inner,
          Some(EqualTo(a: AttributeReference, b: AttributeReference)), _) =>
        val (lfs, lConds) = stripToScan(l).getOrElse(return None)
        val (rfs, rConds) = stripToScan(r).getOrElse(return None)
        // bind each key attribute to its SIDE before name-matching: the
        // unordered name-set form would serve the crossed join
        // fact.dimKey = dim.factKey (a different join) when both tables
        // carry both column names
        val (lKey, rKey) =
          if (l.outputSet.contains(a) && r.outputSet.contains(b)) (a, b)
          else if (l.outputSet.contains(b) && r.outputSet.contains(a)) (b, a)
          else return None
        val mv = MvRegistry.all.find { d =>
          d.join.exists { js =>
            ((d.factRelation eq lfs) && (js.dimRelation eq rfs) &&
              lKey.name == js.factKey && rKey.name == js.dimKey) ||
              ((d.factRelation eq rfs) && (js.dimRelation eq lfs) &&
                rKey.name == js.factKey && lKey.name == js.dimKey)
          }
        }.getOrElse(return None)
        serveFrom(agg, mv, outerConds ++ lConds ++ rConds)
      case _ => None
    }
  }

  private def serveFrom(agg: Aggregate, mv: MvRegistry.MvDef,
                        filterConds: Seq[Expression]): Option[Aggregate] = {
    val summaryAttr: Map[String, Attribute] =
      mv.summaryPlan.output.map(a => a.name -> a).toMap

    // any Filter between aggregate and scan must be group-granular: every
    // referenced column a registered grouping column — then the predicate
    // selects whole groups and commutes with the rollup
    val remappedConds = filterConds.map { cond =>
      val refsOk = cond.references.forall(r => mv.groupCols.contains(r.name))
      if (!refsOk || !cond.deterministic) return None
      cond.transformUp {
        case ar: AttributeReference => summaryAttr(ar.name)
      }
    }

    // every grouping expression: a bare registered grouping column
    val groupAttrs = agg.groupingExpressions.map {
      case ar: AttributeReference if mv.groupCols.contains(ar.name) => ar
      case _ => return None
    }
    val groupMap: Map[ExprId, Attribute] =
      groupAttrs.map(ar => ar.exprId -> summaryAttr(ar.name)).toMap

    // rewrite aggregate functions over measures to their partial rollups
    var ok = true
    def rewriteAggs(e: Expression): Expression = e.transformUp {
      case ae: AggregateExpression if ae.isDistinct || ae.filter.isDefined =>
        ok = false; ae
      case ae @ AggregateExpression(s @ Sum(ar: AttributeReference, _), _, _, _, _)
          if mv.measureCols.contains(ar.name) =>
        ae.copy(aggregateFunction = s.copy(child = summaryAttr(s"${ar.name}_sum")))
      case ae @ AggregateExpression(m @ Min(ar: AttributeReference), _, _, _, _)
          if mv.measureCols.contains(ar.name) =>
        ae.copy(aggregateFunction = m.copy(child = summaryAttr(s"${ar.name}_min")))
      case ae @ AggregateExpression(m @ Max(ar: AttributeReference), _, _, _, _)
          if mv.measureCols.contains(ar.name) =>
        ae.copy(aggregateFunction = m.copy(child = summaryAttr(s"${ar.name}_max")))
      case ae @ AggregateExpression(c: Count, _, _, _, _)
          if c.children.nonEmpty &&
            c.children.forall(ch => ch.foldable && !ch.nullable) =>
        // count(*) = sum(cnt); sum's nullable long coalesces back to
        // count's non-null contract (groups exist → never actually null)
        Coalesce(Seq(
          ae.copy(aggregateFunction = Sum(summaryAttr("cnt")), resultId = ae.resultId),
          Cast(Literal(0L), ae.dataType)))
      case ae: AggregateExpression => ok = false; ae
    }

    val rewritten = agg.aggregateExpressions.map {
      case ar: AttributeReference if groupMap.contains(ar.exprId) =>
        // grouping column in the output: re-alias the summary attribute
        // under the ORIGINAL exprId so parents are unaffected
        Alias(groupMap(ar.exprId), ar.name)(exprId = ar.exprId)
      case al @ Alias(child, _) =>
        val c2 = rewriteAggs(child).transformUp {
          case ar: AttributeReference if groupMap.contains(ar.exprId) =>
            groupMap(ar.exprId)
        }
        al.withNewChildren(Seq(c2)).asInstanceOf[NamedExpression]
      case _ => return None
    }
    if (!ok) return None
    // paranoia: the rewritten aggregate may reference ONLY summary output
    val sOut = AttributeSet(mv.summaryPlan.output)
    if (!rewritten.forall(_.references.subsetOf(sOut))) return None

    val newGroups: Seq[Expression] = groupAttrs.map(ar => summaryAttr(ar.name))
    val filtered =
      if (remappedConds.isEmpty) mv.summaryPlan
      else Filter(remappedConds.reduce(And), mv.summaryPlan)
    // prune the summary scan to the referenced columns
    val needed = AttributeSet(rewritten.flatMap(_.references)) ++
      AttributeSet(newGroups.flatMap(_.references)) ++
      AttributeSet(remappedConds.flatMap(_.references))
    val pruned = Project(mv.summaryPlan.output.filter(needed.contains),
      filtered)
    Some(Aggregate(newGroups, rewritten, pruned))
  }
}
