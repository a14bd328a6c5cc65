package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-behavior analytics over the long-format event stream: ordered
  * funnels, cohort retention, and transition matrices — the report shapes a
  * fleet/user analytics surface runs daily over its full event history.
  *
  * The reference computes per-entity reports by walking one entity at a time
  * (report/report.go's per-flight reporters); these operators are the same
  * "per-key ordered scan" family expressed as key-partitioned aggregations
  * so 100 TB of events shuffles once per stage on the entity key and every
  * stage is map-side combinable.
  *
  * Time is BIGINT nanoseconds throughout (see [[graft.Tables.events]]); day
  * indices are exact integer division (`div`), never a double `floor` —
  * epoch-ns magnitudes (~1.7e18) exceed a double's 53-bit mantissa, so a
  * float path would corrupt day boundaries on both engines differently.
  */
object Behavior {

  private val DayNs = 86400L * 1000000000L

  /** Ordered multi-step funnel with a completion window (the "view → click →
    * purchase within 7 days" report). Greedy earliest-match semantics — the
    * standard funnel definition: step i's timestamp is the EARLIEST event of
    * that type strictly after step i-1's timestamp, with every step within
    * `windowNanos` of step 1.
    *
    * Output: one row per step — (step_idx, step_type, n_users), where
    * n_users = users whose greedy chain reaches that step.
    *
    * Scale: stage i is a groupBy(user) min over the type-filtered scan
    * (filter + 3-column pruning reach parquet) joined to the previous
    * stage's per-user frontier on the SAME key — every shuffle in the plan
    * is user-keyed, so AQE plans the stage-to-stage joins as co-partitioned
    * (or broadcasts the frontier side, which only ever shrinks: each stage's
    * rows ⊆ previous stage's). The k step counts are unioned tiny
    * aggregates, one job. At 100 TB you'd additionally materialize the
    * type-filtered projection once instead of re-scanning per step; that's a
    * storage-layout decision (partition events by type/day), not a plan
    * change.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String], windowNanos: Long): DataFrame = {
    val counts = funnelFrontiers(events, userCol, tsCol, typeCol, steps, windowNanos)
      .zip(steps).zipWithIndex.map { case ((frontier, st), i) =>
        frontier.agg(count(lit(1)).as("n_users"))
          .select(lit((i + 1).toLong).as("step_idx"), lit(st).as("step_type"),
            col("n_users"))
      }
    counts.reduce(_ unionAll _)
  }

  /** The per-stage frontiers behind [[funnel]]: element i is the set of
    * users whose greedy chain reaches step i+1, as (u, t_first, t_prev)
    * with t_prev = that step's event time. The LAST element is the
    * completion set — conversion-latency analyses read t_prev − t_first
    * off it directly.
    */
  def funnelFrontiers(events: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, steps: Seq[String],
                      windowNanos: Long): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val user = col(userCol)

    var frontier = events.where(col(typeCol) === steps.head)
      .groupBy(user.as("u"))
      .agg(min(col(tsCol)).as("t_first"))
      .withColumn("t_prev", col("t_first"))
    val out = Seq.newBuilder[DataFrame]
    out += frontier

    steps.drop(1).foreach { st =>
      val ev = events.where(col(typeCol) === st)
        .select(user.as("u"), col(tsCol).as("t"))
      frontier = frontier.join(ev, "u")
        .where(col("t") > col("t_prev") &&
               col("t") - col("t_first") <= windowNanos)
        .groupBy("u")
        .agg(min(col("t_first")).as("t_first"), min(col("t")).as("t_prev"))
      out += frontier
    }
    out.result()
  }

  /** Cohort retention matrix: users bucketed by the day of their first
    * `cohortType` event; a cell (cohort_day, day_offset) counts the cohort's
    * users active (any event) that many days later.
    *
    * Scale: the distinct (user, day) activity set is map-side combinable
    * before its one user-keyed shuffle; the cohort side (one row per user)
    * joins on the same key. Day indices are exact `div` on epoch-ns.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, cohortType: String, maxOffsetDays: Int): DataFrame = {
    val day = expr(s"$tsCol div $DayNs")
    val cohorts = events.where(col(typeCol) === cohortType)
      .groupBy(col(userCol).as("u"))
      .agg(min(day).as("cohort_day"))
    val active = events.select(col(userCol).as("u"), day.as("day")).distinct()
    cohorts.join(active, "u")
      .withColumn("day_offset", col("day") - col("cohort_day"))
      .where(col("day_offset").between(0, maxOffsetDays))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order transition matrix: per user, events in (ts, tie) order; the
    * (event_type → next event_type) edge counts — the Markov-chain view of
    * behavior, and the flightdb "what do aircraft do after waypoint X"
    * question in event form.
    *
    * Scale: one user-keyed window pass (lead), then a map-side-combinable
    * count on the (src, dst) pair. The deterministic (ts, tie) total order
    * is what makes the edge multiset reproducible.
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(typeCol).as("src_type"),
        lead(col(typeCol), 1).over(w).as("dst_type"))
      .where(col("dst_type").isNotNull)
      .groupBy("src_type", "dst_type")
      .agg(count(lit(1)).as("n"))
  }

  /** Market-basket co-occurrence mining — association "rules" as the
    * (support, lift) table over item pairs seen in the same session
    * (Agrawal & Srikant's A-priori support counting, the two-itemset
    * level every recommender / "related items" pipeline starts from).
    * Sessions are whatever `sessCol` encodes (slot, gap session id);
    * items dedup within a session first (presence, not multiplicity —
    * the standard basket model). All derived measures are EXACT scaled
    * integers (one truncated division each, the bm25Rank discipline):
    * `lift_x10k = n_ab·n_sess·10000 div (n_a·n_b)`,
    * `support_ppm = n_ab·1000000 div n_sess` — cross-engine identical,
    * no float surface.
    *
    * Scale: basket dedup is one (session, item) distinct; pair
    * generation self-joins baskets on the session key — work is
    * Σ|basket|² bounded by per-session item diversity, never corpus²;
    * item marginals are item-vocabulary-sized and broadcast back into
    * the pair table; n_sess is one driver scalar (the precedented
    * bounded-stats head). Giant baskets are the skew case: cap or salt
    * upstream if a session can hold the whole vocabulary.
    */
  def cooccurrence(events: DataFrame, sessCol: Column, itemCol: Column,
                   minPairCount: Long): DataFrame = {
    val baskets = events.select(sessCol.as("_sess"), itemCol.as("_item"))
      .where(col("_item").isNotNull).distinct()
    val nSess = baskets.select(col("_sess")).distinct().count()
    require(nSess > 0, "cooccurrence: no sessions")
    val marg = baskets.groupBy(col("_item")).agg(count(lit(1)).as("_n"))
    val a = baskets.select(col("_sess"), col("_item").as("item_a"))
    val b = baskets.select(col("_sess").as("_sess2"), col("_item").as("item_b"))
    a.join(b, col("_sess") === col("_sess2") && col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairCount)
      .join(broadcast(marg.select(col("_item").as("item_a"), col("_n").as("n_a"))), "item_a")
      .join(broadcast(marg.select(col("_item").as("item_b"), col("_n").as("n_b"))), "item_b")
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        expr(s"n_ab * ${nSess}L * 10000L div (n_a * n_b)").as("lift_x10k"),
        expr(s"n_ab * 1000000L div ${nSess}L").as("support_ppm"))
  }
}
