package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Behavior, TimeSeries}

/** One catalog entry: the Spark plan and (when SQL-expressible) the DuckDB
  * oracle that must hash-match it. Column names/aliases are kept identical on
  * both sides — the driver sorts columns by name before hashing.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
    // Oracle SQL that depends on the DATA (e.g. a trained-model export) or
    // on data-derived parameters (corpus-sized LSH planes): generated at
    // Verify-dump time with the session + sf dir, so the emitted SQL always
    // matches the corpus the driver compares against. Static `oracle` wins
    // when both are set.
    oracleGen: Option[(SparkSession, String) => String] = None)

/** The query catalog — SURVEY.md §2's inventory, one entry per line item. */
object Queries {

  // events.ts is BIGINT nanoseconds (see Tables.events). Matching epoch
  // helpers for literals:
  private def nanos(isoDay: String): Long =
    java.time.LocalDate.parse(isoDay).atStartOfDay(java.time.ZoneOffset.UTC)
      .toInstant.toEpochMilli * 1000000L

  private val HourNs = 3600L * 1000000000L
  private val SessionGapNs = 6 * HourNs // ~11h mean inter-event gap per user

  // ---------------------------------------------------------------------------
  // Group A — relational / query-layer surface (SURVEY §2 items 1–10)
  // ---------------------------------------------------------------------------

  /** §2.1 Filtered scan + multi-key aggregation (TPC-H Q1 shape).
    * Scale: map-side partial aggregation; filter + 5-column pruning reach the
    * parquet scan.
    */
  private def qAggPricing(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where("l_shipdate <= TIMESTAMP_NTZ'1998-09-02 00:00:00'")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("n_items"))

  private val oAggPricing = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus"""

  /** §2.67 Salted equi-join behind the oracle gate: lineitem joined to a
    * per-returnflag dim on a DELIBERATELY hot key (3 distinct values —
    * every key is a hot key, the worst case for a plain hash shuffle:
    * 3 reducers carry the corpus). `Skew.saltedEquiJoin` spreads the
    * shuffle key to (key, salt) over 8 deterministic salts; the RESULT is
    * salt-independent by construction, so the DuckDB oracle runs the
    * plain unsalted join — the equivalence claim is exactly what the
    * driver hash-checks. Reducer-spread demonstrated by
    * tools.SaltSkewProbe (max/median partition rows, unsalted vs salted).
    */
  private def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val dim = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("flag_n"))
    graft.operators.Skew.saltedEquiJoin(li, dim, "l_returnflag",
        col("l_orderkey"), 8)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        max(col("flag_n")).as("flag_n"))
  }

  private val oSaltedJoin = """
    WITH dim AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS flag_n
                 FROM lineitem GROUP BY 1)
    SELECT l.l_returnflag, l.l_linestatus, count(*) AS n_items,
           round(sum(l.l_quantity), 2) AS sum_qty, max(d.flag_n) AS flag_n
    FROM lineitem l JOIN dim d USING (l_returnflag)
    GROUP BY 1, 2"""

  /** §2.67c Skew-ADAPTIVE salted join: same hot-key join as §2.67, but
    * the engine MEASURES the key's top share first (one bounded driver
    * aggregate) and picks the salt count itself — `s·parallelism` salts
    * for a key carrying share s, the plain join when keys are uniform.
    * l_returnflag's top key carries ~50% of lineitem, so the gate
    * genuinely trips; the result is salt-count-independent, so the
    * oracle is the same plain-join SQL and the equivalence claim IS the
    * hash check. The `n_salts` column exports the decision so the gate
    * also pins the adaptive arm taken (it would hash-differ if the
    * data's skew profile changed the decision).
    */
  private def qSaltedAuto(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val dim = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("flag_n"))
    val (joined, nSalts) = graft.operators.Skew.autoSaltedJoin(
      li, dim, "l_returnflag", col("l_orderkey"))
    joined
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        max(col("flag_n")).as("flag_n"))
      .withColumn("n_salts", lit(nSalts.toLong))
  }

  private def oSaltedAutoGen(s: SparkSession, dir: String): String = {
    // replay the decision: top-share × parallelism, clamped to [1, 64] —
    // exported as a literal so the oracle pins the arm actually taken
    val li = Tables.lineitem(s, dir)
    val st = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("_c"))
      .agg(sum(col("_c")), max(col("_c"))).head
    val par = s.sparkContext.defaultParallelism
    val wanted = ((st.getLong(1).toDouble / st.getLong(0)) * par).ceil.toInt
    val nSalts = math.max(1, math.min(64, wanted))
    s"""
    WITH dim AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS flag_n
                 FROM lineitem GROUP BY 1)
    SELECT l.l_returnflag, l.l_linestatus, count(*) AS n_items,
           round(sum(l.l_quantity), 2) AS sum_qty, max(d.flag_n) AS flag_n,
           CAST($nSalts AS BIGINT) AS n_salts
    FROM lineitem l JOIN dim d USING (l_returnflag)
    GROUP BY 1, 2"""
  }

  /** §2.67b Two-phase (salted) aggregation behind the oracle gate: sum of
    * `value` per event_type (5 distinct keys — every key hot) through
    * `Skew.twoPhaseSum`'s extra (key, salt) reduce tier; the result is
    * salt-independent, so the oracle is the plain GROUP BY — like
    * q_salted_join, the equivalence claim IS the hash check. Sums rounded
    * to 2dp on both sides (the parallel-association discipline of
    * q_agg_pricing).
    */
  private def qTwoPhaseSum(s: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.twoPhaseSum(Tables.events(s, dir), "event_type",
        col("value"), col("event_id"), 8, "sum_value")
      .select(col("event_type"), round(col("sum_value"), 2).as("sum_value"),
        col("sum_value_n").as("n"))

  private val oTwoPhaseSum = """
    SELECT event_type, round(sum(value), 2) AS sum_value, count(*) AS n
    FROM events GROUP BY event_type"""

  /** §2.2 Broadcast dimension join chain (identity ⋈ refdata).
    * Scale: nation/region are tiny dims — explicit broadcast keeps the big
    * side shuffle-free.
    */
  private def qJoinBroadcast(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_customers"),
           round(sum("c_acctbal"), 2).as("acctbal_sum"))

  private val oJoinBroadcast = """
    SELECT r_name, n_name, count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS acctbal_sum
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name"""

  /** §2.3 Large shuffle join + aggregation (fact ⋈ fact).
    * Scale: equi-join shuffles both sides on l_orderkey/o_orderkey; AQE can
    * rebalance skewed keys. count(DISTINCT) is planned as a partial expand.
    */
  private def qJoinShuffle(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(countDistinct("o_orderkey").as("n_orders"),
           round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))

  private val oJoinShuffle = """
    SELECT o_orderpriority, count(DISTINCT o_orderkey) AS n_orders,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority"""

  /** §2.4 Top-N per group (fgae QueryForRecent: Order+Limit per key). */
  private def qTopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val joined = Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
    TimeSeries.topNPerKey(joined,
        Seq(col("c_mktsegment")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .select("c_mktsegment", "o_orderkey", "o_totalprice", "rk")
  }

  private val oTopkPerGroup = """
    SELECT c_mktsegment, o_orderkey, o_totalprice, rk FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM customer JOIN orders ON c_custkey = o_custkey) t
    WHERE rk <= 3"""

  /** §2.5 Time-range + tag filter (fgae ByTimeRange/ByTags).
    * Scale: both predicates push to the parquet scan (PushedFilters).
    */
  private def qRangeFilter(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .where(col("ts") >= nanos("2024-01-10") && col("ts") < nanos("2024-01-20"))
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        expr("ts div 1000").as("ts_us"))

  private val oRangeFilter = """
    SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
      AND event_type IN ('click', 'purchase')"""

  /** §2.6 Timeslot bucketing (flight.go Timeslots index): hourly rollup. */
  private def qTimeBucket(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(expr("(ts div 3600000000000) * 3600").as("bucket_s"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("value_sum"))

  private val oTimeBucket = """
    SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS bucket_s, event_type,
           count(*) AS n_events, round(sum(value), 2) AS value_sum
    FROM events GROUP BY 1, 2"""

  /** §2.7 Recent-N per key (fgae QueryForRecentIcaoId). */
  private def qRecentN(s: SparkSession, dir: String): DataFrame =
    TimeSeries.topNPerKey(Tables.events(s, dir),
        Seq(col("user_id")), Seq(col("ts").desc, col("event_id").desc), 5)
      .select("user_id", "event_id", "event_type", "value", "rk")

  private val oRecentN = """
    SELECT user_id, event_id, event_type, value, rk FROM (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rk
      FROM events) t
    WHERE rk <= 5"""

  /** §2.8 Per-key summarization — flightdb CondensedFlight (condensed.go:55):
    * compact per-series summary (span, tag list, totals).
    */
  private def qCondense(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        expr("min(ts) div 1000").as("first_us"),
        expr("max(ts) div 1000").as("last_us"),
        array_join(array_sort(collect_set("event_type")), ",").as("tags"),
        round(sum("value"), 2).as("value_sum"))

  private val oCondense = """
    SELECT user_id, count(*) AS n_events,
           epoch_us(min(ts)) AS first_us, epoch_us(max(ts)) AS last_us,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS tags,
           round(sum(value), 2) AS value_sum
    FROM events GROUP BY user_id"""

  /** §2.9 Anti-join filtering (report.go NotTags preprocessing): series with
    * clicks but no error in the final week. Scale: left_anti shuffles on the
    * key only.
    */
  private def qAntiTags(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.where(col("event_type") === "click")
      .groupBy("user_id").agg(count(lit(1)).as("n_clicks"))
    val errored = ev.where(col("event_type") === "error" && col("ts") >= nanos("2024-01-24"))
      .select("user_id").distinct()
    clicks.join(errored, Seq("user_id"), "left_anti")
  }

  private val oAntiTags = """
    SELECT user_id, count(*) AS n_clicks
    FROM events e
    WHERE event_type = 'click'
      AND user_id NOT IN (SELECT user_id FROM events
                          WHERE event_type = 'error' AND ts >= TIMESTAMP '2024-01-24')
    GROUP BY user_id"""

  /** §2.10 Pivot rollup (report metadata tables): wide per-key counts. */
  private def qPivotTypes(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_click"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_view"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
        sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("n_signup"))

  // DuckDB sum(int) yields HUGEINT, which pandas renders as float64 — the
  // driver's value hash then sees 3.0 vs Spark's 3. CAST back to BIGINT.
  private val oPivotTypes = """
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup
    FROM events GROUP BY user_id"""

  // ---------------------------------------------------------------------------
  // Group B — track/time-series operators (SURVEY §2 items 11–20)
  // ---------------------------------------------------------------------------

  /** §2.11 Sessionization with max-gap (track gluing, track.go:25). */
  private def qSessionGap(s: SparkSession, dir: String): DataFrame =
    TimeSeries.sessionize(Tables.events(s, dir), "user_id", "ts", "event_id", SessionGapNs)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        expr("min(ts) div 1000").as("start_us"),
        expr("max(ts) div 1000").as("end_us"))

  /** §2.11b Sessionization via Spark's NATIVE `session_window` operator
    * (the built-in path beside §2.11's relational lag/cumsum — the
    * equivalence is the point: one declarative operator, one oracle).
    * Semantics nit the oracle must mirror: `session_window` merges
    * OVERLAPPING [t, t+gap) windows, so a gap of EXACTLY `gap` starts a
    * new session (`>=`), where the lag form uses strict `>`. Window end =
    * last event + gap by definition. Scale: one user-keyed aggregation
    * exchange, the same key the relational form shuffles on.
    */
  private def qSessionNative(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("tst", timestamp_micros(expr("ts div 1000")))
      .groupBy(col("user_id"), session_window(col("tst"), "6 hours").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"))

  private val oSessionNative = """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 21600000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged)
    SELECT user_id, epoch_us(min(ts)) AS start_us,
           epoch_us(max(ts)) + 21600000000 AS end_us,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, sid"""

  /** §2.11c: the §2.11b `session_window` sessionization DRIVER-GATED
    * through the actual micro-batch engine, MULTI-BATCH from r13
    * (`StreamGate.runOrdered` — the r12 verdict's "What's wrong #2", the
    * brief's designated ORDER-SENSITIVE lane). Shape:
    *
    *   1. the events split into FOUR hash-SHUFFLED files (event times
    *      fully interleaved across files — every batch after the first
    *      carries rows "late" relative to earlier batches' maxima), plus
    *      ONE far-future sentinel user staged as the LAST file;
    *   2. `readStream` (one file per micro-batch, mtime order) →
    *      watermark → `session_window` aggregate → APPEND-mode memory
    *      sink under `Trigger.AvailableNow`;
    *   3. the watermark delay is the staged REAL event-time span + 1 h —
    *      the StreamJoinSpec rule (delay ≥ max lateness of the arrival
    *      order): after any real batch the watermark stays below every
    *      real event time, so the shuffled arrival loses nothing;
    *   4. the sentinel batch then advances the watermark past every real
    *      session end (year 2100 − span) and the engine finalizes and
    *      emits EVERY real session; the sentinel user is dropped.
    *
    * Sessions now merge across batch boundaries inside the state store
    * (a user's six events arrive spread over four batches) and the final
    * table still equals the batch operator's output — the lane shares
    * §2.11b's relational oracle unchanged. Scale: state is user-keyed
    * (the same exchange key as batch); the span-sized delay is the
    * harness's determinism choice — production picks delay from real
    * arrival skew and accepts the late-drop trade.
    */
  private def qSessionStream(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
    val mm = ev.agg(min(col("ts")), max(col("ts"))).head()
    val delayMs = (mm.getLong(1) - mm.getLong(0)) / 1000000L + 3600000L
    // 2100-01-01 in epoch ns: past any event time, so the watermark
    // (sentinel − delay) closes every real session once the LAST file runs
    val sentinel = s.range(1).select(lit(-1L).as("user_id"),
      lit(4102444800000000000L).as("ts"), lit(-1L).as("event_id"))
    val parts =
      graft.streaming.StreamGate.sliceByHash(ev, "event_id", 4).append(sentinel)
    graft.streaming.StreamGate.runSliced(s, parts, "append") { src =>
      src.withColumn("tst", timestamp_micros(expr("ts div 1000")))
        .withWatermark("tst", s"$delayMs milliseconds")
        .groupBy(col("user_id"), session_window(col("tst"), "6 hours").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("start_us"),
          unix_micros(col("sw.end")).as("end_us"),
          col("n_events"))
    }.where(col("user_id") =!= -1L)
  }

  /** §2.37 Streaming ingest + stateful track assembly DRIVER-GATED through
    * the engine (r12): the reference's consolidator/AddTrackFragment shape
    * (fgae/addtrackfragment.go — fragments glue into gap-bounded tracks in
    * per-key state, emitted when the gap closes them) runs as
    * `SessionStream.sessionize`'s flatMapGroupsWithState through the
    * q_session_stream staging harness. The far-future sentinel pushes the
    * watermark past every real track so the EVENT-TIME TIMEOUT flushes
    * each key's final open session in the no-data batch (the sentinel's
    * own open session stays in state — end+gap is beyond the watermark —
    * and is filtered). Track MEMBERSHIP depends only on ts values (ties
    * extend regardless of order), so the gate is deterministic; the float
    * value_sum stays OUT of the hash (its sequential fold order differs
    * from SQL sum association — the cross-engine float rule). Emitted
    * tracks equal §2.11's strict-gap relational sessionization, so the
    * oracle is q_session_gap's CTE without the session_id column. Scale:
    * state is ONE open session per ACTIVE key (timeout evicts quiet
    * keys), shuffled on the airframe key — the reference's consolidator
    * contract, now hash-checked end-to-end.
    */
  private def qTrackStream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sentinel = s.range(1).select(lit(-1L).as("userId"),
      lit(4102444800000000000L).as("tsNs"), lit(0.0).as("value"))
    val real = Tables.events(s, dir)
      .select(col("user_id").as("userId"), col("ts").as("tsNs"), col("value"))
    // r13 MULTI-BATCH: four event-time-contiguous slices + the sentinel
    // LAST — open tracks carry across real batch boundaries in per-key
    // state; in-time-order arrival is sessionize's cross-batch contract
    // and a boundary timeout can only fire when the gap is genuinely
    // exceeded (next slice's rows are ≥ 2 gaps past the flushed session's
    // end by the watermark arithmetic), so emitted tracks equal the batch
    // gap-split exactly.
    val parts = graft.streaming.StreamGate.sliceByTime(real, "tsNs", 4)
      .append(sentinel)
    graft.streaming.StreamGate.runSliced(s, parts, "append") { src =>
      graft.streaming.SessionStream.sessionize(
          src.as[graft.streaming.SessionStream.Point], SessionGapNs)
        .select(col("user_id"), col("start_us"), col("end_us"),
          col("n_events"))
    }.where(col("user_id") =!= -1L)
  }

  private val oTrackStream = """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 21600000000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id"""

  /** §2.16f Last-touch attribution (the marketing-analytics report on the
    * §2.16 as-of machinery, self-table form): each purchase attributes to
    * the user's latest click/view within a 2-day lookback — one
    * user-partitioned IGNORE-NULLS running window over the unioned event
    * stream (the q_asof_join plan: single shuffle, no per-row subquery),
    * then a scan-stage lookback cut and a channel rollup. All-integer ns
    * arithmetic; ties at equal ts resolve by event_id on both engines.
    */
  private def qAttribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isTouch = col("event_type").isin("click", "view")
    Tables.events(s, dir)
      .withColumn("last_touch",
        last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .withColumn("last_touch_ts",
        last(when(isTouch, col("ts")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .withColumn("channel",
        when(col("last_touch_ts").isNull ||
          col("ts") - col("last_touch_ts") > lit(48L * HourNs), "none")
          .otherwise(col("last_touch")))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"))
  }

  private val oAttribution = """
    WITH t AS (
      SELECT event_type, ts,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS)
               OVER w AS last_touch,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN epoch_ns(ts) END IGNORE NULLS)
               OVER w AS last_touch_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT CASE WHEN last_touch_ts IS NULL
                  OR epoch_ns(ts) - last_touch_ts > 172800000000000
                THEN 'none' ELSE last_touch END AS channel,
           count(*) AS n_purchases
    FROM t WHERE event_type = 'purchase'
    GROUP BY 1"""

  /** §2.12b SCD2 dimension build (warehouse temporal-history shape): the
    * per-user attribute stream (event_type as the tracked attribute)
    * collapses to its CHANGE POINTS, each carrying an effective range
    * [from, to) and a current flag — the slowly-changing-dimension table
    * an as-of join (§2.16) then serves lookups from. Two window passes on
    * the SAME user partitioning (detect changes, then number + close
    * ranges over the filtered change rows); all-integer ns timestamps.
    */
  private def qScd2(s: SparkSession, dir: String): DataFrame = {
    val w1 = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val changes = Tables.events(s, dir)
      .withColumn("_prev", lag(col("event_type"), 1).over(w1))
      .where(col("_prev").isNull || col("_prev") =!= col("event_type"))
    val w2 = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    changes
      .withColumn("version", row_number().over(w2))
      .withColumn("to_ns", lead(col("ts"), 1).over(w2))
      .select(col("user_id"), col("version"), col("event_type"),
        col("ts").as("from_ns"), col("to_ns"),
        col("to_ns").isNull.cast("int").as("is_current"))
  }

  private val oScd2 = """
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    changes AS (
      SELECT user_id, ts, event_id, event_type FROM marked
      WHERE prev IS NULL OR prev <> event_type)
    SELECT user_id,
           CAST(row_number() OVER w AS INT) AS version,
           event_type,
           epoch_ns(ts) AS from_ns,
           epoch_ns(lead(ts) OVER w) AS to_ns,
           CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""

  private val oSessionGap = """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 21600000000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts, event_id,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id, count(*) AS n_events,
           epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
    FROM sessions GROUP BY user_id, session_id"""

  /** §2.12 Derived kinematics via lag (Track.PostProcess, track.go:195). */
  private def qKinematics(s: SparkSession, dir: String): DataFrame =
    TimeSeries.kinematics(Tables.events(s, dir), "user_id", "ts", "event_id", "value")
      .where(col("dt_us").isNotNull)
      .select(col("event_id"), col("user_id"), col("dt_us"),
        round(col("dvalue"), 4).as("dvalue"),
        round(col("rate"), 6).as("rate"))

  // `+ 0` normalizes DuckDB's round() emitting -0.0 for tiny negative rates
  // (Spark's BigDecimal round never does) — the driver's hash is sign-exact.
  private val oKinematics = """
    SELECT event_id, user_id, dt_us, round(dvalue, 4) AS dvalue,
           round(dvalue / (dt_us / 1000000.0), 6) + 0 AS rate
    FROM (
      SELECT event_id, user_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER w) AS dt_us,
             value - lag(value) OVER w AS dvalue
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
    WHERE dt_us IS NOT NULL"""

  /** §2.13 Cumulative along-path distance (DistanceTravelledKM, track.go:216).
    * Also covers §2.28 FlownDist.
    */
  private def qCumdist(s: SparkSession, dir: String): DataFrame =
    TimeSeries.cumulativeDistance(Tables.events(s, dir), "user_id", "ts", "event_id", "value")
      .select(col("event_id"), col("user_id"), round(col("cum_dist"), 2).as("cum_dist"))

  private val oCumdist = """
    SELECT event_id, user_id,
           round(sum(CASE WHEN pv IS NULL THEN 0.0 ELSE abs(value - pv) END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING), 2) AS cum_dist
    FROM (
      SELECT event_id, user_id, ts, value, lag(value) OVER w AS pv
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t"""

  /** §2.14 Time-based resampling (Track.SampleEvery, track.go:604): first
    * event per (user, 6h bucket).
    */
  private def qSampleEvery(s: SparkSession, dir: String): DataFrame =
    TimeSeries.sampleEvery(Tables.events(s, dir), "user_id", "ts", "event_id", 6 * HourNs)
      .select(col("user_id"), expr("(ts div 21600000000000) * 21600").as("bucket_s"),
        col("event_id"), col("value"))

  private val oSampleEvery = """
    SELECT user_id, (epoch_ns(ts) // 21600000000000) * 21600 AS bucket_s,
           event_id, value FROM (
      SELECT user_id, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 21600000000000
                                ORDER BY ts, event_id) AS rn
      FROM events) t
    WHERE rn = 1"""

  /** §2.15 Windowed smoothing (WindowedAverageAt, track.go:530): trailing
    * 5-row moving average.
    */
  private def qWindowedAvg(s: SparkSession, dir: String): DataFrame =
    TimeSeries.trailingAvg(Tables.events(s, dir), "user_id", "ts", "event_id",
        "value", 5, "smooth")
      .select(col("event_id"), col("user_id"), round(col("smooth"), 4).as("smooth"))

  private val oWindowedAvg = """
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS smooth
    FROM events"""

  /** §2.15b Time-based (RANGE-frame) trailing window — the event-TIME
    * sibling of §2.15's row-frame smoothing: per event, count/sum/avg of
    * the same user's events in the trailing 24 h. RANGE frame contents
    * are defined by ORDER-BY VALUES (all ts-peers included on both
    * engines), so the frame is a SET — order-independent by
    * construction; with values as exact integer cents the sum is exact
    * under ANY accumulation order (Spark's running accumulation vs
    * DuckDB's segment trees would re-associate a double sum — the one
    * cross-engine hazard a ROWS-frame float avg tiptoes around). avg is
    * one truncated integer division. One user-keyed window pass.
    */
  private def qTrailing24h(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"))
      .rangeBetween(-24L * HourNs, 0)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        expr("CAST(round(value * 100) AS BIGINT)").as("_cents"))
      .withColumn("n_24h", count(lit(1)).over(w))
      .withColumn("sum_cents", sum(col("_cents")).over(w))
      .select(col("event_id"), col("user_id"), col("n_24h"),
        col("sum_cents"), expr("sum_cents div n_24h").as("avg_cents"))
  }

  private val oTrailing24h = s"""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_24h,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
             AS sum_cents,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
             // CAST(count(*) OVER w AS BIGINT) AS avg_cents
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
                 RANGE BETWEEN ${24L * HourNs} PRECEDING AND CURRENT ROW)"""

  /** §2.16 As-of lookup (METAR Lookup / ComputeIndicatedAltitudes): each
    * purchase gets the most recent preceding click value of the same user.
    */
  private def qAsofJoin(s: SparkSession, dir: String): DataFrame =
    TimeSeries.asOfLast(Tables.events(s, dir), "user_id", "ts", "event_id",
        col("event_type") === "click", col("value"), "last_click_value")
      .where(col("event_type") === "purchase")
      .select("event_id", "user_id", "value", "last_click_value")

  private val oAsofJoin = """
    SELECT event_id, user_id, value, last_click_value FROM (
      SELECT event_id, user_id, event_type, value,
             last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_value
      FROM events) t
    WHERE event_type = 'purchase'"""

  /** §2.17 Interval-overlap join (Track.Compare, track.go:322): pairs of
    * sessions from different users overlapping in time. The Spark plan bins
    * sessions into 6h buckets for an equi-join; the oracle states the naive
    * theta-join — results must agree.
    */
  private def qIntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val sessions = TimeSeries
      .sessionize(Tables.events(s, dir), "user_id", "ts", "event_id", SessionGapNs)
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("s_start"), max("ts").as("s_end"))
      .where(col("user_id") < 30) // bound pair count; semantics identical to oracle
    val a = sessions.toDF("a_user", "a_session", "start", "end")
    val b = sessions.toDF("b_user", "b_session", "start", "end")
    TimeSeries.overlapJoin(a, b, "start", "end", 6 * HourNs,
        col("a_user") < col("b_user"))
      .select("a_user", "a_session", "b_user", "b_session").distinct()
      .groupBy("a_user", "b_user").agg(count(lit(1)).as("n_overlaps"))
  }

  private val oIntervalOverlap = """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 21600000000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events WHERE user_id < 30
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged),
    sessions AS (
      SELECT user_id, session_id, min(ts) AS s_start, max(ts) AS s_end
      FROM numbered GROUP BY user_id, session_id)
    SELECT a.user_id AS a_user, b.user_id AS b_user, count(*) AS n_overlaps
    FROM sessions a JOIN sessions b
      ON a.user_id < b.user_id
     AND a.s_start <= b.s_end AND b.s_start <= a.s_end
    GROUP BY a.user_id, b.user_id"""

  /** §2.18 Run-length detection (LevelFlightReporter): maximal runs of >= 3
    * consecutive events with |Δvalue| < 2.
    */
  private def qLevelFlight(s: SparkSession, dir: String): DataFrame = {
    val withLag = Tables.events(s, dir)
      .withColumn("_pv", lag(col("value"), 1)
        .over(Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
    TimeSeries.runLengths(withLag, "user_id", "ts", "event_id",
        col("_pv").isNotNull && abs(col("value") - col("_pv")) < 2.0, 3L)
      .select("user_id", "run_start", "run_len")
  }

  private val oLevelFlight = """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(value) OVER w IS NOT NULL
                   AND abs(value - lag(value) OVER w) < 2.0 THEN 1 ELSE 0 END AS f
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    grouped AS (
      SELECT user_id, event_id, f,
             sum(1 - f) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS grp
      FROM flagged)
    SELECT user_id, min(event_id) AS run_start, count(*) AS run_len
    FROM grouped WHERE f = 1
    GROUP BY user_id, grp
    HAVING count(*) >= 3"""

  /** §2.19 Sanity filtering (AsSanityFilteredTrack, track.go:809): count
    * implied-rate outliers per series.
    */
  private def qSanityFilter(s: SparkSession, dir: String): DataFrame =
    TimeSeries.kinematics(Tables.events(s, dir), "user_id", "ts", "event_id", "value")
      .where(col("dt_us").isNotNull &&
        abs(col("rate")) > lit(0.01)) // implied |Δvalue|/s beyond plausible
      .groupBy("user_id").agg(count(lit(1)).as("n_outliers"))

  private val oSanityFilter = """
    SELECT user_id, count(*) AS n_outliers FROM (
      SELECT user_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER w) AS dt_us,
             value - lag(value) OVER w AS dvalue
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
    WHERE dt_us IS NOT NULL
      AND abs(dvalue / (dt_us / 1000000.0)) > 0.01
    GROUP BY user_id"""

  /** §2.16c Two-table as-of join (metar.Archive.Lookup against a separate
    * archive table): each event looks up the most recent "alert" — a
    * (user, day) whose daily mean value exceeded 55 — at or before its
    * timestamp. The archive is derived from events (day-start timestamped),
    * the join is the scalable union-window as-of; the oracle uses DuckDB's
    * native ASOF JOIN.
    */
  private def qAsofTable(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    // Alert = day whose mean value exceeds 55, expressed as sum > 55*n so
    // every compared quantity is exact at 2 decimals (values are cent-
    // grained; a rounded AVERAGE can land on a .00005 halfway and round
    // differently across engines — a sum of cents cannot).
    val alerts = ev
      .groupBy(col("user_id"), expr("(ts div 86400000000000) * 86400000000000").as("ats"))
      .agg(round(sum("value"), 2).as("alert_sum"), count(lit(1)).as("alert_n"))
      .where(col("alert_sum") > lit(55.0) * col("alert_n"))
    TimeSeries.asOfJoinTables(ev, alerts, "user_id", "ts", "ats",
        Seq("alert_sum", "alert_n", "ats"))
      .where(col("asof_alert_sum").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("asof_alert_sum").as("alert_sum"), col("asof_alert_n").as("alert_n"),
        expr("asof_ats div 1000000000").as("alert_day_s"))
  }

  private val oAsofTable = """
    WITH alerts AS (
      SELECT user_id,
             (epoch_ns(ts) // 86400000000000) * 86400000000000 AS ats,
             round(sum(value), 2) AS alert_sum, count(*) AS alert_n
      FROM events GROUP BY 1, 2
      HAVING round(sum(value), 2) > 55.0 * count(*))
    SELECT e.event_id, e.user_id, a.alert_sum, a.alert_n,
           a.ats // 1000000000 AS alert_day_s
    FROM events e ASOF JOIN alerts a
      ON e.user_id = a.user_id AND epoch_ns(e.ts) >= a.ats"""

  /** §2.16d The SAME as-of lookup through the custom Catalyst operator
    * (AsOfJoinNode → AsOfJoinStrategy → AsOfJoinExec streaming merge): one
    * co-partitioned exchange per side, no union materialization, no window
    * buffer. Oracle identical to q_asof_table — DuckDB's native ASOF JOIN
    * must hash-match the custom physical operator's output exactly.
    */
  private def qAsofNative(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val alerts = ev
      .groupBy(col("user_id"), expr("(ts div 86400000000000) * 86400000000000").as("ats"))
      .agg(round(sum("value"), 2).as("alert_sum"), count(lit(1)).as("alert_n"))
      .where(col("alert_sum") > lit(55.0) * col("alert_n"))
    org.apache.spark.sql.graft.AsOfJoin.join(ev, alerts, "user_id", "ts", "ats",
        Seq("alert_sum", "alert_n", "ats"))
      .where(col("asof_alert_sum").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("asof_alert_sum").as("alert_sum"), col("asof_alert_n").as("alert_n"),
        expr("asof_ats div 1000000000").as("alert_day_s"))
  }

  /** §2.16e METAR pressure-altitude correction — the reference's flagship
    * use of the as-of METAR lookup (flight.go:276 ComputeIndicatedAltitudes,
    * track.go:231 AdjustAltitudes): each track point's pressure altitude is
    * corrected by the most recent altimeter setting,
    * `indicated = pressure_alt + (inHg - 29.9213) * 1000` (the standard
    * ~1000 ft/inHg sea-level approximation; 29.9213 is the reference's
    * metar.go:10 StandardPressureInHg), falling back to the uncorrected
    * altitude when no METAR precedes the point (track.go:247).
    *
    * The "METAR archive" is derived from events as an hourly per-user
    * series (hour-bucketed min value → a 4-decimal inHg around standard
    * pressure); `value * 100` plays the pressure altitude. The lookup runs
    * through the custom Catalyst as-of operator (one co-partitioned
    * exchange per side, streaming merge); the oracle uses DuckDB's native
    * ASOF LEFT JOIN — nulls (points before any METAR) keep the fallback.
    */
  private def qIndicatedAlt(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    // min(value) is an exact pick (no sum/avg halfway risk); arithmetic on
    // it is identical double ops on both engines
    val metar = ev
      .groupBy(col("user_id"), expr(s"(ts div $HourNs) * $HourNs").as("hts"))
      .agg(round(lit(29.9213) + (min("value") - 50.0) / 100.0, 4).as("inhg"))
    org.apache.spark.sql.graft.AsOfJoin.join(ev, metar, "user_id", "ts", "hts",
        Seq("inhg"))
      .select(col("event_id"), col("user_id"),
        round(col("value") * 100.0, 1).as("press_alt"),
        col("asof_inhg").as("inhg"),
        when(col("asof_inhg").isNull, round(col("value") * 100.0, 1))
          .otherwise(round(col("value") * 100.0
            + (col("asof_inhg") - 29.9213) * 1000.0, 1)).as("indicated_alt"))
  }

  private val oIndicatedAlt = """
    WITH metar AS (
      SELECT user_id, (epoch_ns(ts) // 3600000000000) * 3600000000000 AS hts,
             round(29.9213 + (min(value) - 50.0) / 100.0, 4) AS inhg
      FROM events GROUP BY 1, 2)
    SELECT e.event_id, e.user_id,
           round(e.value * 100.0, 1) AS press_alt, m.inhg,
           CASE WHEN m.inhg IS NULL THEN round(e.value * 100.0, 1)
                ELSE round(e.value * 100.0 + (m.inhg - 29.9213) * 1000.0, 1)
           END AS indicated_alt
    FROM events e ASOF LEFT JOIN metar m
      ON e.user_id = m.user_id AND epoch_ns(e.ts) >= m.hts"""

  /** §2.8b Preferred-source track selection (flight.go:173 PreferredTrack:
    * first source in a priority list the flight actually has — ADSB > MLAT
    * > FOIA in the reference; click > view > signup here). Per key: rank
    * the sources present, keep only the best-ranked source's points, and
    * summarize them. One aggregation for the per-key best rank, one
    * equi-join back — no per-flight loops.
    */
  private def qPreferredSource(s: SparkSession, dir: String): DataFrame = {
    val pri = when(col("event_type") === "click", 1)
      .when(col("event_type") === "view", 2)
      .when(col("event_type") === "signup", 3)
    val e = Tables.events(s, dir).withColumn("_pri", pri).where(col("_pri").isNotNull)
    val best = e.groupBy("user_id").agg(min("_pri").as("_pri"))
    e.join(best, Seq("user_id", "_pri"))
      .groupBy(col("user_id"), col("event_type").as("source"))
      .agg(count(lit(1)).as("n_points"),
        expr("min(ts) div 1000").as("first_us"),
        expr("max(ts) div 1000").as("last_us"))
      .select("user_id", "source", "n_points", "first_us", "last_us")
  }

  private val oPreferredSource = """
    WITH pri AS (
      SELECT user_id, ts, event_type,
             CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
                             WHEN 'signup' THEN 3 END AS p
      FROM events WHERE event_type IN ('click', 'view', 'signup')),
    best AS (SELECT user_id, min(p) AS p FROM pri GROUP BY 1)
    SELECT e.user_id, e.event_type AS source, count(*) AS n_points,
           epoch_us(min(e.ts)) AS first_us, epoch_us(max(e.ts)) AS last_us
    FROM pri e JOIN best b ON e.user_id = b.user_id AND e.p = b.p
    GROUP BY 1, 2"""

  /** §2.10b Multi-level rollup through the SQL surface (report metadata
    * rollups at every grouping level): GROUP BY ROLLUP via `spark.sql` over
    * a temp view — the catalog's SQL-API entry point. NULL marker rows from
    * ROLLUP are coalesced to 'ALL' so the hash-compare is null-free.
    */
  private def qRollup(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("graft_events")
    s.sql("""
      SELECT coalesce(event_type, 'ALL') AS event_type,
             coalesce(CAST(user_id % 10 AS STRING), 'ALL') AS cohort,
             count(*) AS n, round(sum(value), 2) AS value_sum
      FROM graft_events
      GROUP BY ROLLUP(event_type, user_id % 10)""")
  }

  private val oRollup = """
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(CAST(user_id % 10 AS VARCHAR), 'ALL') AS cohort,
           count(*) AS n, round(sum(value), 2) AS value_sum
    FROM events
    GROUP BY ROLLUP(event_type, user_id % 10)"""

  // ---------------------------------------------------------------------------
  // Group F — event-behavior analytics (SURVEY §2 items 68–68b)
  // ---------------------------------------------------------------------------

  /** §2.68 Ordered funnel with a 2-day completion window: view → click →
    * purchase, greedy earliest-match per user (Behavior.funnel). Every
    * shuffle is user-keyed; per-step counts are unioned scalar aggregates.
    */
  private def qFunnel(s: SparkSession, dir: String): DataFrame =
    Behavior.funnel(Tables.events(s, dir), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), 2 * 24 * HourNs)

  private val oFunnel = """
    WITH e AS (SELECT user_id AS u, epoch_ns(ts) AS t, event_type FROM events),
    s1 AS (SELECT u, min(t) AS t1 FROM e WHERE event_type = 'view' GROUP BY u),
    s2 AS (
      SELECT s1.u, s1.t1, min(e.t) AS t2
      FROM s1 JOIN e ON e.u = s1.u AND e.event_type = 'click'
        AND e.t > s1.t1 AND e.t - s1.t1 <= 172800000000000
      GROUP BY s1.u, s1.t1),
    s3 AS (
      SELECT s2.u, min(e.t) AS t3
      FROM s2 JOIN e ON e.u = s2.u AND e.event_type = 'purchase'
        AND e.t > s2.t2 AND e.t - s2.t1 <= 172800000000000
      GROUP BY s2.u)
    SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step_type, count(*) AS n_users FROM s1
    UNION ALL
    SELECT 2, 'click', count(*) FROM s2
    UNION ALL
    SELECT 3, 'purchase', count(*) FROM s3"""

  /** §2.68c Streaming funnel progression DRIVER-GATED through the
    * micro-batch engine (the q_session_stream harness, r12): events stage
    * as one parquet file → `readStream` → the per-user greedy frontier as
    * `mapGroupsWithState` (graft.streaming.FunnelStream) → update-mode
    * memory sink under AvailableNow. One batch ⇒ every user's events reach
    * one sorted group invocation, so the frontier equals the batch greedy
    * chain exactly (StreamFunnelSpec's parity claim, now hash-checked);
    * the final per-user steps roll up to the SAME report as §2.68 and the
    * lane shares q_funnel's oracle. Scale: state is 3 scalars/user; the
    * rollup is a broadcast join against the 3-row step frame.
    */
  private def qFunnelStream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val staged = Tables.events(s, dir).select(
      col("user_id").as("userId"), col("ts").as("tsNs"),
      col("event_type").as("eventType"))
    // r13 MULTI-BATCH: four event-time-contiguous slices in time order
    // (StreamGate.splitByTime) — the greedy frontier crosses real batch
    // boundaries; per-key step is MONOTONE, so the final state is
    // max(step) over the update-sink emissions.
    val parts = graft.streaming.StreamGate.sliceByTime(staged, "tsNs", 4)
    val byUser = graft.streaming.StreamGate.runSliced(s, parts, "update") {
      src =>
        graft.streaming.FunnelStream.funnelProgress(
          src.as[graft.streaming.FunnelStream.Ev],
          Seq("view", "click", "purchase"), 2 * 24 * HourNs)
          .toDF("user_id", "step")
    }.groupBy(col("user_id")).agg(max(col("step")).as("step"))
    val steps = Seq((1L, "view"), (2L, "click"), (3L, "purchase"))
      .toDF("step_idx", "step_type")
    // LEFT join from the step frame: a step nobody reached still emits its
    // zero row, matching the oracle's unconditional per-step scalars
    steps.join(byUser, col("step") >= col("step_idx"), "left")
      .groupBy("step_idx", "step_type")
      .agg(count(col("user_id")).as("n_users"))
  }

  /** §2.68g Stream-STREAM interval join DRIVER-GATED through the engine
    * (r12): views and clicks stage as TWO single-file parquet streams;
    * clicks match the same user's views that precede them by ≤ 30 min — a
    * true two-stream inner join whose buffered state both watermarks bound
    * to O(rate × interval) in production. One batch per side ⇒ the inner
    * join emits the complete matched set in the data batch (inner-join
    * emission is not watermark-gated; the delay governs only state
    * eviction and late-data completeness across batches — the
    * StreamStreamJoinSpec trade, recorded there with measured loss).
    * All-integer μs arithmetic on both engines (operands truncated to μs
    * BEFORE subtracting — the epoch_us discipline).
    */
  private def qStreamJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def side(typ: String, p: String): DataFrame = ev
      .where(col("event_type") === typ)
      .select(col("user_id").as(s"${p}u"), col("event_id").as(s"${p}id"),
        expr("ts div 1000").as(s"${p}us"))
    // r13 MULTI-BATCH (runOrderedMulti): each side splits into four
    // time-contiguous slices staged as its own ordered file sequence —
    // batch k carries slice k of BOTH sides, so the join's buffered state
    // genuinely crosses real batch boundaries and the watermark advances
    // between them. The 1 h delay exceeds the 30 min join window, so a
    // cross-boundary match's view is still in state when its click
    // arrives, and time-ordered arrival makes lateness impossible — the
    // match set stays COMPLETE (the shuffled-arrival loss trade stays
    // documented at StreamJoinSpec); oracle unchanged.
    val parts = Seq(side("view", "v") -> "vus", side("click", "c") -> "cus")
      .map { case (df, c) => graft.streaming.StreamGate.sliceByTime(df, c, 4) }
    graft.streaming.StreamGate.runSlicedMulti(s, parts, "append") {
      case Seq(v, c) =>
        val vS = v.withColumn("vts", timestamp_micros(col("vus")))
          .withWatermark("vts", "1 hour")
        val cS = c.withColumn("cts", timestamp_micros(col("cus")))
          .withWatermark("cts", "1 hour")
        vS.join(cS,
          col("vu") === col("cu") && col("cts") >= col("vts") &&
            col("cts") <= col("vts") + expr("INTERVAL 30 MINUTES"))
          .select(col("vu").as("user_id"), col("vid").as("view_id"),
            col("cid").as("click_id"),
            (col("cus") - col("vus")).as("delay_us"))
    }
  }

  private val oStreamJoin = """
    SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
           epoch_us(c.ts) - epoch_us(v.ts) AS delay_us
    FROM events v JOIN events c
      ON c.user_id = v.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND epoch_us(c.ts) >= epoch_us(v.ts)
     AND epoch_us(c.ts) <= epoch_us(v.ts) + 1800000000"""

  /** §2.68a Cohort retention matrix: cohort = day of first signup; a cell
    * (cohort_day, day_offset) counts that cohort's users active (any event)
    * that many days later (Behavior.retention). Day index is exact integer
    * `div` on epoch-ns — never a double floor.
    */
  private def qRetention(s: SparkSession, dir: String): DataFrame =
    Behavior.retention(Tables.events(s, dir), "user_id", "ts", "event_type",
      "signup", maxOffsetDays = 30)

  private val oRetention = """
    WITH cohorts AS (
      SELECT user_id AS u, min(epoch_ns(ts) // 86400000000000) AS cohort_day
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    active AS (
      SELECT DISTINCT user_id AS u, epoch_ns(ts) // 86400000000000 AS day
      FROM events)
    SELECT cohort_day, day - cohort_day AS day_offset, count(*) AS n_users
    FROM cohorts JOIN active USING (u)
    WHERE day - cohort_day BETWEEN 0 AND 30
    GROUP BY 1, 2"""

  /** §2.68b First-order transition matrix: per-user (ts, event_id)-ordered
    * lead pairs, counted per (src, dst) edge (Behavior.transitions).
    */
  private def qTransitions(s: SparkSession, dir: String): DataFrame =
    Behavior.transitions(Tables.events(s, dir), "user_id", "ts", "event_id",
      "event_type")

  private val oTransitions = """
    WITH seq AS (
      SELECT event_type AS src_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst_type
      FROM events)
    SELECT src_type, dst_type, count(*) AS n
    FROM seq WHERE dst_type IS NOT NULL GROUP BY 1, 2"""

  /** §2.68h Stationary distribution of the behavior Markov chain — the
    * long-run profile the §2.68b one-step matrix only hints at: where
    * does a user's session settle if the observed dynamics persist?
    * Power iteration in exact scaled integers (SCALE = 10⁶): π'_j =
    * Σ_i (π_i·n_ij) div r_i with per-TERM truncation (each term one
    * integer divide — replayable; the sum is integer, order-free).
    * Fixed 8 rounds (the replayable-trainer discipline), transitions
    * restricted to states with outgoing mass so nothing leaks into an
    * absorbing sink. Frames are |event-types|²-bounded — trivially
    * driver-scale; lineage truncated per round anyway (the iterative
    * discipline). Oracle unrolls the same 8 rounds as MATERIALIZED
    * CTEs.
    */
  private def qMarkovStationary(s: SparkSession, dir: String): DataFrame = {
    val Scale = 1000000L
    val ckpt = graft.operators.Graph.ckptFor(s)
    val trans0 = Behavior.transitions(Tables.events(s, dir),
      "user_id", "ts", "event_id", "event_type")
    val srcSet = trans0.select(col("src_type").as("st")).distinct()
    val trans = trans0.join(
      srcSet.withColumnRenamed("st", "dst_type"), Seq("dst_type"))
    val rsum = trans.groupBy("src_type").agg(sum("n").as("r"))
    val tr = ckpt(trans.join(rsum, "src_type"))
    val nStates = srcSet.count() // bounded driver scalar: |event types|
    // an events table with no observed transitions (or none whose target
    // has outgoing mass) has no chain to iterate: return the empty result
    // with the output schema instead of dividing by zero at plan build
    if (nStates == 0)
      return srcSet.select(col("st").as("event_type"),
        lit(0L).as("pi_ppm")).limit(0)
    var pi = ckpt(srcSet.select(col("st").as("state"),
      lit(Scale / nStates).as("pi")))
    for (_ <- 1 to 8) {
      pi = ckpt(tr
        .join(pi.withColumnRenamed("state", "src_type"), "src_type")
        .select(col("dst_type").as("state"), expr("pi * n div r").as("_t"))
        .groupBy("state").agg(sum("_t").as("pi")))
    }
    pi.select(col("state").as("event_type"), col("pi").as("pi_ppm"))
  }

  private val oMarkovStationary: String = {
    val rounds = (1 to 8).map { k =>
      s"""
    p$k AS MATERIALIZED (
      SELECT tr.dst_type AS state, CAST(sum(p.pi * tr.n // tr.r) AS BIGINT) AS pi
      FROM tr JOIN p${k - 1} p ON p.state = tr.src_type GROUP BY 1)"""
    }.mkString(",")
    s"""
    WITH seq AS (
      SELECT event_type AS src_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst_type
      FROM events),
    t0 AS MATERIALIZED (
      SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE dst_type IS NOT NULL GROUP BY 1, 2),
    ss AS (SELECT DISTINCT src_type AS st FROM t0),
    t1 AS (SELECT t0.* FROM t0 JOIN ss ON t0.dst_type = ss.st),
    r AS (SELECT src_type, CAST(sum(n) AS BIGINT) AS r FROM t1 GROUP BY 1),
    tr AS MATERIALIZED (
      SELECT t1.src_type, t1.dst_type, t1.n, r.r
      FROM t1 JOIN r USING (src_type)),
    ns AS (SELECT CAST(count(*) AS BIGINT) AS k FROM ss),
    p0 AS MATERIALIZED (
      SELECT st AS state, CAST(1000000 // (SELECT k FROM ns) AS BIGINT) AS pi
      FROM ss),$rounds
    SELECT state AS event_type, pi AS pi_ppm FROM p8"""
  }

  /** §2.68d Market-basket co-occurrence (Agrawal & Srikant two-itemset
    * support counting — the "related items" table): items = the props-k
    * channel, baskets = 6 h timeslots (co-trending within a window);
    * support and lift kept EXACT as one truncated scaled-integer
    * division each. Scale: pair work is Σ|basket|², never corpus²;
    * marginals broadcast; n_sess is a bounded driver scalar.
    */
  private def qCooccur(s: SparkSession, dir: String): DataFrame =
    Behavior.cooccurrence(Tables.events(s, dir),
      expr(s"ts div ${6 * HourNs}"),
      expr("CAST(substr(props, 7, length(props) - 7) AS INT)"), 3L)

  private val oCooccur = s"""
    WITH b AS (
      SELECT DISTINCT epoch_ns(ts) // ${6 * HourNs} AS sess,
             CAST(substr(props, 7, length(props) - 7) AS INT) AS item
      FROM events),
    ns AS (SELECT CAST(count(DISTINCT sess) AS BIGINT) AS n_sess FROM b),
    marg AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY item),
    pairs AS (
      SELECT a.item AS item_a, b2.item AS item_b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM b a JOIN b b2 ON a.sess = b2.sess AND a.item < b2.item
      GROUP BY 1, 2 HAVING count(*) >= 3)
    SELECT item_a, item_b, n_ab, ma.n AS n_a, mb.n AS n_b,
           n_ab * (SELECT n_sess FROM ns) * 10000 // (ma.n * mb.n) AS lift_x10k,
           n_ab * 1000000 // (SELECT n_sess FROM ns) AS support_ppm
    FROM pairs
    JOIN marg ma ON ma.item = item_a
    JOIN marg mb ON mb.item = item_b"""

  /** §2.55b Weighted label-propagation communities (Raghavan et al. 2007
    * LPA, determinized): over the positively-associated co-occurrence
    * graph (edges = §2.68f pairs with lift ≥ 1, weight = n_ab), 4
    * synchronized rounds, each node adopting the label with the greatest
    * incident-weight sum (ties → smaller label). Unlike connected
    * components, LPA splits connected graphs along weight structure.
    * Fixed rounds + integer weights = the replayable-trainer discipline;
    * the oracle unrolls all 4 rounds as MATERIALIZED CTEs.
    */
  private val LpaRounds = 4

  /** The §2.55b LPA input graph (lift-filtered co-occurrence), shared by
    * q_lpa_communities and the §2.55h modularity audit.
    */
  private def lpaEdges(s: SparkSession, dir: String): DataFrame =
    Behavior.cooccurrence(Tables.events(s, dir),
        expr(s"ts div ${6 * HourNs}"),
        expr("CAST(substr(props, 7, length(props) - 7) AS INT)"), 3L)
      .where(col("lift_x10k") >= 10000L)
      .select(col("item_a").as("src"), col("item_b").as("dst"),
        col("n_ab").as("w"))

  // q_lpa_communities and the §2.55h modularity audit train the IDENTICAL
  // 4-round LPA labels over the identical edge graph — share one frozen
  // (edges, labels) pair per (session, corpus), the pipelineStages/
  // MvRegistry precedent (labelPropagation's rounds already end in a lazy
  // localCheckpoint, so the cached frames are materialization-stable).
  private val lpaLock = new Object
  private val lpaCache =
    scala.collection.mutable.Map[(SparkSession, String), (DataFrame, DataFrame)]()

  private def lpaShared(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    lpaLock.synchronized {
      lpaCache.getOrElseUpdate((s, dir), lpaBuild(s, dir))
    }

  // ALWAYS-fresh build + re-pin — the PairIndex build-lane convention
  // (r11 ADVICE): q_lpa_communities rebuilds the labels every call so the
  // propagation cost stays visible in the bench (its DuckDB oracle replays
  // the full 4-round LPA too — cached Spark numbers were one-sidedly
  // cheap), while q_modularity keeps reading the shared pinned frame.
  private def lpaRebuild(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    lpaLock.synchronized {
      val built = lpaBuild(s, dir)
      lpaCache((s, dir)) = built
      built
    }

  private def lpaBuild(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = lpaEdges(s, dir).localCheckpoint(false)
    val l = graft.operators.Graph.labelPropagation(
      e, graft.operators.Graph.ckptFor(s), LpaRounds,
      ckptEvery = graft.operators.Graph.roundCadence(s))
    (e, l)
  }

  private def qLpaCommunities(s: SparkSession, dir: String): DataFrame = {
    val labels = lpaRebuild(s, dir)._2
    val sizes = labels.groupBy(col("lab"))
      .agg(count(lit(1)).as("n_members"))
    labels.join(sizes, "lab")
      .select(col("id").as("item"), col("lab").as("community"),
        col("n_members"))
  }

  /** §2.55h Weighted modularity audit of the §2.55b communities (Newman
    * 2004): per community, intra-edge weight W_c, weighted degree mass
    * K_c, and the EXACT cross-multiplied contribution
    * num_c = 4W·W_c − K_c² — modularity Q = Σ num_c / (4W²) with zero
    * division inside the gate (the reader's one divide is the only
    * inexact step, outside the hashed output). The honest "did LPA find
    * structure" number: Q ≈ 0 means the partition is no better than the
    * configuration-model null. Shape: the label join back to edges is
    * id-keyed, degrees are one map-side-combined sum, communities-sized
    * rollups after.
    */
  private def qModularity(s: SparkSession, dir: String): DataFrame = {
    // shared frozen LPA (edges, labels) — see lpaShared
    val (edges, labels) = lpaShared(s, dir)
    val lb = labels.select(col("id"), col("lab"))
    val wTot = edges.agg(sum("w").as("w_tot"))
    val intra = edges
      .join(lb.toDF("id_a", "lab_a"), col("src") === col("id_a"))
      .join(lb.toDF("id_b", "lab_b"), col("dst") === col("id_b"))
      .where(col("lab_a") === col("lab_b"))
      .select(col("lab_a").as("community"), col("w"))
      .groupBy("community").agg(sum("w").as("w_in"))
    val deg = edges.select(col("src").as("id"), col("w"))
      .union(edges.select(col("dst").as("id"), col("w")))
      .groupBy("id").agg(sum("w").as("_dw"))
    val kc = lb.join(deg, "id")
      .groupBy(col("lab")).agg(sum("_dw").as("k_c"),
        count(lit(1)).as("n_members"))
      .select(col("lab").as("community"), col("k_c"), col("n_members"))
    kc.join(intra, Seq("community"), "left")
      .crossJoin(broadcast(wTot))
      .select(col("community"), col("n_members"),
        coalesce(col("w_in"), lit(0L)).as("w_in"), col("k_c"),
        (lit(4L) * col("w_tot") * coalesce(col("w_in"), lit(0L))
          - col("k_c") * col("k_c")).as("num_c"))
  }

  /** Shared CTE prefix for the LPA-based oracles: edge build + the
    * unrolled label-propagation rounds ending at l$LpaRounds.
    */
  private lazy val lpaOracleCtes: String = {
    val base = s"""
    WITH b AS MATERIALIZED (
      SELECT DISTINCT epoch_ns(ts) // ${6 * HourNs} AS sess,
             CAST(substr(props, 7, length(props) - 7) AS INT) AS item
      FROM events),
    ns AS (SELECT CAST(count(DISTINCT sess) AS BIGINT) AS n_sess FROM b),
    marg AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY item),
    ed AS MATERIALIZED (
      SELECT item_a AS u, item_b AS v, n_ab AS w FROM (
        SELECT a.item AS item_a, b2.item AS item_b,
               CAST(count(*) AS BIGINT) AS n_ab
        FROM b a JOIN b b2 ON a.sess = b2.sess AND a.item < b2.item
        GROUP BY 1, 2 HAVING count(*) >= 3) p
      JOIN marg ma ON ma.item = item_a
      JOIN marg mb ON mb.item = item_b
      WHERE n_ab * (SELECT n_sess FROM ns) * 10000 // (ma.n * mb.n) >= 10000),
    sym AS MATERIALIZED (
      SELECT u AS src, v AS dst, w FROM ed
      UNION ALL SELECT v AS src, u AS dst, w FROM ed),
    l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS lab FROM sym)"""
    val roundCtes = (1 to LpaRounds).map { r =>
      s"""
    v$r AS (SELECT s.dst AS n, l.lab, CAST(sum(s.w) AS BIGINT) AS sw
           FROM sym s JOIN l${r - 1} l ON l.id = s.src GROUP BY 1, 2),
    l$r AS MATERIALIZED (
      SELECT n AS id, lab FROM (
        SELECT n, lab,
               row_number() OVER (PARTITION BY n ORDER BY sw DESC, lab) AS rn
        FROM v$r) t WHERE rn = 1)"""
    }.mkString(",")
    base + "," + roundCtes
  }

  private lazy val oLpaCommunities: String = lpaOracleCtes + s"""
    SELECT l.id AS item, l.lab AS community,
           CAST(sz.n_members AS BIGINT) AS n_members
    FROM l$LpaRounds l
    JOIN (SELECT lab, count(*) AS n_members FROM l$LpaRounds GROUP BY lab) sz
      USING (lab)"""

  private lazy val oModularity: String = lpaOracleCtes + s""",
    wt AS (SELECT CAST(sum(w) AS BIGINT) AS w_tot FROM ed),
    intra AS (
      SELECT la.lab AS community, CAST(sum(e.w) AS BIGINT) AS w_in
      FROM ed e JOIN l$LpaRounds la ON la.id = e.u
                JOIN l$LpaRounds lb2 ON lb2.id = e.v
      WHERE la.lab = lb2.lab GROUP BY 1),
    dg AS (SELECT src AS id, CAST(sum(w) AS BIGINT) AS dw
           FROM sym GROUP BY src),
    kc AS (SELECT l.lab AS community, CAST(sum(d.dw) AS BIGINT) AS k_c,
                  CAST(count(*) AS BIGINT) AS n_members
           FROM l$LpaRounds l JOIN dg d ON d.id = l.id GROUP BY 1)
    SELECT kc.community, kc.n_members,
           CAST(coalesce(intra.w_in, 0) AS BIGINT) AS w_in, kc.k_c,
           4 * (SELECT w_tot FROM wt) * CAST(coalesce(intra.w_in, 0) AS BIGINT)
             - kc.k_c * kc.k_c AS num_c
    FROM kc LEFT JOIN intra USING (community)"""

  /** §2.3b TPC-H Q3 shape (shipping priority): segment-filtered customers
    * ⋈ date-bounded orders ⋈ post-date lineitems, revenue per order,
    * top-10 by (rounded revenue, orderkey) via sort+limit. Scale: both
    * selective filters reach their scans; customer side broadcasts after
    * the segment cut; the orders⋈lineitem equi-join is the one shuffle.
    */
  private def qShipPriority(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, dir)
        .where("o_orderdate < TIMESTAMP_NTZ'1998-01-01 00:00:00'"),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir)
        .where("l_shipdate > TIMESTAMP_NTZ'1998-01-01 00:00:00'"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_orderkey", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)

  private val oShipPriority = """
    SELECT l_orderkey, o_orderpriority,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  /** §2.3c TPC-H Q5 shape (local supplier volume): the 6-way join with
    * the c_nationkey = s_nationkey locality condition, revenue per
    * nation in one region-year. Scale: nation/region broadcast; the
    * locality predicate rides the supplier join; orders⋈lineitem is the
    * large shuffle, AQE-rebalanced.
    */
  private def qLocalVolume(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
        .where("o_orderdate >= TIMESTAMP_NTZ'1996-01-01 00:00:00' AND " +
               "o_orderdate < TIMESTAMP_NTZ'1998-01-01 00:00:00'"),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir).where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))

  private val oLocalVolume = """
    SELECT n_name,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name"""

  /** §2.3d TPC-H Q17 shape (small-quantity-order revenue): the correlated
    * scalar subquery `l_quantity < 0.2 * avg(l_quantity per part)`
    * DECORRELATED into a per-part aggregate joined back — the rewrite a
    * per-row subquery plan cannot survive at scale. Scale: the per-part
    * avg table is |part|-sized (broadcastable); lineitem is scanned twice
    * but shuffles once on l_partkey for the agg and joins broadcast-side
    * after. Cross-engine: the 20 %-of-average cut is the INTEGER
    * cross-multiply `5 * qty * cnt < sum_qty` (l_quantity is
    * integer-valued, so sum_qty is an exact integer in double — zero
    * float threshold surface; reference analog: report-framework scalar
    * rollups, report/report.go:224).
    */
  private def qTpchQ17(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val partAvg = li.groupBy(col("l_partkey").as("pa_partkey"))
      .agg(sum("l_quantity").cast("bigint").as("sum_qty"),
        count(lit(1)).as("cnt_qty"))
    li.join(broadcast(Tables.part(s, dir).where(col("p_brand") === "Brand#4")),
        col("l_partkey") === col("p_partkey"))
      .join(partAvg, col("l_partkey") === col("pa_partkey"))
      .where(col("l_quantity").cast("bigint") * lit(5L) * col("cnt_qty") < col("sum_qty"))
      .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  private val oTpchQ17 = """
    WITH pa AS (
      SELECT l_partkey AS pa_partkey,
             CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
             count(*) AS cnt_qty
      FROM lineitem GROUP BY 1)
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*) AS n_small
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN pa ON l_partkey = pa_partkey
    WHERE p_brand = 'Brand#4'
      AND CAST(l_quantity AS BIGINT) * 5 * cnt_qty < sum_qty"""

  /** §2.3e TPC-H Q22 shape (global-customer-relationship): customers whose
    * balance beats the positive-balance average but placed NO order in the
    * final half-year — scalar subquery + anti-join, grouped per nation.
    * Scale: the scalar threshold is one agg row broadcast into a
    * scan-stage filter; the anti-join shuffles on the customer key (or
    * bloom-routes past it — §2.61's lane). Cross-engine: balances are
    * 2-decimal, so the threshold is the exact integer-CENTS cross-multiply
    * `cents(bal) * cnt > sum_cents` — avg() never materializes, no float
    * fold crosses an engine boundary.
    */
  private def qTpchQ22(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .withColumn("bal_cents", round(col("c_acctbal") * 100).cast("bigint"))
    val thr = cust.where(col("c_acctbal") > 0)
      .agg(sum("bal_cents").as("sum_cents"), count(lit(1)).as("cnt_bal"))
    val recent = Tables.orders(s, dir)
      .where("o_orderdate >= TIMESTAMP_NTZ'1997-10-01 00:00:00'")
      .select("o_custkey")
    cust.crossJoin(broadcast(thr))
      .where(col("bal_cents") * col("cnt_bal") > col("sum_cents"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"),
        round(sum("bal_cents") / 100.0, 2).as("total_bal"))
  }

  private val oTpchQ22 = """
    WITH c AS (
      SELECT *, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer),
    thr AS (
      SELECT sum(bal_cents) AS sum_cents, count(*) AS cnt_bal
      FROM c WHERE c_acctbal > 0)
    SELECT c_nationkey, count(*) AS n_cust,
           round(sum(bal_cents) / 100.0, 2) AS total_bal
    FROM c, thr
    WHERE bal_cents * cnt_bal > sum_cents
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00')
    GROUP BY c_nationkey"""

  /** §2.3f TPC-H Q18 shape (large-volume customers): the HAVING-semi-join
    * — orders whose lineitem quantity sum beats a threshold, joined back
    * to orders + customer for the report columns. Scale: the lineitem agg
    * shuffles once on l_orderkey (map-side partials); the surviving
    * "big" set is a tiny fraction (≈1 % here) so AQE broadcasts it into
    * the orders join, and the orders⋈big result (same tiny cardinality)
    * broadcasts into the customer join — neither base table shuffles.
    * Cross-engine: l_quantity is integer-valued, so the sum is an exact
    * integer in double and the cut is an exact BIGINT compare (zero
    * float-threshold surface).
    */
  private val Q18Thresh = 250L

  private def qTpchQ18(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("bo_orderkey"))
      .agg(sum("l_quantity").cast("bigint").as("sum_qty"))
      .where(col("sum_qty") > Q18Thresh)
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("bo_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
        round(col("o_totalprice"), 2).as("total_price"), col("sum_qty"))
  }

  private val oTpchQ18 = s"""
    WITH big AS (
      SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY 1
      HAVING CAST(sum(l_quantity) AS BIGINT) > $Q18Thresh)
    SELECT o_orderkey, c_custkey, c_name,
           round(o_totalprice, 2) AS total_price, sum_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey"""

  /** §2.3g TPC-H Q4 shape (order-priority checking): orders with at least
    * one late-shipping lineitem (EXISTS → left-semi join on the order key
    * with a non-equi date-arithmetic residual), counted per priority.
    * Scale: both sides shuffle once on the order key; the semi join
    * short-circuits per order (no fan-out), and the final rollup is
    * priority-cardinality-sized with map-side partials. The date cut is
    * timestamp + literal interval on both engines — exact.
    */
  private def qTpchQ4(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    o.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 80 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  private val oTpchQ4 = """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 80 DAY)
    GROUP BY o_orderpriority"""

  /** §2.89 Suppliers-who-kept-orders-waiting (TPC-H Q21 shape — the
    * hardest-to-plan standard relational query: one EXISTS and one NOT
    * EXISTS against the SAME fact, both correlated on the order key with a
    * supplier-inequality residual): for finished orders, a supplier whose
    * line shipped late (> orderdate + 100 days, this schema's lateness —
    * it has no commit/receipt dates) is charged only when ANOTHER supplier
    * shares the order and NO other supplier was late — the sole-blame
    * rule. Top 25 suppliers by blame count, name from the broadcast dim.
    *
    * Scale shape: the late set is a selective order⋈lineitem join keyed on
    * the order key, then BOTH quantifiers run on that same key — a
    * left-semi against lineitem (other-supplier line exists) and a
    * left-anti against the late set itself (no other late supplier), so
    * every shuffle in the plan is order-keyed and can reuse one exchange;
    * no row fan-out happens at any step (semi/anti short-circuit). The
    * final rollup is supplier-cardinality-sized, the name join broadcasts
    * the dim, and top-25 is sort+limit → TakeOrderedAndProject, never a
    * global sort. Reference analog: fquery combinators compose the same
    * exists/not-exists tag filters (fgae/fquery.go) — this is that shape
    * at TPC-H scale.
    */
  private def qTpchQ21(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val late = li
      .join(Tables.orders(s, dir).where(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 100 DAYS"))
      .select(col("l_orderkey").as("okey"), col("l_suppkey").as("skey"))
      .distinct()
    val hasOther = late.join(li,
      col("okey") === li("l_orderkey") && col("skey") =!= li("l_suppkey"),
      "left_semi")
    val sole = hasOther.join(
      late.toDF("okey2", "skey2"),
      col("okey") === col("okey2") && col("skey") =!= col("skey2"),
      "left_anti")
    sole.groupBy(col("skey")).agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(s, dir)), col("skey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey").asc)
      .limit(25)
  }

  private val oTpchQ21 = """
    WITH late AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 100 DAY),
    sole AS (
      SELECT l1.l_orderkey, l1.l_suppkey
      FROM late l1
      WHERE EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM late l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey))
    SELECT s_suppkey, s_name, numwait
    FROM (SELECT l_suppkey, count(*) AS numwait FROM sole GROUP BY 1) c
    JOIN supplier ON s_suppkey = l_suppkey
    ORDER BY numwait DESC, s_suppkey LIMIT 25"""

  /** §2.10c Window-function suite: rank, dense_rank, ntile, lag/lead and
    * a running sum in ONE user-partitioned window pass — the breadth of
    * the SQL window surface on the deterministic (ts, event_id) order
    * (ntile/rank are integers; the running sum is rounded like every
    * parallel float fold).
    */
  private def qWindowSuite(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .where(col("user_id") < 30)
      .select(col("user_id"), col("event_id"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        ntile(4).over(w).as("quartile"),
        lag(col("event_id"), 1).over(w).as("prev_id"),
        lead(col("event_id"), 1).over(w).as("next_id"),
        round(sum(col("value")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("run_sum"))
  }

  private val oWindowSuite = """
    SELECT user_id, event_id,
           rank() OVER w AS rk,
           dense_rank() OVER w AS drk,
           ntile(4) OVER w AS quartile,
           lag(event_id) OVER w AS prev_id,
           lead(event_id) OVER w AS next_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 2) AS run_sum
    FROM events WHERE user_id < 30
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""

  /** §2.10d GROUPING SETS with grouping_id — the generalized rollup
    * surface (report metadata tables want arbitrary grouping combos, not
    * just the rollup chain). NULL markers coalesced so the compare is
    * null-free; grouping_id disambiguates genuinely-null-looking groups.
    */
  private def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("graft_events_gs")
    s.sql("""
      SELECT coalesce(event_type, 'ALL') AS event_type,
             coalesce(CAST(user_id % 7 AS STRING), 'ALL') AS cohort,
             CAST(grouping_id(event_type, user_id % 7) AS BIGINT) AS gid,
             count(*) AS n, round(sum(value), 2) AS value_sum
      FROM graft_events_gs
      GROUP BY GROUPING SETS ((event_type, user_id % 7), (event_type), (user_id % 7), ())""")
  }

  private val oGroupingSets = """
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(CAST(user_id % 7 AS VARCHAR), 'ALL') AS cohort,
           CAST(grouping(event_type) * 2 + grouping(user_id % 7) AS BIGINT) AS gid,
           count(*) AS n, round(sum(value), 2) AS value_sum
    FROM events
    GROUP BY GROUPING SETS ((event_type, user_id % 7), (event_type), (user_id % 7), ())"""

  /** §2.10e Key-skew diagnosis report — the planning input for every
    * salting / AQE-skew decision in this catalog: per candidate shuffle
    * key, row count, distinct count, Herfindahl concentration
    * (HHI = Σ share², the "how close to one hot key" scalar) and the top
    * key's share, all as EXACT scaled integers (`Σc²·10⁶ div n²`,
    * `max(c)·10⁶ div n` — one truncated division each; Σc²·10⁶ stays
    * under 2⁶³ through sf-scale row counts). Per key: one map-side-
    * combined count, one tiny rollup — the ANALYZE-style companion to
    * q_analyze_stats, aimed at join planning instead of NDV.
    */
  private def skewOf(df: DataFrame, name: String, k: Column): DataFrame =
    df.select(k.cast("string").as("_k"))
      .groupBy(col("_k")).agg(count(lit(1)).as("_c"))
      .agg(sum(col("_c")).as("_n"), count(lit(1)).as("n_distinct"),
        sum(col("_c") * col("_c")).as("_ss"), max(col("_c")).as("_mx"))
      .select(lit(name).as("col_name"), col("_n").as("n_rows"),
        col("n_distinct"),
        expr("_ss * 1000000L div (_n * _n)").as("hhi_ppm"),
        expr("_mx * 1000000L div _n").as("top_share_ppm"))

  private def qSkewReport(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    skewOf(ev, "user_id", col("user_id"))
      .unionByName(skewOf(ev, "event_type", col("event_type")))
      .unionByName(skewOf(ev, "props_k",
        expr("CAST(substr(props, 7, length(props) - 7) AS INT)")))
  }

  private val oSkewReport = """
    WITH prof AS (
      SELECT 'user_id' AS col_name, CAST(user_id AS VARCHAR) AS k FROM events
      UNION ALL
      SELECT 'event_type', event_type FROM events
      UNION ALL
      SELECT 'props_k',
             CAST(CAST(substr(props, 7, length(props) - 7) AS INT) AS VARCHAR)
      FROM events),
    c AS (SELECT col_name, k, CAST(count(*) AS BIGINT) AS c
          FROM prof GROUP BY 1, 2)
    SELECT col_name,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(c * c) AS BIGINT) * 1000000
             // (CAST(sum(c) AS BIGINT) * CAST(sum(c) AS BIGINT)) AS hhi_ppm,
           CAST(max(c) AS BIGINT) * 1000000 // CAST(sum(c) AS BIGINT)
             AS top_share_ppm
    FROM c GROUP BY col_name"""

  /** §2.68d Top session paths: the event-type sequence of each session
    * (deterministic (ts, event_id) order via sorted-fold collect) counted
    * and top-10'd — the "path/sankey" report over the sessionized stream.
    * Scale: path assembly is per-session (one user-keyed shuffle shared
    * with sessionization); the top-k is sort+limit (TakeOrderedAndProject),
    * never a global window.
    */
  private def qTopPaths(s: SparkSession, dir: String): DataFrame =
    TimeSeries.sessionize(Tables.events(s, dir), "user_id", "ts", "event_id",
        SessionGapNs)
      .groupBy("user_id", "session_id")
      .agg(array_join(expr(
        "transform(array_sort(collect_list(struct(ts, event_id, event_type)))," +
          " x -> x.event_type)"), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc).limit(10)

  private val oTopPaths = """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 21600000000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged),
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM sessions GROUP BY 1, 2),
    pc AS (SELECT path, count(*) AS n FROM paths GROUP BY path)
    SELECT path, n FROM pc ORDER BY n DESC, path LIMIT 10"""

  /** §2.68e Funnel conversion latency: over the completion frontier
    * (Behavior.funnelFrontiers' last stage), t_done − t_first per
    * converted user; p50/p90 as exact rank-selected order statistics
    * (the q_quantile_sample rule — completions are funnel-bounded, so
    * the global rank runs on a small set).
    */
  private def qFunnelLatency(s: SparkSession, dir: String): DataFrame = {
    val done = Behavior.funnelFrontiers(Tables.events(s, dir), "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"), 2 * 24 * HourNs).last
    val lat = done.select(col("u"), (col("t_prev") - col("t_first")).as("l"))
    // rank via the two-level globalRank composition, NOT a global window —
    // completions can be user-cardinality-sized at 100 TB and a
    // single-partition WindowExec sort is the q_vocab scale-killer class.
    // The count is the precedented driver scalar.
    val n = lat.count()
    val ranked = graft.operators.Text.globalRank(
      lat, Seq(col("l").asc, col("u").asc), "rk")
    val r50 = (n - 1) / 2 + 1
    val r90 = (n - 1) * 9 / 10 + 1
    ranked.agg(
        max(when(col("rk") === r50, col("l"))).as("p50_ns"),
        max(when(col("rk") === r90, col("l"))).as("p90_ns"))
      .select(lit(n).as("n_conv"), col("p50_ns"), col("p90_ns"))
  }

  private val oFunnelLatency = """
    WITH e AS (SELECT user_id AS u, epoch_ns(ts) AS t, event_type FROM events),
    s1 AS (SELECT u, min(t) AS t1 FROM e WHERE event_type = 'view' GROUP BY u),
    s2 AS (
      SELECT s1.u, s1.t1, min(e.t) AS t2
      FROM s1 JOIN e ON e.u = s1.u AND e.event_type = 'click'
        AND e.t > s1.t1 AND e.t - s1.t1 <= 172800000000000
      GROUP BY s1.u, s1.t1),
    s3 AS (
      SELECT s2.u, s2.t1, min(e.t) AS t3
      FROM s2 JOIN e ON e.u = s2.u AND e.event_type = 'purchase'
        AND e.t > s2.t2 AND e.t - s2.t1 <= 172800000000000
      GROUP BY s2.u, s2.t1),
    lat AS (SELECT u, t3 - t1 AS l FROM s3),
    r AS (SELECT u, l,
            row_number() OVER (ORDER BY l, u) AS rn,
            count(*) OVER () AS n
          FROM lat)
    SELECT CAST(max(n) AS BIGINT) AS n_conv,
           max(CASE WHEN rn = (n - 1) // 2 + 1 THEN l END) AS p50_ns,
           max(CASE WHEN rn = (n - 1) * 9 // 10 + 1 THEN l END) AS p90_ns
    FROM r"""

  // ---------------------------------------------------------------------------
  // TPC-H continuation shapes (r9): the remaining canonical plan shapes the
  // reference's report framework (report/report.go:224 rollup machinery)
  // would express as saved queries. Cross-engine money discipline: revenue
  // is floor(price * (1 - disc) * 100) integer CENTS per row — floor on the
  // identically-computed double is bit-identical in Spark and DuckDB, sums
  // of cents are exact BIGINTs, and every ratio is the one-rounding integer
  // cross-multiply (`a * 10000 div b`, Spark `div` ≡ DuckDB `//` truncation).
  // ---------------------------------------------------------------------------

  /** Per-row revenue in integer cents — the zero-float-surface money unit
    * shared by the r9 TPC-H shapes. MUST stay `floor(price * (1.0 - disc)
    * * 100.0)` with this exact operation order on both engines.
    */
  private def revCents: Column =
    floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0))
  private val oRevCents =
    "CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)"

  /** §2.3h TPC-H Q7 shape (volume shipping): two-sided geography-qualified
    * trade volume — supplier geography ⋈ customer geography, kept when the
    * pair crosses ASIA↔EUROPE in either direction, revenue by (supplier
    * nation, customer nation, ship year). Scale: both nation⋈region dims
    * broadcast (25 + 5 rows); lineitem⋈orders is the one large shuffle;
    * the disjunctive region pair predicate evaluates post-join on
    * broadcast-joined columns (no row explosion — each lineitem meets
    * exactly one supplier and one customer geography).
    */
  private def qVolumeShip(s: SparkSession, dir: String): DataFrame = {
    val nr = Tables.nation(s, dir)
      .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
    val suppGeo = broadcast(Tables.supplier(s, dir)
      .join(nr.select(col("n_nationkey").as("_snk"), col("n_name").as("supp_nation"),
        col("r_name").as("_sreg")), col("s_nationkey") === col("_snk"))
      .select(col("s_suppkey"), col("supp_nation"), col("_sreg")))
    val custGeo = broadcast(Tables.customer(s, dir)
      .join(nr.select(col("n_nationkey").as("_cnk"), col("n_name").as("cust_nation"),
        col("r_name").as("_creg")), col("c_nationkey") === col("_cnk"))
      .select(col("c_custkey"), col("cust_nation"), col("_creg")))
    Tables.lineitem(s, dir)
      .where("l_shipdate >= TIMESTAMP_NTZ'1996-01-01 00:00:00' AND " +
             "l_shipdate < TIMESTAMP_NTZ'1998-01-01 00:00:00'")
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(suppGeo, col("l_suppkey") === col("s_suppkey"))
      .join(custGeo, col("o_custkey") === col("c_custkey"))
      .where((col("_sreg") === "ASIA" && col("_creg") === "EUROPE") ||
             (col("_sreg") === "EUROPE" && col("_creg") === "ASIA"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(revCents).cast("long").as("rev_cents"),
        count(lit(1)).as("n_lines"))
  }

  private val oVolumeShip = s"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(sum($oRevCents) AS BIGINT) AS rev_cents,
           count(*) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN region sr ON sn.n_regionkey = sr.r_regionkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region cr ON cn.n_regionkey = cr.r_regionkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND ((sr.r_name = 'ASIA' AND cr.r_name = 'EUROPE') OR
           (sr.r_name = 'EUROPE' AND cr.r_name = 'ASIA'))
    GROUP BY 1, 2, 3"""

  /** §2.3i TPC-H Q8 shape (national market share): of all PROMO-part
    * revenue delivered to EUROPE-region customers, the share supplied by
    * one nation, per order year. The share is the one-rounding integer
    * cross-multiply over exact cent sums (basis points, truncated) — zero
    * float threshold surface. Scale: part/supplier-geo/customer-geo dims
    * all broadcast; the conditional numerator rides the same aggregate as
    * the denominator (one shuffle, map-side combined).
    */
  private def qMktShare(s: SparkSession, dir: String): DataFrame = {
    val nr = Tables.nation(s, dir)
      .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
    val suppGeo = broadcast(Tables.supplier(s, dir)
      .join(nr.select(col("n_nationkey").as("_snk"), col("n_name").as("_snat")),
        col("s_nationkey") === col("_snk"))
      .select(col("s_suppkey"), col("_snat")))
    val custEu = broadcast(Tables.customer(s, dir)
      .join(nr.select(col("n_nationkey").as("_cnk"), col("r_name").as("_creg")),
        col("c_nationkey") === col("_cnk"))
      .where(col("_creg") === "EUROPE")
      .select(col("c_custkey")))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).where(col("p_type") === "PROMO")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(custEu, col("o_custkey") === col("c_custkey"))
      .join(suppGeo, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("_snat") === "NATION_5", revCents).otherwise(lit(0L)))
          .cast("long").as("nation_cents"),
        sum(revCents).cast("long").as("total_cents"))
      .withColumn("share_bp",
        expr("nation_cents * 10000L div total_cents"))
  }

  private val oMktShare = s"""
    SELECT o_year, nation_cents, total_cents,
           nation_cents * 10000 // total_cents AS share_bp
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(sum(CASE WHEN sn.n_name = 'NATION_5'
                           THEN $oRevCents ELSE 0 END) AS BIGINT) AS nation_cents,
             CAST(sum($oRevCents) AS BIGINT) AS total_cents
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region cr ON cn.n_regionkey = cr.r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE p_type = 'PROMO' AND cr.r_name = 'EUROPE'
      GROUP BY 1)"""

  /** §2.3j TPC-H Q9 shape (product-type profit): name-pattern-filtered
    * parts, profit by supplier nation and order year. (The synthetic
    * schema has no partsupp, so profit = line revenue — the plan shape,
    * not the cost model, is what this gates.) Scale: the LIKE filter
    * prunes the part dim BEFORE broadcast; supplier-geo broadcasts;
    * lineitem⋈orders is the one shuffle.
    */
  private def qProfitNation(s: SparkSession, dir: String): DataFrame = {
    val suppGeo = broadcast(Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation")))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).where(col("p_name").like("%bolt%"))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(suppGeo, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(revCents).cast("long").as("profit_cents"),
        count(lit(1)).as("n_lines"))
  }

  private val oProfitNation = s"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum($oRevCents) AS BIGINT) AS profit_cents,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY 1, 2"""

  /** §2.3k TPC-H Q10 shape (returned-item reporting): top-20 customers by
    * revenue lost to returns in one half-year — the classic "who should
    * account management call" report. Rank key is the exact integer cent
    * sum (ties → custkey), so the top-20 cut is deterministic on both
    * engines. Scale: filter reaches both scans; TakeOrderedAndProject
    * caps the result exchange at 20 rows per partition.
    */
  private def qReturnedTop(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).where(col("l_returnflag") === "R")
      .join(Tables.orders(s, dir)
        .where("o_orderdate >= TIMESTAMP_NTZ'1996-01-01 00:00:00' AND " +
               "o_orderdate < TIMESTAMP_NTZ'1996-07-01 00:00:00'"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(sum(revCents).cast("long").as("lost_cents"))
      .orderBy(col("lost_cents").desc, col("c_custkey").asc)
      .limit(20)

  private val oReturnedTop = s"""
    SELECT c_custkey, c_name, c_acctbal, n_name,
           CAST(sum($oRevCents) AS BIGINT) AS lost_cents
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY 1, 2, 3, 4
    ORDER BY lost_cents DESC, c_custkey LIMIT 20"""

  /** §2.3l TPC-H Q13 shape (customer order-count distribution): LEFT join
    * customers to their non-urgent orders, per-customer order count
    * (zero-order customers KEPT — the left join is the point), then the
    * histogram of counts. Scale: one shuffle on custkey for the count,
    * one tiny shuffle on the count value; no dim needed.
    */
  private def qCustDist(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
        .where(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  private val oCustDist = """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
        AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    GROUP BY c_count"""

  /** §2.3m TPC-H Q14 shape (promotion effect): the share of one quarter's
    * revenue carried by PROMO-type parts, in truncated basis points over
    * exact cent sums (the Q8 integer-ratio discipline; Q14's
    * `100 * sum(case)/sum` is exactly this with one more digit). Scale:
    * part dim broadcasts; single aggregate row out.
    */
  private def qPromoShare(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where("l_shipdate >= TIMESTAMP_NTZ'1997-01-01 00:00:00' AND " +
             "l_shipdate < TIMESTAMP_NTZ'1997-04-01 00:00:00'")
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", revCents).otherwise(lit(0L)))
          .cast("long").as("promo_cents"),
        sum(revCents).cast("long").as("total_cents"))
      .withColumn("promo_bp", expr("promo_cents * 10000L div total_cents"))

  private val oPromoShare = s"""
    SELECT promo_cents, total_cents,
           promo_cents * 10000 // total_cents AS promo_bp
    FROM (
      SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                           THEN $oRevCents ELSE 0 END) AS BIGINT) AS promo_cents,
             CAST(sum($oRevCents) AS BIGINT) AS total_cents
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00')"""

  /** §2.3n TPC-H Q15 shape (top supplier): per-supplier revenue over one
    * half-year, then the supplier(s) achieving the maximum — the
    * scalar-subquery-against-a-view shape, decorrelated as a broadcast
    * 1-row max frame (ties all kept, per spec). Exact cent sums make the
    * max cut deterministic. Scale: the rev aggregate shuffles on suppkey
    * (|suppliers| rows out); the max is one broadcast row.
    */
  private def qTopSupplier(s: SparkSession, dir: String): DataFrame = {
    val revs = Tables.lineitem(s, dir)
      .where("l_shipdate >= TIMESTAMP_NTZ'1996-01-01 00:00:00' AND " +
             "l_shipdate < TIMESTAMP_NTZ'1996-07-01 00:00:00'")
      .groupBy(col("l_suppkey"))
      .agg(sum(revCents).cast("long").as("total_rev_cents"))
    revs
      .crossJoin(broadcast(revs.agg(max(col("total_rev_cents")).as("_mx"))))
      .where(col("total_rev_cents") === col("_mx"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev_cents"))
  }

  private val oTopSupplier = s"""
    WITH revs AS MATERIALIZED (
      SELECT l_suppkey, CAST(sum($oRevCents) AS BIGINT) AS total_rev_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_rev_cents
    FROM revs JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_rev_cents = (SELECT max(total_rev_cents) FROM revs)"""

  /** §2.3o TPC-H Q19 shape (discounted revenue, disjunctive predicate):
    * the OR-of-ANDs brand/size/quantity predicate — the canonical test
    * that a disjunction still reaches the scans (each disjunct's part
    * and lineitem halves prune their respective sides before the join).
    * Scale: part dim broadcasts after the brand-IN cut; single row out.
    */
  private def qDisjunctRev(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .where(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))),
        col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 35)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 50)))
      .agg(sum(revCents).cast("long").as("rev_cents"),
        count(lit(1)).as("n_lines"))

  private val oDisjunctRev = s"""
    SELECT CAST(sum($oRevCents) AS BIGINT) AS rev_cents,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 50)"""

  // ---------------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------------

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q_agg_pricing", qAggPricing, Some(oAggPricing), headline = true),
    GraftQuery("q_join_broadcast", qJoinBroadcast, Some(oJoinBroadcast)),
    GraftQuery("q_join_shuffle", qJoinShuffle, Some(oJoinShuffle), headline = true),
    GraftQuery("q_ship_priority", qShipPriority, Some(oShipPriority)),
    GraftQuery("q_local_volume", qLocalVolume, Some(oLocalVolume)),
    GraftQuery("q_small_qty_rev", qTpchQ17, Some(oTpchQ17)),
    GraftQuery("q_dormant_cust", qTpchQ22, Some(oTpchQ22)),
    GraftQuery("q_big_orders", qTpchQ18, Some(oTpchQ18)),
    GraftQuery("q_late_priority", qTpchQ4, Some(oTpchQ4)),
    GraftQuery("q_wait_chain", qTpchQ21, Some(oTpchQ21)),
    GraftQuery("q_volume_ship", qVolumeShip, Some(oVolumeShip)),
    GraftQuery("q_mkt_share", qMktShare, Some(oMktShare)),
    GraftQuery("q_profit_nation", qProfitNation, Some(oProfitNation)),
    GraftQuery("q_returned_top", qReturnedTop, Some(oReturnedTop)),
    GraftQuery("q_cust_dist", qCustDist, Some(oCustDist)),
    GraftQuery("q_promo_share", qPromoShare, Some(oPromoShare)),
    GraftQuery("q_top_supplier", qTopSupplier, Some(oTopSupplier)),
    GraftQuery("q_disjunct_rev", qDisjunctRev, Some(oDisjunctRev)),
    GraftQuery("q_topk_per_group", qTopkPerGroup, Some(oTopkPerGroup)),
    GraftQuery("q_range_filter", qRangeFilter, Some(oRangeFilter)),
    GraftQuery("q_time_bucket", qTimeBucket, Some(oTimeBucket)),
    GraftQuery("q_recent_n", qRecentN, Some(oRecentN)),
    GraftQuery("q_condense", qCondense, Some(oCondense)),
    GraftQuery("q_preferred_source", qPreferredSource, Some(oPreferredSource)),
    GraftQuery("q_anti_tags", qAntiTags, Some(oAntiTags)),
    GraftQuery("q_pivot_types", qPivotTypes, Some(oPivotTypes)),
    GraftQuery("q_rollup", qRollup, Some(oRollup)),
    GraftQuery("q_window_suite", qWindowSuite, Some(oWindowSuite)),
    GraftQuery("q_grouping_sets", qGroupingSets, Some(oGroupingSets)),
    GraftQuery("q_skew_report", qSkewReport, Some(oSkewReport)),
    GraftQuery("q_session_gap", qSessionGap, Some(oSessionGap), headline = true),
    GraftQuery("q_session_native", qSessionNative, Some(oSessionNative)),
    GraftQuery("q_session_stream", qSessionStream, Some(oSessionNative)),
    GraftQuery("q_track_stream", qTrackStream, Some(oTrackStream)),
    GraftQuery("q_scd2", qScd2, Some(oScd2)),
    GraftQuery("q_attribution", qAttribution, Some(oAttribution)),
    GraftQuery("q_kinematics", qKinematics, Some(oKinematics)),
    GraftQuery("q_cumdist", qCumdist, Some(oCumdist)),
    GraftQuery("q_sample_every", qSampleEvery, Some(oSampleEvery)),
    GraftQuery("q_windowed_avg", qWindowedAvg, Some(oWindowedAvg)),
    GraftQuery("q_trailing_24h", qTrailing24h, Some(oTrailing24h)),
    GraftQuery("q_asof_join", qAsofJoin, Some(oAsofJoin), headline = true),
    GraftQuery("q_asof_table", qAsofTable, Some(oAsofTable), headline = true),
    GraftQuery("q_asof_native", qAsofNative, Some(oAsofTable), headline = true),
    GraftQuery("q_indicated_alt", qIndicatedAlt, Some(oIndicatedAlt)),
    GraftQuery("q_interval_overlap", qIntervalOverlap, Some(oIntervalOverlap), headline = true),
    GraftQuery("q_level_flight", qLevelFlight, Some(oLevelFlight)),
    GraftQuery("q_sanity_filter", qSanityFilter, Some(oSanityFilter)),
    GraftQuery("q_salted_join", qSaltedJoin, Some(oSaltedJoin)),
    GraftQuery("q_salted_auto", qSaltedAuto, None, oracleGen = Some(oSaltedAutoGen)),
    GraftQuery("q_twophase_sum", qTwoPhaseSum, Some(oTwoPhaseSum)),
    GraftQuery("q_funnel", qFunnel, Some(oFunnel)),
    GraftQuery("q_funnel_stream", qFunnelStream, Some(oFunnel)),
    GraftQuery("q_stream_join", qStreamJoin, Some(oStreamJoin)),
    GraftQuery("q_retention", qRetention, Some(oRetention)),
    GraftQuery("q_transitions", qTransitions, Some(oTransitions)),
    GraftQuery("q_markov_stationary", qMarkovStationary,
      Some(oMarkovStationary)),
    GraftQuery("q_cooccur", qCooccur, Some(oCooccur)),
    GraftQuery("q_lpa_communities", qLpaCommunities, Some(oLpaCommunities)),
    GraftQuery("q_modularity", qModularity, Some(oModularity)),
    GraftQuery("q_top_paths", qTopPaths, Some(oTopPaths)),
    GraftQuery("q_funnel_latency", qFunnelLatency, Some(oFunnelLatency))
  ) ++ QueriesGeo.all ++ QueriesText.all ++ QueriesPipe.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap

  /** Static oracles plus the data-dependent generated ones — what Verify
    * dumps to oracle_sql.json. A generator that throws degrades that query
    * to the rows-only check instead of killing the dump. `only` restricts
    * which generators RUN (a generator may train a model — single-query
    * fast-iteration dumps must not pay for queries they filter out).
    */
  def oracleSqlFor(spark: SparkSession, dir: String,
                   only: Set[String] = Set.empty): Map[String, String] =
    all.filter(q => only.isEmpty || only(q.name)).flatMap { q =>
      q.oracle.orElse {
        try q.oracleGen.map(_(spark, dir))
        catch { case e: Throwable =>
          System.err.println(s"[oracle-gen] ${q.name} failed: ${e.getMessage}")
          None
        }
      }.map(o => q.name -> o.trim)
    }.toMap
}
