package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** §2.82b Streaming EWMA: the per-key integer recurrence replayed as
  * mapGroupsWithState must equal the batch sorted-fold (q_ewma) when
  * per-key arrival is in order — batch slicing must not matter, and
  * Update-mode rows expose the running value whose LAST emission per key is
  * the batch answer.
  */
class EwmaStreamSpec extends AnyFunSuite with SparkFixture {

  test("streamed EWMA equals the batch fold on the sf corpus, any slicing") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EwmaStream
    import graft.streaming.EwmaStream.Ev

    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(e => (e.tsNs, e.eventId)) // global ts order → per-key in order
    assert(events.length > 100)

    val input = MemoryStream[Ev]
    val q = EwmaStream.ewma(input.toDS())
      .toDF("user_id", "n_events", "ewma_cents")
      .writeStream.format("memory").queryName("stream_ewma")
      .outputMode(OutputMode.Update()).start()
    try {
      // three uneven slices — state must carry across micro-batches
      val (a, rest) = events.splitAt(events.length / 5)
      val (b, c) = rest.splitAt(rest.length / 2)
      input.addData(a.toSeq); q.processAllAvailable()
      input.addData(b.toSeq); q.processAllAvailable()
      input.addData(c.toSeq); q.processAllAvailable()
    } finally q.stop()

    // Update mode: the row with the max n_events per key is current state
    val streamed = spark.table("stream_ewma")
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("n_events").desc)))
      .where(col("_rn") === 1)
      .select("user_id", "n_events", "ewma_cents")
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap

    val batch = Queries.queries("q_ewma")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("ewma_cents")))).toMap
    assert(streamed == batch)
  }

  test("streamed CUSUM latches alarms and equals a sequential replay across slices") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EwmaStream
    import graft.streaming.EwmaStream.Ev

    val target = 100000L
    val rnd = new scala.util.Random(94)
    // key 0 stays on-target (noise), key 1 drifts up, key 2 drifts down
    val points = for (k <- 0L until 3L; i <- 0L until 60L) yield {
      val drift = k match {
        case 1L => 400L * i
        case 2L => -400L * i
        case _  => 0L
      }
      Ev(k, i, i, target + drift + rnd.nextInt(2000) - 1000L)
    }

    val input = MemoryStream[Ev]
    val q = EwmaStream.cusum(input.toDS(), target)
      .toDF("key", "n", "alarm_up", "alarm_dn", "max_sp", "max_sn")
      .writeStream.format("memory").queryName("stream_cusum")
      .outputMode(OutputMode.Update()).start()
    try {
      points.grouped(55).foreach { g =>
        input.addData(g.toSeq); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("stream_cusum")
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("key")
          .orderBy(col("n").desc)))
      .where(col("_rn") === 1)
      .select("key", "n", "alarm_up", "alarm_dn", "max_sp", "max_sn")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap

    // sequential Scala replay of the identical integer recurrence
    val slack = target / 100L; val h = target / 10L
    val want = points.groupBy(_.userId).map { case (k, evs) =>
      var (sp, sn, aup, adn, msp, msn, n) = (0L, 0L, 0L, 0L, 0L, 0L, 0L)
      evs.sortBy(e => (e.tsNs, e.eventId)).foreach { e =>
        sp = math.max(0L, sp + (e.cents - target - slack))
        sn = math.max(0L, sn + (target - slack - e.cents))
        if (aup == 0L && sp > h) aup = n + 1
        if (adn == 0L && sn > h) adn = n + 1
        msp = math.max(msp, sp); msn = math.max(msn, sn); n += 1
      }
      k -> ((k, n, aup, adn, msp, msn))
    }
    assert(streamed == want)
    // the drifting keys must actually alarm on their drift side only
    assert(want(1L)._3 > 0 && want(2L)._4 > 0)
    assert(want(0L)._3 == 0 || want(0L)._4 == 0)
  }

  test("streamed Holt-Winters equals the batch fold, state carried across slices") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EwmaStream
    import graft.streaming.EwmaStream.Ev
    import graft.operators.TimeSeries

    // synthetic per-key monthly-series points: key = series id, ts = step
    val rnd = new scala.util.Random(91)
    val points = for (k <- 0L until 6L; i <- 0L until 50L) yield
      Ev(k, i, i, 200000L + k * 1000L * i + rnd.nextInt(20000) - 10000L)

    val input = MemoryStream[Ev]
    val q = EwmaStream.holtWinters(input.toDS())
      .toDF("key", "n", "level", "trend")
      .writeStream.format("memory").queryName("stream_hw")
      .outputMode(OutputMode.Update()).start()
    try {
      points.grouped(70).foreach { g =>
        input.addData(g.toSeq); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("stream_hw")
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("key")
          .orderBy(col("n").desc)))
      .where(col("_rn") === 1)
      .select("key", "n", "level", "trend")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap

    val batch = points.toDF("key", "ts", "eid", "c")
      .groupBy("key")
      .agg(array_sort(collect_list(
        struct(col("ts"), col("eid"), col("c").as("_c")))).as("_ser"))
      .select(col("key"), TimeSeries.holtWintersFold("_ser").as("h"))
      .select(col("key"), col("h.n"), col("h.l"), col("h.b"))
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(streamed == batch)
  }
}
