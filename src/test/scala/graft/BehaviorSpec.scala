package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Behavior

/** Semantics of the event-behavior operators on hand-built histories where
  * the greedy-order and window edge cases are visible.
  */
class BehaviorSpec extends AnyFunSuite with SparkFixture {

  private def ev(rows: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    rows.toDF("user_id", "ts", "event_type")
      .withColumn("event_id", col("ts")) // tie-breaker
  }

  test("funnel: greedy order — a click BEFORE the first view does not count") {
    val e = ev(Seq(
      (1L, 100L, "click"),             // pre-view click: must not satisfy step 2
      (1L, 200L, "view"),
      (1L, 900L, "purchase"),          // purchase with no intervening click: no
      (2L, 100L, "view"),
      (2L, 150L, "click"),
      (2L, 180L, "purchase"),          // full chain
      (3L, 100L, "view"),
      (3L, 150L, "click")))            // stops at step 2
    val got = Behavior.funnel(e, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowNanos = 1000L)
      .orderBy("step_idx").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, "view", 3L), (2L, "click", 2L), (3L, "purchase", 1L)))
  }

  test("funnel: completion window measured from step 1, not the previous step") {
    val e = ev(Seq(
      (1L, 0L, "view"),
      (1L, 900L, "click"),
      (1L, 1500L, "purchase")))        // 600 after click but 1500 > window from view
    val got = Behavior.funnel(e, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowNanos = 1000L)
      .orderBy("step_idx").collect().map(_.getLong(2))
    assert(got.toSeq == Seq(1L, 1L, 0L))
  }

  test("retention: offsets clip to [0, max] and count distinct users per cell") {
    val day = 86400L * 1000000000L
    val e = ev(Seq(
      (1L, 0 * day + 5L, "signup"),
      (1L, 0 * day + 9L, "view"),      // same-day activity → offset 0 once
      (1L, 2 * day + 1L, "view"),      // offset 2
      (2L, 0 * day + 7L, "signup"),
      (2L, 2 * day + 3L, "click"),     // offset 2 (second user, same cell)
      (3L, 1 * day + 1L, "view"),      // active BEFORE signup: offset < 0 dropped
      (3L, 2 * day + 1L, "signup")))
    val got = Behavior.retention(e, "user_id", "ts", "event_type", "signup", 30)
      .orderBy("cohort_day", "day_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 0L, 2L), (0L, 2L, 2L), (2L, 0L, 1L)))
  }

  test("madCuts: exact order-statistic median and MAD on known data") {
    import spark.implicits._
    import graft.operators.Robust
    // values 1..9 in group a: median = 5 (rank (9-1) div 2 + 1 = 5);
    // |x-5| = {4,3,2,1,0,1,2,3,4} sorted -> rank 5 = 2
    val df = (1 to 9).map(i => ("a", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val got = Robust.madCuts(df, "g", "v", "id")
      .select("med", "mad").collect().head
    assert(got.getDouble(0) == 5.0 && got.getDouble(1) == 2.0)
  }

  test("madCuts: a single wild outlier cannot drag the cut") {
    import spark.implicits._
    import graft.operators.Robust
    val clean = (1 to 20).map(i => ("a", i.toDouble, i.toLong))
    val dirty = clean :+ (("a", 1.0e12, 99L))
    val c1 = Robust.madCuts(clean.toDF("g", "v", "id"), "g", "v", "id")
      .select("med", "mad").collect().head
    val c2 = Robust.madCuts(dirty.toDF("g", "v", "id"), "g", "v", "id")
      .select("med", "mad").collect().head
    // mean/stddev would explode; median moves by at most one rank, MAD by one
    assert(math.abs(c2.getDouble(0) - c1.getDouble(0)) <= 1.0)
    assert(math.abs(c2.getDouble(1) - c1.getDouble(1)) <= 1.0)
  }

  test("cooccurrence: exact integer support/lift over deduped baskets") {
    import spark.implicits._
    // 4 sessions; items dedup within a session (s1 has item 1 twice)
    val rows = Seq(
      (1L, 1), (1L, 1), (1L, 2),        // basket {1,2}
      (2L, 1), (2L, 2), (2L, 3),        // basket {1,2,3}
      (3L, 1), (3L, 3),                 // basket {1,3}
      (4L, 4)                           // singleton
    ).toDF("sess", "item")
    val got = Behavior.cooccurrence(rows, col("sess"), col("item"), 1L)
      .orderBy("item_a", "item_b")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(5), r.getLong(6)))
    // n_sess=4; n(1)=3 n(2)=2 n(3)=2; (1,2): n_ab=2 lift=2*4*10000/6=13333
    // (1,3): 2*4*10000/6=13333; (2,3): 1*4*10000/4=10000
    assert(got.toSeq == Seq(
      (1, 2, 2L, 13333L, 500000L),
      (1, 3, 2L, 13333L, 500000L),
      (2, 3, 1L, 10000L, 250000L)))
  }

  test("cooccurrence == naive reference on random baskets") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val rows = (0 until 500).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(12)))
    val got = Behavior.cooccurrence(rows.toDF("sess", "item").repartition(7),
        col("sess"), col("item"), 2L)
      .as[(Int, Int, Long, Long, Long, Long, Long)].collect().toSet
    val baskets = rows.distinct
    val nSess = baskets.map(_._1).distinct.size.toLong
    val marg = baskets.groupBy(_._2).map { case (i, xs) => i -> xs.size.toLong }
    val want = baskets.flatMap { a =>
      baskets.filter(b => b._1 == a._1 && a._2 < b._2).map(b => (a._2, b._2))
    }.groupBy(identity).map { case ((i, j), ps) => (i, j, ps.size.toLong) }
      .filter(_._3 >= 2L)
      .map { case (i, j, nab) =>
        (i, j, nab, marg(i), marg(j),
          nab * nSess * 10000L / (marg(i) * marg(j)), nab * 1000000L / nSess)
      }.toSet
    assert(got == want, s"missing=${(want -- got).take(2)} extra=${(got -- want).take(2)}")
    assert(want.nonEmpty)
  }

  test("transitions: per-user (ts, tie)-ordered lead edges") {
    val e = ev(Seq(
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "view"),
      (2L, 100L, "view"), (2L, 200L, "click")))
    val got = Behavior.transitions(e, "user_id", "ts", "event_id", "event_type")
      .orderBy("src_type", "dst_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("click", "view", 1L), ("view", "click", 2L)))
  }
}
