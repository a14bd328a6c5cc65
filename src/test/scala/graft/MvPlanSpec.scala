package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MvRegistry
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

/** MvRewriteRule: the rewrite must (a) actually serve matching aggregates
  * from the summary scan, (b) preserve results exactly, (c) refuse every
  * disqualifying shape (filters, non-decomposable aggregates, distinct,
  * unregistered measures, unknown grouping columns).
  */
class MvPlanSpec extends AnyFunSuite with SparkFixture with BeforeAndAfterEach {

  override def afterEach(): Unit = MvRegistry.clear()

  private val group = Seq("l_returnflag", "l_linestatus", "l_shipdate")

  /** Register a summary for lineitem(l_quantity) and return the fact df. */
  private def registered(): (DataFrame, String) = {
    val fact = Tables.lineitem(spark, sfDir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_mv_spec").toString
    MvRegistry.buildSummary(fact, group, Seq("l_quantity"))
      .write.mode("overwrite").parquet(tmp)
    MvRegistry.register(fact, group, Seq("l_quantity"), spark.read.parquet(tmp))
    (fact, tmp)
  }

  /** Scan paths in the AQE-finalized executed plan (materializes df). */
  private def scanPaths(df: DataFrame): String = {
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectLeaves().mkString("\n")
  }

  test("matching rollup is served from the summary scan, results exact") {
    val (fact, tmp) = registered()
    val q = fact.groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n_items"),
        min("l_quantity").as("min_qty"),
        max("l_quantity").as("max_qty"))
    val leaves = scanPaths(q)
    assert(leaves.contains("graft_mv_spec"), s"summary not scanned:\n$leaves")
    assert(!leaves.contains("lineitem.parquet"), "base table still scanned")

    // ground truth with the registry EMPTY (rule active but no-op)
    MvRegistry.clear()
    val base = Tables.lineitem(spark, sfDir).groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n_items"),
        min("l_quantity").as("min_qty"),
        max("l_quantity").as("max_qty"))
    assert(scanPaths(base).contains("lineitem.parquet"))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getString(1))
    val got = q.collect().map(r => key(r) -> (r.getDouble(2), r.getLong(3),
      r.getDouble(4), r.getDouble(5))).toMap
    val want = base.collect().map(r => key(r) -> (r.getDouble(2), r.getLong(3),
      r.getDouble(4), r.getDouble(5))).toMap
    assert(got == want)
    assert(got.nonEmpty)
    val _ = tmp
  }

  test("full-key grouping and single-key grouping both rewrite") {
    val (fact, _) = registered()
    val full = fact.groupBy(group.head, group.tail: _*)
      .agg(sum("l_quantity").as("s"))
    assert(scanPaths(full).contains("graft_mv_spec"))
    val one = fact.groupBy("l_shipdate").agg(count(lit(1)).as("n"))
    assert(scanPaths(one).contains("graft_mv_spec"))
    // global aggregate (empty grouping set) rolls up too
    val global = fact.agg(count(lit(1)).as("n"), max("l_quantity").as("mx"))
    assert(scanPaths(global).contains("graft_mv_spec"))
    assert(global.collect().head.getLong(0) ==
      Tables.lineitem(spark, sfDir).count())
  }

  test("group-granular filters rewrite onto the summary and stay exact") {
    val (fact, _) = registered()
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag")
        .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
    // predicate on a grouping column commutes with the rollup
    val cut = java.sql.Timestamp.valueOf("1995-06-01 00:00:00")
    val q = agg(fact.where(col("l_shipdate") >= cut &&
      col("l_linestatus") === "F"))
    assert(scanPaths(q).contains("graft_mv_spec"))
    val got = q.collect().map(r => r.getString(0) ->
      ((r.getDouble(1), r.getLong(2)))).toMap
    MvRegistry.clear()
    val want = agg(Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= cut && col("l_linestatus") === "F"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("disqualifying shapes read the base table") {
    val (fact, _) = registered()
    // a filter touching a NON-grouping column disqualifies
    val filtered = fact.where(col("l_quantity") > 10)
      .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
    assert(scanPaths(filtered).contains("lineitem.parquet"))
    // an aggregate over an unregistered measure
    val otherMeasure = fact.groupBy("l_returnflag")
      .agg(sum("l_extendedprice").as("s"))
    assert(scanPaths(otherMeasure).contains("lineitem.parquet"))
    // a non-decomposable aggregate
    val avg_ = fact.groupBy("l_returnflag").agg(avg("l_quantity").as("a"))
    assert(scanPaths(avg_).contains("lineitem.parquet"))
    // distinct
    val dist = fact.groupBy("l_returnflag")
      .agg(countDistinct("l_linestatus").as("d"))
    assert(scanPaths(dist).contains("lineitem.parquet"))
    // grouping on a column outside the summary keys
    val badGroup = fact.groupBy("l_partkey").agg(count(lit(1)).as("n"))
    assert(scanPaths(badGroup).contains("lineitem.parquet"))
    // a DIFFERENT lineitem handle (separate read) is not the registered one
    val otherHandle = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
    assert(scanPaths(otherHandle).contains("lineitem.parquet"))
  }

  test("randomized shapes: every served aggregate equals the base answer") {
    val (fact, _) = registered()
    val rnd = new scala.util.Random(20260814L)
    val aggPool: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "s" -> sum("l_quantity").as("s"),
      "n" -> count(lit(1)).as("n"),
      "lo" -> min("l_quantity").as("lo"),
      "hi" -> max("l_quantity").as("hi"),
      "r" -> round(sum("l_quantity") / 100.0, 3).as("r"),
      "c2" -> (count(lit(1)) * 2).as("c2"))
    val cut = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
    val filterPool: Seq[org.apache.spark.sql.Column] = Seq(
      lit(true), col("l_returnflag") =!= "R", col("l_shipdate") < cut,
      col("l_linestatus") === "O" || col("l_returnflag") === "A")
    for (i <- 1 to 15) {
      val keys = rnd.shuffle(group).take(rnd.nextInt(group.size + 1))
      val aggs = rnd.shuffle(aggPool).take(1 + rnd.nextInt(aggPool.size))
      val f = filterPool(rnd.nextInt(filterPool.size))
      def run(df: org.apache.spark.sql.DataFrame) = {
        val filtered = df.where(f)
        val g = if (keys.isEmpty) filtered.groupBy()
                else filtered.groupBy(keys.map(col): _*)
        g.agg(aggs.head._2, aggs.tail.map(_._2): _*)
          .collect()
          .map(r => keys.map(k => r.getAs[Any](k)).mkString("|") ->
            aggs.map(a => r.getAs[Any](a._1)).toList).toMap
      }
      val served = run(fact)
      assert(scanPaths(fact.where(f).groupBy(keys.map(col): _*)
        .agg(aggs.head._2, aggs.tail.map(_._2): _*)).contains("graft_mv_spec"),
        s"shape $i (keys=$keys) not served from the MV")
      // a FRESH handle is instance-keyed out of the registry → base plan
      val base = run(Tables.lineitem(spark, sfDir))
      assert(served == base, s"shape $i: keys=$keys aggs=${aggs.map(_._1)}")
    }
  }

  test("join-MV serves the star rollup; wrong shapes fall through") {
    val fact = Tables.lineitem(spark, sfDir)
    val dim = Tables.supplier(spark, sfDir)
    val g = Seq("s_nationkey", "l_returnflag")
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvj_spec").toString
    MvRegistry.buildJoinSummary(fact, dim, "l_suppkey", "s_suppkey",
        g, Seq("l_quantity"))
      .write.mode("overwrite").parquet(tmp)
    MvRegistry.registerJoin(fact, dim, "l_suppkey", "s_suppkey",
      g, Seq("l_quantity"), spark.read.parquet(tmp))

    def joined = fact.join(dim, fact("l_suppkey") === dim("s_suppkey"))
    val q = joined.groupBy("s_nationkey")
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
    val leaves = scanPaths(q)
    assert(leaves.contains("graft_mvj_spec"), s"join-MV not serving:\n$leaves")
    assert(!leaves.contains("lineitem.parquet") &&
      !leaves.contains("supplier.parquet"), "base tables still scanned")
    // exactness vs fresh (unregistered) handles
    val f2 = Tables.lineitem(spark, sfDir); val d2 = Tables.supplier(spark, sfDir)
    val want = f2.join(d2, f2("l_suppkey") === d2("s_suppkey"))
      .groupBy("s_nationkey").agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val got = q.collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got == want && got.nonEmpty)

    // a group-granular filter on the DIM side still serves
    val filt = joined.where(col("s_nationkey") < 10)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(scanPaths(filt).contains("graft_mvj_spec"))

    // the join MV must NOT serve a plain fact aggregate (joined counts)
    val plain = fact.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(scanPaths(plain).contains("lineitem.parquet"))
    // a join on the WRONG key falls through
    val wrong = fact.join(dim, fact("l_orderkey") === dim("s_suppkey"))
      .groupBy("s_nationkey").agg(count(lit(1)).as("n"))
    assert(scanPaths(wrong).contains("lineitem.parquet"))
    // a filter on a non-grouping fact column falls through
    val badFilter = joined.where(col("l_quantity") > 10)
      .groupBy("s_nationkey").agg(count(lit(1)).as("n"))
    assert(scanPaths(badFilter).contains("lineitem.parquet"))
  }

  test("count served from an MV equals the base count on every group") {
    val (fact, _) = registered()
    val got = fact.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    MvRegistry.clear()
    val want = Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
