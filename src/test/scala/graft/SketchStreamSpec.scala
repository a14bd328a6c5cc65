package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** §2.63c Streaming Misra-Gries heavy hitters: bounded per-key counter
  * state advanced as tokens arrive must equal the batch sequential fold
  * over the same ordered tokens — micro-batch slicing must not matter —
  * and the classic MG guarantee (every token with true frequency
  * > n/(k+1) survives; counts under-report by ≤ n/(k+1)) must hold
  * against exact truth.
  */
class SketchStreamSpec extends AnyFunSuite with SparkFixture {

  test("streamed MG equals the batch fold on any slicing; MG guarantee holds") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.SketchStream
    import graft.streaming.SketchStream.Tok

    val k = 8
    // event_type stream per user-bucket key: skewed enough that some
    // tokens clear the n/(k+1) bar
    val toks = Tables.events(spark, sfDir)
      .select((col("user_id") % 4).cast("string").as("key"), col("ts"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => Tok(r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t.tsNs, t.eventId))
    assert(toks.length > 500)

    val input = MemoryStream[Tok]
    val q = SketchStream.heavyHitters(input.toDS(), k)
      .toDF("key", "n_seen", "token", "count")
      .writeStream.format("memory").queryName("stream_mg")
      .outputMode(OutputMode.Update()).start()
    try {
      val (a, rest) = toks.splitAt(toks.length / 3)
      val (b, c) = rest.splitAt(rest.length / 4)
      input.addData(a.toSeq); q.processAllAvailable()
      input.addData(b.toSeq); q.processAllAvailable()
      input.addData(c.toSeq); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("stream_mg")
      .withColumn("_rn", dense_rank().over(
        org.apache.spark.sql.expressions.Window.partitionBy("key")
          .orderBy(col("n_seen").desc)))
      .where(col("_rn") === 1)
      .select("key", "token", "count")
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap

    for ((key, grp) <- toks.groupBy(_.key)) {
      val fold = SketchStream.misraGriesFold(grp.map(_.token).toSeq, k)
      assert(streamed.getOrElse(key, Map.empty) == fold.counters,
        s"key $key: stream state != batch fold")
      // MG guarantee vs exact truth
      val n = grp.length.toLong
      val truth = grp.groupBy(_.token).view.mapValues(_.length.toLong).toMap
      for ((t, c) <- truth if c > n / (k + 1))
        assert(fold.counters.contains(t), s"frequent '$t' ($c of $n) missing")
      for ((t, c) <- fold.counters)
        assert(c <= truth(t) && truth(t) - c <= n / (k + 1),
          s"'$t' reported $c vs true ${truth(t)} (n=$n)")
    }
  }

  test("streamed bottom-k quantile sketch == batch aggregate under SHUFFLED arrival") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.SketchStream
    import graft.streaming.SketchStream.QTok
    import graft.operators.{Sampling, Sketch}

    val k = 32
    val base = Tables.events(spark, sfDir)
      .select((col("user_id") % 4).cast("string").as("key"),
        Sampling.sampleHash(col("event_id").cast("string"), "qsk").as("h"),
        col("value"))
    val rows = base.as[(String, Long, Double)].collect()
      .map { case (key, h, v) => QTok(key, h, v) }
    assert(rows.length > 500)
    // fully shuffled arrival: the set-union/bottom-k state is commutative
    // and idempotent, so order CANNOT matter — assert it, don't assume it
    val shuffled = new scala.util.Random(7).shuffle(rows.toSeq)

    val input = MemoryStream[QTok]
    val q = SketchStream.quantileSketch(input.toDS(), k)
      .toDF("key", "n_seen", "n_sketch", "p50")
      .writeStream.format("memory").queryName("stream_qsk")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    try {
      val (a, rest) = shuffled.splitAt(shuffled.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
      input.addData(c); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("stream_qsk")
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("key")
          .orderBy(col("n_seen").desc)))
      .where(col("_rn") === 1)
      .select("key", "n_sketch", "p50")
      .as[(String, Int, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap

    // batch truth: the NATIVE aggregate + the batch rank-selection rule
    val batch = base.groupBy("key")
      .agg(Sketch.quantileSketch(col("h"), col("value"), k).as("sk"))
      .select(col("key"), size(col("sk")).as("n_sketch"),
        Sketch.sketchQuantile("sk", 1, 2).as("p50"))
      .as[(String, Int, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(streamed == batch)
  }
}
