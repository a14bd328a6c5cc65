package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MvRegistry
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

/** §2.86b Streaming MV maintenance: a foreachBatch ingest loop appends each
  * micro-batch to the fact table AND merges its [[MvRegistry.buildSummary]]
  * partials into a new summary version (`mergeSummaries` — every partial is
  * a semilattice element, so maintenance cost is summary-sized, the fact
  * table is never re-read). After the stream drains, the latest summary
  * version serves aggregates over the full fact table through the
  * MvRewriteRule, and the served numbers equal a direct recompute.
  */
class MvStreamSpec extends AnyFunSuite with SparkFixture with BeforeAndAfterEach {

  override def afterEach(): Unit = MvRegistry.clear()

  private val group = Seq("l_returnflag", "l_linestatus")
  private val measures = Seq("l_quantity")

  test("foreachBatch keeps the MV fresh; every version serves exactly") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mv_stream").toString
    val factDir = s"$root/fact"

    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"))
      .collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[String]("l_returnflag"),
        r.getAs[String]("l_linestatus"), r.getAs[Double]("l_quantity")))
    assert(rows.length > 100)
    val (seed, streamed) = rows.partition(_._1 % 3 == 0)

    // batch 0: seed the fact table + summary v0
    seed.toSeq.toDF("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity")
      .write.mode("overwrite").parquet(factDir)
    MvRegistry.buildSummary(spark.read.parquet(factDir), group, measures)
      .write.mode("overwrite").parquet(s"$root/summary_v0")
    var version = 0

    // stream the remainder in two micro-batches; each batch appends to the
    // fact table and rolls the summary forward WITHOUT re-reading the fact
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Double)]
    val q = input.toDF()
      .toDF("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.localCheckpoint()
        b.write.mode("append").parquet(factDir)
        val merged = MvRegistry.mergeSummaries(
          spark.read.parquet(s"$root/summary_v$version"),
          MvRegistry.buildSummary(b, group, measures), group, measures)
        merged.write.mode("overwrite").parquet(s"$root/summary_v${version + 1}")
        version += 1
      }
      .start()
    val (b1, b2) = streamed.splitAt(streamed.length / 2)
    input.addData(b1.toSeq); q.processAllAvailable()
    input.addData(b2.toSeq); q.processAllAvailable()
    q.stop()
    assert(version == 2)

    // the latest summary serves the full fact table through the rewrite
    val fact = spark.read.parquet(factDir)
    MvRegistry.register(fact, group, measures,
      spark.read.parquet(s"$root/summary_v$version"))
    val served = fact.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"),
        min("l_quantity").as("lo"), max("l_quantity").as("hi"))
    served.count()
    val leaves = (served.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).collectLeaves().mkString("\n")
    assert(leaves.contains(s"summary_v$version"), s"not served from MV:\n$leaves")
    assert(!leaves.contains("fact"), s"fact still scanned:\n$leaves")

    val got = served.collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    MvRegistry.clear()
    val want = spark.read.parquet(factDir).groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"),
        min("l_quantity").as("lo"), max("l_quantity").as("hi"))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == want)
    // nothing was lost across the batches
    assert(got.values.map(_._2).sum == rows.length)
  }
}
