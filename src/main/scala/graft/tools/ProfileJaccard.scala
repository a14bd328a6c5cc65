package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Text

/** Scratch profiler for the PPJoin stages (not part of the catalog):
  * runs the catalog query once end-to-end with a stage listener so the
  * per-stage wall/task breakdown is visible without the UI.
  */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        val cpu = si.taskMetrics.executorRunTime / 1000.0
        val rddChain = si.rddInfos.map(r => s"${r.id}:${r.name}").mkString(" <- ")
        println(f"STAGE ${si.stageId}%3d wall=$wall%7.3f taskSum=$cpu%8.3f n=${si.numTasks}%3d  ${rddChain.take(220)}")
      }
    })
    val q = args.headOption.getOrElse("q_doc_ngram_jaccard")
    val t0 = System.nanoTime()
    val qdf = graft.Queries.queries(q)(spark, sfDir)
    val n = qdf.count()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
    if (args.length > 1)
      println(qdf.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    Thread.sleep(500)
    spark.stop()
  }
}
