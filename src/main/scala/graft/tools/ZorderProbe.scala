package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Measures what Z-order layout buys at the storage layer: write the same
  * (replicated) events table twice — clustered by time vs clustered by the
  * Morton key of (user bucket, day bucket) — then count, from parquet
  * FOOTER stats only, how many row groups a 2-D box predicate must read
  * under each layout. This is exactly the pruning a 100 TB scan does
  * (row-group min/max skipping); no data pages are touched by the probe.
  *
  * MEASURED (factor=100, 1M rows, ~370 row groups of 64 KB, 17×17 box
  * in a 256×256 space): time layout must read 25/370 groups (6.8% — its
  * floor is the y-selectivity; x never prunes), Z layout 8/371 (2.2%).
  * The gap widens as groups shrink relative to the space: a group of G
  * consecutive Morton keys is a ~√G×√G tile, so Z reads
  * ~((bx+√G)(by+√G))/G groups vs time's ~by/extent·total — at
  * production scale (10⁶+ groups, wider key spaces) the ratio is
  * orders of magnitude, which is why every lakehouse format ships this.
  * Usage: `sbt "runMain graft.tools.ZorderProbe [factor]"` (default 50).
  */
object ZorderProbe {

  private val Day = 86400000000000L

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .appName("zorder-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Replicate events with user-id rotation so the user dimension stays
    // uniformly occupied as the table grows (the ScaleProbe discipline).
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("user_id"), col("ts"))
    val reps = spark.range(factor).select(col("id").as("rep"))
    val big = ev.crossJoin(reps)
      .select(pmod(col("user_id") + col("rep") * 37L, lit(256L)).as("xq"),
        pmod(expr(s"ts div $Day") + col("rep") * 13L, lit(256L)).as("yq"))
      .withColumn("zkey", Layout.zorder(Seq(col("xq"), col("yq")), 8))

    val base = "/tmp/zorder_probe"
    val timePath = s"$base/by_time"
    val zPath = s"$base/by_z"

    // Small row groups so group counts, not file counts, are the metric.
    def write(df: DataFrame, sortCol: String, path: String): Unit =
      df.repartitionByRange(8, col(sortCol)).sortWithinPartitions(sortCol)
        .write.mode("overwrite")
        .option("parquet.block.size", (64 * 1024).toString)
        .parquet(path)

    write(big, "yq", timePath) // time-style layout: clustered by day only
    write(big, "zkey", zPath)

    // 2-D box predicate (17×17 of 256×256).
    val (xLo, xHi, yLo, yHi) = (40L, 56L, 96L, 112L)

    def overlapping(path: String): (Int, Int) = {
      import scala.jdk.CollectionConverters._
      val conf = new Configuration()
      val fs = new Path(path).getFileSystem(conf)
      val files = fs.listStatus(new Path(path)).map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
      var total = 0; var hit = 0
      for (p <- files) {
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
        try {
          for (b <- reader.getFooter.getBlocks.asScala) {
            total += 1
            def range(name: String): (Long, Long) = {
              val c = b.getColumns.asScala
                .find(_.getPath.toDotString == name)
                .getOrElse(sys.error(s"no column $name in $p"))
              val st = c.getStatistics
              (st.genericGetMin.asInstanceOf[Number].longValue(),
               st.genericGetMax.asInstanceOf[Number].longValue())
            }
            val (xmn, xmx) = range("xq")
            val (ymn, ymx) = range("yq")
            if (xmx >= xLo && xmn <= xHi && ymx >= yLo && ymn <= yHi) hit += 1
          }
        } finally reader.close()
      }
      (total, hit)
    }

    val (tTotal, tHit) = overlapping(timePath)
    val (zTotal, zHit) = overlapping(zPath)
    val nRows = big.count()
    println(f"rows=$nRows factor=$factor box: xq[$xLo,$xHi] yq[$yLo,$yHi]")
    println(f"time-layout row groups: $tHit/$tTotal must be read (${100.0 * tHit / tTotal}%.1f%%)")
    println(f"zorder-layout row groups: $zHit/$zTotal must be read (${100.0 * zHit / zTotal}%.1f%%)")
    spark.stop()
  }
}
