package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reducer-spread probe for the salted-join lane (q_salted_join): on a
  * hot-key shuffle, how evenly do rows land across reduce partitions with
  * and without the salt in the key?
  *
  * Construction: `n` rows where 90% carry ONE key (the hot airframe/user
  * at 100 TB) and the rest spread over 1000 keys. Each lane
  * `repartition`s by its shuffle key — exactly the exchange a sort-merge
  * join would perform on that side — and reports per-partition row
  * counts via spark_partition_id (a groupBy over partition ids, one
  * scalar row per partition to the driver):
  *  - unsalted: key only — the hot key's partition carries ~90% of rows,
  *    max/median spread ~ #partitions;
  *  - salted:   (key, salt) with the deterministic per-row salt
  *    `pmod(hash(saltSrc), nSalts)` (the Skew.saltedEquiJoin key) — the
  *    hot key spreads over nSalts reducers.
  *
  * Usage: `sbt "runMain graft.tools.SaltSkewProbe [n] [nSalts]"`
  * (defaults 2,000,000 rows, 8 salts). Prints one JSON line per lane.
  */
object SaltSkewProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nSalts = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // probe the RAW exchange: AQE would coalesce this deliberately
      // small shuffle into one partition and hide the per-reducer story
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = spark.range(n).toDF("id")
      .withColumn("key",
        when(pmod(col("id"), lit(10)) < 9, lit("HOT"))
          .otherwise(concat(lit("k"), pmod(col("id"), lit(1000)))))
      .withColumn("_salt", pmod(hash(col("id")), lit(nSalts)))

    def spread(name: String, keyed: org.apache.spark.sql.DataFrame): Unit = {
      val counts = keyed
        .select(spark_partition_id().as("pid"))
        .groupBy("pid").count()
        .select(col("count")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted
      val max = counts.last
      val med = counts(counts.length / 2)
      println(s"""{"lane":"$name","n":$n,"parts":${counts.length},""" +
        s""""max_part":$max,"median_part":$med,""" +
        s""""max_over_median":${"%.1f".format(max.toDouble / math.max(med, 1))}}""")
    }

    spread("unsalted", df.repartition(col("key")))
    spread("salted", df.repartition(col("key"), col("_salt")))
    spark.stop()
  }
}
