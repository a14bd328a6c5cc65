package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-partitioned joins — the storage-layout answer to the
  * biggest shuffle in the engine. Writing both sides `bucketBy(N, key)`
  * pins identical hash partitioning into the table layout, so a later
  * equi-join on the key plans with ZERO Exchange operators: each task
  * reads bucket i of both sides. At 100 TB this converts the recurring
  * fact⋈fact shuffle (every run, full network) into a one-time layout
  * cost at write — the same trade as Z-ordering (ZorderProbe) on the
  * pruning axis.
  */
class BucketJoinSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("bucketed equi-join plans with zero exchanges and matches the shuffled result") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.range(0, 5000).select(col("id").as("k"),
        (col("id") % 97).as("va"))
      val b = spark.range(0, 5000, 3).select(col("id").as("k"),
        (col("id") % 31).as("vb"))
      a.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .option("path", s"$dir/ga").saveAsTable("graft_bucket_a")
      b.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .option("path", s"$dir/gb").saveAsTable("graft_bucket_b")

      val j = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), "k")
      val plan = j.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a co-partitioned join:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan must report bucketing:\n$plan")

      val got = j.select("k", "va", "vb").as[(Long, Long, Long)].collect().toSet
      val want = a.join(b, "k").select("k", "va", "vb")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("bucketed group-by on the bucket key also plans without an exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket2").toString
    try {
      spark.range(0, 4000).select((col("id") % 50).as("k"), col("id").as("v"))
        .write.mode("overwrite").bucketBy(8, "k")
        .option("path", s"$dir/gc").saveAsTable("graft_bucket_c")
      val agg = spark.table("graft_bucket_c").groupBy("k").agg(sum("v").as("s"))
      val plan = agg.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(!plan.contains("Exchange"),
        s"bucketed aggregation must not shuffle:\n$plan")
      assert(agg.count() == 50)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_c")
    }
  }
}
