package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs. */
trait SparkFixture extends BeforeAndAfterAll { self: AnyFunSuite =>
  lazy val spark: SparkSession = SparkFixture.session
  val sfDir = "/root/testdata/sf0.001"
}

object SparkFixture {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Catalog smoke: every declared query runs and returns rows at sf0.001. */
class CatalogSpec extends AnyFunSuite with SparkFixture {
  // Density-dependent queries are legitimately empty at sf0.001 (15 users,
  // ~1 event per 43 min globally); smoke them at sf0.01 instead.
  private val needsDensity = Set("q_level_flight", "q_trains")

  for (q <- Queries.all) {
    test(s"${q.name} runs and returns rows") {
      val dir = if (needsDensity(q.name)) "/root/testdata/sf0.01" else sfDir
      val n = q.fn(spark, dir).count()
      assert(n > 0, s"${q.name} returned 0 rows at $dir")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle name exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("typed model: condense matches the untyped catalog query") {
    import spark.implicits._
    val typed = graft.model.Model.condense(
        graft.model.Model.trackPoints(spark, sfDir))
      .collect().map(c => c.user_id -> c.n_points).toMap
    val untyped = Queries.queries("q_condense")(spark, sfDir)
      .select("user_id", "n_events").as[(Long, Long)].collect().toMap
    assert(typed == untyped)
  }

  test("graft_dot is callable from SQL via SparkSessionExtensions") {
    val v = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(v == 11.0)
  }
}
