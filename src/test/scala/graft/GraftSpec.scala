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
  private val needsDensity = Set("q_level_flight", "q_trains",
    // sf0.001's corpus/customer draw legitimately yields zero rows for
    // these (no <=6-Hamming phash pair; no above-average dormant customer)
    "q_phash_pairs", "q_dormant_cust")

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

  test("Tables.events normalizes every on-disk ts encoding to BIGINT ns") {
    // The r7 regression: the driver regenerated events.parquet with
    // TIMESTAMP(MICROS, NTZ) where r1-r6 data was TIMESTAMP(NANOS), and
    // 25 events queries silently vanished. The loader must read BOTH (and
    // plain adjusted-to-UTC micros) to the same nanosecond longs.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_events_enc")
    val base = Seq((1L, 1705320000000000L), (2L, 1705320060123456L))

    // micros NTZ (the current testdata encoding)
    base.map { case (id, us) =>
      (id, java.time.LocalDateTime.ofEpochSecond(us / 1000000L,
        (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
    }.toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")
    // micros adjusted-to-UTC (TimestampType)
    base.map { case (id, us) =>
      (id, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        us / 1000000L, (us % 1000000L) * 1000L)))
    }.toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/tz/events.parquet")
    // raw BIGINT ns (what nanosAsLong yields from TIMESTAMP(NANOS) files)
    base.map { case (id, us) => (id, us * 1000L) }.toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/ns/events.parquet")

    val want = base.map { case (id, us) => id -> us * 1000L }.toMap
    for (enc <- Seq("ntz", "tz", "ns")) {
      val got = Tables.events(spark, s"$dir/$enc")
        .select("event_id", "ts").as[(Long, Long)].collect().toMap
      assert(got == want, s"encoding $enc")
      assert(Tables.events(spark, s"$dir/$enc").schema("ts").dataType ==
        org.apache.spark.sql.types.LongType, s"encoding $enc type")
    }
  }

  test("graft_dot is callable from SQL via SparkSessionExtensions") {
    val v = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(v == 11.0)
  }
}
