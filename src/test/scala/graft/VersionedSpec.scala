package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Versioned

/** §2.78c Snapshot versioning / time travel: append and overwrite commits,
  * immutable older versions (including across a compaction rewrite), and
  * vacuum that preserves every kept version's readability.
  */
class VersionedSpec extends AnyFunSuite with SparkFixture {

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("append/overwrite commits; every version reads its exact snapshot") {
    val d = Tables.documents(spark, sfDir).select("doc_id", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_ver").toString
    val a = d.where(col("doc_id") % 3 === 0)
    val b = d.where(col("doc_id") % 3 === 1)

    assert(Versioned.currentVersion(dir) == -1)
    assert(Versioned.commit(a, dir) == 0)
    assert(Versioned.commit(b, dir) == 1) // append
    // compaction commit: same content, rewritten as one batch
    assert(Versioned.commit(Versioned.read(spark, dir).repartition(1),
      dir, overwrite = true) == 2)

    assert(ids(Versioned.read(spark, dir, 0)) == ids(a))
    assert(ids(Versioned.read(spark, dir, 1)) == ids(a) ++ ids(b))
    assert(ids(Versioned.read(spark, dir, 2)) == ids(a) ++ ids(b))
    assert(Versioned.currentVersion(dir) == 2)

    // a reader bound to v1 before a later commit still sees v1's snapshot
    val v1 = Versioned.read(spark, dir, 1)
    Versioned.commit(d.where(col("doc_id") % 3 === 2), dir) // v3 append
    assert(ids(v1) == ids(a) ++ ids(b))
    assert(ids(Versioned.read(spark, dir)) == ids(d))
  }

  test("streaming ingest commits a snapshot per micro-batch; readers are isolated") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val dir = java.nio.file.Files.createTempDirectory("graft_ver_stream").toString
    val rows = Tables.documents(spark, sfDir).select("doc_id").collect()
      .map(_.getLong(0)).sorted
    val input = MemoryStream[Long]
    val q = input.toDS().toDF("doc_id")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/_ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Versioned.commit(batch.localCheckpoint(), dir): Unit
      }
      .start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      input.addData(a.toSeq); q.processAllAvailable()
      val pinned = Versioned.read(spark, dir) // bound to the v0 manifest
      input.addData(b.toSeq); q.processAllAvailable()
      // the pinned reader still sees only batch 0 (snapshot isolation)...
      assert(ids(pinned) == a.toSet)
      // ...while a fresh reader sees everything, exactly once
      assert(Versioned.currentVersion(dir) == 1)
      assert(ids(Versioned.read(spark, dir)) == rows.toSet)
    } finally q.stop()
  }

  test("two racing committers: exactly one wins n+1, the loser lands n+2 intact") {
    // The r9 ADVICE medium-severity fix: with version-deterministic batch
    // paths two committers could pick the same `batch-%06d` dir (Spark's
    // ErrorIfExists is check-then-write — part files can interleave) and
    // the loser's slide-move could throw. Batch names are now unique and
    // version-agnostic; only the manifest CAS assigns versions. Race two
    // committer threads repeatedly and assert both datasets always land
    // intact in consecutive versions.
    import java.util.concurrent.{CountDownLatch, Executors}
    val d = Tables.documents(spark, sfDir).select("doc_id")
    val a = d.where(col("doc_id") % 2 === 0).localCheckpoint()
    val b = d.where(col("doc_id") % 2 === 1).localCheckpoint()
    val pool = Executors.newFixedThreadPool(2)
    try {
      for (round <- 0 until 3) {
        val dir = java.nio.file.Files.createTempDirectory(s"graft_race$round").toString
        val gate = new CountDownLatch(1)
        def racer(df: org.apache.spark.sql.DataFrame) =
          pool.submit(new java.util.concurrent.Callable[Int] {
            def call(): Int = { gate.await(); Versioned.commit(df, dir) }
          })
        val (fa, fb) = (racer(a), racer(b))
        gate.countDown()
        val (va, vb) = (fa.get(), fb.get())
        // exactly one winner per slot, loser retried into the next slot
        assert(Set(va, vb) == Set(0, 1), s"versions were ($va, $vb)")
        // the loser's append manifest includes the winner's batch: the
        // final version reads BOTH datasets, each exactly once
        assert(ids(Versioned.read(spark, dir, 1)) == ids(a) ++ ids(b))
        assert(Versioned.read(spark, dir, 1).count() == a.count() + b.count(),
          "no row may be duplicated or lost across the racing commits")
        // and the winner's snapshot holds exactly its own rows
        val v0 = ids(Versioned.read(spark, dir, 0))
        assert(v0 == ids(if (va == 0) a else b))
      }
    } finally pool.shutdown()
  }

  test("manifest-stats data skipping: selective reads touch only matching batches") {
    val d = Tables.documents(spark, sfDir).select("doc_id", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_skip").toString
    // three commits with disjoint doc_id ranges — the time/id-ordered
    // ingest pattern whose batch bounds manifest pruning exploits
    val lo = d.where(col("doc_id") < 15)
    val mid = d.where(col("doc_id") >= 15 && col("doc_id") < 30)
    val hi = d.where(col("doc_id") >= 30)
    Versioned.commitWithStats(lo, dir, Seq("doc_id"))
    Versioned.commitWithStats(mid, dir, Seq("doc_id"))
    Versioned.commitWithStats(hi, dir, Seq("doc_id"))

    // batch names are unique/opaque (the commit-race fix) — resolve them
    // through the manifest, which is the only place names bind to versions
    def batchNames(v: Int): Seq[String] =
      Versioned.batchStats(dir, v).map(_._1)

    // point-range read: only the middle batch's files are ever listed
    val midBatch = batchNames(2)(1)
    val pruned = Versioned.readPruned(spark, dir, "doc_id", 18L, 22L)
    assert(pruned.inputFiles.forall(_.contains(midBatch)),
      s"prune must keep only the middle batch: ${pruned.inputFiles.toSeq}")
    // skipping is a superset guarantee: after the row predicate, equality
    val full = Versioned.read(spark, dir)
      .where(col("doc_id").between(18, 22))
    assert(ids(pruned.where(col("doc_id").between(18, 22))) == ids(full))
    assert(ids(full).nonEmpty, "test range must be non-trivial")

    // nothing matches -> zero files read, schema preserved
    val none = Versioned.readPruned(spark, dir, "doc_id", 100000L, 200000L)
    assert(none.inputFiles.isEmpty && none.count() == 0)
    assert(none.schema == pruned.schema)

    // a batch committed WITHOUT stats is read conservatively
    Versioned.commit(d.where(col("doc_id") === 3), dir)
    val statslessBatch = batchNames(3).last
    val cons = Versioned.readPruned(spark, dir, "doc_id", 18L, 22L)
    assert(cons.inputFiles.exists(_.contains(statslessBatch)),
      "stats-less batch must always be read")
    // ...and an unknown column prunes nothing
    val unk = Versioned.readPruned(spark, dir, "n_chars", 0L, 1L)
    assert(unk.inputFiles.length ==
      Versioned.read(spark, dir).inputFiles.length)

    // vacuum removes dead batches' sidecars with them
    val firstBatch = batchNames(0).head
    Versioned.commit(hi.repartition(1), dir, overwrite = true)
    Versioned.vacuum(dir, keepVersions = 1)
    val sidecars = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(sidecars)
      .asScala.map(_.getFileName.toString).toSet
    assert(!names.contains(s"stats-$firstBatch.txt"),
      s"vacuumed batch kept its sidecar: $names")
  }

  test("mergeUpsert updates matched keys, inserts the rest, atomically versioned") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_merge").toString
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "v")
    Versioned.commit(base, dir)
    // pin a reader to the pre-merge snapshot
    val pinned = Versioned.read(spark, dir)

    val updates = Seq((2L, "B2"), (9L, "new")).toDF("doc_id", "v")
    val v = Versioned.mergeUpsert(dir, updates, "doc_id")
    assert(v == 1)

    val after = Versioned.read(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(after == Map(1L -> "a", 2L -> "B2", 3L -> "c", 9L -> "new"))
    // the pre-merge snapshot is untouched (manifest-level atomicity)
    assert(pinned.as[(Long, String)].collect().toMap ==
      Map(1L -> "a", 2L -> "b", 3L -> "c"))
    // idempotent re-merge of the same updates changes nothing but the version
    Versioned.mergeUpsert(dir, updates, "doc_id")
    assert(Versioned.read(spark, dir).as[(Long, String)].collect().toMap == after)

    // the delete clause: matched-delete keys leave, updates still land,
    // unmatched delete keys are a no-op, all in ONE commit
    val del = Seq(3L, 77L).toDF("doc_id")
    Versioned.mergeUpsert(dir, Seq((9L, "new2")).toDF("doc_id", "v"),
      "doc_id", Some(del))
    assert(Versioned.read(spark, dir).as[(Long, String)].collect().toMap ==
      Map(1L -> "a", 2L -> "B2", 9L -> "new2"))
  }

  test("vacuum drops only unreferenced batches; kept versions stay readable") {
    val d = Tables.documents(spark, sfDir).select("doc_id")
    val dir = java.nio.file.Files.createTempDirectory("graft_ver2").toString
    val a = d.where(col("doc_id") < 10)
    val b = d.where(col("doc_id") >= 10 && col("doc_id") < 20)
    Versioned.commit(a, dir)                    // v0: [batch0]
    Versioned.commit(b, dir)                    // v1: [batch0, batch1]
    Versioned.commit(a.union(b).repartition(1),
      dir, overwrite = true)                    // v2: [batch2]
    Versioned.commit(d.where(col("doc_id") === 25), dir) // v3: [batch2, batch3]

    // resolve the opaque batch names through the manifests before vacuum
    val v1Batches = Versioned.batchStats(dir, 1).map(_._1).toSet // batch0+1
    val v2Batch = Versioned.batchStats(dir, 2).map(_._1).head    // batch2

    val deleted = Versioned.vacuum(dir, keepVersions = 2) // keep v2, v3
    // batch0/batch1 are referenced only by dropped v0/v1 → deleted
    assert(deleted.map(_.split('/').last).toSet == v1Batches)
    assert(ids(Versioned.read(spark, dir, 2)) == ids(a) ++ ids(b))
    assert(ids(Versioned.read(spark, dir, 3)) ==
      ids(a) ++ ids(b) + 25L)
    // dropped versions are gone
    intercept[IllegalArgumentException](Versioned.read(spark, dir, 0))
    // vacuum keeping only the latest must NOT delete batch2 (shared by v3)
    val deleted2 = Versioned.vacuum(dir, keepVersions = 1)
    assert(!deleted2.exists(_.endsWith(v2Batch)))
    assert(ids(Versioned.read(spark, dir, 3)) == ids(a) ++ ids(b) + 25L)
  }

  test("RefCache: refresh is a versioned MERGE; lookup broadcasts a pinned snapshot") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_refc").toString
    // initial registry load (reference: airframe map built up over time)
    val v0 = Versioned.commit(Seq(
      ("icao1", "B738", "UAL"), ("icao2", "A320", "DAL"))
      .toDF("icao24", "equip", "carrier"), dir)
    assert(v0 == 0)
    // refresh: icao2 re-observed with a corrected type + a new airframe
    val v1 = graft.sources.RefCache.refresh(dir, Seq(
      ("icao2", "A321", "DAL"), ("icao3", "E75L", "SKW"))
      .toDF("icao24", "equip", "carrier"), "icao24")
    assert(v1 == 1)
    val facts = Seq(("icao1", 1L), ("icao2", 2L), ("icaoX", 3L))
      .toDF("icao24", "n")
    // latest snapshot: corrected equip, new rows visible, unknown -> null
    val now = graft.sources.RefCache.lookup(spark, facts, dir, "icao24")
      .select("icao24", "equip").as[(String, String)].collect().toMap
    assert(now("icao1") == "B738" && now("icao2") == "A321"
      && now("icaoX") == null)
    // pinned pre-refresh snapshot reproduces yesterday's enrichment
    val old = graft.sources.RefCache.lookup(spark, facts, dir, "icao24",
        version = 0)
      .select("icao24", "equip").as[(String, String)].collect().toMap
    assert(old("icao2") == "A320")
    // the enrichment join really broadcasts (the registry-sized contract)
    val plan = graft.sources.RefCache.lookup(spark, facts, dir, "icao24")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }

  test("streaming ingest lands as Versioned commits; a pinned reader is isolated") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_vstream").toString
    val in = MemoryStream[(Long, Long)]
    val q = in.toDF.toDF("k", "cents").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Versioned.commit(batch, dir): Unit
      }
      .start()
    in.addData((1L, 10L), (2L, 20L))
    q.processAllAvailable()
    val vAfterFirst = Versioned.currentVersion(dir)
    val pinned = Versioned.read(spark, dir, vAfterFirst)
    in.addData((3L, 30L))
    q.processAllAvailable()
    q.stop()
    // later micro-batches appended new versions...
    assert(Versioned.currentVersion(dir) > vAfterFirst)
    assert(Versioned.read(spark, dir).count() == 3)
    // ...but the reader pinned before them still sees its exact snapshot
    assert(pinned.count() == 2)
  }
}
