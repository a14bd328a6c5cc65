package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SessionStream
import graft.streaming.SessionStream.{ClosedSession, Point}

/** Streaming track assembly: fragments glued into sessions across
  * micro-batches, sessions emitted when the gap rule closes them.
  */
class StreamingSpec extends AnyFunSuite with SparkFixture {

  test("stream sessionization glues fragments across batches and closes on gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val ns = 1000000000L
    val input = MemoryStream[Point]
    val sessions = SessionStream.sessionize(input.toDS(), maxGapNs = 100L * ns)

    val query = sessions.writeStream
      .format("memory").queryName("closed_sessions")
      .outputMode(OutputMode.Append())
      .start()

    try {
      // batch 1: two points close together (one open session)
      input.addData(Point(1L, 10L * ns, 1.0), Point(1L, 20L * ns, 2.0))
      query.processAllAvailable()
      assert(spark.table("closed_sessions").count() == 0)

      // batch 2: a point far in the future → closes the first session
      input.addData(Point(1L, 500L * ns, 5.0))
      query.processAllAvailable()
      val closed = spark.table("closed_sessions").as[ClosedSession].collect()
      assert(closed.length == 1)
      assert(closed.head == ClosedSession(1L, 10L * ns / 1000, 20L * ns / 1000, 2L, 3.0))

      // batches 3-4: a DIFFERENT key far ahead advances the watermark past
      // key 1's end+gap → the quiet key's open session is flushed by the
      // event-time timeout and its state freed (the unbounded-state fix)
      input.addData(Point(2L, 2000L * ns, 7.0))
      query.processAllAvailable()
      input.addData(Point(2L, 2010L * ns, 8.0))
      query.processAllAvailable()
      val flushed = spark.table("closed_sessions").as[ClosedSession].collect()
      assert(flushed.contains(ClosedSession(1L, 500L * ns / 1000, 500L * ns / 1000, 1L, 5.0)),
        s"idle key 1 not flushed; closed so far: ${flushed.mkString(", ")}")
    } finally query.stop()
  }

  test("streaming dedup before sessionization drops replayed messages (consolidator fifoset)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._

    val ns = 1000000000L
    // (msg_id, userId, tsNs, value): msg_id is the at-least-once delivery key
    val input = MemoryStream[(Long, Long, Long, Double)]
    val deduped = input.toDS()
      .toDF("msg_id", "userId", "tsNs", "value")
      .withColumn("event_time", timestamp_micros((col("tsNs") / 1000L).cast("long")))
      .withWatermark("event_time", "10 seconds")
      .dropDuplicatesWithinWatermark("msg_id")
      // keep the watermarked column: sessionize's event-time timeout needs a
      // watermark in scope, and a downstream stage may not redefine one
      .select("userId", "tsNs", "value", "event_time").as[Point]
    val sessions = SessionStream.sessionize(deduped, maxGapNs = 100L * ns)

    val query = sessions.writeStream
      .format("memory").queryName("dedup_sessions")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    try {
      // duplicate delivery of msg 1 within the watermark window
      input.addData((1L, 7L, 10L * ns, 1.0), (1L, 7L, 10L * ns, 1.0), (2L, 7L, 12L * ns, 2.0))
      query.processAllAvailable()
      input.addData((3L, 7L, 500L * ns, 9.0)) // closes the session
      query.processAllAvailable()
      val closed = spark.table("dedup_sessions").as[ClosedSession].collect()
      assert(closed.length == 1)
      // duplicate dropped: 2 points, not 3
      assert(closed.head.n_events == 2L && closed.head.value_sum == 3.0)
    } finally query.stop()
  }

  test("full ingest shape: dedup -> static-dim enrich -> sessionize in one streaming query") {
    // mirrors addtrackfragment.go: dedupe replayed fragments, identify
    // against airframe refdata (stream-static broadcast join — the static
    // side never re-shuffles the stream), then glue into tracks
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._

    val ns = 1000000000L
    val airframes = Seq((7L, "B738"), (8L, "A320")).toDF("userId", "icao_type")
    val input = MemoryStream[(Long, Long, Long, Double)]
    val enriched = input.toDS()
      .toDF("msg_id", "userId", "tsNs", "value")
      .withColumn("event_time", timestamp_micros((col("tsNs") / 1000L).cast("long")))
      .withWatermark("event_time", "10 seconds")
      .dropDuplicatesWithinWatermark("msg_id")
      .join(broadcast(airframes), Seq("userId")) // stream-static enrich
      .where(col("icao_type") === "B738")        // identified subset only
      .select("userId", "tsNs", "value", "event_time").as[Point]
    val sessions = SessionStream.sessionize(enriched, maxGapNs = 100L * ns)

    val query = sessions.writeStream
      .format("memory").queryName("enriched_sessions")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    try {
      input.addData(
        (1L, 7L, 10L * ns, 1.0), (1L, 7L, 10L * ns, 1.0), // dup delivery
        (2L, 7L, 12L * ns, 2.0),
        (3L, 9L, 11L * ns, 5.0)) // unknown airframe -> dropped by enrich
      query.processAllAvailable()
      input.addData((4L, 7L, 500L * ns, 9.0)) // closes key 7's session
      query.processAllAvailable()
      val closed = spark.table("enriched_sessions").as[ClosedSession].collect()
      assert(closed.length == 1)
      assert(closed.head.user_id == 7L)
      assert(closed.head.n_events == 2L && closed.head.value_sum == 3.0)
    } finally query.stop()
  }
}

/** Streaming document dedup (streaming/DedupStream): the continuous-ingest
  * form of the batch dedup tiers — exact norm-key first-wins and
  * simhash-bucket near-dup suppression, both watermark-bounded.
  */
class DedupStreamSpec extends AnyFunSuite with SparkFixture {
  import graft.streaming.DedupStream
  import graft.streaming.DedupStream.Doc

  private val ns = 1000000000L

  test("streaming exact dedup: first arrival of a norm key survives") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Doc]
    val out = DedupStream.dedupExact(input.toDS(), retentionMs = 60000L)
    val query = out.writeStream.format("memory").queryName("dedup_exact")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Doc(1L, "the quick brown fox jumps over the lazy dog tail", 10L * ns),
        Doc(2L, "the quick brown fox jumps over the lazy dog ears", 12L * ns), // same 8-word key
        Doc(3L, "an entirely different document body goes right here", 14L * ns))
      query.processAllAvailable()
      val ids = spark.table("dedup_exact").select("docId").as[Long].collect().toSet
      assert(ids == Set(1L, 3L)) // doc 2's first-8-words key matches doc 1
    } finally query.stop()
  }

  test("streaming simhash near-dup: later near-duplicate suppressed, state times out") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // 60 tokens (3 repeats) so the simhash majority votes are stable enough
    // that a one-word edit keeps the pair in one bucket (top-10-bit block) —
    // the regime the blocking tier is FOR; short texts spread across buckets
    // and fall through to the exact tiers
    val base = Seq.fill(3)("alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima mike november oscar papa quebec romeo sierra tango")
      .mkString(" ")
    val nearDup = base.patch(base.lastIndexOf("tango"), "whiskey", 5) // last word differs
    val distinct = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"

    val input = MemoryStream[Doc]
    val out = DedupStream.dedupSimhash(input.toDS(), maxHamming = 6,
      retentionMs = 60000L)
    val query = out.writeStream.format("memory").queryName("dedup_near")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Doc(1L, base, 10L * ns))
      query.processAllAvailable()
      input.addData(Doc(2L, nearDup, 20L * ns), Doc(3L, distinct, 21L * ns))
      query.processAllAvailable()
      val ids = spark.table("dedup_near")
        .select("docId").as[Long].collect().toSet
      assert(ids.contains(1L) && ids.contains(3L), s"survivors: $ids")
      assert(!ids.contains(2L), "near-duplicate of doc 1 must be suppressed")

      // sanity: batch twin agrees the pair is within the Hamming bound and
      // shares a bucket (the suppression was blocking, not luck)
      val sig = graft.operators.Text.simhash(
        Seq((1L, base), (2L, nearDup)).toDF("docId", "text"),
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " "), 30)
        .select("docId", "simhash").as[(Long, Long)].collect().toMap
      assert(java.lang.Long.bitCount(sig(1L) ^ sig(2L)) <= 6)
      assert((sig(1L) >> 20) == (sig(2L) >> 20))
    } finally query.stop()
  }

  test("streaming minhash-LSH tier agrees with the batch tier's pair semantics") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Text
    def doc(ws: Seq[String]) = ws.mkString(" ")
    val w = (0 until 30).map(i => s"w$i")
    val z = (0 until 30).map(i => s"z$i")
    val docsSeq = Seq(
      Doc(1L, doc(w), 10L * ns),
      Doc(2L, doc(w.init :+ "changed"), 20L * ns), // jaccard vs 1 ≈ 0.93
      Doc(3L, doc(z), 30L * ns),
      Doc(4L, doc((0 until 30).map(i => s"q$i")), 40L * ns),
      Doc(5L, doc(z.init :+ "flip"), 50L * ns))    // jaccard vs 3 ≈ 0.93

    // independent batch twin (q_doc_minhash_lsh semantics): b drops iff
    // some a<b shares a band bucket AND verifies at true jaccard >= 0.8
    // (arrival order == id order in this corpus)
    val sigs = Text.minhashSignature(
        docsSeq.toDF().withColumn("sh", Text.shingles(col("text"), 2)),
        col("sh"), 16, Text.polyHash)
      .select(col("docId"), col("sh"), col("sig"))
    val banded = Text.lshBands(sigs, 4, 4).select("docId", "band", "band_hash")
    val dropped = banded.toDF("a", "band", "band_hash")
      .join(banded.toDF("b", "band", "band_hash"), Seq("band", "band_hash"))
      .where(col("a") < col("b")).select("a", "b").distinct()
      .join(sigs.select(col("docId").as("a"), col("sh").as("sh_a")), "a")
      .join(sigs.select(col("docId").as("b"), col("sh").as("sh_b")), "b")
      .withColumn("j",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("j") >= 0.8)
      .select("b").as[Long].collect().toSet
    assert(dropped === Set(2L, 5L), s"scenario must exercise suppression: $dropped")
    val expected = Set(1L, 3L, 4L)

    // the operator's batch mode reproduces the twin
    val viaBatch = DedupStream.dedupMinhashLsh(docsSeq.toDS(), 0.8, 60000L)
      .collect().map(_.docId).toSet
    assert(viaBatch === expected)

    // streaming: doc 5 arrives a LATER micro-batch than its match (doc 3) —
    // suppression must come from bucket state, not same-batch comparison.
    // The chained-stateful-stage checker opt-out is scoped to this query
    // and restored (see dedupMinhashLsh scaladoc for why it is sound).
    val checkKey = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prior = spark.conf.get(checkKey)
    spark.conf.set(checkKey, "false")
    val input = MemoryStream[Doc]
    val out = DedupStream.dedupMinhashLsh(input.toDS(), 0.8, 60000L)
    val query = out.writeStream.format("memory").queryName("dedup_mh")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(docsSeq.take(4): _*)
      query.processAllAvailable()
      input.addData(docsSeq(4))
      query.processAllAvailable()
      val ids = spark.table("dedup_mh").select("docId").as[Long].collect().toSet
      assert(ids === expected)
    } finally { query.stop(); spark.conf.set(checkKey, prior) }
  }

  test("ingest-time sampling and split: stateless hash filters agree with batch") {
    // sampleByHash/splitByHash are pure per-row projections (no state, no
    // watermark), so they run unchanged at ingest — and because membership
    // is a function of the ROW, a doc admitted by the stream is exactly the
    // doc the batch pipeline would admit: stream-vs-batch dataset assembly
    // can never drift.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Sampling
    val rows = (0 until 300).map(i => (i.toLong, s"doc body $i"))
    val batch = Sampling.splitByHash(
        Sampling.sampleByHash(rows.toDF("doc_id", "text"), col("doc_id"), "in", 400),
        col("doc_id"), "sp", Seq(("train", 900), ("val", 1000)))
      .select("doc_id", "split").as[(Long, String)].collect().toSet

    val input = MemoryStream[(Long, String)]
    val query = Sampling.splitByHash(
        Sampling.sampleByHash(input.toDS().toDF("doc_id", "text"),
          col("doc_id"), "in", 400),
        col("doc_id"), "sp", Seq(("train", 900), ("val", 1000)))
      .select("doc_id", "split")
      .writeStream.format("memory").queryName("ingest_sample")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.take(150): _*)
      query.processAllAvailable()
      input.addData(rows.drop(150): _*)
      query.processAllAvailable()
      val got = spark.table("ingest_sample").as[(Long, String)].collect().toSet
      assert(got === batch)
      assert(got.size < 300 && got.nonEmpty)
    } finally query.stop()
  }

  test("streaming ANN-index ingest: IVF assignment + PQ encode on a stream") {
    // the index-build expressions are stateless projections, so incoming
    // vectors score against the broadcast model AT INGEST — new corpus
    // rows land in the persisted (n_id, cell, codes) index with no batch
    // rebuild; batch-mode encoding of the same rows is the twin
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sfDir)
    val model = Similarity.ivfTrainDriver(e, "embedding", 16)
    val codebooks = Similarity.pqTrain(e, "embedding", model, 8, 32)
    def encode(df: org.apache.spark.sql.DataFrame) =
      Similarity.pqEncode(
        Similarity.ivfAssign(df, "embedding", model),
        "embedding", "cell", model, codebooks, 8, 32)
        .select("vec_id", "cell", "codes")
    val rows = e.select("vec_id", "embedding").limit(50)
      .as[(Long, Seq[Float])].collect().toSeq
    val expected = encode(rows.toDF("vec_id", "embedding"))
      .as[(Long, Int, Long)].collect().toSet

    val input = MemoryStream[(Long, Seq[Float])]
    val query = encode(input.toDS().toDF("vec_id", "embedding"))
      .writeStream.format("memory").queryName("ann_ingest")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.take(30): _*)
      query.processAllAvailable()
      input.addData(rows.drop(30): _*)
      query.processAllAvailable()
      val got = spark.table("ann_ingest")
        .as[(Long, Int, Long)].collect().toSet
      assert(got === expected)
    } finally query.stop()
  }
}

/** Ingest-time dataset assembly: the hash-membership sampling/split
  * operators are stateless per-row projections, so they run unchanged on a
  * stream — and, because membership is a pure function of the row (not of
  * partitioning, batch boundaries, or arrival order), the streamed result
  * is exactly the batch result: replaying the same corpus through any
  * micro-batch slicing yields the same sample and the same splits.
  */
class StreamAssemblySpec extends AnyFunSuite with SparkFixture {

  test("streamed hash sample + split agree with the batch twin exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.operators.Sampling

    val cuts = Seq(("train", 900), ("val", 950), ("test", 1000))
    val rows = (0L until 300L).map(i => (i, s"doc body $i"))

    val input = MemoryStream[(Long, String)]
    val streamed = Sampling.splitByHash(
      Sampling.sampleByHash(input.toDS().toDF("doc_id", "text"),
        col("doc_id"), "ing", 400),
      col("doc_id"), "ing", cuts)
    val q = streamed.writeStream.format("memory").queryName("ingest_split")
      .outputMode(OutputMode.Append()).start()
    try {
      // deliberately uneven micro-batches, out-of-order ids
      input.addData(rows.slice(120, 300).reverse)
      q.processAllAvailable()
      input.addData(rows.slice(0, 120))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("ingest_split").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val want = Sampling.splitByHash(
        Sampling.sampleByHash(rows.toDF("doc_id", "text"),
          col("doc_id"), "ing", 400),
        col("doc_id"), "ing", cuts)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(got == want, "stream/batch membership or split label diverged")
    assert(got.nonEmpty && got.size < 300)
  }
}

/** The quality gate is a single scan-stage projection (doc-local signals,
  * native repetition stats), so it filters at INGEST on a stream with the
  * exact batch semantics — the filter stage of the pipeline moves to the
  * edge for free.
  */
class StreamQualityGateSpec extends AnyFunSuite with SparkFixture {

  test("streamed quality verdict == batch verdict per document") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.operators.Text

    def gate(df: org.apache.spark.sql.DataFrame) = {
      val q = Text.qualityMetrics(df, col("text"), Seq("the", "a"))
      q.select(col("doc_id"), col("n_words"),
          round(col("stopword_ratio"), 4).as("sw"),
          Text.repetitionStats(col("text"), 2).as("_s"))
        .select(col("doc_id"),
          ((col("n_words") < 6).cast("int") +
           (col("sw") > 0.3).cast("int") +
           (when(col("_s.n_grams") === 0, lit(1.0))
             .otherwise(Text.fracTrunc4(col("_s.top_gram_n"), col("_s.n_grams")))
             >= 0.5).cast("int") === 0).cast("int").as("keep"))
    }

    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today fine"),
      (2L, "spam spam spam spam spam spam spam spam"),   // repetition flag
      (3L, "too short"),                                  // length flag
      (4L, "the the the a a the a the a the a the")       // stopword flag
    )
    val input = MemoryStream[(Long, String)]
    val q = gate(input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("stream_gate")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.take(2)); q.processAllAvailable()
      input.addData(rows.drop(2)); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("stream_gate").as[(Long, Int)].collect().toMap
    val want = gate(rows.toDF("doc_id", "text")).as[(Long, Int)].collect().toMap
    assert(got == want)
    assert(want == Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 0))
  }

  test("composed scrub -> gate ingest pipeline streams with batch semantics") {
    // the documented "scrub before train" order as ONE streaming
    // projection: PII-redact the text, then quality-gate the REDACTED
    // text — both are scan-stage projections, so the composition needs
    // no state, no watermark, and agrees with batch exactly
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.operators.{Pii, Text}

    def scrubGate(df: org.apache.spark.sql.DataFrame) = {
      val red = Pii.redact(df, col("text"))
      val q = Text.qualityMetrics(red, col("redacted"), Seq("the", "a"))
      q.select(col("doc_id"), col("redacted"),
          ((col("n_words") >= 6).cast("int")).as("keep"))
    }

    val rows = Seq(
      (1L, "mail me at bob@example.com about the quick brown fox plan"),
      (2L, "call 555-123-4567 or 10.0.0.1 now"),
      (3L, "too short")
    )
    val input = MemoryStream[(Long, String)]
    val q = scrubGate(input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("stream_scrub_gate")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.take(1)); q.processAllAvailable()
      input.addData(rows.drop(1)); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("stream_scrub_gate")
      .as[(Long, String, Int)].collect().toMap2
    val want = scrubGate(rows.toDF("doc_id", "text"))
      .as[(Long, String, Int)].collect().toMap2
    assert(got == want)
    // the scrub actually fired before the gate saw the text
    assert(got(1L)._1.contains("[EMAIL]") && !got(1L)._1.contains("@"))
    assert(got(2L)._1.contains("[PHONE]") && got(2L)._1.contains("[IPV4]"))
    assert(got(3L)._2 == 0 && got(1L)._2 == 1)
  }

  private implicit class Tup3Ops[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}

/** Streaming ingest into the PERSISTED cell-partitioned index: each
  * micro-batch assigns against the frozen stored centers and appends into
  * its cell directories (foreachBatch — the serving-time index-maintenance
  * loop). Because the quantizer is frozen, arrival order and batch slicing
  * can't change any row's cell: a stored search over the streamed index
  * equals the in-memory search over a batch-built index of the full corpus
  * with the same model.
  */
class StreamStoredIndexSpec extends AnyFunSuite with SparkFixture {

  test("stream-appended stored index == batch-built index, search-for-search") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity

    val e = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfstream").toString
    val seed = e.where(col("vec_id") % 4 =!= 0)   // initial build
    val late = e.where(col("vec_id") % 4 === 0)   // arrives on the stream
    Similarity.writeIvfIndex(seed, "vec_id", "embedding", 16, dir)

    val input = MemoryStream[(Long, Seq[Float])]
    val q = input.toDS().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Similarity.appendIvfIndex(spark, dir, batch, "vec_id", "embedding")
      }.start()
    try {
      val rows = late.select("vec_id", "embedding")
        .as[(Long, Seq[Float])].collect().toSeq
      input.addData(rows.take(rows.length / 2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(rows.length / 2): _*)
      q.processAllAvailable()
    } finally q.stop()

    val queries = e.where(col("vec_id") < 8)
    val stored = Similarity.knnIvfSearchStored(spark, dir, queries,
        "vec_id", "embedding", 5, 4, 3)
      .as[(Long, Long, Int, Double)].collect().toSet

    // twin: in-memory index of the FULL corpus under the same frozen model
    val model = Similarity.readIvfCenters(spark, dir)
    val mem = Similarity.knnIvfSearchIndexed(
        Similarity.ivfAssign(
          e.select(col("vec_id").as("n_id"), col("embedding").as("n_vec")),
          "n_vec", model),
        queries, "vec_id", "embedding", 5, 4, 3, model)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(stored == mem && stored.nonEmpty)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}

/** Streaming distinct-count: the native KMV aggregate in a streaming
  * groupBy (Complete mode — TypedImperativeAggregate buffers merge across
  * micro-batches like any partial aggregation). The sketch's set semantics
  * make the result batch-slicing-invariant: however arrivals split into
  * micro-batches, the final per-group sketch equals the batch twin's.
  */
/** Streaming funnel frontier == batch funnel, per user and in aggregate. */
class StreamFunnelSpec extends AnyFunSuite with SparkFixture {

  test("streamed funnel progression matches the batch operator's counts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.streaming.FunnelStream
    import graft.streaming.FunnelStream.Ev
    import graft.operators.Behavior

    val steps = Seq("view", "click", "purchase")
    val win = 1000L
    val rows = Seq(
      Ev(1L, 100L, "click"),             // pre-view click must not count
      Ev(1L, 200L, "view"),
      Ev(1L, 900L, "purchase"),          // no intervening click
      Ev(2L, 100L, "view"),
      Ev(2L, 150L, "click"),
      Ev(2L, 180L, "purchase"),
      Ev(3L, 100L, "view"),
      Ev(3L, 150L, "click"),
      Ev(3L, 2000L, "purchase"))         // outside the window from t_first

    val input = MemoryStream[Ev]
    val q = FunnelStream.funnelProgress(input.toDS(), steps, win)
      .toDF("user_id", "step")
      .writeStream.format("memory").queryName("stream_funnel")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(rows.take(4)); q.processAllAvailable()
      input.addData(rows.drop(4)); q.processAllAvailable()
    } finally q.stop()

    // Update mode: last row per user is the current frontier
    val streamed = spark.table("stream_funnel")
      .groupBy("user_id").agg(max("step").as("step"))
      .as[(Long, Int)].collect().toMap
    assert(streamed == Map(1L -> 1, 2L -> 3, 3L -> 2))

    // aggregate equivalence with the batch operator
    val batch = Behavior.funnel(
        rows.toDS().toDF("user_id", "ts", "event_type")
          .withColumn("event_id", col("ts")),
        "user_id", "ts", "event_type", steps, win)
      .select("step_idx", "n_users").as[(Long, Long)].collect().toMap
    val fromStream = (1 to steps.size).map(i =>
      i.toLong -> streamed.values.count(_ >= i).toLong).toMap
    assert(fromStream == batch)
  }

  test("cross-batch arrival order within a user preserves greedy semantics") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.FunnelStream
    import graft.streaming.FunnelStream.Ev

    // the qualifying click arrives in a LATER batch than a too-early one:
    // state must keep waiting rather than lock in the wrong event
    val input = MemoryStream[Ev]
    val q = FunnelStream.funnelProgress(input.toDS(),
        Seq("view", "click"), 1000L)
      .toDF("user_id", "step")
      .writeStream.format("memory").queryName("stream_funnel2")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(Seq(Ev(7L, 500L, "click"))); q.processAllAvailable()
      input.addData(Seq(Ev(7L, 600L, "view"))); q.processAllAvailable()
      input.addData(Seq(Ev(7L, 700L, "click"))); q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("stream_funnel2")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max("step").as("s"))
      .as[(Long, Int)].collect().toMap
    assert(last == Map(7L -> 2))
  }
}

class StreamSketchSpec extends AnyFunSuite with SparkFixture {

  test("streaming KMV sketch == batch sketch regardless of batch slicing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.operators.{Sketch, Text}

    val rnd = new scala.util.Random(5)
    val rows = (0 until 2000).map(_ =>
      (rnd.nextInt(3).toLong, rnd.nextInt(400).toLong))
    def sketch(df: org.apache.spark.sql.DataFrame) = {
      val h = Text.polyHash(concat(col("key").cast("string"), lit("#st")))
      df.groupBy(col("g")).agg(Sketch.kmvAgg(h, 32).as("sk"))
    }

    val input = MemoryStream[(Long, Long)]
    val q = sketch(input.toDS().toDF("g", "key"))
      .writeStream.format("memory").queryName("stream_kmv")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(rows.take(700)); q.processAllAvailable()
      input.addData(rows.slice(700, 701)); q.processAllAvailable() // 1-row batch
      input.addData(rows.drop(701)); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("stream_kmv").as[(Long, Seq[Long])].collect().toMap
    val want = sketch(rows.toDF("g", "key")).as[(Long, Seq[Long])]
      .collect().toMap
    assert(got == want && got.nonEmpty)
  }

  test("streaming CMS grid == batch grid regardless of slicing") {
    // counter cells are plain sums (CMS's merge is linearity), so the
    // grid is a streaming aggregation too — completes the streaming
    // story for all four sketch families (KMV, bottom-k, HLL, CMS)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.operators.Sketch

    val rnd = new scala.util.Random(23)
    val rows = (0 until 2500).map(_ => s"tok${rnd.nextInt(300)}")
    def grid(df: org.apache.spark.sql.DataFrame) =
      Sketch.cmsCounters(df, col("term"), 3, 64)

    val input = MemoryStream[String]
    val q = grid(input.toDS().toDF("term"))
      .writeStream.format("memory").queryName("stream_cms")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(rows.take(900)); q.processAllAvailable()
      input.addData(rows.slice(900, 901)); q.processAllAvailable()
      input.addData(rows.drop(901)); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("stream_cms").as[(Int, Long, Long)].collect().toSet
    val want = grid(rows.toDF("term")).as[(Int, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("streaming HLL registers == batch registers regardless of slicing") {
    // register max is a semilattice, so the register GRID is a plain
    // streaming aggregation — live cardinality with m longs of state per
    // group, the third sketch family's streaming story
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.operators.{Sketch, Text}

    val rnd = new scala.util.Random(17)
    val rows = (0 until 3000).map(_ =>
      (rnd.nextInt(3).toLong, rnd.nextInt(800).toLong))
    def regs(df: org.apache.spark.sql.DataFrame) = {
      val h = Text.polyHash(concat(col("key").cast("string"), lit("#sh")))
      Sketch.hllRegisters(df.select(col("g"), h.as("_h0")),
        col("g"), col("_h0"), 6, 26)
    }

    val input = MemoryStream[(Long, Long)]
    val q = regs(input.toDS().toDF("g", "key"))
      .writeStream.format("memory").queryName("stream_hll")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(rows.take(1000)); q.processAllAvailable()
      input.addData(rows.slice(1000, 1001)); q.processAllAvailable()
      input.addData(rows.drop(1001)); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("stream_hll").as[(Long, Long, Long)].collect().toSet
    val want = regs(rows.toDF("g", "key")).as[(Long, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("streaming bottom-k quantile sketch == batch regardless of slicing") {
    // same batch-slicing invariance for the rank member of the sketch
    // suite: the bottom-k pair set is a semilattice, so micro-batch merge
    // order can't change the final sketch or its rank-selected quantiles
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.operators.{Sketch, Text}

    val rnd = new scala.util.Random(9)
    val rows = (0 until 1500).map(i =>
      (rnd.nextInt(3).toLong, i.toLong, rnd.nextInt(500) / 4.0))
    def sketch(df: org.apache.spark.sql.DataFrame) = {
      val h = Text.polyHash(concat(col("key").cast("string"), lit("#sq")))
      df.groupBy(col("g"))
        .agg(Sketch.quantileSketch(h, col("v"), 48).as("sk"))
        .select(col("g"), col("sk"),
          Sketch.sketchQuantile("sk", 1, 2).as("p50"),
          Sketch.sketchQuantile("sk", 9, 10).as("p90"))
    }

    val input = MemoryStream[(Long, Long, Double)]
    val q = sketch(input.toDS().toDF("g", "key", "v"))
      .writeStream.format("memory").queryName("stream_bottomk")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(rows.take(500)); q.processAllAvailable()
      input.addData(rows.slice(500, 501)); q.processAllAvailable()
      input.addData(rows.drop(501)); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("stream_bottomk")
      .as[(Long, Seq[(Long, Double)], Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val want = sketch(rows.toDF("g", "key", "v"))
      .as[(Long, Seq[(Long, Double)], Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == want && got.nonEmpty)
  }

  test("event-time-windowed streaming KMV == batch per hour window") {
    // the production monitor shape: distinct-count sketches per event-time
    // hour window in a streaming aggregation — sketch set semantics make
    // each window's result independent of micro-batch slicing and arrival
    // order (late rows merge into their window's buffer like any partial)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.operators.{Sketch, Text}

    val rnd = new scala.util.Random(29)
    val t0 = 1705320000L // epoch seconds, hour-aligned
    val rows = (0 until 1200).map { i =>
      val sec = t0 + rnd.nextInt(4 * 3600) // four hour windows
      (new java.sql.Timestamp(sec * 1000L), rnd.nextInt(300).toLong)
    }
    def agg(df: org.apache.spark.sql.DataFrame) = {
      val h = Text.polyHash(concat(col("key").cast("string"), lit("#wk")))
      df.groupBy(window(col("ts"), "1 hour"))
        .agg(Sketch.kmvAgg(h, 32).as("sk"))
        .select(col("window.start").cast("long").as("w"), col("sk"),
          Sketch.kmvEstimate("sk", 32, Text.PolyP).as("est"))
    }

    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val q = agg(input.toDS().toDF("ts", "key").withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("stream_kmv_win")
      .outputMode(OutputMode.Complete()).start()
    try {
      // out-of-order arrival: shuffled slices across three micro-batches
      val shuffled = rnd.shuffle(rows)
      input.addData(shuffled.take(400)); q.processAllAvailable()
      input.addData(shuffled.slice(400, 401)); q.processAllAvailable()
      input.addData(shuffled.drop(401)); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("stream_kmv_win")
      .as[(Long, Seq[Long], Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val want = agg(rows.toDF("ts", "key"))
      .as[(Long, Seq[Long], Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == want && got.size >= 4)
  }
}

/** The BUILT-IN streaming sessionization path: `session_window` under a
  * watermark (§2.11b's operator), beside SessionStream's custom-state
  * flatMapGroupsWithState path — two implementations, one semantics.
  */
class StreamSessionWindowSpec extends AnyFunSuite with SparkFixture {

  test("native session_window streaming agg: watermark closes sessions, batch twin agrees") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._

    // (user_id, ts_us); gap 30 s, watermark 10 s — the built-in streaming
    // sessionization path (§2.11b's operator under a watermark), beside
    // SessionStream's flatMapGroupsWithState custom-state path.
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("tst", timestamp_micros(col("ts_us")))
      .withWatermark("tst", "10 seconds")
      .groupBy(col("user_id"), session_window(col("tst"), "30 seconds").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"), col("n"))

    val input = MemoryStream[(Long, Long)]
    val query = agg(input.toDF().toDF("user_id", "ts_us")).writeStream
      .format("memory").queryName("native_sw")
      .outputMode(OutputMode.Append())
      .start()
    val us = 1000000L
    try {
      // user 1: two events 10 s apart -> one open session [0, 10+30)
      input.addData((1L, 0L), (1L, 10L * us))
      query.processAllAvailable()
      assert(spark.table("native_sw").count() == 0, "session emitted before watermark")

      // user 2 far ahead advances the watermark past user 1's session end
      input.addData((2L, 100L * us))
      query.processAllAvailable()
      val closed = spark.table("native_sw")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(closed == Set((1L, 0L, 40L * us, 2L)),
        s"closed sessions: $closed")

      // batch twin over the same rows produces the same closed session
      val batch = agg(Seq((1L, 0L), (1L, 10L * us), (2L, 100L * us))
          .toDF("user_id", "ts_us"))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(batch.contains((1L, 0L, 40L * us, 2L)))
    } finally query.stop()
  }
}

/** Streaming last-touch attribution: keyed two-scalar state, purchases
  * emit their channel on arrival; the batch twin is q_attribution's
  * IGNORE-NULLS running window over the same rows.
  */
class StreamAttributionSpec extends AnyFunSuite with SparkFixture {
  import graft.streaming.AttributionStream
  import AttributionStream.{Attributed, Ev}

  test("streamed attribution equals the batch window, incl. lookback and ties") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val input = MemoryStream[Ev]
    val query = AttributionStream.attribute(input.toDS(), lookbackNs = 100L)
      .writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append()).start()
    val rows = Seq(
      Ev(1L, 10L, 1L, "view"), Ev(1L, 20L, 2L, "click"), Ev(1L, 30L, 3L, "purchase"),
      Ev(1L, 200L, 4L, "purchase"),           // 180 ns past the click: outside lookback
      Ev(2L, 50L, 5L, "purchase"),            // never touched
      Ev(1L, 210L, 6L, "view"), Ev(1L, 210L, 7L, "click"), // tie: higher event_id wins
      Ev(1L, 220L, 8L, "purchase"))
    try {
      input.addData(rows.take(3)); query.processAllAvailable()
      input.addData(rows.slice(3, 5)); query.processAllAvailable()
      input.addData(rows.drop(5)); query.processAllAvailable()
      val got = spark.table("attr").as[Attributed].collect().toSet
      assert(got == Set(
        Attributed(1L, 30L, "click"),
        Attributed(1L, 200L, "none"),
        Attributed(2L, 50L, "none"),
        Attributed(1L, 220L, "click")), s"got $got")

      // batch twin: the q_attribution window over the same rows
      val df = rows.map(e => (e.userId, e.tsNs, e.eventId, e.eventType))
        .toDF("user_id", "ts", "event_id", "event_type")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val isTouch = col("event_type").isin("click", "view")
      val batch = df
        .withColumn("lt", last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
        .withColumn("lts", last(when(isTouch, col("ts")), ignoreNulls = true).over(w))
        .where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          when(col("lts").isNull || col("ts") - col("lts") > 100L, "none")
            .otherwise(col("lt")).as("channel"))
        .as[(Long, Long, String)].collect()
        .map(t => Attributed(t._1, t._2, t._3)).toSet
      assert(batch == got, s"stream $got vs batch $batch")
    } finally query.stop()
  }
}

/** Stream-STREAM interval join — the attribution primitive as a true
  * two-stream join (clicks matched to the impressions that preceded them
  * by ≤ 30 min), with watermarks on BOTH sides bounding the join state:
  * Spark buffers each side only until the other side's watermark passes
  * the interval bound, so state is O(rate × interval), not stream length.
  * The batch twin is the same inner join on the same interval condition —
  * micro-batch slicing and arrival order must not change the matched set.
  */
class StreamStreamJoinSpec extends AnyFunSuite with SparkFixture {

  test("watermarked stream-stream interval join == batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val rnd = new scala.util.Random(41)
    val t0 = 1705320000L
    val views = (0 until 300).map { i =>
      (i.toLong, s"u${rnd.nextInt(25)}",
        new java.sql.Timestamp((t0 + rnd.nextInt(7200)) * 1000L))
    }
    val clicks = (0 until 200).map { i =>
      (1000L + i, s"u${rnd.nextInt(25)}",
        new java.sql.Timestamp((t0 + rnd.nextInt(9000)) * 1000L))
    }
    def joined(v: org.apache.spark.sql.DataFrame,
               c: org.apache.spark.sql.DataFrame) =
      v.join(c,
        v("vu") === c("cu") &&
          c("cts") >= v("vts") &&
          c("cts") <= v("vts") + expr("INTERVAL 30 MINUTES"))
        .select(col("vu").as("user"), col("vid"), col("cid"),
          (col("cts").cast("long") - col("vts").cast("long")).as("delay_s"))

    val vIn = MemoryStream[(Long, String, java.sql.Timestamp)]
    val cIn = MemoryStream[(Long, String, java.sql.Timestamp)]
    // The watermark delay must cover the test's FULLY-SHUFFLED arrival
    // (span 2.5 h): a 1 h delay drops genuinely-late rows by design
    // (first run: 288 of 487 matches — the missing rows were exactly the
    // ones arriving > 1 h event-time-late). Parity with the batch twin
    // requires delay >= max lateness; production picks the delay as the
    // state-size vs completeness knob.
    val vS = vIn.toDS().toDF("vid", "vu", "vts").withWatermark("vts", "3 hours")
    val cS = cIn.toDS().toDF("cid", "cu", "cts").withWatermark("cts", "3 hours")
    val q = joined(vS, cS)
      .writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append()).start()
    try {
      // interleaved, shuffled arrival across micro-batches
      val vSh = rnd.shuffle(views)
      val cSh = rnd.shuffle(clicks)
      vIn.addData(vSh.take(150)); q.processAllAvailable()
      cIn.addData(cSh.take(60)); q.processAllAvailable()
      vIn.addData(vSh.drop(150)); cIn.addData(cSh.slice(60, 140))
      q.processAllAvailable()
      cIn.addData(cSh.drop(140)); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("ssj")
      .as[(String, Long, Long, Long)].collect().toSet
    val want = joined(views.toDF("vid", "vu", "vts"),
        clicks.toDF("cid", "cu", "cts"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty, "degenerate twin: no matched pairs")
    assert(got == want,
      s"stream ${got.size} vs batch ${want.size}; missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }
}
