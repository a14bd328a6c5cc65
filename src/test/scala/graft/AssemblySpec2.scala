package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Text

/** Round-6 pipeline additions: integer-bit LM surprisal and incremental
  * cross-corpus dedup.
  */
class LmSurprisalSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("surprisal = bits(N) - bits(count), mean in centibits via integer div") {
    // corpus: a:2 b:2 c:1, N=5 → bits: N=2, a=1, b=1, c=0
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = Text.unigramSurprisal(df, "doc_id", col("text"))
      .select("doc_id", "n_toks", "sum_bits", "avg_centibits")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // doc1: (2-1)+(2-1)+(2-1)=3 over 3 toks → 100; doc2: (2-1)+(2-0)=3 over 2 → 150
    assert(out.toSeq == Seq((1L, 3L, 3L, 100L), (2L, 2L, 3L, 150L)))
  }

  test("rare tokens score higher than stopword soup") {
    val common = Seq.fill(40)("the quick brown fox").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val rare = Seq((100L, "zxq1 vvw2 kkp3 mmr4"))
    val df = (common ++ rare).toDF("doc_id", "text")
    val scores = Text.unigramSurprisal(df, "doc_id", col("text"))
      .select("doc_id", "avg_centibits").as[(Long, Long)].collect().toMap
    assert(scores(100L) > scores(0L))
  }
}

class SketchSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._
  import graft.operators.{Sketch, Text}

  test("native KMV aggregate is bit-equal to the relational twin") {
    val rnd = new scala.util.Random(11)
    val df = (0 until 3000).map(_ =>
      (rnd.nextInt(4).toLong, rnd.nextInt(500).toLong)).toDF("g", "key")
      .repartition(7) // merge path must engage across partitions
    val h = Text.polyHash(concat(col("key").cast("string"), lit("#t")))
    val native = df.groupBy(col("g"))
      .agg(Sketch.kmvAgg(h, 32).as("sk"))
      .as[(Long, Seq[Long])].collect().toMap
    val twin = Sketch.kmvAggTwin(df, col("g"), h, 32)
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == twin)
  }

  test("KMV estimate: exact below k, within 40% at 16x saturation") {
    val df = (0L until 4000L).map(i => (if (i < 20) 0L else 1L, i))
      .toDF("g", "key")
    val h = Text.polyHash(concat(col("key").cast("string"), lit("#t")))
    val est = df.groupBy(col("g"))
      .agg(Sketch.kmvAgg(h, 256).as("sk"))
      .select(col("g"), Sketch.kmvEstimate("sk", 256, Text.PolyP).as("e"))
      .as[(Long, Long)].collect().toMap
    assert(est(0L) == 20L) // unsaturated → exact
    val nd = 3980.0
    assert(est(1L) > nd * 0.6 && est(1L) < nd * 1.4,
      s"estimate ${est(1L)} too far from $nd")
  }

  test("CMS never undercounts and is exact for isolated buckets") {
    val toks = (Seq.fill(50)("alpha") ++ Seq.fill(7)("beta") ++
      (0 until 200).map(i => s"noise$i")).toDF("term")
    val grid = Sketch.cmsCounters(toks, col("term"), 3, 64)
    val cands = Seq("alpha", "beta").toDF("term")
    val est = Sketch.cmsEstimate(grid, cands, 3, 64)
      .as[(String, Long)].collect().toMap
    assert(est("alpha") >= 50L && est("beta") >= 7L)
    // d=3 independent rows over w=64 with ~207 distinct terms: min over
    // rows keeps the overcount small — sanity-bound it
    assert(est("alpha") <= 50L + 60L && est("beta") <= 7L + 60L)
  }

  test("KMV merge property: rollup of partial sketches == direct sketch") {
    // kmin_k(A ∪ B) = kmin_k(kmin_k(A) ∪ kmin_k(B)) — what makes
    // persisted day sketches reusable for any time-range rollup.
    val rnd = new scala.util.Random(7)
    val df = (0 until 5000).map(_ =>
      (rnd.nextInt(14).toLong, rnd.nextInt(900).toLong)).toDF("day", "key")
      .repartition(5)
    val h = Text.polyHash(concat(col("key").cast("string"), lit("#t")))
    val days = df.groupBy(col("day")).agg(Sketch.kmvAgg(h, 48).as("sk"))
    val rolled = days
      .select((col("day") / 7).cast("long").as("week"), explode(col("sk")).as("_h"))
      .groupBy(col("week")).agg(Sketch.kmvAgg(col("_h"), 48).as("sk"))
      .as[(Long, Seq[Long])].collect().toMap
    val direct = df.select((col("day") / 7).cast("long").as("week"), h.as("_h"))
      .groupBy(col("week")).agg(Sketch.kmvAgg(col("_h"), 48).as("sk"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(rolled == direct)
  }

  test("CMS join estimate never undercounts; tight when buckets are sparse") {
    // true |A join B| = sum_k fa(k)*fb(k) = 10 shared keys * 2 * 3 = 60;
    // 30 distinct keys over w=4096 buckets -> collisions are rare, so the
    // min-over-rows estimate sits at or just above the truth. Determinism:
    // the poly hash is fixed, so this value is stable run-to-run.
    val a = (0 until 20).flatMap(k => Seq.fill(2)(s"k$k")).toDF("term")
    val b = (0 until 10).flatMap(k => Seq.fill(3)(s"k$k")).toDF("term")
    val est = Sketch.cmsJoinEstimate(
        Sketch.cmsCounters(a, col("term"), 3, 4096),
        Sketch.cmsCounters(b, col("term"), 3, 4096))
      .as[Long].head()
    assert(est >= 60L, s"undercount: $est")
    assert(est <= 80L, s"collision overcount too large for sparse grid: $est")
  }

  test("native HLL pack is bit-equal to the Column-built mix chain") {
    val rnd = new scala.util.Random(21)
    val df = (0 until 4000).map(_ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(2000).toLong)).toDF("g", "key")
      .repartition(7)
    val h = Text.polyHash(concat(col("key").cast("string"), lit("#hn")))
    val base = df.select(col("g"), h.as("_h0"))
    val native = Sketch.hllRegisters(base, col("g"), col("_h0"), 6, 26)
      .as[(Long, Long, Long)].collect().toSet
    val twin = Sketch.hllRegistersTwin(base, col("g"), col("_h0"), 6, 26)
      .as[(Long, Long, Long)].collect().toSet
    assert(native == twin && native.nonEmpty)
  }

  test("HLL merge property: max-merged day registers == direct week registers") {
    // register-wise max is the sketch's merge — the semilattice law that
    // makes persisted day grids reusable for any rollup range.
    val rnd = new scala.util.Random(3)
    val df = (0 until 6000).map(_ =>
      (rnd.nextInt(14).toLong, rnd.nextInt(1200).toLong)).toDF("day", "key")
      .repartition(5)
    val h = Text.polyHash(concat(col("key").cast("string"), lit("#t")))
    val base = df.select(col("day"), h.as("_h0"), col("key"))
    val dayRegs = Sketch.hllRegisters(base, col("day"), col("_h0"), 6, 26)
    val rolled = dayRegs
      .select(expr("_g div 7").as("_g"), col("bucket"), col("reg"))
      .groupBy("_g", "bucket").agg(max("reg").as("reg"))
      .as[(Long, Long, Long)].collect().toSet
    val direct = Sketch.hllRegisters(
        base.select(expr("day div 7").as("week"), col("_h0")),
        col("week"), col("_h0"), 6, 26)
      .as[(Long, Long, Long)].collect().toSet
    assert(rolled == direct)
  }

  test("HLL estimate lands within 30% of truth once registers saturate") {
    // 5000 distinct keys over m=64 registers (~78/bucket): the raw
    // estimator's small-range bias is gone; HLL's theoretical rel-err at
    // m=64 is 1.04/sqrt(64) = 13%, so 30% is a loose determinism-safe gate.
    val df = (0L until 5000L).map(i => (0L, i)).toDF("g", "key")
    val h = Text.polyHash(concat(col("key").cast("string"), lit("#t")))
    val regs = Sketch.hllRegisters(
      df.select(col("g"), h.as("_h0")), col("g"), col("_h0"), 6, 26)
    val est = Sketch.hllEstimate(regs, 6, 26, Sketch.hllNumScaled(6, 26))
      .select(col("est_nd")).as[Double].head()
    assert(est > 3500.0 && est < 6500.0, s"estimate $est far from 5000")
  }

  test("rank-selection quantiles pick exact order statistics") {
    // 101 known values, one group: p50 = rank 51, p90 = rank 91,
    // p99 = rank 100 under (n-1)*q div qden + 1.
    val df = scala.util.Random.shuffle((0 until 101).toList)
      .map(i => ("a", i.toDouble, i.toLong)).toDF("g", "value", "id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("value").asc, col("id").asc)
    val got = df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .groupBy(col("g")).agg(
        max(when(col("rn") === expr("(n - 1) div 2 + 1"), col("value"))).as("p50"),
        max(when(col("rn") === expr("(n - 1) * 9 div 10 + 1"), col("value"))).as("p90"),
        max(when(col("rn") === expr("(n - 1) * 99 div 100 + 1"), col("value"))).as("p99"))
      .as[(String, Double, Double, Double)].head()
    assert(got == (("a", 50.0, 90.0, 99.0)))
  }

  test("bottom-k quantile sketch is bit-equal to the relational twin") {
    val rnd = new scala.util.Random(13)
    val df = (0 until 4000).map(i =>
      (rnd.nextInt(3).toLong, i.toLong, rnd.nextInt(1000) / 8.0))
      .toDF("g", "key", "v")
      .repartition(7) // merge path must engage across partitions
    val h = Text.polyHash(concat(col("key").cast("string"), lit("#qs")))
    val native = df.groupBy(col("g"))
      .agg(Sketch.quantileSketch(h, col("v"), 64).as("sk"))
      .as[(Long, Seq[(Long, Double)])].collect().toMap
    val twin = Sketch.quantileSketchTwin(df, col("g"), h, col("v"), 64)
      .as[(Long, Seq[(Long, Double)])].collect().toMap
    assert(native == twin)
    assert(native.values.forall(_.size == 64))
  }

  test("bottom-k merge property: rollup of day sketches == direct sketch") {
    // bottomk(A ∪ B) = bottomk(bottomk(A) ∪ bottomk(B)) — persisted day
    // sketches answer any time-range quantile without rescanning raw rows.
    val rnd = new scala.util.Random(17)
    val df = (0 until 6000).map(i =>
      (rnd.nextInt(14).toLong, i.toLong, rnd.nextGaussian() * 10))
      .toDF("day", "key", "v").repartition(5)
    val h = Text.polyHash(concat(col("key").cast("string"), lit("#qs")))
    val days = df.groupBy(col("day"))
      .agg(Sketch.quantileSketch(h, col("v"), 48).as("sk"))
    val rolled = days
      .select((col("day") / 7).cast("long").as("week"), explode(col("sk")).as("p"))
      .groupBy(col("week"))
      .agg(Sketch.quantileSketch(col("p.h"), col("p.v"), 48).as("sk"))
      .as[(Long, Seq[(Long, Double)])].collect().toMap
    val direct = df.select((col("day") / 7).cast("long").as("week"), h.as("_h"), col("v"))
      .groupBy(col("week"))
      .agg(Sketch.quantileSketch(col("_h"), col("v"), 48).as("sk"))
      .as[(Long, Seq[(Long, Double)])].collect().toMap
    assert(rolled == direct)
  }

  test("sketchQuantile rank-selects exact order statistics of the sample") {
    // k larger than the group -> the sketch IS the whole group, so the
    // sketch quantiles must equal exact rank-selected quantiles.
    val df = scala.util.Random.shuffle((0 until 101).toList)
      .map(i => ("a", i.toLong, i.toDouble)).toDF("g", "key", "v")
    val h = Text.polyHash(concat(col("key").cast("string"), lit("#qs")))
    val got = df.groupBy(col("g"))
      .agg(Sketch.quantileSketch(h, col("v"), 256).as("sk"))
      .select(col("g"), size(col("sk")).as("n"),
        Sketch.sketchQuantile("sk", 1, 2).as("p50"),
        Sketch.sketchQuantile("sk", 9, 10).as("p90"),
        Sketch.sketchQuantile("sk", 99, 100).as("p99"))
      .as[(String, Int, Double, Double, Double)].head()
    assert(got == (("a", 101, 50.0, 90.0, 99.0)))
  }
}

class PackSequencesSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._
  import graft.operators.Sampling

  private val budget = 64L
  private def pack(df: org.apache.spark.sql.DataFrame) = {
    val h = Sampling.sampleHash(col("doc_id").cast("string"), "pk")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("_h").asc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.select(col("doc_id"), col("n_tok"),
        pmod(h, lit(4L)).as("bucket"), h.as("_h"))
      .withColumn("_cum", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("bucket"), col("n_tok"),
        expr(s"(_cum - n_tok) div ${budget}L").as("shard"),
        expr(s"(_cum - n_tok) % ${budget}L").as("off"))
  }

  test("packing tiles each bucket contiguously and survives repartitioning") {
    val rnd = new scala.util.Random(3)
    val df = (0 until 400).map(i => (i.toLong, (1 + rnd.nextInt(30)).toLong))
      .toDF("doc_id", "n_tok")
    val a = pack(df).as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val b = pack(df.repartition(13)).as[(Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(a.sameElements(b)) // membership/assignment is partitioning-invariant
    // start offsets reconstruct the exclusive prefix sum per bucket: sorted
    // starts (shard*budget + off) must chain exactly by n_tok
    a.groupBy(_._2).foreach { case (_, ds) =>
      val inOrder = ds.sortBy(d => d._4 * budget + d._5)
      inOrder.zip(inOrder.drop(1)).foreach { case (p, n) =>
        assert(p._4 * budget + p._5 + p._3 == n._4 * budget + n._5,
          s"gap/overlap between ${p._1} and ${n._1}")
      }
      assert(inOrder.head._4 == 0L && inOrder.head._5 == 0L)
    }
  }
}

class DedupIncrementalSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val base = Seq(
    (1L, "alpha beta gamma"), (2L, "delta epsilon zeta")
  ).toDF("doc_id", "text")

  test("drops batch docs whose key exists in base; first-wins within batch") {
    val incoming = Seq(
      (10L, "alpha beta gamma"),   // collides with base 1 → dropped
      (11L, "eta theta iota"),     // new → kept
      (12L, "eta theta iota"),     // in-batch dup of 11 → dropped
      (13L, "kappa lambda mu")     // new → kept
    ).toDF("doc_id", "text")
    val out = Text.dedupIncremental(incoming, base, "doc_id",
        col("text"), 100L)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(11L, 13L))
  }

  test("equals rebuild-over-union batch-side survivors (random corpus)") {
    val rnd = new scala.util.Random(7)
    val words = Vector("a", "b", "c", "d")
    def txt() = Seq.fill(3)(words(rnd.nextInt(words.size))).mkString(" ")
    val all = (0L until 120L).map(i => (i, txt()))
    val (b, inc) = (all.take(60).toDF("doc_id", "text"),
      all.drop(60).toDF("doc_id", "text"))
    val got = Text.dedupIncremental(inc, b, "doc_id", col("text"), 64L)
      .select("doc_id").as[Long].collect().toSet
    // naive: exact dedup over base ∪ batch keeping min doc_id, then
    // restrict to batch-side ids
    val naive = all.groupBy(_._2).map { case (_, g) => g.map(_._1).min }
      .filter(_ >= 60L).toSet
    assert(got == naive)
  }
}
