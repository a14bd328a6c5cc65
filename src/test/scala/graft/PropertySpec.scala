package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Geo, Text, TimeSeries}

/** Randomized-invariant checks on generated inputs (seeded → reproducible) —
  * sweeps the example-based specs can't cover.
  */
class PropertySpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val ns = 1000000000L
  private val rnd = new scala.util.Random(42)

  test("sessionize: session count per key = gaps over maxGap + 1") {
    for (_ <- 1 to 8) {
      val gaps = List.fill(12)(1L + rnd.nextInt(200))
      val times = gaps.scanLeft(0L)((acc, g) => acc + g * ns).tail
      val rows = times.zipWithIndex.map { case (t, i) => (1L, t, i.toLong) }
      val df = rows.toDF("user_id", "ts", "event_id")
      val maxGap = 100L * ns
      val nSessions = TimeSeries.sessionize(df, "user_id", "ts", "event_id", maxGap)
        .agg(max("session_id")).head().getLong(0)
      val expected = 1 + gaps.tail.count(_ * ns > maxGap)
      assert(nSessions == expected, s"gaps=$gaps")
    }
  }

  test("headingDelta: bounded by 180 and consistent modulo 360") {
    val pairs = Seq.fill(40)((rnd.nextDouble() * 360.0, rnd.nextDouble() * 360.0))
    val out = pairs.toDF("h1", "h2")
      .select(col("h1"), col("h2"), Geo.headingDelta(col("h1"), col("h2")).as("d"))
      .as[(Double, Double, Double)].collect()
    for ((h1, h2, d) <- out) {
      assert(d > -180.0 - 1e-9 && d <= 180.0 + 1e-9, s"delta $d out of range")
      val diff = math.abs(((h1 + d - h2) % 360.0 + 360.0) % 360.0)
      assert(diff < 1e-6 || math.abs(diff - 360.0) < 1e-6, s"$h1+$d != $h2 (mod 360)")
    }
  }

  test("native as-of join equals union-window form on random data (ties, gaps, missing keys)") {
    for (round <- 1 to 6) {
      // coarse time grid + few keys → plenty of exact-tie and no-match cases
      val left = List.fill(30)((rnd.nextInt(4).toLong, rnd.nextInt(20).toLong * ns,
        rnd.nextLong().abs)).toDF("k", "t", "lid")
      // seq is UNIQUE so the (rt, seq) tiebreak is a total order — equal
      // (k, rt, seq) with different payloads would be partition-luck in
      // both implementations and the comparison would be meaningless
      val right = List.tabulate(20)(i => (rnd.nextInt(5).toLong,
          rnd.nextInt(20).toLong * ns, rnd.nextInt(100).toDouble, i.toLong))
        .toDF("k", "rt", "payload", "seq")
      val native = org.apache.spark.sql.graft.AsOfJoin.join(
          left, right, "k", "t", "rt", Seq("payload"), rightTie = Some("seq"))
        .select("lid", "asof_payload")
        .as[(Long, Option[Double])].collect().toMap
      val window = TimeSeries.asOfJoinTables(left, right, "k", "t", "rt",
          Seq("payload"), rightTie = Some("seq"))
        .select("lid", "asof_payload")
        .as[(Long, Option[Double])].collect().toMap
      assert(native == window, s"round=$round")
    }
  }

  test("jaccardPairs equals naive quadratic on random word docs") {
    val vocab = Seq("a", "b", "c", "d", "e", "f", "g", "h")
    for (round <- 1 to 4) {
      val texts = List.fill(8)(List.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .withColumn("sh", Text.shingles(col("text"), 2))
      val t = 0.5
      val fast = Text.jaccardPairs(docs, "doc_id", col("sh"), t)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val d = docs.select(col("doc_id"), col("sh"))
      val naive = d.toDF("doc_a", "sh_a").crossJoin(d.toDF("doc_b", "sh_b"))
        .where(col("doc_a") < col("doc_b"))
        .withColumn("j",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))))
        .where(col("j") >= t)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(fast == naive, s"round $round: ${fast.diff(naive)} / ${naive.diff(fast)}")
    }
  }

  test("overlapJoin matches naive theta-join on random intervals") {
    for (_ <- 1 to 4) {
      def ivs() = List.fill(10) {
        val s = rnd.nextInt(500).toLong
        (s * ns, (s + rnd.nextInt(80)) * ns)
      }
      val as = ivs(); val bs = ivs()
      val a = as.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("a_id", "start", "end")
      val b = bs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("b_id", "start", "end")
      val bucketed = TimeSeries.overlapJoin(a, b, "start", "end", 60L * ns, lit(true))
        .select("a_id", "b_id").distinct().as[(Long, Long)].collect().toSet
      val naive = (for {
        ((s1, e1), i) <- as.zipWithIndex
        ((s2, e2), j) <- bs.zipWithIndex
        if s1 <= e2 && s2 <= e1
      } yield (i.toLong, j.toLong)).toSet
      assert(bucketed == naive)
    }
  }
}

/** Randomized batteries for the round-5 additions: the native IVF argmin
  * (vs its relational twin on random vectors and random models — edge cells,
  * duplicate centers, tie distances) and the METAR raw decoder (round-trip
  * through randomly synthesized report strings).
  */
class PropertySpecR8 extends AnyFunSuite with SparkFixture {
  import spark.implicits._
  import graft.operators.{Sketch, Text}

  test("bottom-k sketch: randomized semilattice + partition invariance") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 6) {
      val n = 200 + rnd.nextInt(800)
      val k = Seq(8, 16, 48)(trial % 3)
      val rows = (0 until n).map(i =>
        (rnd.nextInt(3).toLong, i.toLong, rnd.nextInt(100) - 50.0))
      val h = Text.polyHash(concat(col("key").cast("string"), lit("#pp")))
      def sk(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("g")).agg(Sketch.quantileSketch(h, col("v"), k).as("sk"))
          .as[(Long, Seq[(Long, Double)])].collect().toMap

      val base = sk(rows.toDF("g", "key", "v"))
      // partition invariance (merge path engages differently each layout)
      for (p <- Seq(1, 3, 13)) {
        assert(sk(rows.toDF("g", "key", "v").repartition(p)) == base,
          s"trial $trial parts $p")
      }
      // semilattice: sketch(A ∪ B) == sketch(sketch(A) pairs ∪ sketch(B) pairs)
      val (a, b) = rows.splitAt(rnd.nextInt(n))
      val merged = {
        val pa = sk(if (a.nonEmpty) a.toDF("g", "key", "v")
                    else Seq.empty[(Long, Long, Double)].toDF("g", "key", "v"))
        val pb = sk(if (b.nonEmpty) b.toDF("g", "key", "v")
                    else Seq.empty[(Long, Long, Double)].toDF("g", "key", "v"))
        val pairs = (pa.toSeq ++ pb.toSeq)
          .flatMap { case (g, ps) => ps.map(p => (g, p._1, p._2)) }
        pairs.toDF("g", "h", "v")
          .groupBy(col("g"))
          .agg(Sketch.quantileSketch(col("h"), col("v"), k).as("sk"))
          .as[(Long, Seq[(Long, Double)])].collect().toMap
      }
      assert(merged == base, s"trial $trial semilattice")
      // every sketch is (h, v)-sorted and at most k long
      base.values.foreach { ps =>
        assert(ps.size <= k && ps == ps.sorted, s"trial $trial shape")
      }
    }
  }
}

class PropertySpecR5 extends AnyFunSuite with SparkFixture {
  import spark.implicits._
  import graft.operators.Similarity

  private val rnd = new scala.util.Random(1234)

  test("IvfArgminExpr bit-matches the join/min_by twin on random vectors + models") {
    for (round <- 1 to 4) {
      val dim = 8
      val nCells = 1 + rnd.nextInt(7)
      // small integer coordinates force plenty of EXACT distance ties —
      // the tie rule (lowest cell) is the part worth hammering
      val model: Seq[(Int, Seq[Float])] = (0 until nCells)
        .map(c => (c, Seq.fill(dim)(rnd.nextInt(3).toFloat)))
      val vecs = (0 until 60)
        .map(i => (i.toLong, Seq.fill(dim)(rnd.nextInt(3).toFloat)))
        .toDF("vid", "v")
      val native = Similarity.ivfAssign(vecs, "v", model)
        .select("vid", "cell").as[(Long, Int)].collect().toMap
      val twin = Similarity.ivfAssignHof(vecs, "vid", "v", model)
        .select("vid", "cell").as[(Long, Int)].collect().toMap
      assert(native === twin, s"round=$round nCells=$nCells")
    }
  }

  test("METAR parseRaw round-trips randomly synthesized reports") {
    import graft.sources.Metar
    val cases = (1 to 50).map { i =>
      val station = "K" + Seq.fill(3)(('A' + rnd.nextInt(26)).toChar).mkString
      val day = 1 + rnd.nextInt(28)
      val hour = rnd.nextInt(24)
      val min = rnd.nextInt(60)
      val altim = 2800 + rnd.nextInt(400)
      val hasAltim = rnd.nextBoolean()
      val prefix = rnd.nextInt(3) match {
        case 0 => f"201601$day%02d$hour%02d$min%02d METAR "
        case 1 => "SPECI "
        case _ => ""
      }
      val raw = f"$prefix$station $day%02d$hour%02d$min%02dZ 28014KT 10SM" +
        (if (hasAltim) f" A$altim%04d" else "") + " RMK AO2"
      (i.toLong, raw, station, day, hour, min, if (hasAltim) altim / 100.0 else -1.0)
    }
    val parsed = Metar.parseRaw(
        cases.map(c => (c._1, c._2)).toDF("id", "raw"), col("raw"))
      .select("id", "metar_station", "metar_day", "metar_hour", "metar_min", "metar_inhg")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4),
          if (r.isNullAt(5)) -1.0 else r.getDouble(5))).toMap
    for ((id, _, station, day, hour, min, inhg) <- cases) {
      assert(parsed(id) === ((station, day, hour, min, inhg)), s"case $id")
    }
  }

  test("priorityKSample: DLT subset-sum estimate is unbiased across seeds") {
    import graft.operators.Sampling
    // random positive weights; the mean of the realized estimates over
    // independent seeds must straddle the true total (the pre-r9 formula
    // collapsed est_w to w and sat ~10x LOW on every seed)
    val docs = (0L until 300L).map(i => (i, 1L + rnd.nextInt(900).toLong))
    val df = docs.toDF("id", "w")
    val totalW = docs.map(_._2).sum
    val ratios = (1 to 6).map { sd =>
      val est = Sampling.priorityKSample(df, col("id"), s"seed$sd", col("w"), 25)
        .agg(sum("est_w")).head().getLong(0)
      est.toDouble / totalW
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.6 && mean < 1.6, s"mean ratio $mean from $ratios")
    assert(ratios.exists(_ >= 1.0) || mean > 0.85,
      s"estimates one-sided low: $ratios")
  }

  test("knnBand results are always a subset of the unbanded ranking's band slice") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sfDir)
    val q = e.where(col("vec_id") < 5)
    val band = Similarity.knnBand(e, q, "vec_id", "embedding", 50, 3, -0.1, 0.3)
      .select("q_id", "n_id", "cos").as[(Long, Long, Double)].collect()
    assert(band.nonEmpty)
    assert(band.forall { case (_, _, c) => c >= -0.1 && c < 0.3 })
    val full = Similarity.knnBrute(e, q, "vec_id", "embedding", 10000, 3)
      .select("q_id", "n_id", "cos").as[(Long, Long, Double)].collect()
      .map { case (qi, ni, c) => (qi, ni) -> c }.toMap
    assert(band.forall { case (qi, ni, c) => full.get((qi, ni)).contains(c) })
  }

  test("cluster cap: never more than c kept per near-dup component") {
    import graft.operators.{Graph, Sampling, Text}
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(spark, sfDir)
    val edges = Text.jaccardPairs(d, "doc_id", Text.shingles(col("text"), 2), 0.8)
      .select("doc_a", "doc_b")
    val comp = Graph.connectedComponents(edges, "doc_a", "doc_b")
    val kept = d.select(col("doc_id"))
      .join(comp, d("doc_id") === comp("id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp"))
      .withColumn("rn", row_number().over(Window.partitionBy("comp")
        .orderBy(Sampling.sampleHash(col("doc_id").cast("string"), "s").asc,
          col("doc_id").asc)))
      .where(col("rn") <= 2)
    val maxPerComp = kept.groupBy("comp").count()
      .agg(max("count")).head().getLong(0)
    assert(maxPerComp <= 2L)
    // singletons always survive: kept count >= number of components
    val nComp = kept.select("comp").distinct().count()
    val total = d.count()
    assert(kept.count() >= nComp && kept.count() <= total)
  }
}
