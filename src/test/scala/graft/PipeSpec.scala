package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant specs for the Group H catalog queries (QueriesPipe): the
  * catalog smoke in CatalogSpec checks rows>0; these pin the SEMANTICS
  * against naive recomputations and structural invariants at sf0.001/sf0.01.
  */
class PipeSpec extends AnyFunSuite with SparkFixture {

  private def q(name: String, dir: String = sfDir) =
    Queries.queries(name)(spark, dir)

  test("q_json_extract: every row has k, none has the absent path") {
    val rows = q("q_json_extract").collect()
    val total = Tables.events(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
    assert(rows.forall(r => r.getAs[Long]("n_with_k") == r.getAs[Long]("n_events")))
    assert(rows.forall(_.getAs[Long]("n_with_absent") == 0L))
    assert(rows.forall(r => r.getAs[Long]("min_k") <= r.getAs[Long]("max_k")))
  }

  test("q_k_anon: classes partition the corpus; flag matches the k cut") {
    val rows = q("q_k_anon").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sfDir).count())
    assert(rows.forall { r =>
      r.getAs[Long]("at_risk") == (if (r.getAs[Long]("n_docs") < 5L) 1L else 0L)
    })
  }

  test("q_ewma: equals a naive per-user sequential fold") {
    val got = q("q_ewma").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("ewma_cents")).toMap
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts"),
        r.getAs[Long]("event_id"), r.getAs[Long]("cents")))
    val want = events.groupBy(_._1).map { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3)).map(_._4)
      u -> sorted.tail.foldLeft(sorted.head)((acc, c) => (c + 3 * acc) / 4)
    }
    assert(got == want)
    // smoothing stays inside the per-user value envelope
    val env = events.groupBy(_._1).map { case (u, evs) =>
      u -> (evs.map(_._4).min, evs.map(_._4).max) }
    assert(got.forall { case (u, v) =>
      v >= env(u)._1 && v <= env(u)._2 })
  }

  test("q_gapfill: contiguous days per user; LOCF carries the last value") {
    val dayNs = 86400000000000L
    val rows = q("q_gapfill").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day"),
        r.getAs[Long]("cents_locf")))
    val purchases = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts"),
        r.getAs[Long]("event_id"), r.getAs[Long]("cents")))
    assert(purchases.nonEmpty)
    val d1 = purchases.map(_._2 / dayNs).max
    val byUser = rows.groupBy(_._1)
    for ((u, rs) <- byUser) {
      val days = rs.map(_._2).sorted
      // contiguous from the user's first purchase day to the global span end
      assert(days.last == d1)
      assert(days.toSeq == (days.head to days.last).toSeq)
      // each day's value = the user's latest purchase at or before that day
      val evs = purchases.filter(_._1 == u).sortBy(e => (e._2, e._3))
      for ((_, day, v) <- rs) {
        val last = evs.filter(_._2 / dayNs <= day).lastOption
        assert(last.exists(_._4 == v),
          s"user $u day $day: got $v want ${last.map(_._4)}")
      }
    }
    // r9 scale fix: the slots frame is per-user-span-bounded — exactly
    // Σ_u (d1 − first_u + 1) generated rows, NOT the |users| × |global
    // span| rectangle (which at 10⁹ users × 10 years would be 10¹² rows,
    // mostly discarded post-LOCF)
    val firstByUser = purchases.groupBy(_._1)
      .map { case (_, evs) => evs.map(_._2 / dayNs).min }
    val wantSlots = firstByUser.map(f0 => d1 - f0 + 1).sum
    assert(QueriesPipe.gapfillSlots(spark, sfDir).count() == wantSlots)
    val rectangle = firstByUser.size.toLong * (d1 - firstByUser.min + 1)
    assert(wantSlots < rectangle, "corpus has users with differing first days")
  }

  test("q_ccnet_buckets: buckets partition each language, boundaries ordered") {
    val rows = q("q_ccnet_buckets").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("bucket"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("lo_centibits"),
        r.getAs[Long]("hi_centibits")))
    val perLang = Tables.documents(spark, sfDir).groupBy("lang").count()
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    for ((lang, n) <- perLang)
      assert(rows.filter(_._1 == lang).map(_._3).sum == n)
    // value ranges are disjoint and ordered by bucket within a language
    for ((lang, bs) <- rows.groupBy(_._1)) {
      val sorted = bs.sortBy(_._2)
      for (w <- sorted.sliding(2) if w.length == 2) {
        val (a, b) = (w(0), w(1))
        assert(a._5 < b._4, s"$lang: bucket ${a._2} hi ${a._5} !< ${b._2} lo ${b._4}")
      }
    }
  }

  test("q_topic_map: ranks are 1..3 per cell, counts consistent") {
    // sf0.01: sf0.001's 50-vector space can train degenerate singleton cells
    val rows = q("q_topic_map", "/root/testdata/sf0.01").collect()
      .map(r => (r.getAs[Int]("cell"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("rank"), r.getAs[String]("term"), r.getAs[Long]("term_n")))
    for ((_, cellRows) <- rows.groupBy(_._1)) {
      val ranks = cellRows.map(_._3).sorted
      assert(ranks.toSeq == (1L to ranks.size).toSeq && ranks.size <= 3)
      // ranked by (term_n desc, term): counts non-increasing with rank
      val byRank = cellRows.sortBy(_._3).map(_._5)
      assert(byRank.toSeq == byRank.sorted.reverse.toSeq)
      assert(cellRows.forall(_._4.length >= 4))
    }
    // every corpus doc lands in exactly one counted cell
    assert(rows.map(r => r._1 -> r._2).distinct.map(_._2).sum ==
      Tables.documents(spark, "/root/testdata/sf0.01").count())
  }

  test("q_benford: digits 1..9 partition the rows; permilles sum to ~1000") {
    val rows = q("q_benford").collect()
      .map(r => (r.getAs[Long]("digit"), r.getAs[Long]("n"),
        r.getAs[Long]("permille"), r.getAs[Long]("benford_permille"),
        r.getAs[Long]("dev_permille")))
    assert(rows.map(_._1).toSet.subsetOf((1L to 9L).toSet))
    assert(rows.map(_._2).sum == Tables.orders(spark, sfDir).count())
    val pSum = rows.map(_._3).sum
    assert(pSum >= 1000 - 9 && pSum <= 1000, s"permille sum $pSum")
    assert(rows.forall { case (_, _, p, b, d) => d == math.abs(p - b) })
  }

  test("q_ref_integrity: the generated schema has no orphans, totals match") {
    val rows = q("q_ref_integrity").collect()
      .map(r => r.getAs[String]("edge") ->
        ((r.getAs[Long]("n_child"), r.getAs[Long]("n_orphans")))).toMap
    assert(rows.size == 5)
    assert(rows.values.forall(_._2 == 0L), s"orphans found: $rows")
    assert(rows("lineitem->orders")._1 == Tables.lineitem(spark, sfDir).count())
    assert(rows("orders->customer")._1 == Tables.orders(spark, sfDir).count())
  }

  test("q_rfm: buckets are near-terciles and the segment composes them") {
    val rows = q("q_rfm").collect()
      .map(r => (r.getAs[Long]("r_b"), r.getAs[Long]("f_b"),
        r.getAs[Long]("m_b"), r.getAs[Long]("segment")))
    assert(rows.nonEmpty)
    assert(rows.forall { case (r, f, m, s) => s == r * 100 + f * 10 + m })
    // each metric's buckets are within a value-tie band of n/3
    for (pick <- Seq[((Long, Long, Long, Long)) => Long](_._1, _._2, _._3)) {
      val byB = rows.groupBy(pick).view.mapValues(_.length).toMap
      assert(byB.keySet.subsetOf(Set(0L, 1L, 2L)))
      assert(byB.getOrElse(0L, 0) >= 1)
    }
  }

  test("globalRank/globalCumsum: stable across repeated runs on shuffled input") {
    import graft.operators.Text
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .repartition(11) // scramble arrival order feeding the range sampler
    val wantRank = base.orderBy(col("c").desc, col("event_id").asc)
      .collect().zipWithIndex
      .map { case (r, i) => r.getLong(0) -> (i + 1L) }.toMap
    for (run <- 1 to 3) {
      val got = Text.globalRank(base,
          Seq(col("c").desc, col("event_id").asc), "rk")
        .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Int]("rk").toLong)
        .toMap
      assert(got == wantRank, s"rank run $run")
    }
  }

  test("globalCumsum: equals the single-window cumsum, any partition count") {
    import graft.operators.Text
    val rev = Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .groupBy("o_custkey").agg(sum("c").as("rev"))
    val want = rev.withColumn("cum", sum("rev").over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rev").desc, col("o_custkey").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("cum")).toMap
    for (parts <- Seq(1, 3, 7)) {
      val got = Text.globalCumsum(rev,
          Seq(col("rev").desc, col("o_custkey").asc), col("rev"), "cum",
          numParts = parts)
        .collect().map(r => r.getAs[Long]("o_custkey") -> r.getAs[Long]("cum")).toMap
      assert(got == want, s"numParts=$parts")
    }
  }

  test("globalCumsum: deterministic under the cumsum→scalar-crossJoin→agg shape") {
    // r9 regression guard: with the r8 reuse-dependent offsets, THIS shape
    // (the q_rank_sum plan) duplicated the range exchange — each instance
    // reservoir-samples its own boundaries — and one write action returned
    // five different sums in five runs. The frozen-instance primitive must
    // return the same (and correct) integer every time.
    import graft.operators.Text
    val d = Tables.events(spark, sfDir)
      .where(col("event_type").isin("view", "purchase"))
      .groupBy(col("value").as("v"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_b"))
      .withColumn("cnt", col("n_a") + col("n_b"))
    // truth: single-window replay (domain is distinct values — bounded here)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val want = d.withColumn("cum_all", sum("cnt").over(w))
      .agg(sum(col("n_a") *
        (lit(2L) * (col("cum_all") - col("cnt")) + col("cnt") + lit(1L))))
      .head.getLong(0)
    for (run <- 1 to 3) {
      val c = Text.globalCumsum(d, Seq(col("v").asc), col("cnt"), "cum_all")
        .withColumn("mr2",
          lit(2L) * (col("cum_all") - col("cnt")) + col("cnt") + lit(1L))
      val got = c.crossJoin(broadcast(
          d.agg(sum("n_a").as("tot_a"), sum("n_b").as("tot_b"))))
        .groupBy(col("tot_a"), col("tot_b"))
        .agg(sum(col("n_a") * col("mr2")).as("r2_a"))
        .head.getAs[Long]("r2_a")
      assert(got == want, s"run $run: r2_a=$got want=$want")
    }
  }

  test("q_mix_temperature: quotas follow isqrt weights exactly") {
    def isqrt(n: Long): Long = { var s = math.sqrt(n.toDouble).toLong
      while ((s + 1) * (s + 1) <= n) s += 1; while (s * s > n) s -= 1; s }
    val nSrc = Tables.documents(spark, sfDir).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wTotal = nSrc.values.map(isqrt).sum
    val rows = q("q_mix_temperature").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rank"), r.getAs[Long]("n_src"), r.getAs[Long]("quota")))
    assert(rows.nonEmpty)
    for ((src, srcRows) <- rows.groupBy(_._1)) {
      val quota = 1000L * isqrt(nSrc(src)) / wTotal
      assert(srcRows.forall(_._5 == quota))
      assert(srcRows.forall(_._4 == nSrc(src)))
      assert(srcRows.length == math.min(quota, nSrc(src)))
      val ranks = srcRows.map(_._3).sorted.toSeq
      assert(ranks == (1L to ranks.size))
    }
  }

  test("q_dedup_keep_best: survivors match a naive union-find over the same pairs") {
    import graft.operators.Text
    val withSh = Tables.documents(spark, sfDir)
      .withColumn("sh", Text.shingles(col("text"), 2))
    val sigs = Text.minhashSignature(withSh, col("sh"), 16, Text.polyHash)
      .select(col("doc_id"), col("sh"), col("sig")).localCheckpoint()
    val banded = Text.lshBands(sigs, 4, 4).select("doc_id", "band", "band_hash")
    val cand = banded.toDF("doc_a", "band", "band_hash")
      .join(banded.toDF("doc_b", "band", "band_hash"), Seq("band", "band_hash"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val shA = sigs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val shB = sigs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val pairs = cand.join(shA, "doc_a").join(shB, "doc_b")
      .where(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))) >= 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.nonEmpty)
    // scala-side union-find (independent of the distributed label propagation)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val words = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(find)
    val want = clusters.map { case (root, members) =>
      val keeper = members.minBy(m => (-words(m), m))
      root -> ((keeper, words(keeper), members.length.toLong))
    }
    val got = q("q_dedup_keep_best").collect()
      .map(r => r.getAs[Long]("comp") -> ((r.getAs[Long]("keeper"),
        r.getAs[Long]("keeper_words"), r.getAs[Long]("n_members")))).toMap
    assert(got == want)
  }

  test("q_cluster_purity: majority label support and permille math") {
    val rows = q("q_cluster_purity", "/root/testdata/sf0.01").collect()
      .map(r => (r.getAs[Int]("cell"), r.getAs[Long]("n_vecs"),
        r.getAs[Int]("top_label"), r.getAs[Long]("top_n"),
        r.getAs[Long]("purity_permille")))
    assert(rows.map(_._2).sum ==
      Tables.embeddings(spark, "/root/testdata/sf0.01").count())
    assert(rows.forall { case (_, n, _, top, p) =>
      top >= 1 && top <= n && p == top * 1000 / n })
    // verify the majority label per cell against a naive recomputation from
    // the same deterministic quantizer (public train/assign APIs)
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val model = Similarity.ivfTrainDispatch(e, "embedding",
      Similarity.autoCells(e.count()))
    val assigned = Similarity.ivfAssign(
        e.select(col("vec_id"), col("label"), col("embedding").as("_v")),
        "_v", model)
      .select("cell", "label").collect()
      .map(r => r.getAs[Int]("cell") -> r.getAs[Int]("label"))
    val naive = assigned.groupBy(_._1).map { case (c, ls) =>
      val counts = ls.groupBy(_._2).map { case (l, xs) => (l, xs.size.toLong) }
      val (lbl, n) = counts.toSeq.minBy { case (l, n) => (-n, l) }
      c -> ((lbl, n, ls.size.toLong))
    }
    assert(rows.size == naive.size)
    for ((cell, nVecs, topLabel, topN, _) <- rows) {
      val (wantLbl, wantN, wantTot) = naive(cell)
      assert((topLabel, topN, nVecs) == ((wantLbl, wantN, wantTot)),
        s"cell $cell: got ($topLabel,$topN,$nVecs) want ($wantLbl,$wantN,$wantTot)")
    }
  }
}
