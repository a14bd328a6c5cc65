package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards for headline queries: the properties
  * PLANS.md narrates (pushdown reaching the scan, column pruning, small
  * sides broadcasting, bounded top-k via TakeOrderedAndProject) asserted
  * against the EXECUTED plan, so a refactor that silently de-optimizes a
  * plan fails a spec instead of only dimming a benchmark number.
  *
  * Assertions are deliberately coarse (node presence / substring on the
  * plan string) — they pin the plan CLASS, not its exact shape, so AQE
  * re-planning and Spark-version node renames don't produce false alarms.
  */
class PlanSpec extends AnyFunSuite with SparkFixture {

  private def planOf(name: String): String = {
    val q = (Queries.all ++ QueriesGeo.all ++ QueriesText.all ++ QueriesPipe.all)
      .find(_.name == name).getOrElse(fail(s"no catalog query named $name"))
    val df = q.fn(spark, sfDir)
    df.count() // materialize so AQE finalizes (broadcast conversions happen at runtime)
    df.queryExecution.executedPlan.toString
  }

  test("q_knn_filtered: the metadata predicate reaches the documents scan; rank is group-limited") {
    val p = planOf("q_knn_filtered")
    assert(p.contains("EqualTo(lang,en)"),
      s"lang filter not pushed to the scan:\n${p.take(1500)}")
    assert(p.contains("WindowGroupLimit"),
      "per-query top-k must push the rank limit below the exchange")
  }

  test("q_hard_negatives: the cosine band filters BEFORE the rank window") {
    val p = planOf("q_hard_negatives")
    val iBand = p.indexOf("0.15")
    val iWin = p.indexOf("row_number")
    assert(iBand >= 0 && iWin >= 0, s"band filter + rank expected:\n${p.take(1500)}")
    // plan prints top-down: the window appears above (before) its child filter
    assert(iWin < iBand, "band predicate must sit under the rank, not over it")
    assert(p.contains("WindowGroupLimit"))
  }

  test("q_score_calibrate: corpus re-attaches by broadcast; windows see only the histogram") {
    val p = planOf("q_score_calibrate")
    assert(p.contains("BroadcastHashJoin"),
      s"histogram join-back should broadcast:\n${p.take(1500)}")
    // the window input is the (source, n_chars) aggregate, not the corpus:
    // the plan's Window nodes sit above a HashAggregate, never directly
    // over the parquet scan
    val iWin = p.indexOf("Window")
    assert(iWin >= 0 && p.indexOf("HashAggregate", iWin) >= 0,
      "cumulative window must read the aggregated histogram")
  }

  test("q_agg_pricing: shipdate filter is pushed to the parquet scan, columns pruned") {
    val p = planOf("q_agg_pricing")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate pushdown missing:\n${p.take(1500)}")
    // 5 needed columns of 11 — the scan schema must not read the rest
    assert(!p.contains("l_orderkey") && !p.contains("l_partkey"),
      "unused lineitem columns leaked into the scan")
  }

  test("q_join_broadcast: dimension chain joins broadcast, fact side never shuffles for them") {
    val p = planOf("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast dim joins:\n${p.take(1500)}")
  }

  test("q_big_orders: the HAVING-filtered agg drives broadcast report joins") {
    val p = planOf("q_big_orders")
    assert(p.contains("BroadcastHashJoin") || p.contains("broadcast"),
      s"expected AQE to broadcast the tiny big-orders set:\n${p.take(1500)}")
  }

  test("q_keyword_rank / q_bm25: top-k is TakeOrderedAndProject, never a global sort") {
    for (name <- Seq("q_keyword_rank", "q_bm25")) {
      val p = planOf(name)
      assert(p.contains("TakeOrderedAndProject"),
        s"$name: expected sort+limit to plan as TakeOrderedAndProject:\n${p.take(1500)}")
    }
  }

  test("q_substr_dedup: corpus-wide gram stage carries hashes, strings only after the sliver join") {
    val p = planOf("q_substr_dedup")
    // the first window pass (gram hash) must run BEFORE any substr
    // materialization: substring appears only downstream of the join
    val iHash = p.indexOf("window")
    val firstHash = if (iHash < 0) p.indexOf("Window") else iHash
    val iSub = p.indexOf("substr(_t")
    assert(firstHash >= 0 && iSub >= 0, s"expected window + substr nodes:\n${p.take(1200)}")
  }

  test("q_feature_hash_dup: blocked equi-join on the two-bucket key, no cartesian") {
    // r12 rebuild: candidates block on (b1, b2) at corpus-scaled dim —
    // the pair meeting must be a keyed join (hash/sort-merge), never a
    // cartesian or a non-local-build nested loop. The dot is the sparse
    // map-intersection HOF by design: candidate volume dropped 38x
    // (2.64 M -> 69 k at sf0.1), so lambda interpretation no longer
    // dominates any stage profile (the CLAUDE.md swap rule).
    val p = planOf("q_feature_hash_dup")
    assert(!p.contains("CartesianProduct"),
      s"pair stage degenerated to a cartesian:\n${p.take(1500)}")
    assert(p.contains("b1") && p.contains("b2"),
      s"expected the (b1, b2) blocking key in the plan:\n${p.take(1500)}")
  }

  test("q_sink_partitioned: the day range prunes PARTITIONS at the scan") {
    // the lane's whole point is the layout: the day filter must land in
    // PartitionFilters (directory pruning before any file read), not in
    // a post-scan Filter
    val p = planOf("q_sink_partitioned")
    val i = p.indexOf("PartitionFilters")
    assert(i >= 0, s"scan has no PartitionFilters section:\n${p.take(1500)}")
    assert(p.substring(i, math.min(p.length, i + 300)).contains("day"),
      s"day bounds missing from PartitionFilters:\n${p.substring(i, math.min(p.length, i + 300))}")
  }

  test("q_proximity_pairs: the pair join is a hash equi-join on (slot, cell), not a cross/NL join") {
    val p = planOf("q_proximity_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"proximity join degenerated to a non-equi join:\n${p.take(1500)}")
  }

  test("rankBounded: window keeps a non-empty partition spec (foldable-key pruning guard)") {
    // Spark 4 prunes constant-FOLDABLE keys out of window partition
    // specs, so a lit(0) key silently degrades to the empty-spec
    // move-everything-to-one-partition plan (r9: 94 WindowExec warnings
    // per Verify run traced to exactly this). rankBounded's key must
    // stay in the executed plan.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.functions.col
    val top = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("n_chars").desc, col("doc_id")).limit(5)
    val df = operators.Text.rankBounded(top, Seq(col("n_chars").desc, col("doc_id")))
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val wins = plan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty, s"expected a WindowExec in the rankBounded plan:\n$plan")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "rankBounded window lost its partition key (foldable-key pruning regression)")
  }
}
