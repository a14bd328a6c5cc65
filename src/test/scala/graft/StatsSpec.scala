package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Analytic-extreme checks for the r9 corpus-statistics screens
  * (Spearman / kappa / Gini / TVD / Chao1 / burstiness): crafted
  * corpora whose statistic is known in closed form, pushed through the
  * REAL catalog queries (temp documents.parquet, same loader path), so
  * a formula slip fails here rather than only shifting oracle-matched
  * numbers both engines agree on.
  */
class StatsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stats").toString
    rows.map { case (id, src, text) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(name: String, dir: String) =
    Queries.queries(name)(spark, dir)

  test("spearman: monotone corpus scores exactly 10000, reversed exactly -10000") {
    val mono = (1L to 6L).map { i =>
      (i, "mono", (1L to i).map(j => f"w$j%02d").mkString(" "))
    }
    // dw strictly increasing while length strictly decreases
    val anti = (1L to 6L).map { i =>
      val distinct = (1 to i.toInt).map(j => ('a' + j).toChar.toString)
      val pad = Seq.fill(20 - 3 * i.toInt)("qq")
      (10 + i, "anti", (distinct ++ pad).mkString(" "))
    }
    val out = run("q_spearman", writeDocs(mono ++ anti))
      .select("source", "rho_bp").as[(String, Long)].collect().toMap
    assert(out("mono") == 10000L, s"mono: ${out("mono")}")
    assert(out("anti") == -10000L, s"anti: ${out("anti")}")
  }

  test("kappa: perfect agreement = 10000, perfect disagreement on balanced margins = -10000, degenerate margins filtered") {
    val longDiverse = (1 to 30).map(j => f"verylong$j%02d").mkString(" ")
    val agree = (1L to 6L).map { i =>
      (i, "agree", if (i <= 3) longDiverse else "w w w")
    }
    val disagree = (1L to 6L).map { i =>
      (10 + i, "disagree",
        if (i <= 3) "x" * 300
        else ('a' to 'y').map(_.toString).mkString(" "))
    }
    val degenerate = (1L to 4L).map(i => (20 + i, "degen", "w w w"))
    val out = run("q_kappa", writeDocs(agree ++ disagree ++ degenerate))
      .select("source", "kappa_bp").as[(String, Long)].collect().toMap
    assert(out("agree") == 10000L, s"agree: ${out("agree")}")
    assert(out("disagree") == -10000L, s"disagree: ${out("disagree")}")
    assert(!out.contains("degen"), "constant-margin source must be guarded out")
  }

  test("gini: identical lengths = 0; concentration is positive and ordered") {
    val flat = (1L to 5L).map(i => (i, "flat", "same same same"))
    val skew = Seq((10L, "skew", "a"), (11L, "skew", "b"),
      (12L, "skew", "c" * 200))
    val mild = Seq((20L, "mild", "a" * 90), (21L, "mild", "b" * 100),
      (22L, "mild", "c" * 110))
    val out = run("q_gini", writeDocs(flat ++ skew ++ mild))
      .select("source", "gini_bp").as[(String, Long)].collect().toMap
    assert(out("flat") == 0L, s"flat: ${out("flat")}")
    assert(out("skew") > out("mild") && out("mild") > 0L,
      s"skew ${out("skew")} vs mild ${out("mild")}")
  }

  test("tvd: two sources with identical word distributions both read 0") {
    val docs = Seq(
      (1L, "s1", "a a b"), (2L, "s1", "b c c"),
      (3L, "s2", "a a b"), (4L, "s2", "b c c"))
    val out = run("q_tvd_mix", writeDocs(docs))
      .select("source", "tvd_bp").as[(String, Long)].collect().toMap
    assert(out == Map("s1" -> 0L, "s2" -> 0L), out.toString)
  }

  test("tvd: disjoint-vocabulary sources split the corpus mass exactly") {
    // two equal-sized sources with NO shared words: each source's dist
    // vs the 50/50 corpus mix has TVD exactly 1/2 -> 5000 bp
    val docs = Seq(
      (1L, "s1", "a a a a"), (2L, "s1", "b b b b"),
      (3L, "s2", "c c c c"), (4L, "s2", "d d d d"))
    val out = run("q_tvd_mix", writeDocs(docs))
      .select("source", "tvd_bp").as[(String, Long)].collect().toMap
    assert(out == Map("s1" -> 5000L, "s2" -> 5000L), out.toString)
  }

  test("chao1: all-doubleton source estimates D with full coverage; all-singleton source extrapolates") {
    val docs = Seq(
      // two identical docs: trigrams {p q r, q r s} each seen twice ->
      // f1=0, f2=2, chao1 = D = 2, coverage = 10000
      (1L, "dup2", "p q r s"), (2L, "dup2", "p q r s"),
      // one doc, every trigram a singleton -> f1=2, f2=0,
      // chao1 = 2 + 2*1/2 = 3, coverage = (2-2)*1e4/2 = 0
      (3L, "single", "t u v w"))
    val out = run("q_chao1", writeDocs(docs))
      .select("source", "chao1", "coverage_bp").as[(String, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("dup2") == ((2L, 10000L)), s"dup2: ${out("dup2")}")
    assert(out("single") == ((3L, 0L)), s"single: ${out("single")}")
  }

  test("chunkPassages: full coverage, overlap stride, short tail; batch == stream (stateless)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Text
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // analytic shape: n=85, W=32, S=24 -> chunks at 1/25/49/73 with
    // lens 32/32/32/13; n=5 -> one short chunk; n=32 -> exactly one
    val docs = Seq(
      (1L, (1 to 85).map(i => s"t$i").mkString(" ")),
      (2L, "a b c d e"),
      (3L, (1 to 32).map(i => s"u$i").mkString(" ")))
    val batch = Text.chunkPassages(docs.toDF("doc_id", "text"),
      "doc_id", col("text"), 32L, 24L)
    val rows = batch.select("doc_id", "chunk_id", "start_tok", "len_tok")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(rows.filter(_._1 == 1L).map(r => (r._3, r._4)) ==
      Set((1L, 32L), (25L, 32L), (49L, 32L), (73L, 13L)))
    assert(rows.filter(_._1 == 2L) == Set((2L, 0L, 1L, 5L)))
    assert(rows.filter(_._1 == 3L) == Set((3L, 0L, 1L, 32L)))
    // every token covered: max(start+len-1) = n and starts tile by S
    val batchAll = batch.collect().map(_.toSeq).toSet

    // stateless => the SAME code runs over a stream, any slicing
    val input = MemoryStream[(Long, String)]
    val q = Text.chunkPassages(input.toDS().toDF("doc_id", "text"),
        "doc_id", col("text"), 32L, 24L)
      .writeStream.format("memory").queryName("stream_chunks")
      .outputMode("append").start()
    try {
      input.addData(docs.take(1)); q.processAllAvailable()
      input.addData(docs.drop(1)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("stream_chunks").collect().map(_.toSeq).toSet
    assert(streamed == batchAll, "stream output must equal batch output")
  }

  test("markov stationary: deterministic alternating chain fixes the uniform point exactly") {
    // user alternates A,B,A,B,... -> P(A->B)=P(B->A)=1; power iteration
    // from the uniform start is an EXACT fixed point (every term is
    // pi*n div r = pi, no truncation loss), so 8 rounds return exactly
    // (500000, 500000)
    val dir = java.nio.file.Files.createTempDirectory("graft_markov").toString
    (1 to 20).map { i =>
      (1L, i.toLong * 1000000000L, i.toLong,
        if (i % 2 == 0) "A" else "B", 1.0, "{}")
    }.toDF("user_id", "ts", "event_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Queries.queries("q_markov_stationary")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(out == Map("A" -> 500000L, "B" -> 500000L), out.toString)
  }

  test("burstiness: constant word = 0, poisson-ish alternating word = 10000, one-doc spike explodes") {
    // 40 docs; 'a' appears twice in every even doc (Fano = 1 exactly),
    // 'b' once in every doc (Fano = 0), 'z' 30 times in one doc
    val docs = (1L to 40L).map { i =>
      val base = if (i % 2 == 0) "a a b" else "b"
      val text = if (i == 1L) base + (" z" * 30) else base
      (i, "burst", text)
    }
    val out = run("q_burstiness", writeDocs(docs))
      .select("w", "fano_bp").as[(String, Long)].collect().toMap
    assert(out("b") == 0L, s"b: ${out("b")}")
    assert(out("a") == 10000L, s"a: ${out("a")}")
    assert(out("z") > 100000L, s"z: ${out("z")}")
  }
}
