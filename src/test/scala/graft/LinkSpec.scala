package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Link

class LinkSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("two-pass blocking is exhaustive for single-edit variants of len >= 4") {
    val registry = Seq("table", "window", "spark").toDF("w")
    // all single-char deletions of "table": first-2-broken ones ("able",
    // "tble") must be caught by the last-2 pass and vice versa
    val dirty = Seq("able", "tble", "tale", "tabe", "tabl").toDF("d")
    val got = Link.fuzzyLink(dirty, "d", registry, "w", 1)
      .select("d", "w").as[(String, String)].collect().toSet
    assert(got == dirty.as[String].collect().map(d => (d, "table")).toSet)
  }

  test("refine excludes blocked candidates beyond the edit budget") {
    val registry = Seq("table", "tablet").toDF("w")
    val dirty = Seq("taxxx").toDF("d") // shares first-2 block, dist 3
    assert(Link.fuzzyLink(dirty, "d", registry, "w", 1).count() == 0)
  }

  test("maxBlockSize drops only oversized blocks; other passes still surface their pairs") {
    // 50 registry words share the "xq" prefix block (oversized); their
    // last-2 chars differ, so the last-2 pass still finds the true match
    val registry = ((0 until 50).map(i => f"xq$i%03d") :+ "table").toDF("w")
    val dirty = Seq("xq007x", "tabl").toDF("d")
    val keys = Seq(
      (substring(col("d"), 1, 2), substring(col("w"), 1, 2)),
      (substring(col("d"), -2, 2), substring(col("w"), -2, 2)))
    val uncapped = Link.blockedCandidates(dirty, "d", registry, "w", keys)
    val capped = Link.blockedCandidates(dirty, "d", registry, "w", keys, 10L)
    // uncapped: the xq block contributes 50 candidates for xq007x
    assert(uncapped.where(col("d") === "xq007x").count() >= 50)
    // capped: the oversized first-2 block is dropped, but "tabl" -> "table"
    // (block size 1 in both its passes) survives untouched
    assert(capped.where(col("d") === "xq007x" && col("w") =!= "xq007x").count() < 50)
    assert(capped.where(col("d") === "tabl" && col("w") === "table").count() == 1)
  }

  test("candidates never include pairs outside every block") {
    val registry = Seq("zzzzz").toDF("w")
    val dirty = Seq("aaaa").toDF("d")
    assert(Link.blockedCandidates(dirty, "d", registry, "w", Seq(
      (substring(col("d"), 1, 2), substring(col("w"), 1, 2)))).count() == 0)
  }
}
