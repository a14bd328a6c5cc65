package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guard for the driver's BENCH artifact (the r5–r7 killer): the
  * collector keeps only the last ~2000 chars of stdout and parses a JSON
  * line out of that tail, so Bench's final line must stay comfortably
  * under that no matter how the catalog grows. No SparkSession needed —
  * this tests the pure formatter.
  */
class BenchLineSpec extends AnyFunSuite {

  private def fakeCatalog(n: Int): Seq[(String, Double)] =
    (0 until n).map { i =>
      // worst-case realistic names (the catalog's longest is ~22 chars)
      // and times with full double precision before formatting
      (f"q_synthetic_operator_name_$i%03d", 0.123456789 * (i % 17 + 1))
    }

  test("compact line stays under 1700 chars at 250 queries") {
    val best = fakeCatalog(250)
    val line = Bench.compactLine(best, best.map(_._2).sum, "/root/testdata/sf0.1",
      floorMs = 166.123456)
    assert(line.length < 1700, s"line is ${line.length} chars")
    // and is a single line of valid-enough JSON shape for the collector
    assert(!line.contains("\n"))
    assert(line.startsWith("{\"metric\":\"total\"") && line.endsWith("}"))
    // box self-calibration field (r16): present, 1-dp, addition-only
    assert(line.contains("\"floor_ms\":166.1"))
  }

  test("partial runs route to BENCH_PARTIAL.json, never the round record") {
    // the r9 verdict 3a fix: a named-query iteration run must not clobber
    // the full-catalog BENCH_FULL.json artifact
    assert(Bench.artifactPath(partial = true) == "BENCH_PARTIAL.json")
    assert(Bench.artifactPath(partial = false) == "BENCH_FULL.json")
  }

  test("artifact roots separate corpora whose paths share a 31-bit hashCode") {
    // the r9 ADVICE failure mode: "Aa" and "BB" have identical
    // String.hashCode, so the old scheme keyed both corpora to ONE /tmp
    // dir; the SHA-256 keying must not
    assert("/tmp/xAa".hashCode == "/tmp/xBB".hashCode) // the trap is real
    val a = Artifacts.dir("spec", "/tmp/xAa")
    val b = Artifacts.dir("spec", "/tmp/xBB")
    assert(a != b)
    // and the keying is stable across calls (same corpus -> same root)
    assert(a == Artifacts.dir("spec", "/tmp/xAa"))
  }

  test("failed lanes count but never leak unbounded entries into the line") {
    val best = fakeCatalog(250).zipWithIndex.map {
      case ((k, v), i) => (k, if (i % 3 == 0) -1.0 else v)
    }
    val line = Bench.compactLine(best, 0.0, "/root/testdata/sf0.1")
    assert(line.length < 1700)
    assert(line.contains("\"fail\":84"))
    assert(!line.contains("-1.000"), "failed lanes must not enter the top list")
  }
}
