package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process._

/** Gate for scripts/baseline.py's headline arithmetic (r11 verdict item
  * 3): the like-for-like lane set must be COMPUTED from the previous
  * round's BASELINE.md (parse_baseline_md), never hand-curated, and the
  * three first-class aggregates (comparable-pool sum ratio,
  * like-for-like sum ratio with the previous round's number over the
  * SAME set, timeout-inclusive lower bound) must be the arithmetic they
  * claim. The script carries its own fixture-driven selftest; this spec
  * runs it so `sbt test` holds the contract.
  */
class BaselineScriptSpec extends AnyFunSuite {

  test("baseline.py --selftest: like-for-like set parsed programmatically, aggregates exact") {
    val python = Seq("sh", "-c", "command -v python3").!!.trim
    assume(python.nonEmpty, "python3 not on PATH — selftest runs driver-side")
    val out = new StringBuilder
    val code = Process(Seq("python3", "scripts/baseline.py", "--selftest"),
      new java.io.File(".")).!(ProcessLogger(out ++= _, out ++= _))
    assert(code == 0, s"selftest failed:\n$out")
    assert(out.toString.contains("selftest OK"), out.toString)
  }
}
