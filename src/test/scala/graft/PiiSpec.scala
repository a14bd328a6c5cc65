package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pii

/** PII detect/redact semantics on hand-built inputs, pinning exactly the
  * behaviors the cross-engine oracle relies on (per-kind counts, masking
  * order, pattern disjointness on the decorated corpus).
  */
class PiiSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val sample = Seq(
    (1L, "mail u12@ex3.example.com here"),
    (2L, "node 10.1.200.3 responded"),
    (3L, "id 321-45-6789 on file"),
    (4L, "call 555-123-4567 now"),
    (5L, "clean text with digits 123456 and 1.2 only"),
    (6L, "two mails a@b.co c@d.org and ip 192.168.0.1")
  ).toDF("doc_id", "text")

  test("scan counts each kind once and only where present") {
    val out = Pii.scan(sample, col("text"))
      .select("doc_id", "pii_email", "pii_ipv4", "pii_ssn", "pii_phone", "pii_total")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 1L, 0L, 0L, 0L, 1L),
      (2L, 0L, 1L, 0L, 0L, 1L),
      (3L, 0L, 0L, 1L, 0L, 1L),
      (4L, 0L, 0L, 0L, 1L, 1L),
      (5L, 0L, 0L, 0L, 0L, 0L),
      (6L, 2L, 1L, 0L, 0L, 3L)))
  }

  test("ssn and phone patterns do not cross-match each other") {
    val df = Seq((1L, "555-123-4567 321-45-6789")).toDF("doc_id", "text")
    val out = Pii.scan(df, col("text"))
      .select("pii_ssn", "pii_phone").as[(Long, Long)].head()
    assert(out == ((1L, 1L)))
  }

  test("redact masks every kind with its typed placeholder") {
    val out = Pii.redact(sample, col("text"))
      .select("doc_id", "redacted").as[(Long, String)].collect().toMap
    assert(out(1L) == "mail [EMAIL] here")
    assert(out(2L) == "node [IPV4] responded")
    assert(out(3L) == "id [SSN] on file")
    assert(out(4L) == "call [PHONE] now")
    assert(out(5L) == "clean text with digits 123456 and 1.2 only")
    assert(out(6L) == "two mails [EMAIL] [EMAIL] and ip [IPV4]")
  }

  test("redacted text has zero residual hits (fixpoint)") {
    val red = Pii.redact(sample, col("text"))
    val residual = Pii.scan(red, col("redacted"))
      .agg(sum("pii_total")).as[Long].head()
    assert(residual == 0L)
  }

  test("scan + redact on the sf0.001 decorated corpus: hits exist and mask cleanly") {
    val dir = "/root/testdata/sf0.001"
    val decorated = Queries.queries("q_pii_redact")(spark, dir)
    val n = decorated.count()
    assert(n > 0, "decoration must produce PII-bearing docs at sf0.001")
    // no residual PII in any redacted doc
    val residual = Pii.scan(decorated, col("redacted"))
      .agg(sum("pii_total")).as[Long].head()
    assert(residual == 0L)
  }
}
