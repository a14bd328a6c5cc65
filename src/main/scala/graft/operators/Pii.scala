package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines (the
  * scrub-before-train step every public corpus pipeline runs — C4/CCNet
  * family): per-document pattern hits by kind, and in-place masking with
  * typed placeholder tokens.
  *
  * Patterns are deliberately written in the regex subset that Java's
  * engine and RE2 (DuckDB) interpret identically — character classes,
  * bounded repetition, non-capturing groups, ASCII `\b` — so the DuckDB
  * oracle replays detection and redaction exactly (leftmost-first
  * semantics agree on this subset; no backreferences, no lookaround).
  *
  * Scale (100 TB): both operators are pure per-row projections over the
  * scan — zero shuffles, zero state, codegen'd regex evaluation inside
  * whole-stage codegen, compose with column pruning and partition
  * pruning, and stream at ingest unchanged (same projection under
  * `readStream`). The cost is O(bytes scanned), embarrassingly parallel.
  */
object Pii {

  /** Detection patterns in REDACTION ORDER. Order is part of the contract
    * (earlier redactions must not manufacture later matches — placeholder
    * tokens contain no digits or '@', so any order-dependence is ruled
    * out by construction, but oracle SQL still applies them identically).
    */
  val Patterns: Seq[(String, String)] = Seq(
    "email" -> """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
    "ipv4"  -> """\b(?:\d{1,3}\.){3}\d{1,3}\b""",
    "ssn"   -> """\b\d{3}-\d{2}-\d{4}\b""",
    "phone" -> """\b\d{3}-\d{3}-\d{4}\b"""
  )

  /** Per-kind hit counts: adds one `pii_<kind>` LONG column per pattern
    * plus `pii_total`. Counting, not extraction — the scan stays a
    * projection and the aggregate rollup downstream is a plain sum.
    */
  def scan(df: DataFrame, text: Column): DataFrame = {
    val withCounts = Patterns.foldLeft(df) { case (d, (kind, pat)) =>
      d.withColumn(s"pii_$kind", regexp_count(text, lit(pat)).cast("long"))
    }
    withCounts.withColumn("pii_total",
      Patterns.map { case (k, _) => col(s"pii_$k") }
        .reduce((a: Column, b: Column) => a + b))
  }

  /** Masked text: every pattern hit replaced by its `[KIND]` placeholder,
    * applied in [[Patterns]] order. Adds `redacted`.
    */
  def redact(df: DataFrame, text: Column): DataFrame = {
    val masked = Patterns.foldLeft(text) { case (c, (kind, pat)) =>
      regexp_replace(c, pat, s"[${kind.toUpperCase}]")
    }
    df.withColumn("redacted", masked)
  }
}
