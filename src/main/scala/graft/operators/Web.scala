package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus URL hygiene: canonicalization, host extraction, per-host
  * quotas — the CommonCrawl/C4-style stage that runs before text dedup (a
  * crawl's duplicate URLs and host-level spam dominate raw volume; ref
  * analog: the feed-ingest normalization in fr24/fa/aex parsers, which
  * canonicalize airport codes and ids the same way).
  *
  * Every rule is a scan-stage regexp projection in the Java∩RE2 subset
  * (the Pii discipline), so the operator streams at ingest, costs zero
  * shuffles, and a SQL engine replays the canonical form byte-for-byte.
  */
object Web {

  /** Canonical URL form: fragment dropped; scheme and host lowercased;
    * default ports (:80/:443) stripped; trailing path slashes stripped;
    * query reduced to the content-identifying `id=` parameter (tracking
    * params — utm_* and friends — dropped). Scheme normalizes to https
    * (the dedup-key choice: http/https variants of one resource collapse).
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val host = regexp_replace(
      lower(regexp_extract(noFrag, "^[a-zA-Z]+://([^/?#]+)", 1)),
      ":(443|80)$", "")
    val path = regexp_replace(
      regexp_extract(noFrag, "^[a-zA-Z]+://[^/?#]*([^?#]*)", 1), "/+$", "")
    val qid = regexp_extract(noFrag, "[?&](id=[0-9]+)", 1)
    concat(lit("https://"), host, path,
      when(qid === "", lit("")).otherwise(concat(lit("?"), qid)))
  }

  /** Host of an already-canonical URL (lowercased, port-free by contract). */
  def hostOf(canonical: Column): Column =
    regexp_extract(canonical, "^https://([^/?#]+)", 1)
}
