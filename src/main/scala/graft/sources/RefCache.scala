package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-data caches (reference: ref/airframecache.go:17 — the
  * Icao24→Airframe map "built up over time" and persisted as a singleton
  * blob; ref/schedulecache.go is the same shape for schedules). The
  * reference loads the whole map into memory, mutates with Set(), and
  * periodically re-saves.
  *
  * Spark form: the cache IS a small [[Versioned]] table keyed by the
  * lookup id — refresh = MERGE upsert (newer observations replace the
  * keyed row, one atomic snapshot commit, full history time-travelable),
  * and enrichment = a BROADCAST join of the fact stream against the
  * pinned latest snapshot (the cache is airframe-registry-sized — 10⁵-10⁶
  * rows — exactly the broadcast-dimension regime; a reader binds to ONE
  * manifest so a concurrent refresh can't tear its view mid-job). The
  * reference's in-memory map + gzip singleton collapses into machinery
  * the engine already trusts: §2.78's commit/CAS protocol and §2.2's
  * broadcast join — no bespoke serialization, no cache/DB coherence
  * problem, and stale-read semantics are explicit (you joined snapshot v;
  * v is immutable).
  */
object RefCache {

  /** Merge fresh observations into the cache table (reference Set() +
    * SaveAirframeCache, but atomic and versioned): rows in `updates`
    * replace same-key rows, new keys append. Single-writer (the
    * mergeUpsert precondition — the reference's cron refresh is also a
    * single writer). Returns the new version.
    */
  def refresh(dir: String, updates: DataFrame, key: String): Int =
    Versioned.mergeUpsert(dir, updates, key)

  /** Enrich `facts` with cache columns by `key` — LEFT join so unknown
    * ids pass through with nulls (the reference's Get() returning nil).
    * The cache side is explicitly `broadcast()`: registry-sized, never a
    * shuffle of the fact stream. Pass `version` to pin an older snapshot
    * (reproducing yesterday's enrichment exactly — the capability the
    * reference's mutate-in-place map fundamentally cannot offer).
    */
  def lookup(spark: SparkSession, facts: DataFrame, dir: String, key: String,
             version: Int = -1): DataFrame =
    facts.join(broadcast(Versioned.read(spark, dir, version)), Seq(key), "left")
}
