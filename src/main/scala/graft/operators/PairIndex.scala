package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once near-dup PAIR INDEX (r9 verdict item 3): the sketch-tier
  * pair joins (PTJ bigram-Jaccard, MinHash-LSH, SimHash) used to be
  * rebuilt from raw text by every graph/audit diagnostic lane — ~26 s of
  * a 151 s bench was six lanes re-running the same pair join. Pairs now
  * materialize ONCE per (session, corpus, tier) into a [[graft.sources.Versioned]]
  * table and every consumer reads the session-PINNED manifest version, so
  *
  *   - the pair join runs once per session (the q_knn_ivf_batch
  *     index-reuse precedent, at the pair tier);
  *   - consumers are manifest-pinned: a concurrent rebuild (or another
  *     session committing a newer version) can never smear what this
  *     session's lanes read — exactly the snapshot-isolation property the
  *     Versioned layer is gated on;
  *   - at 100 TB this is the production shape anyway: the pair index is
  *     the expensive corpus-wide artifact you persist and re-derive
  *     diagnostics from, not a per-query subexpression.
  *
  * The gated `q_pair_index` lane calls [[rebuild]] — an ALWAYS-fresh
  * build+commit — so the build cost stays visible in the bench instead of
  * hiding in whichever diagnostic happens to touch the index first; its
  * generated oracle replays the rollup from the SAME immutable batch
  * files the pinned manifest lists.
  *
  * Builds are deterministic (cross-engine poly-hash sketches over a fixed
  * corpus), so index contents equal the from-scratch build bit-for-bit —
  * PairIndexSpec asserts indexed == standalone per tier, and every
  * consumer lane's from-raw-text DuckDB oracle keeps hash-matching
  * through the index by construction.
  */
object PairIndex {

  private val lock = new Object
  // (session, corpus dir, tier) -> (table root, pinned manifest version)
  private val pinned =
    scala.collection.mutable.Map[(SparkSession, String, String), (String, Int)]()

  def root(kind: String, dir: String): String =
    graft.Artifacts.dir(s"pairs_$kind", dir)

  /** Read the session-pinned immutable pair table for (corpus, tier),
    * building and committing it first iff this session hasn't yet.
    *
    * Pins are process-local but the table root is shared across JVMs of
    * the same user+corpus, so a CONCURRENT session rebuilding 4+ times
    * can vacuum the manifest this session is pinned to (r11 ADVICE).
    * Guard: if the pinned version's manifest is gone, transparently
    * rebuild + re-pin instead of throwing — contents are deterministic
    * per (corpus, tier), so the re-pinned read is bit-identical to the
    * vacuumed one (PairIndexSpec races 5 rebuilds against a v-pinned
    * reader).
    */
  def pinnedRead(s: SparkSession, dir: String, kind: String)
                (build: => DataFrame): DataFrame = {
    val (r, v) = lock.synchronized {
      val rv = pinned.getOrElseUpdate((s, dir, kind),
        commitFresh(dir, kind, build))
      if (graft.sources.Versioned.hasVersion(rv._1, rv._2)) rv
      else {
        val fresh = commitFresh(dir, kind, build)
        pinned((s, dir, kind)) = fresh
        fresh
      }
    }
    graft.sources.Versioned.read(s, r, v)
  }

  /** Force a fresh build + overwrite-commit and re-pin the session to the
    * new version (the gated build lane). Returns (root, version).
    */
  def rebuild(s: SparkSession, dir: String, kind: String)
             (build: => DataFrame): (String, Int) = lock.synchronized {
    val rv = commitFresh(dir, kind, build)
    pinned((s, dir, kind)) = rv
    rv
  }

  /** The session's pinned (root, version) for (corpus, tier), if built. */
  def pinnedVersion(s: SparkSession, dir: String,
                    kind: String): Option[(String, Int)] =
    lock.synchronized(pinned.get((s, dir, kind)))

  private def commitFresh(dir: String, kind: String,
                          build: => DataFrame): (String, Int) = {
    val rt = root(kind, dir)
    val v = graft.sources.Versioned.commit(build, rt, overwrite = true)
    // bound on-disk growth across JVMs/rebuilds while keeping enough
    // history that a concurrently-pinned older version stays readable
    graft.sources.Versioned.vacuum(rt, keepVersions = 4)
    (rt, v)
  }
}
