package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned table: immutable data batches + manifest files — the
  * time-travel/snapshot-isolation primitive every table format (Delta,
  * Iceberg, Hudi) builds on, reduced to its load-bearing core:
  *
  *   - every commit writes a NEW batch directory (data files are never
  *     mutated) and a manifest listing the batch dirs that make up that
  *     version — append commits extend the previous list, overwrite
  *     commits (compaction, rewrite) start a fresh list;
  *   - a reader binds to ONE manifest, so it sees an immutable snapshot
  *     regardless of concurrent commits (readers never list the data
  *     directory itself — that is what makes object-store listings safe);
  *   - old versions stay readable until [[vacuum]] drops their manifests
  *     and any batch no surviving manifest references.
  *
  * At 100 TB the manifest is the unit that makes O(1)-metadata snapshot
  * reads possible: version resolution is one small-file read, not a
  * recursive listing of millions of objects. (A production format adds
  * an atomic commit protocol — rename/CAS on the manifest — and
  * per-file column stats; both compose with this layout.)
  */
object Versioned {

  private def manifestPath(dir: String, v: Int) =
    Paths.get(dir, f"manifest-$v%06d.txt")

  /** Latest committed version, -1 if none. */
  def currentVersion(dir: String): Int = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return -1
    Files.list(d).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("manifest-") && s.endsWith(".txt") =>
        s.stripPrefix("manifest-").stripSuffix(".txt").toInt }
      .foldLeft(-1)(math.max)
  }

  private def readManifest(dir: String, v: Int): Seq[String] = {
    val p = manifestPath(dir, v)
    require(Files.exists(p), s"Versioned: no version $v at $dir")
    Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty)
  }

  /** Commit `df` as the next version. `overwrite = false` appends the new
    * batch to the previous version's batch list; `overwrite = true` makes
    * the new batch the ENTIRE table (rewrite/compaction commit) — in both
    * cases previously written batches are untouched, so every older
    * version stays byte-identical. Returns the new version number.
    */
  def commit(df: DataFrame, dir: String, overwrite: Boolean = false): Int = {
    val cur = currentVersion(dir)
    val next = cur + 1
    val batch = f"batch-$next%06d"
    df.write.parquet(s"$dir/$batch")
    val prev = if (overwrite || cur < 0) Seq.empty else readManifest(dir, cur)
    Files.createDirectories(Paths.get(dir))
    Files.write(manifestPath(dir, next),
      (prev :+ batch).mkString("\n").getBytes("UTF-8"))
    next
  }

  /** Snapshot read of a specific version (default: latest). The returned
    * frame reads exactly that manifest's batch dirs — a concurrent commit
    * cannot change what this reader sees.
    */
  def read(spark: SparkSession, dir: String, version: Int = -1): DataFrame = {
    val v = if (version < 0) currentVersion(dir) else version
    require(v >= 0, s"Versioned: empty table at $dir")
    val batches = readManifest(dir, v).map(b => s"$dir/$b")
    spark.read.parquet(batches: _*)
  }

  /** Drop all manifests older than `keepVersions` back from the latest,
    * then delete every batch directory no surviving manifest references.
    * Returns the deleted batch dirs. Batches referenced by ANY kept
    * version survive — time travel within the retention window keeps
    * working after vacuum.
    */
  def vacuum(dir: String, keepVersions: Int = 1): Seq[String] = {
    require(keepVersions >= 1, "Versioned.vacuum: keep at least the latest")
    val cur = currentVersion(dir)
    if (cur < 0) return Seq.empty
    val cutoff = cur - keepVersions + 1
    val (dropped, kept) = (0 to cur).filter(v =>
      Files.exists(manifestPath(dir, v))).partition(_ < cutoff)
    val live = kept.flatMap(readManifest(dir, _)).toSet
    val dead = dropped.flatMap(readManifest(dir, _)).distinct
      .filterNot(live.contains)
    dropped.foreach(v => Files.delete(manifestPath(dir, v)))
    dead.foreach { b =>
      val p = Paths.get(dir, b)
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.delete(f))
    }
    dead.map(b => s"$dir/$b")
  }
}
