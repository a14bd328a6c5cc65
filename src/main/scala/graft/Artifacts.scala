package graft

/** Collision-resistant /tmp roots for per-(corpus, kind) derived artifacts
  * (MV summaries, Versioned demo tables, persisted IVF indexes). The r9
  * scheme keyed on 31-bit `dir.hashCode` — collidable across corpora and
  * shared by every user on the machine (ADVICE r9). Keys are now the first
  * 64 bits of SHA-256 over the ABSOLUTE corpus path (content-independent,
  * stable across JVMs for the same corpus, 2^-32 birthday risk at even
  * thousands of corpora), rooted under a per-user directory so concurrent
  * users never contend on each other's artifacts.
  */
object Artifacts {

  private lazy val userRoot: java.nio.file.Path = {
    val u = Option(System.getProperty("user.name")).getOrElse("anon")
      .replaceAll("[^A-Za-z0-9._-]", "_")
    java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_TMP", s"/tmp/graft-$u"))
  }

  /** Deterministic artifact root for (kind, corpus dir); creates the
    * per-user parent, not the artifact dir itself (writers own that).
    */
  def dir(kind: String, sfDir: String): String = {
    val abs = java.nio.file.Paths.get(sfDir).toAbsolutePath.normalize.toString
    val h = java.security.MessageDigest.getInstance("SHA-256")
      .digest(abs.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    java.nio.file.Files.createDirectories(userRoot)
    userRoot.resolve(s"${kind}_$h").toString
  }
}
