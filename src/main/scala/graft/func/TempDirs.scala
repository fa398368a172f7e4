package graft.func

/** JVM-scoped temp directories with shutdown cleanup — shared by every
  * fixture/sink path that materializes parquet under /tmp (Sinks,
  * LogNested, CdcEnvelope), so no caller re-implements the cache
  * without its cleanup half. */
object TempDirs {
  /** One directory per (JVM, tag), created on first use — the cache
    * half every overwrite-mode sink path needs (bench reruns re-write
    * the SAME directory, so timing measures the write path, not
    * filesystem accumulation). Hoisted here so no caller re-implements
    * it and forgets the cleanup. */
  private val cachedDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** [[cached]] keyed by an input-directory string: the shardExport
    * keying (wide-charset sanitize + hashCode to stay
    * lowercase-collision-proof), hoisted so the five fixture sinks
    * share ONE copy of the key derivation. */
  def cachedFor(prefix: String, dir: String): String =
    cached(s"$prefix-${dir.replaceAll("[^A-Za-z0-9._-]", "_")}" +
      s"-${Integer.toHexString(dir.hashCode)}")

  def cached(tag: String): String =
    cachedDirs.get(tag) match {
      case Some(p) => p
      case None =>
        // TrieMap.getOrElseUpdate is not atomic: two first-use racers
        // would both mint a directory and one path would leak. CAS via
        // putIfAbsent; the loser deletes its directory now (its
        // shutdown hook stays registered but no-ops on the missing
        // path).
        val fresh = scoped(tag)
        cachedDirs.putIfAbsent(tag, fresh) match {
          case None => fresh
          case Some(winner) =>
            deleteRecursively(java.nio.file.Paths.get(fresh))
            winner
        }
    }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f): Unit)
  }

  /** A FRESH directory per call, recursively deleted at JVM exit.
    * Callers that need one directory per logical key should use
    * [[cached]] — calling this per query invocation would accumulate
    * a directory and a shutdown hook per call. */
  def scoped(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook { deleteRecursively(p) }
    p.toString
  }
}
