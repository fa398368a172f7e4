package graft.func

/** JVM-scoped temp directories with shutdown cleanup — shared by every
  * fixture/sink path that materializes parquet under /tmp (Sinks,
  * LogNested, CdcEnvelope), so no caller re-implements the cache
  * without its cleanup half. */
object TempDirs {
  /** A FRESH directory per call, recursively deleted at JVM exit.
    * Callers that need one directory per logical key must cache the
    * returned path (Sinks/LogNested/CdcEnvelope each keep a
    * per-key map whose miss branch also writes the content) — calling
    * this per query invocation would accumulate a directory and a
    * shutdown hook per call. */
  def scoped(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f): Unit)
    }
    p.toString
  }
}
