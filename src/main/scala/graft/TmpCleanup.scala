package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** RAM-disk hygiene for the bench/verify harness temp dirs: /dev/shm is
  * MEMORY, so a leaked fixture directory is leaked RAM that survives the
  * JVM. Every run (a) sweeps stale dirs left by crashed prior runs and
  * (b) registers a shutdown hook for its own dir — the pair bounds tmpfs
  * usage at one run's footprint no matter how many times the driver
  * invokes the harness.
  */
object TmpCleanup {

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.foreach(deleteRecursively) finally s.close()
    }
    try Files.deleteIfExists(p) catch { case _: Exception => () }
  }

  /** Best-effort removal of prior runs' dirs under `base` whose name starts
    * with `prefix` and whose mtime is older than an hour (a concurrently
    * RUNNING harness keeps touching its dir, so an hour of silence means a
    * dead run).
    */
  def sweepStale(base: Path, prefix: String, maxAgeMillis: Long = 3600000L): Unit =
    try {
      val cutoff = System.currentTimeMillis() - maxAgeMillis
      val s = Files.list(base)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith(prefix))
        .filter(p => Files.getLastModifiedTime(p).toMillis <= cutoff)
        .foreach(deleteRecursively)
      finally s.close()
    } catch { case _: Exception => () }

  def deleteOnExit(p: Path): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p)))
}
