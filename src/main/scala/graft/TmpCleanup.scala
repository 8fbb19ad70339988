package graft

import java.nio.file.{Files, LinkOption, Path}
import scala.jdk.CollectionConverters._

/** RAM-disk hygiene for the bench/verify harness temp dirs: /dev/shm is
  * MEMORY, so a leaked fixture directory is leaked RAM that survives the
  * JVM. Every run (a) sweeps stale dirs left by crashed prior runs and
  * (b) registers a shutdown hook for its own dir — the pair bounds tmpfs
  * usage at one run's footprint no matter how many times the driver
  * invokes the harness.
  *
  * Liveness is decided by the OWNING PID embedded in the dir name
  * (`<prefix><pid>-<nonce>`), not by mtime: a directory's mtime only
  * changes when its immediate children churn, and Spark creates its
  * top-level scratch subdirs early then writes deep inside — so a healthy
  * run longer than the sweep age would look "silent" by mtime alone and
  * get its live shuffle dirs deleted mid-run by the next invocation. A
  * heartbeat touch of the dir itself backs the pid check up for dirs
  * whose embedded pid was recycled.
  */
object TmpCleanup {

  private def deleteRecursively(p: Path): Unit = {
    // NOFOLLOW is load-bearing: /dev/shm is world-writable, so a planted
    // (or crash-leftover) symlink inside a stale dir pointing at, say, the
    // repository would otherwise be RECURSED INTO and its target's
    // contents deleted (review finding). A symlink is deleted as a link,
    // never followed.
    if (Files.isDirectory(p, LinkOption.NOFOLLOW_LINKS)) {
      val s = Files.list(p)
      try s.iterator().asScala.foreach(deleteRecursively) finally s.close()
    }
    try Files.deleteIfExists(p) catch { case _: Exception => () }
  }

  /** Create this run's own scratch dir under `base` with the owning pid
    * encoded in the name, WITHOUT going through the java.nio temp-file
    * API. Ordering matters: `Files.createTempDirectory` class-loads
    * `TempFileHelper`, which caches `java.io.tmpdir` in a static final at
    * that moment — so the property must be pointed at the new dir BEFORE
    * any temp-file API call, or every later `createTempDirectory(prefix)`
    * in the process silently lands back in /tmp (off the RAM disk and
    * outside the shutdown-hook cleanup).
    */
  def createOwnDir(base: Path, prefix: String): Path = {
    val own = base.resolve(
      s"$prefix${ProcessHandle.current().pid()}-${java.lang.Long.toHexString(System.nanoTime())}")
    Files.createDirectories(own)
    own
  }

  /** Point java.io.tmpdir at a fresh pid-stamped dir under /dev/shm when
    * available (after sweeping dead runs' dirs), register its cleanup, and
    * start the liveness heartbeat. No-op (returns None) when /dev/shm is
    * unusable — callers fall back to the default tmpdir.
    */
  def useShmTmpdir(prefix: String): Option[Path] = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm)) {
      sweepStale(shm, "graft-")
      val own = createOwnDir(shm, prefix)
      System.setProperty("java.io.tmpdir", own.toString)
      deleteOnExit(own)
      startHeartbeat(own)
      Some(own)
    } else None
  }

  /** Best-effort removal of prior runs' dirs under `base` whose name starts
    * with `prefix`, whose owning process (pid embedded in the name) is no
    * longer alive, and whose own mtime (kept fresh by [[startHeartbeat]])
    * is older than `maxAgeMillis`. Dirs from the CURRENT process are never
    * swept. Unparseable names fall back to the mtime check alone.
    */
  def sweepStale(base: Path, prefix: String, maxAgeMillis: Long = 3600000L): Unit =
    try {
      val cutoff = System.currentTimeMillis() - maxAgeMillis
      val selfPid = ProcessHandle.current().pid()
      // the pid is the penultimate `-`-separated segment — createOwnDir
      // names end `…<pid>-<hexnonce>`, so anchoring at the TAIL parses the
      // actual pid regardless of what digits the caller prefix contains.
      // (An earlier first-digit-run scan could latch onto a nonce or a
      // prefix digit that happened to match an unrelated live pid, making
      // the stale dir immortal — review finding.)
      val ownShape = """^.*?(\d+)-[0-9a-f]+$""".r
      def ownerAlive(p: Path): Boolean =
        p.getFileName.toString match {
          case ownShape(d) =>
            scala.util.Try(d.toLong).toOption.exists { pid =>
              pid == selfPid ||
                ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false)
            }
          case _ => false // not our dir shape: mtime decides alone
        }
      val s = Files.list(base)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith(prefix))
        .foreach { p =>
          // per-entry best effort: a dir vanishing mid-sweep (a racing
          // harness swept it first) must not abort the remaining entries
          try {
            if (!ownerAlive(p) &&
                Files.getLastModifiedTime(p).toMillis <= cutoff)
              deleteRecursively(p)
          } catch { case _: Exception => () }
        }
      finally s.close()
    } catch { case _: Exception => () }

  /** Keep `p`'s own mtime fresh from a daemon thread so a pid-recycled or
    * pid-less dir belonging to a LIVE long run still fails the mtime half
    * of the sweep test. Touching the directory's mtime directly — child
    * file churn doesn't propagate to the parent dir's timestamp.
    */
  def startHeartbeat(p: Path, periodMillis: Long = 300000L): Unit = {
    val t = new Thread(() => {
      while (true) {
        // each statement guarded separately: a stray interrupt (Spark
        // shutdown-retry paths interrupt broadly) must not silently kill
        // the heartbeat, and a throwing touch must not skip the sleep
        // into a busy spin
        try Files.setLastModifiedTime(
          p, java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
        catch { case _: Exception => () }
        try Thread.sleep(periodMillis)
        catch { case _: InterruptedException => () }
      }
    }, "graft-tmp-heartbeat")
    t.setDaemon(true)
    t.start()
  }

  def deleteOnExit(p: Path): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p)))
}
