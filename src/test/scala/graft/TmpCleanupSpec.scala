package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The RAM-disk hygiene rules the whole bench/verify harness stands on:
  * wrong sweeping deletes a LIVE run's shuffle dirs mid-flight (the
  * round-4 advice finding), and a missed sweep leaks tmpfs MEMORY.
  */
class TmpCleanupSpec extends AnyFunSuite {

  private def tmpBase() = Files.createTempDirectory("graft-cleanup-spec")

  test("createOwnDir embeds the owning pid in the directory name") {
    val base = tmpBase()
    val own = TmpCleanup.createOwnDir(base, "graft-x-")
    assert(Files.isDirectory(own))
    assert(own.getFileName.toString
      .startsWith(s"graft-x-${ProcessHandle.current().pid()}-"))
  }

  test("sweepStale never deletes a dir whose owning process is alive, however stale its mtime") {
    val base = tmpBase()
    val own = TmpCleanup.createOwnDir(base, "graft-x-") // our own (live) pid
    Files.setLastModifiedTime(own,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 86400000L))
    TmpCleanup.sweepStale(base, "graft-x-", maxAgeMillis = 1000L)
    assert(Files.isDirectory(own), "live-pid dir must survive the sweep")
  }

  test("sweepStale removes a stale dir whose embedded pid is dead; keeps a fresh one") {
    val base = tmpBase()
    // pid far above pid_max-by-default: certainly not a live process
    val deadStale = base.resolve("graft-x-99999999-aa")
    val deadFresh = base.resolve("graft-x-99999998-bb")
    Files.createDirectories(deadStale)
    Files.createDirectories(deadFresh)
    Files.write(deadStale.resolve("f"), "x".getBytes)
    Files.setLastModifiedTime(deadStale,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 86400000L))
    TmpCleanup.sweepStale(base, "graft-x-", maxAgeMillis = 3600000L)
    assert(!Files.exists(deadStale), "dead + stale must be swept (recursively)")
    assert(Files.isDirectory(deadFresh), "dead but FRESH must survive (may be mid-handoff)")
  }

  test("legacy pid-less names fall back to the mtime rule alone") {
    val base = tmpBase()
    val legacy = base.resolve("graft-x-legacy")
    Files.createDirectories(legacy)
    Files.setLastModifiedTime(legacy,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 86400000L))
    TmpCleanup.sweepStale(base, "graft-x-", maxAgeMillis = 3600000L)
    assert(!Files.exists(legacy))
  }

  test("family-prefix sweep still honors the pid guard (harness sweeps 'graft-' over 'graft-bench-<pid>-' dirs)") {
    // the real callers create with "graft-bench-"/"graft-verify-" but sweep
    // with the family prefix "graft-" — stripPrefix then left-anchored
    // digit-parse yielded "" for every real dir and the documented pid
    // liveness guard NEVER engaged (review finding). The pid is now the
    // first digit run after the prefix wherever it starts.
    val base = tmpBase()
    val live = base.resolve(s"graft-bench-${ProcessHandle.current().pid()}-aa")
    Files.createDirectories(live)
    Files.setLastModifiedTime(live,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 86400000L))
    TmpCleanup.sweepStale(base, "graft-", maxAgeMillis = 1000L)
    assert(Files.isDirectory(live),
      "live-pid dir must survive a family-prefix sweep even with a stale mtime")
    val dead = base.resolve("graft-bench-99999999-bb")
    Files.createDirectories(dead)
    Files.setLastModifiedTime(dead,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 86400000L))
    TmpCleanup.sweepStale(base, "graft-", maxAgeMillis = 1000L)
    assert(!Files.exists(dead), "dead + stale must still sweep under the family prefix")
  }

  test("a live-pid-lookalike digit run that is NOT the pid segment does not immortalize a stale dir") {
    // only the full `…<pid>-<hexnonce>` tail shape parses as owned; a name
    // whose digits are a nonce/other number must fall back to mtime, or a
    // coincidental match with any live pid leaks the dir forever (review
    // finding). `-zz` is not hex, so the tail shape does not match.
    val base = tmpBase()
    val lookalike = base.resolve(s"graft-x-${ProcessHandle.current().pid()}-zz")
    Files.createDirectories(lookalike)
    Files.setLastModifiedTime(lookalike,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 86400000L))
    TmpCleanup.sweepStale(base, "graft-", maxAgeMillis = 1000L)
    assert(!Files.exists(lookalike),
      "non-owned shape with a coincidental live digit run must sweep by mtime")
  }

  test("sweep deletes a symlink inside a stale dir WITHOUT following it") {
    // /dev/shm is world-writable: a planted link to a precious directory
    // must be removed as a LINK, never recursed into (review finding —
    // following it would delete the target's contents)
    val base = tmpBase()
    val precious = Files.createTempDirectory("graft-precious")
    Files.write(precious.resolve("keep.txt"), "keep".getBytes)
    val stale = base.resolve("graft-x-99999999-cc")
    Files.createDirectories(stale)
    Files.createSymbolicLink(stale.resolve("link"), precious)
    Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 86400000L))
    TmpCleanup.sweepStale(base, "graft-x-", maxAgeMillis = 1000L)
    assert(!Files.exists(stale), "stale dir (and its link) must be swept")
    assert(Files.exists(precious.resolve("keep.txt")),
      "the symlink TARGET's contents must be untouched")
  }

  test("heartbeat refreshes the dir's own mtime (child churn does not)") {
    val base = tmpBase()
    val own = TmpCleanup.createOwnDir(base, "graft-x-")
    val old = System.currentTimeMillis() - 86400000L
    Files.setLastModifiedTime(own, java.nio.file.attribute.FileTime.fromMillis(old))
    // writing DEEP inside does not touch the top dir's mtime — the exact
    // trap the heartbeat exists for
    val deep = own.resolve("a/b")
    Files.createDirectories(deep)
    Files.setLastModifiedTime(own, java.nio.file.attribute.FileTime.fromMillis(old))
    Files.write(deep.resolve("f"), "x".getBytes)
    assert(Files.getLastModifiedTime(own).toMillis == old)
    TmpCleanup.startHeartbeat(own, periodMillis = 50L)
    val deadline = System.currentTimeMillis() + 5000L
    while (Files.getLastModifiedTime(own).toMillis == old &&
           System.currentTimeMillis() < deadline) Thread.sleep(20L)
    assert(Files.getLastModifiedTime(own).toMillis > old, "heartbeat must touch the dir itself")
  }
}
