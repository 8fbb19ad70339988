package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.Streaming

/** Shared, memoized harness fixtures for the declared queries.
  *
  * Two cost classes the bench should not re-pay per query:
  *
  *  1. The g4 streaming queries each feed a MemoryStream from collected
  *     event/document rows. Collecting the same sf0.1 table once PER QUERY
  *     was ~11 redundant driver collects (and ~11× the driver memory);
  *     the collected arrays are plain JVM data — safe to share.
  *  2. The TxTable queries each stage immutable base commits (appends the
  *     timed operation then mutates or reads). The base build is fixture
  *     construction, not the certified operation — build each ONCE as a
  *     template table, then hand mutating queries a cheap file-tree clone
  *     (TxTable logs reference data files RELATIVE to the table root —
  *     TxTable.scala:30 — so a clone is a fully independent table).
  *
  * Everything here is keyed by the testdata dir (fixture data is immutable
  * per run) and built lazily, so correctness runs are unchanged; Bench
  * warms the cache untimed via SparkEntry.prepareIndexes.
  */
object HarnessFixtures {

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  private def memo[T <: AnyRef](key: String)(build: => T): T =
    cache.computeIfAbsent(key, _ => build).asInstanceOf[T]

  // ---------------------------------------------------------------- events

  /** The g4 streaming event fixture: every non-null-value event row, one
    * driver collect per (dir) for the whole harness. Queries that stream a
    * subset (every second/third entity, one event type) filter this array
    * in memory — same rows as their previous per-query collects. (The two
    * queries that historically collected WITHOUT the value filter —
    * attribution, as-of spine — only stream click/purchase rows, whose
    * `value` is never null in the generated data; a null there would have
    * crashed their Dataset[EventRow] decode long before this memo.)
    */
  def eventRows(s: SparkSession, dir: String): Array[Streaming.EventRow] =
    memo(s"events|$dir") {
      import s.implicits._
      Tables.events(s, dir)
        .where(col("value").isNotNull) // EventRow.value is a primitive Double
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Streaming.EventRow].collect()
    }

  /** Event rows in (event-time, id) order — the replay order the
    * watermark-driven g4 queries need. */
  def eventRowsOrdered(s: SparkSession, dir: String): Array[Streaming.EventRow] = {
    // the base memo is resolved OUTSIDE this memo's builder: nesting
    // computeIfAbsent calls on one ConcurrentHashMap throws
    // IllegalStateException("Recursive update") whenever the two keys hash
    // to the same bin — which dir strings they do is luck (review finding;
    // the shipped testdata dirs happened to land in different bins)
    val base = eventRows(s, dir)
    memo(s"eventsOrdered|$dir") {
      base.sortBy(e => (e.ts.getTime, e.event_id))
    }
  }

  // ------------------------------------------------------------- documents

  /** (doc_id, word) pairs of the whole corpus — g4_heavy_stream's feed. */
  def wordRows(s: SparkSession, dir: String): Array[(Long, String)] =
    memo(s"words|$dir") {
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("word"))
        .as[(Long, String)].collect()
    }

  /** (doc_id, text) of the non-benchmark corpus half (doc_id % 50 != 0) —
    * g4_decontam_stream's feed. */
  def corpusDocRows(s: SparkSession, dir: String): Array[(Long, String)] =
    memo(s"corpusDocs|$dir") {
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .where(col("doc_id") % 50 =!= 0)
        .as[(Long, String)].collect()
    }

  /** (doc_id, text, lang, source) of the non-benchmark corpus half in
    * doc_id order — p3_prepare_stream's feed (id-ordered replay makes
    * streaming first-arrival-wins coincide with batch min-id canonical
    * choice, so the stream's final state has an exact batch oracle). */
  def corpusManifestRows(s: SparkSession, dir: String): Array[(Long, String, String, String)] =
    memo(s"corpusManifest|$dir") {
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
        .where(col("doc_id") % 50 =!= 0)
        .orderBy("doc_id")
        .as[(Long, String, String, String)].collect()
    }

  // -------------------------------------------------------------- TxTable

  /** Build-once template table: `build` stages the immutable base commits
    * at `path`; callers that mutate must go through [[cloneTxDir]],
    * read-only callers may use the template directly. */
  def txTemplate(s: SparkSession, dir: String, name: String)(build: String => Unit): String =
    memo(s"tx|$dir|$name") {
      val path = Files.createTempDirectory(s"graft_txtpl_$name").toString
      build(path)
      path
    }

  /** Independent copy of a template table for a mutating operation. A flat
    * file-tree copy (on the harness tmpfs this is memcpy-speed) — valid
    * because the commit log addresses data files relative to the root. */
  def cloneTxDir(template: String): String = {
    val dst = Files.createTempDirectory("graft_txclone")
    copyTree(Paths.get(template), dst)
    dst.toString
  }

  private def copyTree(src: Path, dst: Path): Unit = {
    val walk = Files.walk(src)
    try {
      walk.forEach { p =>
        val target = dst.resolve(src.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(target)
        else Files.copy(p, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
      }
    } finally walk.close()
  }

  /** Session-keyed memoized FIXTURE FRAME: a `localCheckpoint`ed read of
    * an immutable template, shared across the queries (and bench reps)
    * that certify against the same source — e.g. the two part-delete
    * queries' `src` over the b5_part template. Keyed by the session's
    * UNIQUE id because a checkpointed frame dies with its session (an
    * identity hash could be reused by a later session after GC, serving
    * a frame whose cached blocks are gone). */
  def memoFrame(s: SparkSession, key: String)(build: => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    memo(s"df|${sessionId(s)}|$key")(build)

  /** A UNIQUE id per live session (a WeakHashMap so dead sessions are
    * collectable; SparkSession equality is identity). */
  private val sessionIds =
    new java.util.WeakHashMap[SparkSession, String]()
  private def sessionId(s: SparkSession): String = sessionIds.synchronized {
    var id = sessionIds.get(s)
    if (id == null) { id = java.util.UUID.randomUUID().toString; sessionIds.put(s, id) }
    id
  }

  // --------------------------------------------------- lakehouse exports

  /** Pre-mutation lakehouse fixture staged ONCE at its FIXED export path
    * (the DuckDB oracle SQL globs that exact path) with a pristine backup
    * copy; every later call RESTORES the fixed path from the backup — a
    * flat file-tree copy of a sub-MB table — instead of re-running the
    * Spark export/commit jobs that build the pre-mutation history. A
    * bench rep therefore times only the mutation-under-test plus one
    * memcpy-scale restore, and the restore keeps the table at the SAME
    * root, so the absolute `file:` URIs Iceberg manifests record (per
    * spec) stay valid — the reason [[cloneTxDir]]'s clone-to-a-new-path
    * pattern cannot serve the Iceberg fixtures.
    *
    * `build` must create the table AT `livePath` (it runs with the path
    * cleared). Restores are byte-exact, so every rep mutates an identical
    * pre-state and the post-mutation bytes the oracle reads are
    * deterministic. Keyed by (dir, livePath): a scale change rebuilds. */
  def stagedExport(s: SparkSession, dir: String, livePath: String)(build: => Unit): Unit = {
    val live = Paths.get(livePath)
    var builtNow = false
    val backup = memo(s"export|$dir|$livePath") {
      graft.sources.DeltaInterop.deleteRecursively(live)
      Files.createDirectories(live.getParent)
      build
      val b = Files.createTempDirectory("graft_expbak")
      copyTree(live, b)
      builtNow = true
      b
    }
    if (!builtNow) {
      graft.sources.DeltaInterop.deleteRecursively(live)
      copyTree(backup, live)
    }
  }
}
