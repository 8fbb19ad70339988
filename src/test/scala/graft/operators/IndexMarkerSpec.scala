package graft.operators

import java.nio.file.{Files, Paths}

/** Pins tolerant `_SUCCESS` marker parsing: the dedup index's parameter
  * marker must treat foreign-format content (a Spark/Hadoop committer can
  * emit a non-empty JSON `_SUCCESS`) or a truncated write exactly like the
  * documented legacy empty marker — None, never a MatchError that crashes
  * every probe of an otherwise valid index.
  */
class IndexMarkerSpec extends graft.SparkSpec {

  private def withMarker(content: Option[String])(check: Option[Map[String, Int]] => Unit): Unit = {
    val dir = Files.createTempDirectory("graft_marker").toString
    content.foreach(c => Files.write(Paths.get(dir, "_SUCCESS"), c.getBytes("UTF-8")))
    check(Dedup.readIndexParams(dir))
  }

  test("well-formed k=v pairs parse") {
    withMarker(Some("n_hashes=64,bands=16,shingle_k=5")) { p =>
      assert(p.contains(Map("n_hashes" -> 64, "bands" -> 16, "shingle_k" -> 5)))
    }
  }

  test("absent marker, empty marker, JSON marker, truncated marker all yield None") {
    withMarker(None)(p => assert(p.isEmpty))
    withMarker(Some(""))(p => assert(p.isEmpty))
    withMarker(Some("""{"state":"SUCCESS","timestamp":1700000000}"""))(p => assert(p.isEmpty))
    withMarker(Some("n_hashes=64,ban"))(p => assert(p.isEmpty))
    withMarker(Some("n_hashes=sixty-four"))(p => assert(p.isEmpty))
    // matches the k=v shape but exceeds Int range (foreign epoch-millis
    // marker) — must yield None, not NumberFormatException
    withMarker(Some("ts=1700000000000"))(p => assert(p.isEmpty))
    withMarker(Some("n_hashes=64,ts=1700000000000"))(p => assert(p.isEmpty))
  }
}
