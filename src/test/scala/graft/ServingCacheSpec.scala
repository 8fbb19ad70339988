package graft

import org.apache.spark.sql.functions._
import graft.store._

/** Pins the serving tier against the reference's semantics
  * (feature_server.py): LRU+TTL cache behavior (get TTL-evicts, put
  * LRU-evicts past capacity, invalidate/clear), the sha256 cache key,
  * metrics (hit rate, avg + exact-index p99 over the last-1000 window),
  * the EP1 cached read flow, and write-invalidates-cache consistency.
  */
class ServingCacheSpec extends SparkSpec {
  import spark.implicits._

  private val now = ts("2024-02-01 00:00:00")

  test("LruTtlCache: TTL eviction on get, LRU eviction on put, invalidate/clear") {
    var t = 0L
    val cache = new LruTtlCache[String](maxSize = 2, ttlSeconds = 10, clock = () => t)
    cache.put("a", "va"); cache.put("b", "vb")
    assert(cache.get("a").contains("va"))
    // capacity 2 + access-ordered LRU: touching "a" made "b" the eldest
    cache.put("c", "vc")
    assert(cache.get("b").isEmpty, "least-recently-used entry must evict")
    assert(cache.get("a").contains("va") && cache.get("c").contains("vc"))
    // TTL: entries stored at t=0 expire at t >= 10s (reference :151-153)
    t = 10000L
    assert(cache.get("a").isEmpty, "expired entry must miss and evict")
    assert(cache.size == 1) // only c's re-put... a evicted, c stored at t=0 -> also expired on next get
    cache.put("d", "vd")
    cache.invalidate("d")
    assert(cache.get("d").isEmpty)
    cache.put("e", "ve"); cache.clear()
    assert(cache.size == 0)
  }

  test("ServingMetrics: hit rate + avg/p99 over the sliding window") {
    val m = new ServingMetrics(windowSize = 1000)
    (1 to 10).foreach(_ => m.requestStarted())
    (1 to 7).foreach(_ => m.cacheHit())
    (1 to 3).foreach(_ => m.cacheMiss())
    (1 to 100).foreach(i => m.recordLatencyMs(i.toDouble))
    val s = m.snapshot
    assert(s.totalRequests == 10 && s.cacheHits == 7 && s.cacheMisses == 3)
    assert(s.hitRate == 0.7)
    assert(s.avgLatencyMs == 50.5)
    // reference p99: sorted[int(n * 0.99)] = sorted[99] = 100.0
    assert(s.p99LatencyMs == 100.0)
    m.reset()
    assert(m.snapshot == ServingMetrics.Snapshot(0, 0, 0, 0.0, 0.0, 0.0))
    // empty-metrics hit rate divides by max(total, 1): 0.0, not NaN
    assert(!m.snapshot.hitRate.isNaN)
  }

  test("cache key parity: 16-hex sha256 of type:id:sorted-names") {
    val fs = new FeatureStore(spark)
    val srv = new FeatureServer(fs)
    val k = srv.cacheKey("patient", "p1", Seq("b", "a"))
    assert(k.length == 16 && k.matches("[0-9a-f]{16}"))
    // name order must not matter (the reference sorts, :474)
    assert(k == srv.cacheKey("patient", "p1", Seq("a", "b")))
    assert(k != srv.cacheKey("patient", "p2", Seq("a", "b")))
  }

  private def servedStore(): (FeatureServer, String, String) = {
    val fs = new FeatureStore(spark)
    val Right(hr) = fs.registerFeature("heart_rate", "1.0.0",
      FeatureSchemaMeta("heart_rate", "float64", entity_type = "patient"),
      FeatureSourceMeta("batch"), "ops", now)
    val Right(dx) = fs.registerFeature("diagnosis_risk", "1.0.0",
      FeatureSchemaMeta("diagnosis_risk", "float64", entity_type = "patient"),
      FeatureSourceMeta("batch"), "ops", now,
      phiLevel = "direct", accessRoles = Seq("doctor"))
    fs.activateFeature(hr.feature_id, now)
    fs.activateFeature(dx.feature_id, now)
    val df = Seq(
      ("p1", "heart_rate", Some(80.0), ts("2024-01-10 00:00:00")),
      ("p1", "diagnosis_risk", Some(0.9), ts("2024-01-05 00:00:00")))
      .toDF("entity_id", "feature_name", "value_double", "event_timestamp")
      .withColumn("value_string", lit(null).cast("string"))
    fs.ingestValues(df,
      Map("heart_rate" -> hr.feature_id, "diagnosis_risk" -> dx.feature_id), now)
    (new FeatureServer(fs), hr.feature_id, dx.feature_id)
  }

  test("EP1 flow: miss fetches the vector, hit serves from cache, metrics track both") {
    val (srv, hrId, dxId) = servedStore()
    val v1 = srv.getOnlineFeatures("p1", "patient", Seq(hrId, dxId), "u", Seq("doctor"), now)
    assert(v1(hrId).contains(80.0) && v1(dxId).contains(0.9))
    val v2 = srv.getOnlineFeatures("p1", "patient", Seq(hrId, dxId), "u", Seq("doctor"), now)
    assert(v2 == v1)
    val s = srv.getMetrics
    assert(s.totalRequests == 2 && s.cacheHits == 1 && s.cacheMisses == 1)
    assert(s.hitRate == 0.5)
    // deny->null survives the cached path AND the cache is role-scoped:
    // the doctor's cached PHI vector must NOT be served to an analyst
    // (the reference's role-blind cache key would leak exactly this)
    val masked = srv.getOnlineFeatures("p1", "patient", Seq(hrId, dxId), "u", Seq("analyst"), now)
    assert(masked(hrId).contains(80.0) && masked(dxId).isEmpty,
      s"role-blind cache leaked PHI: $masked")
    // and the masked vector is itself cached per-role, not recomputed
    assert(srv.getOnlineFeatures("p1", "patient", Seq(hrId, dxId), "u", Seq("analyst"), now)(dxId).isEmpty)
    val absent = srv.getOnlineFeatures("p9", "patient", Seq(hrId), "u", Seq(), now)
    assert(absent(hrId).isEmpty)
  }

  test("write_features invalidates the touched entity's cached vectors") {
    val (srv, hrId, _) = servedStore()
    val before = srv.getOnlineFeatures("p1", "patient", Seq(hrId), "u", Seq(), now)
    assert(before(hrId).contains(80.0))
    val later = ts("2024-01-20 00:00:00")
    srv.writeFeatures(
      Seq(("p1", "heart_rate", Some(95.0), later))
        .toDF("entity_id", "feature_name", "value_double", "event_timestamp")
        .withColumn("value_string", lit(null).cast("string")),
      Map("heart_rate" -> hrId), now)
    // the stale cached 80.0 must NOT be served (reference :449)
    val after = srv.getOnlineFeatures("p1", "patient", Seq(hrId), "u", Seq(), now)
    assert(after(hrId).contains(95.0), s"stale cache served: $after")
  }
}
