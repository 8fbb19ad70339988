package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY.md §2 F). All built-ins / codegen'd
  * expressions — no UDFs anywhere, so everything stays inside whole-stage
  * codegen and pushes down where Catalyst allows.
  */
object Fns {

  /** Deterministic feature id: "feat_" + first 16 hex chars of
    * sha256("name:version:entityType") (reference _generate_feature_id,
    * /root/reference/src/registry/feature_registry.py:617-625).
    */
  def featureId(name: Column, version: Column, entityType: Column): Column =
    concat(lit("feat_"), substring(sha2(concat_ws(":", name, version, entityType), 256), 1, 16))

  /** Group id: 12 hex chars (feature_registry.py:627-630). */
  def groupId(name: Column, entityType: Column): Column =
    concat(lit("grp_"), substring(sha2(concat_ws(":", name, entityType), 256), 1, 12))

  /** Cache key: 16 hex of "type:id:sorted-names" (reference
    * /root/reference/src/serving/feature_server.py:470-479; sorted-join of
    * names = array_sort + array_join).
    */
  def cacheKey(entityType: Column, entityId: Column, featureNames: Column): Column =
    substring(
      sha2(concat_ws(":", entityType, entityId, array_join(array_sort(featureNames), ",")), 256),
      1, 16
    )

  /** Store key "entityType:entityId" (feature_server.py:428, :502). */
  def storeKey(entityType: Column, entityId: Column): Column =
    concat_ws(":", entityType, entityId)

  /** round() with a +1e-9 nudge, mirrored verbatim in every oracle SQL that
    * rounds the same value. Spark rounds the exact binary expansion of the
    * double (BigDecimal HALF_UP); DuckDB rounds the scaled double — so the
    * SAME double sitting on a .xx5 decimal boundary can legally round apart.
    * Nudging both engines off the boundary keeps the comparison stable for
    * any input data (the boundary case is measure-zero but real — it bit
    * g3_quality). Only for computed doubles (ratios, averages, products);
    * plain sums of 2-dp inputs don't need it but tolerate it.
    */
  def epsRound(c: Column, scale: Int): Column = round(c + lit(1e-9), scale)

  // ---- embedding math (G2) ------------------------------------------------
  // Computed in double with a strict left-to-right fold (higher-order
  // functions), so results are bit-reproducible across runs and engines
  // that fold in index order.

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x
    )

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Zero-norm -> null (nullif keeps ANSI mode from throwing DIVIDE_BY_ZERO). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(l2Norm(a) * l2Norm(b), lit(0.0))

  // ---- text (G3) ----------------------------------------------------------

  /** Whitespace token count; empty/blank -> 0. */
  // empty-token filter, not a trim()-emptiness branch: Spark trim strips
  // only ' ' and split keeps edge empties, so "\n" or "\thello" would
  // otherwise count phantom "" tokens (same discipline as
  // TextAnalysis.tokens; kept textually in sync — functions must not
  // depend on operators)
  def tokenCount(text: Column): Column =
    size(filter(split(trim(text), "\\s+"), t => length(t) > 0))

  /** BPE-ish subword count proxy: word chunks + digits + punctuation each
    * count as a token (regexp over the codegen'd path).
    */
  def roughBpeCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** 64-bit document fingerprint over normalized text (lowercased,
    * whitespace-collapsed) — xxhash64 with Spark's fixed seed 42.
    */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))
}
