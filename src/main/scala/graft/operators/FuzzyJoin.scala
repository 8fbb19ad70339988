package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) matching — the record-linkage /
  * entity-resolution primitive a data-cleaning pipeline runs over product
  * names, institution strings, author lists. The reference has no string
  * matching at all; this is a new capability in the same family as G1
  * near-dup dedup, but over SHORT structured strings where edit distance is
  * the right metric (shingles/minhash degenerate on 2-3 token names).
  *
  * Scale shape: a naive fuzzy join is Θ(n²) levenshtein calls — never
  * viable. The standard fix is BLOCKING: only pairs sharing a cheap
  * deterministic block key are compared. Block keys here are (token,
  * length-bucket) pairs — two names within edit distance d of each other
  * share at least one token unchanged whenever d < token count, and their
  * lengths differ by at most d (levenshtein's length lower bound), so a
  * same-token + close-length block has bounded recall loss and the
  * candidate set stays ~linear in practice. The comparison itself is
  * Spark's codegen'd `levenshtein`; the join is a hash equi-join on the
  * block key — no cross product anywhere (asserted by the plan audit).
  */
object FuzzyJoin {

  /** Candidate pairs from `left` and `right` whose `nameCol` values are
    * within `maxDist` (Levenshtein), compared only within blocks.
    *
    * `maxBlockDf` is the quadratic-block guard (the fuzzy-join analogue of
    * the jaccard stop-shingle cap): a token occurring in more than this
    * many RIGHT-side names is an uninformative blocker — its block would
    * compare ~df² candidate pairs — so it is dropped from blocking on both
    * sides. A pair whose every shared token is that hot is missed
    * (documented recall trade; rare at sensible caps because near-dup
    * names share their distinctive tokens too). The hot-token set is
    * heavy-hitters-small by construction and broadcasts. The default cap
    * never triggers at fixture scale, so declared-query oracles replay
    * blocking without modelling it; FuzzyJoinSpec pins the cap's
    * semantics directly.
    *
    * Output: (left id, right id, left name, right name, dist), one row per
    * matched pair (deduped across blocks — a pair sharing two tokens would
    * otherwise surface twice).
    */
  def byName(
      left: DataFrame, leftId: String,
      right: DataFrame, rightId: String,
      nameCol: String,
      maxDist: Int,
      maxBlockDf: Long = 1000L): DataFrame = {
    def blocked(df: DataFrame, id: String, side: String) = df
      .select(col(id).as(s"${side}_id"), col(nameCol).as(s"${side}_name"))
      .withColumn("__tok", explode(split(trim(col(s"${side}_name")), "\\s+")))
      // length bucket: |len(a) - len(b)| <= maxDist for any match, so
      // bucketing by len/(maxDist+1) means a match is in the same or an
      // adjacent bucket; emit each row into its own AND the next bucket so
      // adjacency becomes equality (a standard 2-probe length filter)
      .withColumn("__lb", (length(col(s"${side}_name")) / (maxDist + 1)).cast("int"))
    val r0 = blocked(right, rightId, "r")
    val hot = r0.groupBy("__tok")
      .agg(countDistinct(col("r_id")).as("__df"))
      .where(col("__df") > maxBlockDf)
      .select("__tok")
    val l = blocked(left, leftId, "l")
      .join(broadcast(hot), Seq("__tok"), "left_anti")
      .withColumn("__probe", explode(array(col("__lb"), col("__lb") + 1)))
    val r = r0
      .join(broadcast(hot), Seq("__tok"), "left_anti")
      .withColumnRenamed("__lb", "__probe")
    l.join(r, Seq("__tok", "__probe"))
      .where(levenshtein(col("l_name"), col("r_name")) <= maxDist)
      .select("l_id", "r_id", "l_name", "r_name")
      .distinct()
      .withColumn("dist", levenshtein(col("l_name"), col("r_name")))
  }

  /** Self-dedup form: pairs within `maxDist` inside one table, id_a < id_b. */
  def selfPairs(df: DataFrame, idCol: String, nameCol: String, maxDist: Int,
      maxBlockDf: Long = 1000L): DataFrame =
    byName(df, idCol, df, idCol, nameCol, maxDist, maxBlockDf)
      .where(col("l_id") < col("r_id"))
      .select(col("l_id").as("id_a"), col("r_id").as("id_b"),
        col("l_name").as("name_a"), col("r_name").as("name_b"), col("dist"))
}
