package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Percolation — REVERSE search (Elasticsearch's percolator, Lucene
 * monitor): a registry of STANDING boolean profiles is matched against
 * every arriving document, instead of one ad-hoc query against a stored
 * corpus. The alerting/routing primitive of every ingest pipeline:
 * "notify subscription X when a doc mentioning all of A,B and any of C,D
 * but none of E arrives."
 *
 * Profile semantics per doc (the [[graft.store.TextIndex.booleanQuery]]
 * clause model, minus ranking — percolation is a match, not a score):
 * every `must` term present, at least one `any` term present when the
 * clause is non-empty, no `must_not` term present. A profile needs at
 * least one positive (must/any) term — a pure-negation profile would
 * match the whole corpus.
 *
 * Scale shape (docs N can be 100 TB, profiles P is a registry — thousands):
 * NEVER a doc × profile cross join. Documents tokenize once and explode
 * to DISTINCT (doc, term) pairs; the join key is the TERM, so only doc
 * tokens that appear in some profile clause survive the first join (the
 * inverted-index trick run data-side); everything after is keyed on
 * (doc, profile) with cardinality bounded by actual term hits, and the
 * profile metadata (clause sizes) broadcasts. Stateless per batch, so the
 * streaming twin ([[graft.streaming.StreamOps.percolate]]) is the same
 * function applied per micro-batch.
 */
object Percolate {

  /** Match `docs` (idCol, textCol) against `profiles`
    * (profile_id LONG, must ARRAY<STRING>, any ARRAY<STRING>,
    * must_not ARRAY<STRING>). Returns (idCol, profile_id) pairs. */
  def matches(docs: DataFrame, profiles: DataFrame,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(profiles.filter(size(col("must")) + size(col("any")) === 0)
      .limit(1).isEmpty,
      "every profile needs at least one positive (must/any) term — " +
        "a pure-negation profile would match the whole corpus")
    val tf = graft.functions.TextFunctions
    val docTerms = docs
      .select(col(idCol), explode(array_distinct(tf.tokens(col(textCol)))).as("term"))
    // one unified positive-terms frame: kind 'm' rows count toward the
    // all-musts requirement, kind 'a' rows toward the any-match bit —
    // ONE term join + ONE (doc, profile) aggregation decides both
    val posTerms = profiles
      .select(col("profile_id"), explode(col("must")).as("term"), lit("m").as("kind"))
      .unionByName(profiles
        .select(col("profile_id"), explode(col("any")).as("term"), lit("a").as("kind")))
    val meta = profiles.select(col("profile_id"),
      size(col("must")).as("nm"), size(col("any")).as("na"))
    val hits = docTerms.join(broadcast(posTerms), Seq("term"))
      .groupBy(col(idCol), col("profile_id"))
      .agg(
        countDistinct(when(col("kind") === "m", col("term"))).as("mh"),
        max(when(col("kind") === "a", 1).otherwise(0)).as("ah"))
    val positive = hits.join(broadcast(meta), Seq("profile_id"))
      .filter(col("mh") === col("nm") && (col("na") === 0 || col("ah") === 1))
      .select(col(idCol), col("profile_id"))
    val notTerms = profiles.select(col("profile_id"), explode(col("must_not")).as("term"))
    val notPairs = docTerms.join(broadcast(notTerms), Seq("term"))
      .select(col(idCol), col("profile_id")).distinct()
    positive.join(notPairs, Seq(idCol, "profile_id"), "left_anti")
  }
}
