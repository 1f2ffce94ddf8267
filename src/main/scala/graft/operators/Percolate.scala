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
 * every DISTINCT `must` term present, at least one `any` term present
 * when the clause is non-empty, no `must_not` term present. A profile
 * needs at least one positive (must/any) term — a pure-negation profile
 * can never fire (no positive term ever joins it to a doc), which is a
 * silently-dead subscription, so registration rejects it loudly.
 *
 * Scale shape (docs N can be 100 TB, profiles P is a registry — thousands):
 * NEVER a doc × profile cross join, and the corpus is read ONCE.
 * Documents tokenize once and explode to DISTINCT (doc, term) pairs; the
 * join key is the TERM, so only doc tokens that appear in some profile
 * clause survive the single join (the inverted-index trick run
 * data-side); ONE (doc, profile) aggregation then decides all three
 * clauses at once — must coverage by distinct-count, any-match and
 * negation by flag-max — and the profile metadata (clause sizes)
 * broadcasts. Stateless per batch, so the streaming twin
 * ([[graft.streaming.StreamOps.percolate]]) is the same function applied
 * per micro-batch (profiles validated ONCE at stream start, not per
 * batch).
 */
object Percolate {

  /** NULL clause arrays (a registry loaded from parquet with nullable
    * columns) normalize to empty — size(NULL) is NULL, which would slip
    * past [[validate]] AND make the nm comparison never-true: the
    * silently-dead subscription both guards exist to prevent. */
  private def nullsafe(profiles: DataFrame): DataFrame =
    profiles.select(col("profile_id"),
      coalesce(col("must"), array()).as("must"),
      coalesce(col("any"), array()).as("any"),
      coalesce(col("must_not"), array()).as("must_not"))

  /** Reject profiles with no positive term, and registries with a
    * duplicated profile_id — two rows sharing an id would MERGE their
    * clause terms in the (doc, profile) aggregation and duplicate the
    * broadcast meta join, yielding wrong or duplicated alert pairs with
    * no error (the stores' requireUniqueKeys discipline, applied here).
    * Registration-time, two tiny jobs over the registry (NOT per matched
    * batch). */
  def validate(profiles: DataFrame): Unit = {
    require(nullsafe(profiles)
      .filter(size(col("must")) + size(col("any")) === 0)
      .limit(1).isEmpty,
      "every profile needs at least one positive (must/any) term — " +
        "a pure-negation profile could never fire (a dead subscription)")
    require(profiles
      .groupBy(col("profile_id")).count().filter(col("count") > 1)
      .limit(1).isEmpty,
      "profile_id must be unique across the registry — duplicate rows " +
        "would merge their clauses into one unintended profile")
  }

  /** Match `docs` (idCol, textCol) against `profiles`
    * (profile_id LONG, must ARRAY<STRING>, any ARRAY<STRING>,
    * must_not ARRAY<STRING>). Returns (idCol, profile_id) pairs. */
  def matches(docs: DataFrame, profiles: DataFrame,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    validate(profiles)
    matchesValidated(docs, profiles, idCol, textCol)
  }

  /** [[matches]] without the registry re-validation — the streaming twin
    * validates once at stream start and calls this per micro-batch. */
  private[graft] def matchesValidated(docs: DataFrame, rawProfiles: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val profiles = nullsafe(rawProfiles)
    val tf = graft.functions.TextFunctions
    val docTerms = docs
      .select(col(idCol), explode(array_distinct(tf.tokens(col(textCol)))).as("term"))
    // one unified clause-terms frame: kind 'm' rows count toward the
    // all-musts requirement, 'a' toward the any-match bit, 'x' toward the
    // negation bit — ONE term join + ONE (doc, profile) aggregation
    // decides the whole profile, and the corpus-side frame is read once.
    // Clause arrays dedupe BEFORE the size/count comparison: a duplicated
    // must term must not demand two distinct matches (the oracle's
    // list_has_all semantics).
    val posTerms = profiles
      .select(col("profile_id"),
        explode(array_distinct(col("must"))).as("term"), lit("m").as("kind"))
      .unionByName(profiles.select(col("profile_id"),
        explode(array_distinct(col("any"))).as("term"), lit("a").as("kind")))
      .unionByName(profiles.select(col("profile_id"),
        explode(array_distinct(col("must_not"))).as("term"), lit("x").as("kind")))
    val meta = profiles.select(col("profile_id"),
      size(array_distinct(col("must"))).as("nm"), size(col("any")).as("na"))
    docTerms.join(broadcast(posTerms), Seq("term"))
      .groupBy(col(idCol), col("profile_id"))
      .agg(
        countDistinct(when(col("kind") === "m", col("term"))).as("mh"),
        max(when(col("kind") === "a", 1).otherwise(0)).as("ah"),
        max(when(col("kind") === "x", 1).otherwise(0)).as("xh"))
      .join(broadcast(meta), Seq("profile_id"))
      .filter(col("mh") === col("nm") &&
        (col("na") === 0 || col("ah") === 1) && col("xh") === 0)
      .select(col(idCol), col("profile_id"))
  }
}
