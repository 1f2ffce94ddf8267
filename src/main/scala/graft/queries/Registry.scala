package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One registered query per implemented operator (SURVEY.md §2). Each query is
 * a Spark program over the driver's parquet tables plus, where the semantics
 * are ANSI-SQL-expressible, an equivalent DuckDB oracle statement.
 *
 * Conventions that keep the DuckDB hash-compare stable:
 *  - every query has an explicit total ORDER BY (ties broken by a key);
 *  - floating-point outputs are rounded (per-row math: round 6; distributed
 *    sums: round 2-4 — accumulation order across partitions is nondeterministic
 *    so only coarse digits are comparable);
 *  - raw ARRAY<FLOAT> columns are never returned, only derived scalars;
 *  - aggregate results that DuckDB widens (sum(BIGINT) → HUGEINT) are cast
 *    back to BIGINT in the oracle.
 */
case class Q(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  lazy val all: Seq[Q] =
    VectorQueries.all ++ RelationalQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      AnnQueries.all ++ StoreQueries.all ++ AttackQueries.all ++ OperatorQueries.all ++
      AnalyticsQueries.all ++ SearchQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
