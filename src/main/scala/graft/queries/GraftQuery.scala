package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One conformance query: a Spark plan builder plus (when SQL-expressible)
  * an equivalent ANSI SQL string the driver runs in DuckDB over the same
  * parquet tables.
  *
  * Determinism contract (required for the driver's hash compare):
  *   - every query ends in a total ORDER BY;
  *   - money/quantity aggregates are integer cents (order-independent sums);
  *   - array aggregates are sorted before being joined to strings;
  *   - column names match between the Spark plan and the oracle SQL.
  */
final case class GraftQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, build, Some(oracle))

  def noOracle(name: String)(
      build: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, build, None)
}
