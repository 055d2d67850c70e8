package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every conformance query registered by the operator suites.
  * Each suite row maps to a SURVEY.md §2 operator (see COVERAGE.md).
  */
object SparkEntry {

  /** All registered conformance queries, in suite order. */
  def allQueries: Seq[GraftQuery] =
    RelationalQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ SearchQueries.all ++
      TemporalQueries.all ++ MoviesQueries.all ++ AnalyticsQueries.all ++
      CurationQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Shared SPARK_GRAFT_ONLY dev-filter contract for Bench and Verify:
    * comma-separated name PREFIXES; unset → everything. One definition
    * so the two drivers can't drift.
    */
  def onlyFilter(): String => Boolean = {
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    name => only.forall(_.exists(name.startsWith))
  }
}
