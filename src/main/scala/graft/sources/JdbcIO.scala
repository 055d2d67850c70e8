package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink face (SURVEY §2.1 S1/S2/S4).
  *
  * Reference analogues: the SQLite full scan (sqlite_to_postgresql/
  * etl.py:62-117, here via [[SqliteFile]] + a JDBC round trip), the
  * parameterized PostgreSQL batch source (postgres_to_es/daemon.py:80-87),
  * and the multi-row INSERT sink (etl.py:205-232).
  *
  * Scale notes:
  *  - [[readPartitioned]] issues one range-predicate query per partition
  *    (Spark's partitionColumn machinery) so a big table scans in
  *    parallel across executors instead of through one connection.
  *  - Predicates/required columns push into the remote SQL (Catalyst
  *    JDBC pushdown) — filter/select BEFORE any wide transform.
  *  - The CDC keyset scan (S3) deliberately does NOT use offset-based
  *    partitioning; its resumable (ts, id) batches live in cdc.Keyset.
  *  - Writes go through `df.write.jdbc`, which batches inserts per
  *    partition (reference's mogrify multi-row INSERT, minus the string
  *    pasting). Idempotent upserts are the sink's job — see
  *    cdc.UpsertSink / DocSink.
  *
  * Tested end-to-end against embedded Apache Derby (the JDBC engine
  * shipped with Spark) in GoldenJdbcSpec — same API binds to
  * PostgreSQL/MySQL/SQLite by switching the URL/driver.
  */
object JdbcIO {

  private def props(extra: Map[String, String]): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Full-table (or pushdown-narrowed) scan over one connection. */
  def read(
      spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, props(options))

  /** Parallel range scan: `numPartitions` concurrent connections, each
    * reading `[lower, upper)` stripes of `partitionCol` (must be
    * numeric/date). The 100 TB-side answer to "one JDBC cursor".
    */
  def readPartitioned(
      spark: SparkSession, url: String, table: String,
      partitionCol: String, lower: Long, upper: Long, numPartitions: Int,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(
      url, table, partitionCol, lower, upper, numPartitions, props(options))

  /** Append/overwrite batch insert sink (S4). */
  def write(
      df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.ErrorIfExists,
      options: Map[String, String] = Map.empty): Unit =
    df.write.mode(mode).jdbc(url, table, props(options))
}
