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

  /** Per-run scratch dir for sink/stored-index round-trip gates,
    * deleted on JVM exit: a fixed path raced concurrent Verify/Bench
    * runs mid-overwrite, but bare createTempDirectory leaked a full
    * table copy into /tmp per run — the shutdown hook walks and
    * removes it. (Shared by the suites; keep the one implementation.)
    */
  private[queries] def scratchDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dir.toFile)
    }))
    dir.toString + "/data"
  }

  def noOracle(name: String)(
      build: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, build, None)
}

/** Shared DuckDB oracle fragment: the Q20 fixed-point binary-log
  * recurrence (`GraftColumns.binLog2Q20`) replayed as UNROLLED chained
  * CTEs of plain column arithmetic — the q153 pattern. (DuckDB 1.0.0's
  * vectorized `list_reduce` with a branching struct lambda silently
  * miscomputes some rows on mixed chunks; scalar CASE over columns
  * vectorizes correctly.)
  */
private[queries] object DuckLog2Q20 {

  /** CTE text from `l0` through `l20` computing the recurrence over a
    * prior CTE named `args` with columns (`keyCols`..., `v` BIGINT ≥ 1).
    * The caller continues with
    * `lg AS (SELECT <keys>, v, p * 1048576 + acc AS l FROM l20)`.
    * Embed as `WITH args AS (...), ${DuckLog2Q20.ctes(...)}, lg AS ...`.
    */
  def ctes(keyCols: String*): String = {
    val keys = keyCols.mkString(", ")
    val pows = (0 until 63).map(i => (1L << i).toString)
      .mkString("[", ", ", "]")
    val steps = (1 to 20).map { i =>
      s"""l$i AS (
         |  SELECT $keys, v, p,
         |    CASE WHEN (y*y)//1073741824 >= 2147483648
         |      THEN ((y*y)//1073741824)//2
         |      ELSE (y*y)//1073741824 END AS y,
         |    CASE WHEN (y*y)//1073741824 >= 2147483648
         |      THEN acc*2 + 1 ELSE acc*2 END AS acc
         |  FROM l${i - 1})""".stripMargin
    }.mkString(",\n")
    // The % 2147483648 clamp is IDENTITY on the taken branch (v < 2^31
    // when p <= 30); it bounds the eagerly-evaluated untaken branch,
    // which must not overflow INT64.
    s"""l0 AS (
       |  SELECT $keys, v, p, CAST(0 AS BIGINT) AS acc,
       |    CASE WHEN p <= 30
       |      THEN (v % 2147483648) * pows[31 - least(greatest(p, 0), 30)]
       |      ELSE v // pows[least(p, 62) - 29] END AS y
       |  FROM (SELECT *, length(printf('%b', v)) - 1 AS p,
       |          $pows AS pows
       |        FROM args)),
       |$steps""".stripMargin
  }
}
