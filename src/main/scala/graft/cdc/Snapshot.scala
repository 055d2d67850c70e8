package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Current-state view over an append-only change log: latest row per
  * key, ordered by (ts, tiebreak) descending — the lakehouse analogue
  * of the reference's UPDATE-in-place PostgreSQL rows
  * (postgres_to_es/daemon.py:110-117 sees one row per id because
  * PostgreSQL overwrites; an append-only log sees every version and
  * reads the newest).
  *
  * Scale: one shuffle on the key (window partition), no driver
  * involvement; at 100 TB this is the standard log-compaction read —
  * pair it with partition pruning on the log's ingest-date partitions
  * to bound the scan.
  */
object Snapshot {

  /** Latest version of each `keyCol` row: max (tsCol, tiebreakCol). */
  def latestPerKey(
      log: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tiebreakCol).desc)
    log.withColumn("__version_rn", row_number().over(w))
      .filter(col("__version_rn") === 1)
      .drop("__version_rn")
  }
}
