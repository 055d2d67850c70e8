package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session configuration — what we rely on
  * at scale, spelled out:
  *
  *  - AQE on (default in Spark 4) with skew-join splitting: runtime
  *    re-planning fixes partition-count and hot-key estimates that no
  *    static setting gets right at 100 TB.
  *  - `shuffle.partitions` sized to the executor slot count here
  *    (local mode); on a 1000-executor cluster set it ~2-3× total
  *    cores and let AQE coalesce down — it can split/merge, but only
  *    from an upper bound.
  *  - 256 MB scan partitions: big enough to amortize task overhead,
  *    small enough to fit comfortably in executor memory with a
  *    columnar batch in flight.
  *  - UTC session time zone: timestamp determinism across engines is
  *    part of the oracle contract (TemporalQueries scaladoc).
  */
object GraftSession {

  def build(cores: String, appName: String = "graft"): SparkSession =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${256 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
