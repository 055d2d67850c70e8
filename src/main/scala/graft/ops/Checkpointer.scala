package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/** Pluggable lineage truncation for the iterative operator family
  * (GraphOps loops, BPE merge learning, incremental-index refresh).
  *
  * `localCheckpoint` stores blocks in executor memory/disk — fast, but
  * NOT executor-loss-safe: a 100 TB PageRank losing one executor in
  * round 40 restarts from zero. `df.checkpoint()` against a reliable
  * (DFS) checkpoint dir survives executor loss at the cost of one write
  * per round.
  *
  * Mode selection is the session's own contract, no extra config
  * surface: if `sparkContext.setCheckpointDir(...)` has been called (a
  * production cluster points it at DFS), every [[checkpoint]] is a
  * RELIABLE checkpoint; otherwise it falls back to `localCheckpoint`
  * (tests, local dev). Both forms are eager, so per-round cost
  * accounting is identical. Results are bit-identical either way —
  * GraphOpsSpec runs one loop in reliable mode and asserts so.
  */
object Checkpointer {

  def checkpoint[T](ds: Dataset[T]): Dataset[T] =
    if (ds.sparkSession.sparkContext.getCheckpointDir.isDefined)
      ds.checkpoint()
    else ds.localCheckpoint()

  /** `df.graftCheckpoint()` sugar so call sites read like the
    * `localCheckpoint()` they replace.
    */
  implicit class CheckpointSyntax(private val df: DataFrame)
      extends AnyVal {
    def graftCheckpoint(): DataFrame = checkpoint(df)
  }
}
