package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The single-file JSON sidecar durability discipline, shared by every
  * sidecar owner ([[SeqSidecar]]'s `__maint.json`,
  * [[graft.cdc.WriterLease]]'s `__lease.json`) so the copies cannot
  * drift (review-pass finding, round 14 — the two hand-rolled copies
  * had already diverged on the is-object corruption guard):
  *
  *   - [[publish]]: tmp file + rename, so the visible file is always a
  *     COMPLETE JSON document; a crash mid-publish leaves the previous
  *     file or none. The delete+rename pair is not atomic on every FS,
  *     but its only crash residue is ABSENCE — which every owner
  *     treats as a safe state.
  *   - [[read]]: None when the file is absent; a file that EXISTS but
  *     fails to parse as a JSON object returns `Some(None)` so the
  *     owner can raise ITS OWN loud domain error (the owners' messages
  *     name the store and the recovery path). Transport errors (an fs
  *     blip) propagate as themselves, so an operator is never told to
  *     delete a healthy sidecar over a transient fault.
  */
private[graft] object JsonSidecar {

  type Node = com.fasterxml.jackson.databind.node.ObjectNode

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def newRoot: Node =
    new com.fasterxml.jackson.databind.ObjectMapper().createObjectNode()

  /** None = absent; Some(None) = present but not a parseable JSON
    * object (the owner raises its loud corruption error); Some(Some) =
    * the parsed root.
    */
  def read(spark: SparkSession, p: Path): Option[Option[Node]] = {
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val root =
        try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        catch {
          case _: com.fasterxml.jackson.core.JacksonException => null
        }
        finally in.close()
      Some(
        if (root != null && root.isObject) Some(root.asInstanceOf[Node])
        else None)
    }
  }

  def publish(spark: SparkSession, p: Path, root: Node): Unit = {
    val tmp = new Path(p.toString + ".tmp")
    val fs = fsOf(spark, p)
    val out = fs.create(tmp, true)
    try out.write(new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsBytes(root))
    finally out.close()
    if (fs.exists(p)) { fs.delete(p, false); () }
    require(fs.rename(tmp, p),
      s"could not publish sidecar $p (rename failed)")
  }

  def delete(spark: SparkSession, p: Path): Unit = {
    val fs = fsOf(spark, p)
    if (fs.exists(p)) { fs.delete(p, false); () }
  }
}
