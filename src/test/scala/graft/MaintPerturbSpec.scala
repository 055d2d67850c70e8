package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.movies.PostingIndex

/** MAINTENANCE-STATE sensitivity (VERDICT r11 #6): the oracle gates
  * hash the SERVED output, so they catch an index-maintenance bug only
  * if corrupting the maintained store actually changes the serve. This
  * spec proves it does, for each corruption class the seq discipline
  * exists to survive: drop a delta segment, skip (drop) a tombstone
  * segment, and off-by-one a segment's seq — each perturbation applied
  * to a maintained PostingIndex mid-state must change the served
  * (id, score) set vs the unperturbed serve. (The audit_oracle.py
  * result-frame perturbations cover the compare function itself; these
  * cover the store → the q293/q294 class of gate cannot be blind to
  * maintenance state.)
  */
class MaintPerturbSpec extends SparkTestBase {
  import spark.implicits._

  /** Build the same maintained state fresh per leg: base build of docs
    * 1..40, one upsert batch (replacing 1..4 with new content + adding
    * 41..44), one delete of ids 5..8 — a live log with one `-u` and
    * one `-d` segment the serve must fold.
    */
  private def freshMaintained(): (PostingIndex, String) = {
    val all = (1L to 40L).map(i =>
      (i, s"word${i % 7} base common")).toDF("id", "text")
    val tokens = Map("text" -> split($"text", "\\s+"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_perturb").toString + "/idx"
    var idx = PostingIndex.buildTokenized(all, dir, tokens,
      Map("text" -> 1), idCol = "id",
      nTermBuckets = 4, nDocBuckets = 4)
    val batch = ((1L to 4L) ++ (41L to 44L)).map(i =>
      (i, s"word${i % 7} upserted common")).toDF("id", "text")
    idx = idx.upsert(batch, tokens)
    idx = idx.delete((5L to 8L).toDF("id"))
    (idx, dir)
  }

  private def serve(dir: String): Set[(Long, Long)] =
    PostingIndex.open(spark, dir).scoreTerms(Seq("common", "upserted"))
      .select($"id", round($"score" * 1000).cast("long"))
      .as[(Long, Long)].collect().toSet

  private def segDirs(dir: String, suffix: String): Seq[java.io.File] =
    new java.io.File(s"$dir/delta").listFiles().toSeq
      .filter(f => f.getName.startsWith("seg-") &&
        f.getName.endsWith(suffix))

  private def rmRf(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rmRf))
    f.delete(); ()
  }

  test("dropping a delta segment CHANGES the serve (an oracle-hashed " +
       "gate over a maintained index cannot miss a lost upsert batch)") {
    val (_, dir) = freshMaintained()
    val want = serve(dir)
    rmRf(segDirs(dir, "-u").head)
    assert(serve(dir) !== want, "serve was blind to a dropped segment")
  }

  test("skipping a tombstone segment CHANGES the serve (a resurfaced " +
       "deleted doc must break the hash)") {
    val (_, dir) = freshMaintained()
    val want = serve(dir)
    rmRf(segDirs(dir, "-d").head)
    assert(serve(dir) !== want, "serve was blind to a skipped tombstone")
  }

  test("off-by-one on a segment's seq CHANGES the serve (a publish " +
       "recorded above the stats window is torn debris and must not " +
       "fold — here the newest tombstone segment, so deletes undo)") {
    val (_, dir) = freshMaintained()
    val want = serve(dir)
    // the delete's segment holds the HIGHEST seq; +1 pushes it above
    // thruSeq — the window check must drop it, resurfacing the deletes
    val seg = segDirs(dir, "-d").head
    val Array(n, op) = seg.getName.stripPrefix("seg-").split("-", 2)
    val bumped = new java.io.File(seg.getParentFile,
      s"seg-${n.toLong + 1}-$op")
    assert(seg.renameTo(bumped))
    assert(serve(dir) !== want, "serve was blind to an off-by-one seq")
  }
}
