package graft.movies

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.ops.JsonSidecar

/** ATOMIC SERVE-POINTER for full-reindex generations of the posting
  * index (VERDICT r15 #3 — the [[graft.ops.IvfPqCurrent]] pattern
  * applied to the text side): changing the ANALYZER (stopword list,
  * stemmer version) is the text-side quantization change — postings
  * built under the old analyzer are unservable against new-analyzer
  * queries, exactly as PQ codes are undecodable under foreign
  * codebooks. [[PostingIndex.compact]] versions LAYOUTS within one
  * generation (same analyzer, folded deltas); this pointer versions
  * GENERATIONS (one full reindex per analyzer change), the reference's
  * ES reindex-then-alias-swap shape (`run.sh:25-29` bootstraps the
  * schema the daemon then fills; the alias serves one live index while
  * the replacement builds aside).
  *
  *   root/__current.json   serve pointer ([[JsonSidecar]] — atomic
  *                         overwrite-rename): live generation NAME,
  *                         version, and the ANALYZER VERSION its
  *                         postings were tokenized under
  *   root/index-<v>/       one self-contained [[PostingIndex]] dir per
  *                         generation (its own stats.json, doc store,
  *                         postings, delta log — maintenance ops keep
  *                         working against the current generation's
  *                         dir exactly as before)
  *
  * Why the pointer carries the ANALYZER VERSION, not just the dir: a
  * server must tokenize QUERIES with the same analyzer that built the
  * postings, and the failure mode this exists for is exactly "new
  * postings served under old query analysis" (a stemmer bump that
  * reindexes `running`→`run` while queries still stem to `runn`
  * returns silent empties). One atomic read hands a server a
  * consistent pair: (generation dir, analyzer version to apply to
  * queries). The analyzer itself is code — the caller maps the
  * version string to its token columns; the store records WHICH one
  * is live.
  *
  * Reader contract: [[openCurrent]] is one tiny JSON read; a handle
  * opened on the previous generation keeps serving until its dir ages
  * out of `retainVersions` (the retained-layout rule one level up).
  * Writer contract: single writer via the ROOT's
  * [[graft.cdc.WriterLease]]; a crash before the pointer swap leaves
  * the old generation serving and the half-built `index-<v+1>` as
  * debris the next cutover's lease-held pre-build sweep removes
  * (exact-name matching only).
  */
object PostingCurrent {

  /** One consistent serving generation of the text index. */
  final case class Current(
      root: String,
      version: Long,
      dir: String,
      analyzerVersion: String) {
    /** The generation's serving handle (re-open to rebind after a
      * cutover — the PostingIndexSink pattern).
      */
    def open(spark: SparkSession): PostingIndex =
      PostingIndex.open(spark, dir)
  }

  private def pointerPath(root: String): Path =
    new Path(root.stripSuffix("/"), "__current.json")

  private def generationName(version: Long): String = s"index-$version"

  private val GenerationRe = "^index-(\\d+)$".r

  /** The serve pointer, if one has been published. */
  def read(spark: SparkSession, root: String): Option[Current] =
    JsonSidecar.read(spark, pointerPath(root)).map { parsed =>
      val n = parsed.orNull
      require(n != null && n.hasNonNull("version") &&
        n.hasNonNull("generation") && n.hasNonNull("analyzerVersion"),
        s"corrupt posting-index serve pointer at ${pointerPath(root)} " +
          "— re-publish via reindexCutover (the generation dirs " +
          "themselves are intact)")
      Current(root, n.path("version").asLong(),
        new Path(root.stripSuffix("/"), n.path("generation").asText())
          .toString,
        n.path("analyzerVersion").asText())
    }

  /** The serve pointer — loud when the store was never published. */
  def openCurrent(spark: SparkSession, root: String): Current =
    read(spark, root).getOrElse(throw new IllegalArgumentException(
      s"no posting-index serve pointer under $root — publish a first " +
        "generation via PostingCurrent.reindexCutover"))

  /** Full reindex under a (possibly changed) analyzer + atomic
    * cutover: build `index-<v+1>` from the live doc-of-record with
    * `tokens` (the NEW analyzer's token columns, tagged
    * `analyzerVersion`), swap the pointer, retire generations beyond
    * `retainVersions`. The first publish of a store and the
    * analyzer-bump reindex are the same operation. Old-generation
    * readers keep serving their dir through the swap; a server that
    * re-reads the pointer gets the new generation AND the analyzer
    * version to tokenize queries with — never a torn mix.
    */
  def reindexCutover(
      docs: DataFrame, root: String,
      tokens: Map[String, Column], weights: Map[String, Int],
      analyzerVersion: String,
      idCol: String = "id",
      nTermBuckets: Int = 16, nDocBuckets: Int = 16,
      retainVersions: Int = 2,
      lease: Option[graft.cdc.WriterLease] = None): Current = {
    require(retainVersions >= 1, "retainVersions must be >= 1")
    require(analyzerVersion.nonEmpty, "analyzerVersion must be non-empty")
    lease.foreach(_.requireHeld()) // preventive gate BEFORE any op work
    val spark = docs.sparkSession
    val version = read(spark, root).fold(0L)(_.version + 1L)
    // pre-build debris sweep (lease-held): a crashed previous cutover
    // may have staged exactly this version's dir
    sweepAbove(spark, root, version - 1L)
    val dir = new Path(root.stripSuffix("/"), generationName(version))
      .toString
    PostingIndex.buildTokenized(docs, dir, tokens, weights, idCol,
      nTermBuckets, nDocBuckets)
    // build/swap boundary renewal (the build is the long phase; a
    // writer superseded during it aborts here — the staged generation
    // becomes sweep debris, the pointer never moves)
    lease.foreach(_.requireHeld())
    val n = JsonSidecar.newRoot
    n.put("version", version)
    n.put("generation", generationName(version))
    n.put("analyzerVersion", analyzerVersion)
    JsonSidecar.publish(spark, pointerPath(root), n)
    retire(spark, root, version, retainVersions, lease)
    Current(root, version, dir, analyzerVersion)
  }

  /** Drop generations BELOW the newest `retainVersions` (from
    * `current` down), sidecars before the dir — the
    * [[graft.ops.IvfPqCurrent]] retirement discipline, including its
    * ADVICE-r15 rules: never touch generations ABOVE the pointer
    * (a lapsed lease could otherwise delete a newly admitted writer's
    * staged build — above-pointer debris is the next cutover's
    * lease-held pre-build sweep's job), and re-check the lease first.
    */
  private def retire(
      spark: SparkSession, root: String, current: Long,
      retainVersions: Int,
      lease: Option[graft.cdc.WriterLease]): Unit = {
    lease.foreach(_.requireHeld())
    dropGenerations(spark, root, v => v < current - (retainVersions - 1))
  }

  private def sweepAbove(
      spark: SparkSession, root: String, current: Long): Unit =
    dropGenerations(spark, root, v => v > current)

  private def dropGenerations(
      spark: SparkSession, root: String, doomed: Long => Boolean): Unit = {
    val rootPath = new Path(root.stripSuffix("/"))
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return
    fs.listStatus(rootPath).map(_.getPath).foreach { p =>
      p.getName match {
        // exact generated names only (a user-placed `index_backup` is
        // never touched); the length guard keeps a foreign huge-digit
        // name from overflowing toLong. Sidecars BEFORE the dir: the
        // exact-name sweep anchors on the dir name, so dir-first would
        // strand a crashed sweep's lease file forever.
        case GenerationRe(v) if v.length <= 18 && doomed(v.toLong) =>
          JsonSidecar.delete(spark,
            new Path(p.toString + "__lease.json"))
          fs.delete(p, true)
        case _ => ()
      }
    }
  }
}
