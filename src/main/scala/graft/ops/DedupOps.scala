package graft.ops

import graft.ops.Checkpointer._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale document pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design:
  *  - Exact dedup shuffles once on a 16-byte hash key (not the full text).
  *  - Near-dup candidate generation NEVER does a cross join: MinHash/LSH
  *    buckets via explode + self-equi-join on (band, bandHash) — the join
  *    key cardinality grows with corpus size so the shuffle stays balanced;
  *    n-gram Jaccard uses an inverted-index join on shingle hash.
  *  - Signatures/hashes are portable polynomial arithmetic (see TextOps),
  *    reproducible in any engine for oracle checks.
  */
object DedupOps {

  /** Prime larger than 2^32 for MinHash universal hashing. */
  val MinhashPrime: Long = 4294967311L

  /** Exact-dedup key: md5 of whitespace/case-normalized text. */
  def exactKey(text: Column): Column = md5(TextOps.normalize(text))

  /** Drop exact duplicates, keeping the row with the smallest `id` per
    * key. One shuffle on the hash key; min_by avoids a sort.
    */
  def dropExactDuplicates(df: DataFrame, id: String, text: String): DataFrame = {
    // The keep-set is derived from `keyed` itself, so a naive self-join
    // would resolve both __key refs to the same attribute (a dead,
    // "trivially true" conjunct). Renaming the agg side's columns gives
    // the join two genuinely distinct attributes.
    val keyed = df.withColumn("__key", exactKey(col(text)))
    val keep = keyed.groupBy(col("__key"))
      .agg(min(col(id)).as("__keep_id"))
      .withColumnRenamed("__key", "__keep_key")
    keyed.join(keep,
        col("__key") === col("__keep_key") &&
          col(id) === col("__keep_id"), "left_semi")
      .drop("__key")
  }

  /** MinHash signature (length k) over a distinct shingle-hash array.
    * Permutation j is the universal hash h -> (a_j*h + b_j) mod P with
    * a_j = 2j+1 (odd), b_j = j*j+7 — fixed, engine-portable parameters.
    * Empty shingle sets get signature element P (= "no shingle" sentinel).
    */
  def minhashSignature(shingleHashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), j => {
      val a = j * lit(2L) + lit(1L)
      val b = j * j + lit(7L)
      coalesce(
        array_min(transform(shingleHashes,
          h => (a * h + b) % lit(MinhashPrime))),
        lit(MinhashPrime))
    })

  /** Distributed MinHash signatures for a whole DataFrame: explode the
    * shingle-hash arrays and compute all k permutation minima as plain
    * `min()` aggregates in one groupBy — every expression codegen'd, no
    * per-element lambdas (the Column-level [[minhashSignature]] is
    * semantically identical but its nested HOFs are CodegenFallback,
    * which interprets a lambda per shingle × permutation and dominates
    * wall-clock at corpus scale). One shuffle on the doc id; arithmetic
    * identical to [[minhashSignature]], so results match element-wise.
    * Docs with empty shingle sets get the all-sentinel signature.
    */
  def minhashSignatures(
      df: DataFrame, id: String, shingles: String, k: Int): DataFrame = {
    val inv = df.select(col(id), explode(col(shingles)).as("__h"))
    val mins = inv.groupBy(col(id)).agg(
      min((col("__h") * lit(1L) + lit(7L)) % lit(MinhashPrime)).as("__s0"),
      (1 until k).map(j =>
        min((col("__h") * lit(2L * j + 1L) + lit(j.toLong * j + 7L))
          % lit(MinhashPrime)).as(s"__s$j")): _*)
    val sigCol = array((0 until k).map(j => col(s"__s$j")): _*)
    df.select(col(id))
      .join(mins, Seq(id), "left_outer")
      .select(col(id),
        // array(null,...) is non-null, so test a slot, not the array
        when(col("__s0").isNull,
          array((0 until k).map(_ => lit(MinhashPrime)): _*))
          .otherwise(sigCol).as("sig"))
  }

  /** LSH band keys for a signature: `bands` structs (band index, portable
    * hash of that band's `rows` signature slots). Docs sharing any band
    * key are near-dup candidates.
    */
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(
        b.as("band"),
        aggregate(
          slice(sig, b * lit(rows) + lit(1), lit(rows)),
          lit(0L),
          (acc, x) => (acc * lit(31L) + x % lit(TextOps.HashPrime))
            % lit(TextOps.HashPrime)).as("bh")))

  /** Default per-bucket cardinality cap for LSH pair generation. A bucket
    * this large is by definition one dup cluster (its members all share a
    * band hash), so all-pairs output adds no connectivity information —
    * star pairs to the bucket minimum carry the same components at linear
    * instead of quadratic cost.
    */
  val DefaultMaxBucket: Int = 1024

  /** (id_a < id_b) pairs within each (band, bh) bucket of `keyed`
    * (columns: band, bh, `idc`). Buckets with at most `maxBucket` members
    * produce all pairs via posting lists (one shuffle of the band keys,
    * codegen'd explodes). Buckets ABOVE the cap — on real web corpora,
    * boilerplate/empty documents collapse to one signature and would
    * otherwise build a multi-million-element array row and an N² explode
    * in one task — instead emit star pairs (bucket-min id ↔ every other
    * member): no posting array is ever materialized for them, output is
    * linear in bucket size, and downstream connectivity (the only thing a
    * candidate-pair stream feeds) is provably identical, since a star
    * spans the same connected component as the clique.
    */
  private def boundedBucketPairs(
      keyed: DataFrame, idc: String, maxBucket: Int): DataFrame = {
    require(maxBucket >= 2, "maxBucket must be >= 2")
    val par = keyed.sparkSession.sparkContext.defaultParallelism
    val counts = keyed.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("__cnt"))
    val tagged = keyed.join(counts, Seq("band", "bh"))
    val small = tagged.filter(col("__cnt") <= maxBucket)
      .groupBy(col("band"), col("bh"))
      .agg(collect_list(col(idc)).as("ids"))
      // explicit repartition before the quadratic in-list explode: the
      // posting-list stream is small (AQE would coalesce it to one
      // task) but the pair generation blows it up ~|bucket|× — pin the
      // parallelism so the explosion spreads (same fix as
      // SimilarityOps.lshNeighborPairs).
      .repartition(par)
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
    val bigMembers = tagged.filter(col("__cnt") > maxBucket)
    val bigMin = bigMembers.groupBy(col("band"), col("bh"))
      .agg(min(col(idc)).as("__m"))
    val bigStar = bigMembers.join(bigMin, Seq("band", "bh"))
      .filter(col(idc) =!= col("__m"))
      .select(col("__m").as("id_a"), col(idc).as("id_b"))
    small.union(bigStar).distinct()
  }

  /** Candidate near-dup pairs (idA < idB) from LSH banding: explode band
    * keys and pair ids sharing a (band, bandHash) bucket. Distributed:
    * one shuffle on the band key, no cross join; buckets above
    * `maxBucket` members degrade to star pairs (same connectivity, see
    * [[boundedBucketPairs]]) so degenerate boilerplate buckets can't OOM
    * a task.
    */
  def lshCandidatePairs(
      df: DataFrame, id: String, sig: String,
      bands: Int, rows: Int,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val exploded = df
      .select(col(id), explode(lshBandKeys(col(sig), bands, rows)).as("bk"))
      .select(col(id), col("bk.band").as("band"), col("bk.bh").as("bh"))
    boundedBucketPairs(exploded, id, maxBucket)
  }

  /** Candidate near-dup pairs for an INCREMENTAL batch: every pair with
    * at least one side in `delta` — (delta × corpus) candidates via an
    * equi-join of delta band keys against corpus band keys, plus
    * within-delta pairs. The accumulated corpus NEVER self-joins: this
    * is the daily-increment shape at 100 TB, where re-pairing the whole
    * corpus per batch is quadratic-over-time, but checking the new
    * batch against the corpus's (band, bh) index — precomputable and
    * storable as a table — costs |delta|-proportional work. Corpus and
    * delta id sets must be disjoint. Returns (id_a, id_b), id_a < id_b.
    */
  def lshCandidatePairsIncremental(
      corpus: DataFrame, delta: DataFrame, id: String, sig: String,
      bands: Int, rows: Int,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    // co-partition the in-memory corpus keys explicitly: the bucket
    // join's output explodes ~|bucket|× over its input, and AQE (sizing
    // from the small inputs) would coalesce the exchange under it to
    // one task. (The STORED-index path skips this — bucketed layout IS
    // the partitioning; see lshCandidatePairsIncrementalIndexed.)
    val ck = lshBandKeyTable(corpus, id, sig, bands, rows)
      .repartition(par, col("band"), col("bh"))
    lshCandidatePairsIncrementalIndexed(
      ck, delta, id, sig, bands, rows, maxBucket)
  }

  /** The corpus (band, bh, id, __seq) key table — the STORED LSH index
    * schema. Persist it bucketed+sorted on (band, bh)
    * ([[BucketingOps.writeBucketed]], bucket count ≈ cluster
    * parallelism) and every corpus-side step of the incremental probe —
    * the hot-bucket bounding aggregate, the bound semi-join back, the
    * delta equi-join — runs WITHOUT shuffling the corpus: only the
    * |delta|-sized key stream moves (PlansSpec asserts the no-exchange
    * corpus subtree). Rebuild cost is one |corpus| pass, paid once per
    * index refresh, not per batch.
    *
    * `__seq` is the row-version column of the seq-ordered maintenance
    * discipline (base/refresh rows = [[LshBaseSeq]];
    * [[upsertIntoLshIndex]] writes replacements at a higher seq) —
    * VERDICT r11 #1, the PostingIndex rule applied family-wide.
    */
  def lshBandKeyTable(
      df: DataFrame, id: String, sig: String,
      bands: Int, rows: Int): DataFrame = df
    .select(col(id), explode(lshBandKeys(col(sig), bands, rows)).as("bk"))
    .select(col("bk.band").as("band"), col("bk.bh").as("bh"), col(id),
      lit(LshBaseSeq).as(LshSeqCol))

  /** Incremental REFRESH of a stored [[lshBandKeyTable]] index: fold an
    * accepted delta's (band, bh, id) keys into the bucketed table via
    * [[BucketingOps.appendBucketed]]. After the append the index is
    * pair-set-equivalent to a from-scratch rebuild over corpus∪delta
    * (same key rows, same bucket hashing — spec-checked in
    * BucketingSpec), so the maintenance cost of the q70 serving path
    * drops from one |corpus| pass per refresh to one |delta| pass per
    * accepted batch. Compact with [[BucketingOps.writeBucketed]] when
    * file counts warrant.
    */
  def refreshLshIndex(
      table: String, acceptedDelta: DataFrame, id: String, sig: String,
      bands: Int, rows: Int, nBuckets: Int): Unit = {
    // refreshed rows land at the CURRENT seq high-water mark (last
    // allocated op seq; base seq when none): they supersede nothing,
    // survive every EARLIER tombstone — a deleted id re-submitted
    // through the refresh path serves again instead of being silently
    // masked (review-pass fix) — and die to every later op. Contract:
    // delta ids not currently LIVE (replacement is upsertIntoLshIndex).
    val spark = acceptedDelta.sparkSession
    val highWater = SeqSidecar.highWater(spark, storePath(spark, table),
      LshBaseSeq, nextLshSeq(spark, table))
    BucketingOps.appendBucketed(
      lshBandKeyTable(acceptedDelta, id, sig, bands, rows)
        .withColumn(LshSeqCol, lit(highWater)),
      table, Seq("band", "bh"), nBuckets)
  }

  // Maintenance below follows the shared serving-index contract —
  // invariant table in [[IndexMaintenance]].

  /** Row/tombstone version column of the stored LSH index. */
  val LshSeqCol = "__seq"

  /** Seq of build/refresh ("base") rows — below every allocated op
    * seq, so a tombstone at any op seq supersedes them. */
  val LshBaseSeq = -1L

  /** Warehouse path of the stored index table — the [[SeqSidecar]]
    * anchor (the sidecar lives next to the table dir, like the
    * tombstone side table does).
    */
  private def storePath(
      spark: org.apache.spark.sql.SparkSession, table: String): String =
    spark.conf.get("spark.sql.warehouse.dir") + "/" + table

  private def tombstonePath(
      spark: org.apache.spark.sql.SparkSession, table: String): String =
    storePath(spark, table) + "__tombstones"

  /** The tombstone side table with legacy rows normalized: files
    * written before the seq discipline carry ids only — read with an
    * explicit schema (no mergeSchema job) and coalesce
    * a missing/null `__seq` to 0, preserving legacy semantics exactly
    * (base rows at seq -1 stay deleted; any new op allocates seq ≥ 1
    * and supersedes). None ⇔ no tombstones.
    */
  private def lshTombstones(
      spark: org.apache.spark.sql.SparkSession,
      table: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(tombstonePath(spark, table))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      // Footer-only schema probe (driver-side, no job) for the id
      // field, then ONE explicit-schema read: the previous mergeSchema
      // read launched a distributed footer-merge JOB on every call —
      // several per maintenance op/serve (guide §2.4, fewer driver
      // actions). Legacy files without __seq read it as null under
      // the forced schema; the coalesce-to-0 below preserves their
      // semantics exactly, mixed old/new file sets included.
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val idFields = spark.read.parquet(p.toString).schema.fields
        .filterNot(_.name == LshSeqCol)
      val schema = StructType(idFields.map(_.copy(nullable = true)) :+
        StructField(LshSeqCol, LongType))
      Some(spark.read.schema(schema).parquet(p.toString)
        .withColumn(LshSeqCol, coalesce(col(LshSeqCol), lit(0L))))
    }
  }

  /** LEGACY next-seq derive for a pre-sidecar (or sidecar-deleted)
    * store: the max seq across the tombstone table AND the stored
    * index rows, + 1. The ROW side matters (review-pass fix, round
    * 13): a refresh lands rows at the sidecar's high-water mark, which
    * can be a seq a torn op burned — reserved, tombstones never
    * written — so a tombstone-only derive would re-issue that seq and
    * a later delete of the refreshed id would TIE its row and lose.
    * Paid at most once per store — [[SeqSidecar.alloc]] seeds the
    * sidecar from it and every later op reads the sidecar (one tiny
    * JSON file) instead of re-scanning per op (ADVICE r12 #2's O(K²)
    * file-open aggregate across a K-op no-compact window).
    */
  private def nextLshSeq(
      spark: org.apache.spark.sql.SparkSession, table: String): Long = {
    def maxOf(df: DataFrame): Long = {
      val r = df.agg(max(coalesce(col(LshSeqCol), lit(LshBaseSeq)))).head()
      if (r.isNullAt(0)) LshBaseSeq else r.getLong(0)
    }
    val tombMax = lshTombstones(spark, table).fold(LshBaseSeq)(maxOf)
    val rowMax =
      if (!spark.catalog.tableExists(table)) LshBaseSeq
      else {
        val t = spark.table(table)
        if (!t.columns.contains(LshSeqCol)) LshBaseSeq else maxOf(t)
      }
    math.max(tombMax, rowMax) + 1L
  }

  /** Reserve the next maintenance-op seq: sidecar read + bump (O(1)),
    * legacy tombstone-table derive only for a pre-sidecar store;
    * [[compactLshIndex]] clears sidecar + tombstones and resets row
    * seqs to [[LshBaseSeq]], so restarting at 0 afterwards is safe.
    */
  private def allocLshSeq(
      spark: org.apache.spark.sql.SparkSession, table: String): Long =
    SeqSidecar.alloc(spark, storePath(spark, table),
      nextLshSeq(spark, table))

  /** Legacy-table guard: an index written before the seq discipline
    * has no `__seq` column — treat its rows as base rows. */
  private def withLshSeq(df: DataFrame): DataFrame =
    if (df.columns.contains(LshSeqCol)) df
    else df.withColumn(LshSeqCol, lit(LshBaseSeq))

  /** DELETE from a stored LSH index (right-to-be-forgotten /
    * retraction): append the ids to a tombstone side table at a fresh
    * op seq — one |request| write, no index rewrite. A bucketed table
    * cannot drop rows in place, and the id's key rows are scattered
    * across ~bands buckets, so an eager rewrite would touch most of
    * the index; tombstoning defers that cost to [[compactLshIndex]].
    *
    * Tombstones are SEQ-ORDERED, not an id-set: a read keeps a row iff
    * the row's seq beats the id's newest tombstone, so a LATER
    * [[upsertIntoLshIndex]] re-adds a deleted id without waiting for a
    * compact (the PostingIndex discipline; the r11 "re-add is
    * UNDEFINED" restriction is gone).
    *
    * Readers go through [[activeLshIndex]], which applies the max-seq
    * filter as a BROADCAST (corpus side keeps its bucketed layout,
    * zero added exchanges). Contract: tombstone count between
    * compactions stays broadcast-sized (deletion requests are rare and
    * small next to the corpus); compact on whatever cadence the
    * tombstone table grows.
    */
  def removeFromLshIndex(
      spark: org.apache.spark.sql.SparkSession, table: String,
      deletedIds: DataFrame, id: String,
      lease: Option[graft.cdc.WriterLease] = None): Unit = {
    lease.foreach(_.requireHeld()) // preventive gate BEFORE any op work
    deletedIds.select(col(id)).distinct()
      .withColumn(LshSeqCol, lit(allocLshSeq(spark, table)))
      .write.mode("append").parquet(tombstonePath(spark, table))
  }

  /** UPSERT-BY-ID into a stored LSH index — a re-shingled document
    * replaces its band-key rows without a rebuild (the index-agnostic
    * daemon.py:358-381 replace, VERDICT r11 #1): the batch's keys land
    * at a fresh op seq and the batch ids are tombstoned AT that seq —
    * old versions (lower seq) stop serving immediately, the new rows
    * (seq == tombstone seq) survive the `>=` read rule. Ids may be new
    * or existing; replay is absorbed (higher seq, equal content).
    * Cost: O(|batch|) writes (one bucket-aligned append + one
    * tombstone append), zero corpus reads.
    *
    * Contract: `batch` unique by `id` (checked); single writer; torn
    * op ⇒ rebuild (the per-family durability difference).
    */
  def upsertIntoLshIndex(
      spark: org.apache.spark.sql.SparkSession, table: String,
      batch: DataFrame, id: String, sig: String,
      bands: Int, rows: Int, nBuckets: Int,
      lease: Option[graft.cdc.WriterLease] = None): Unit = {
    lease.foreach(_.requireHeld()) // preventive gate BEFORE any op work
    val pinned = Checkpointer.checkpoint(
      batch.select(col(id), col(sig)))
    val n = pinned.count()
    if (n == 0L) return
    require(pinned.select(col(id)).distinct().count() == n,
      s"upsert batch must be unique by '$id' — duplicates would " +
        "serve two versions at one seq")
    // reserve AFTER validation (no burned seq on a rejected batch) but
    // BEFORE any write at the seq — a torn op below leaves the counter
    // already advanced, so a replay allocates fresh
    val seq = allocLshSeq(spark, table)
    // tombstone FIRST: if the key append is torn, the old version is
    // already superseded and a replay heals (never two live versions)
    pinned.select(col(id)).withColumn(LshSeqCol, lit(seq))
      .write.mode("append").parquet(tombstonePath(spark, table))
    BucketingOps.appendBucketed(
      lshBandKeyTable(pinned, id, sig, bands, rows)
        .withColumn(LshSeqCol, lit(seq)),
      table, Seq("band", "bh"), nBuckets)
  }

  /** The index rows whose seq beats their id's newest tombstone — what
    * every probe should read. Broadcast max-seq filter: the bucketed
    * corpus scan streams through unshuffled (PlansSpec-checked on the
    * q70 serving path).
    */
  def activeLshIndex(
      spark: org.apache.spark.sql.SparkSession, table: String,
      id: String): DataFrame = {
    val idx = withLshSeq(spark.table(table))
    lshTombstones(spark, table).fold(idx) { t =>
      val tmax = t.groupBy(col(id)).agg(max(col(LshSeqCol)).as("__tmax"))
      idx.join(broadcast(tmax), Seq(id), "left")
        .filter(col("__tmax").isNull || col(LshSeqCol) >= col("__tmax"))
        .drop("__tmax")
        // normalize to the build schema (the USING-join moved `id`
        // first): band-key consumers and compact's rewrite both expect
        // (band, bh, id, __seq) — file-parity with a fresh build
        .select(col("band"), col("bh"), col(id), col(LshSeqCol))
    }
  }

  /** Fold tombstones into the layout: rewrite the index without the
    * superseded rows (one bounded |index| pass — the same cost class
    * as a [[BucketingOps.writeBucketed]] compaction, which this also
    * is), reset surviving row seqs to [[LshBaseSeq]] (they are base
    * rows of the folded layout — what makes clearing the tombstone
    * table and restarting the seq counter safe) and clear the
    * tombstone table. After compaction the index is file-identical to
    * a from-scratch rebuild over the live versions
    * (BucketingSpec-checked).
    */
  def compactLshIndex(
      spark: org.apache.spark.sql.SparkSession, table: String,
      id: String, nBuckets: Int,
      lease: Option[graft.cdc.WriterLease] = None): Unit = {
    lease.foreach(_.requireHeld()) // preventive gate BEFORE any op work
    // materialize BEFORE the rewrite: writeBucketed drops the table
    // this plan reads from
    val active = Checkpointer.checkpoint(
      activeLshIndex(spark, table, id)
        .withColumn(LshSeqCol, lit(LshBaseSeq)))
    // mid-op renewal at the fold/rewrite boundary (ADVICE r14): the
    // checkpointed fold above is the long read phase; a lease
    // superseded during it aborts HERE — before the table rewrite
    lease.foreach(_.requireHeld())
    BucketingOps.writeBucketed(active, table, Seq("band", "bh"), nBuckets)
    val p = new org.apache.hadoop.fs.Path(tombstonePath(spark, table))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
    // all survivors are base rows and the tombstones are gone — the
    // seq counter restarts at 0 (absent sidecar + absent tombstones)
    SeqSidecar.clear(spark, storePath(spark, table))
  }

  /** [[lshCandidatePairsIncremental]] against a PRECOMPUTED corpus key
    * table (`corpusKeys`: band, bh, `id` — the [[lshBandKeyTable]]
    * schema, typically a stored bucketed table). The daily-increment
    * shape at 100 TB: the corpus is never re-shingled, re-hashed, or —
    * when the index is bucketed on (band, bh) — even re-shuffled; the
    * delta side alone pays a shuffle to meet the index's layout.
    */
  def lshCandidatePairsIncrementalIndexed(
      corpusKeys: DataFrame, delta: DataFrame, id: String, sig: String,
      bands: Int, rows: Int,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    // the delta key stream serves BOTH branches — materialize it once
    // (recomputing lshBandKeys per branch doubled the delta-side work,
    // which is the |delta|-proportional cost this op exists to bound)
    val dk = lshBandKeyTable(delta, id, sig, bands, rows)
      .withColumnRenamed(id, "__did").graftCheckpoint()
    // Bound the corpus side per bucket BEFORE the join: a corpus bucket
    // above `maxBucket` is a dup cluster the corpus's own dedup pass has
    // already linked internally, so pairing each delta id with one
    // representative (the bucket-min corpus id) yields the same
    // downstream connectivity as pairing it with all members — and keeps
    // the join output |delta|-proportional instead of
    // |delta|×|hot-bucket|. On a bucketed index both the aggregate and
    // the join back read co-partitioned scans — no corpus shuffle.
    val ck = corpusKeys
      .select(col("band"), col("bh"), col(id).as("__cid"))
    val ckCounts = ck.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("__cnt"), min(col("__cid")).as("__rep"))
    val ckBounded = ck.join(ckCounts, Seq("band", "bh"))
      .filter(col("__cnt") <= maxBucket || col("__cid") === col("__rep"))
      .select(col("band"), col("bh"), col("__cid"))
    // No explicit repartition here: the corpus side's partitioning (its
    // bucketed layout, or the caller's repartition on the in-memory
    // path) already satisfies the join's distribution, so Catalyst
    // shuffles only the delta stream to meet it.
    val cross = ckBounded
      .join(dk, Seq("band", "bh"))
      .select(least(col("__cid"), col("__did")).as("id_a"),
        greatest(col("__cid"), col("__did")).as("id_b"))
    // within-delta pairs from the same materialized keys (bounded
    // posting-list shape of lshCandidatePairs, minus the recompute)
    val within = boundedBucketPairs(dk, "__did", maxBucket)
    cross.union(within).distinct()
  }

  /** Jaccard similarity in per-mille (integer-exact) between two distinct
    * element arrays: |a∩b| * 1000 div |a∪b|.
    */
  def jaccardMilli(a: Column, b: Column): Column =
    floor(size(array_intersect(a, b)).cast("double") * 1000.0 /
      size(array_union(a, b)).cast("double")).cast("long")

  /** 32-bit SimHash over an array of portable token hashes: bit i of the
    * result is set when the sum of (2*bit_i(h) - 1) over all hashes is
    * positive. Returned as a non-negative Long. Native codegen'd
    * expression ([[graft.functions.SimHash32]]); [[simhash32Hof]] is
    * the layered differential referee (TextDedupSimSpec equivalence).
    */
  def simhash32(tokenHashes: Column): Column =
    graft.functions.GraftColumns.simhash32(tokenHashes)

  /** Reference HOF implementation of [[simhash32]] — nested interpreted
    * lambdas (32·|hashes| steps/row, never codegen'd); kept only as the
    * cross-implementation referee, do not use on a hot path.
    */
  def simhash32Hof(tokenHashes: Column): Column =
    aggregate(
      transform(sequence(lit(0), lit(31)), i => {
        val pow2 = pow(lit(2.0), i).cast("long")
        val bitSum = aggregate(tokenHashes, lit(0L),
          (acc, h) => acc + ((h.cast("long") / pow2).cast("long") % lit(2L))
            * lit(2L) - lit(1L))
        when(bitSum > 0, pow2).otherwise(lit(0L))
      }),
      lit(0L), (acc, x) => acc + x)

  /** Hamming distance between two SimHash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Inverted-index candidate pairs for n-gram Jaccard: explode shingle
    * hashes, self-join on the hash, count shared shingles per pair.
    * Returns (id_a, id_b, shared). Exact but subject to hot-shingle join
    * fan-out (Σ freq² intermediate rows) — prefer
    * [[jaccardSimilarPairs]] (prefix-filtered, same results) at scale.
    */
  def sharedShingleCounts(
      df: DataFrame, id: String, shingles: String): DataFrame = {
    val inv = df.select(col(id), explode(col(shingles)).as("sh"))
    val l = inv.select(col("sh"), col(id).as("id_a"))
    val r = inv.select(col("sh"), col(id).as("id_b"))
    l.join(r, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
  }

  /** [[sharedShingleCounts]] specialized for a Jaccard threshold query:
    * since jaccard(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), pairs failing the
    * length-ratio bound can't reach the threshold and are dropped
    * BEFORE the pair aggregation — on Zipfian corpora most of the
    * hot-shingle Σfreq² fan-out dies here, in the same codegen stage as
    * the join. Sizes ride along, so the caller computes jaccard with no
    * extra joins. Returns (id_a, id_b, shared, n_a, n_b); exact for any
    * downstream filter `jaccard_milli >= thresholdMilli`.
    */
  def sharedShingleCountsBounded(
      df: DataFrame, id: String, shingles: String,
      thresholdMilli: Int,
      maxPosting: Int = DefaultMaxBucket): DataFrame = {
    // Posting lists instead of a self-join: group the inverted index by
    // shingle once, then generate in-list pairs with two codegen'd
    // explodes — one shuffle of the postings (vs two join sides), same
    // Σfreq² pair stream, pruned by the length-ratio bound before the
    // pair aggregation. Shingles hotter than `maxPosting` (stopword-like
    // boilerplate on a web corpus) would build an OOM-sized posting
    // array in one row, so they route through a self-equi-join instead:
    // no array is materialized and AQE's skew-join split spreads the hot
    // key across tasks. Unlike the LSH star-pair degradation, this keeps
    // the output EXACT for any `maxPosting` — `shared` counts feed the
    // Jaccard value, so dropping pairs would change similarity answers.
    val inv = df.select(col(id), explode(col(shingles)).as("sh"),
      size(col(shingles)).as("n"))
    val counts = inv.groupBy(col("sh")).agg(count(lit(1)).as("__cnt"))
    val tagged = inv.join(counts, Seq("sh"))
    val par = df.sparkSession.sparkContext.defaultParallelism
    def ratioOk(na: Column, nb: Column): Column =
      least(na, nb) * 1000 >= lit(thresholdMilli.toLong) * greatest(na, nb)
    val small = tagged.filter(col("__cnt") <= maxPosting)
      .groupBy(col("sh"))
      .agg(collect_list(struct(col(id).as("id"), col("n"))).as("ds"))
      // pin parallelism before the Σfreq² explode (see lshCandidatePairs)
      .repartition(par)
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a.id") < col("b.id") && ratioOk(col("a.n"), col("b.n")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
    val hot = tagged.filter(col("__cnt") > maxPosting)
      .select(col("sh"), col(id), col("n"))
    val hotPairs = hot
      .select(col("sh"), col(id).as("id_a"), col("n").as("n_a"))
      .join(hot.select(col("sh"), col(id).as("id_b"), col("n").as("n_b")),
        Seq("sh"))
      .filter(col("id_a") < col("id_b") && ratioOk(col("n_a"), col("n_b")))
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
    small.union(hotPairs)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
  }

  /** ASYMMETRIC containment pairs: C(A→B) = |A∩B| div |A| over DISTINCT
    * shingle sets, kept when either direction reaches `thresholdMilli`.
    * This is the dedup relation Jaccard structurally misses: a short
    * doc wholly quoted inside a long one (boilerplate wrapper, quoted
    * reply, excerpt) has jaccard ≈ |A|/|B| → 0 as B grows, but
    * containment C(A→B) = 1. No length-ratio prune applies — the
    * asymmetric pairs are exactly the ones a ratio bound would drop —
    * so the pair stream is the exact posting-list Σfreq² shape of
    * [[sharedShingleCountsBounded]] at threshold 0 (hot postings still
    * route through the skew-safe equi-join). Integer per-mille, exact.
    * Returns (id_a, id_b, shared, n_a, n_b, cont_a_milli, cont_b_milli).
    */
  def containmentPairs(
      df: DataFrame, id: String, shingles: String,
      thresholdMilli: Int,
      maxPosting: Int = DefaultMaxBucket): DataFrame = {
    require(thresholdMilli >= 0 && thresholdMilli <= 1000,
      "threshold is per-mille")
    val sets = df.select(col(id),
      array_distinct(col(shingles)).as("__set"))
    val div = graft.functions.GraftColumns.longDiv _
    sharedShingleCountsBounded(sets, id, "__set", thresholdMilli = 0,
        maxPosting = maxPosting)
      .withColumn("cont_a_milli", div(col("shared") * 1000L, col("n_a")))
      .withColumn("cont_b_milli", div(col("shared") * 1000L, col("n_b")))
      .filter(col("cont_a_milli") >= thresholdMilli ||
        col("cont_b_milli") >= thresholdMilli)
  }

  /** Per-pair tf-histogram statistics over a MULTISET feature column —
    * the shared kernel of [[weightedJaccardPairs]] and
    * [[sparseCosinePairs]]. The input column keeps duplicate features
    * (e.g. the raw native shingle stream, NOT `array_distinct`'d):
    * term frequency is the weight, so boilerplate that repeats inside a
    * document counts with its multiplicity — what the set-based q31/q151
    * measures deliberately flatten.
    *
    * Shape: one groupBy builds the (id, feature, tf) histogram with
    * map-side combine; per-doc totals (Σtf, Σtf²) ride along on the
    * posting structs like the sizes in [[sharedShingleCountsBounded]];
    * postings hotter than `maxPosting` route through the skew-safe
    * self-equi-join (AQE skew split) instead of a one-row posting
    * array; parallelism is pinned before the Σfreq² explode (AQE sizes
    * from the tiny key stream otherwise). `ratioMilli` prunes pairs
    * whose Σtf totals differ by more than the bound BEFORE the pair
    * aggregation — valid for weighted Jaccard (wj ≤ totMin/totMax),
    * pass 0 when the caller's measure has no such bound.
    *
    * Returns (id_a, id_b, min_sum, dot, tot_a, tot_b, n2_a, n2_b):
    * Σ min(tf_a,tf_b), Σ tf_a·tf_b, and the per-doc Σtf / Σtf².
    */
  def histogramPairStats(
      df: DataFrame, id: String, features: String,
      ratioMilli: Int = 0,
      maxPosting: Int = DefaultMaxBucket): DataFrame = {
    val hist = df.select(col(id), explode(col(features)).as("__f"))
      .groupBy(col(id), col("__f"))
      .agg(count(lit(1)).as("tf"))
    val stats = hist.groupBy(col(id))
      .agg(sum(col("tf")).as("tot"),
        sum(col("tf") * col("tf")).as("n2"))
    val tagged = hist.join(stats, Seq(id))
    val dfreq = hist.groupBy(col("__f")).agg(count(lit(1)).as("__cnt"))
    val posts = tagged.join(dfreq, Seq("__f"))
    val par = df.sparkSession.sparkContext.defaultParallelism
    def ratioOk(ta: Column, tb: Column): Column =
      least(ta, tb) * 1000 >= lit(ratioMilli.toLong) * greatest(ta, tb)
    def pairCols(a: Column, b: Column): Seq[Column] = Seq(
      a.getField(id).as("id_a"), b.getField(id).as("id_b"),
      least(a.getField("tf"), b.getField("tf")).as("__min"),
      (a.getField("tf") * b.getField("tf")).as("__prod"),
      a.getField("tot").as("tot_a"), b.getField("tot").as("tot_b"),
      a.getField("n2").as("n2_a"), b.getField("n2").as("n2_b"))
    val entry = struct(col(id).as(id), col("tf"), col("tot"), col("n2"))
    val small = posts.filter(col("__cnt") <= maxPosting)
      .groupBy(col("__f"))
      .agg(collect_list(entry).as("ds"))
      .repartition(par)
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a").getField(id) < col("b").getField(id) &&
        ratioOk(col("a").getField("tot"), col("b").getField("tot")))
      .select(pairCols(col("a"), col("b")): _*)
    val hot = posts.filter(col("__cnt") > maxPosting)
      .select(col("__f"), entry.as("e"))
    val hotPairs = hot.select(col("__f"), col("e").as("a"))
      .join(hot.select(col("__f"), col("e").as("b")), Seq("__f"))
      .filter(col("a").getField(id) < col("b").getField(id) &&
        ratioOk(col("a").getField("tot"), col("b").getField("tot")))
      .select(pairCols(col("a"), col("b")): _*)
    small.union(hotPairs)
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("__min")).as("min_sum"),
        sum(col("__prod")).as("dot"),
        first(col("tot_a")).as("tot_a"), first(col("tot_b")).as("tot_b"),
        first(col("n2_a")).as("n2_a"), first(col("n2_b")).as("n2_b"))
  }

  /** Weighted (multiset) Jaccard near-dup pairs: wj = Σ min(tf_a,tf_b)
    * / Σ max(tf_a,tf_b) over the shingle HISTOGRAMS. Identity
    * Σ max = tot_a + tot_b − Σ min turns the denominator into two
    * ride-along scalars, so only matching features ever join. The
    * multiset view scores a doc that repeats a boilerplate block n
    * times differently from one containing it once — set Jaccard
    * (q31) cannot tell them apart. The Σtf length-ratio bound prunes
    * before pair aggregation (wj ≥ t ⇒ totMin/totMax ≥ t). Integer
    * per-mille, exact. Returns (id_a, id_b, min_sum, tot_a, tot_b,
    * wj_milli) at wj_milli ≥ `thresholdMilli`.
    */
  def weightedJaccardPairs(
      df: DataFrame, id: String, features: String,
      thresholdMilli: Int,
      maxPosting: Int = DefaultMaxBucket): DataFrame = {
    require(thresholdMilli >= 0 && thresholdMilli <= 1000,
      "threshold is per-mille")
    val div = graft.functions.GraftColumns.longDiv _
    histogramPairStats(df, id, features,
        ratioMilli = thresholdMilli, maxPosting = maxPosting)
      .withColumn("wj_milli", div(col("min_sum") * 1000L,
        col("tot_a") + col("tot_b") - col("min_sum")))
      .filter(col("wj_milli") >= thresholdMilli)
      .select("id_a", "id_b", "min_sum", "tot_a", "tot_b", "wj_milli")
  }

  /** Sparse-vector cosine pairs via the inverted index (the
    * feature-hashed CountVectorizer path): documents as tf vectors over
    * hashed features, cosine through the posting-list join — only
    * features present in BOTH documents contribute to the dot product,
    * so compute scales with Σ df² over the feature vocabulary, never
    * corpus n² (q34's dense BNLJ shape). Works on any integer-weight
    * multiset column; compose with `pmod(shingleHash, dim)` for a
    * fixed-dimension hashing-trick vectorization.
    *
    * Determinism: cosine is compared SQUARED in integer ppm —
    * cos²·1e6 = dot²·1e6 div (Σtf_a²·Σtf_b²) — monotone in cosine for
    * nonnegative weights, so thresholding cos² ≥ t² ≡ cos ≥ t with no
    * sqrt in the plan and no floating point anywhere. Long-safe while
    * n2_a·n2_b ≤ 9.2e12, i.e. per-doc token counts into the millions.
    * Returns (id_a, id_b, dot, n2_a, n2_b, cos2_ppm) at cos2_ppm ≥
    * `thresholdPpm`.
    */
  def sparseCosinePairs(
      df: DataFrame, id: String, features: String,
      thresholdPpm: Int,
      maxPosting: Int = DefaultMaxBucket): DataFrame = {
    require(thresholdPpm >= 0 && thresholdPpm <= 1000000,
      "threshold is ppm of cos²")
    val div = graft.functions.GraftColumns.longDiv _
    histogramPairStats(df, id, features,
        ratioMilli = 0, maxPosting = maxPosting)
      .withColumn("cos2_ppm", div(col("dot") * col("dot") * 1000000L,
        col("n2_a") * col("n2_b")))
      .filter(col("cos2_ppm") >= thresholdPpm)
      .select("id_a", "id_b", "dot", "n2_a", "n2_b", "cos2_ppm")
  }

  /** EXACT Jaccard-threshold pairs via prefix filtering (the PPJoin-family
    * optimization): two sets with jaccard ≥ t must share an element among
    * each one's first `|S| - ceil(t*|S|) + 1` elements in any global
    * canonical order — so only those prefixes are indexed. Ordering by
    * ascending document frequency puts the rarest shingles in the prefix,
    * collapsing the hot-shingle Σfreq² join fan-out that makes the naive
    * inverted index blow up at corpus scale. Candidates are then verified
    * exactly on the full shingle sets (array_intersect — no lambdas), so
    * the output is identical to the naive join, just cheaper.
    *
    * Returns (id_a, id_b, jaccard_milli) with jaccard_milli ≥
    * `thresholdMilli`.
    */
  def jaccardSimilarPairs(
      df: DataFrame, id: String, shingles: String,
      thresholdMilli: Int): DataFrame = {
    val base = df.select(col(id), col(shingles).as("__sh"))
    val inv = base.select(col(id), explode(col("__sh")).as("h"))
    val freq = inv.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // rarest-first canonical order: (df, h); prefix len = n - ceil(t*n) + 1
    val ranked = inv.join(freq, Seq("h"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(id)).orderBy(col("df").asc, col("h").asc)))
    val sized = base.select(col(id), size(col("__sh")).as("n"))
    val prefix = ranked.join(sized, Seq(id))
      .filter(col("rk") <=
        col("n") - ceil(col("n") * thresholdMilli / 1000.0) + 1)
      .select(col(id), col("h"))
    val cand = prefix.select(col("h"), col(id).as("id_a"))
      .join(prefix.select(col("h"), col(id).as("id_b")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // exact verification on the full sets
    cand
      .join(base.select(col(id).as("id_a"), col("__sh").as("sh_a")), "id_a")
      .join(base.select(col(id).as("id_b"), col("__sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        jaccardMilli(col("sh_a"), col("sh_b")).as("jaccard_milli"))
      .filter(col("jaccard_milli") >= thresholdMilli)
  }

  /** Exact-substring span removal (the RefinedWeb exact-substring
    * dedup rule, token granularity): delete every token covered by a
    * k-token span whose exact text occurs MORE THAN ONCE corpus-wide
    * (both cross-document AND within-document repeats — both copies
    * are cut, matching the published rule). Document-level near-dup
    * removal (MinHash and friends) misses long verbatim quotes inside
    * otherwise-distinct pages; this is the complementary pass.
    *
    * Shape: positional k-shingle hashes (one codegen'd pass; index =
    * start token), map-side-combined occurrence counts, semi-join of
    * occurrences against the >1 hash set (AQE splits hot boilerplate
    * hashes), per-doc duplicated-start lists (bounded by doc length),
    * then a pure per-row coverage filter — token j survives iff no
    * duplicated span starts in (j−k, j]. The per-row filter is
    * O(tokens × dup-starts) worst case, bounded by doc length².
    */
  def dropDuplicatedSpans(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, "span width must be >= 1")
    val withSh = df.select(col(idCol),
      TextOps.tokenize(col(textCol)).as("__toks"),
      graft.functions.GraftColumns.shingleHash(col(textCol), k).as("__sh"))
    val occ = withSh.select(col(idCol),
      posexplode(col("__sh")).as(Seq("start", "h")))
    val dupH = occ.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select(col("h"))
    val dupStarts = occ.join(dupH, Seq("h"), "left_semi")
      .groupBy(col(idCol))
      .agg(collect_list(col("start")).as("__dups"))
    withSh.join(dupStarts, Seq(idCol), "left_outer")
      .withColumn("__dups",
        coalesce(col("__dups"), array().cast("array<int>")))
      .withColumn("__kept",
        filter(col("__toks"), (t, j) =>
          !exists(col("__dups"), s => s <= j && j < s + lit(k))))
      .select(col(idCol),
        size(col("__toks")).as("n_tokens"),
        size(col("__kept")).as("n_kept"),
        array_join(col("__kept"), " ").as("cleaned_text"))
  }

  /** Per-row band keys for [[hammingNeighborPairs]]: the signature's
    * `totalBits` bits split into `maxDist + 1` near-equal contiguous
    * bands, each emitted as a (band, bv) struct. By the pigeonhole
    * principle, two signatures within Hamming distance `maxDist` differ
    * in at most `maxDist` bands, so they agree EXACTLY on at least one —
    * equi-joining on (band, bv) is a candidate generator with NO recall
    * loss (unlike MinHash banding, which is probabilistic).
    */
  private[ops] def hammingBandKeys(
      bits: Column, maxDist: Int, totalBits: Int): Column = {
    val nBands = maxDist + 1
    array((0 until nBands).map { b =>
      val lo = b * totalBits / nBands
      val hi = (b + 1) * totalBits / nBands
      val mask = if (hi - lo >= 63) -1L else (1L << (hi - lo)) - 1L
      struct(lit(b).as("band"),
        shiftrightunsigned(bits, lo).bitwiseAND(lit(mask)).as("bv"))
    }: _*)
  }

  /** Exact Hamming-ball pairs over a packed bit-signature column (SimHash
    * / aHash / audio-fingerprint dedup keys) via multi-index pigeonhole
    * banding (Manku et al. 2007 simhash dedup; Norouzi et al. 2012 MIH):
    * candidates from per-band equi-joins, verified with the exact
    * `bit_count(a XOR b) <= maxDist`. Returns (id_a, id_b, dist) with
    * id_a < id_b, every qualifying pair exactly once.
    *
    * Scale design: index cost is (maxDist+1) keys/row; the candidate
    * stream is Σ|bucket|² over band buckets, never corpus n². Low-entropy
    * corpora make band buckets hot, so buckets above `hotCap` rows are
    * REFINED, not clique-joined: within a bucket the band's bits agree
    * exactly, so all ≤ maxDist differing bits lie in the remaining
    * bits — compacting those and banding them again is a second exact
    * pigeonhole level. One refinement level is built here (the recursion
    * depth is a dial; each level multiplies keys by maxDist+1 and
    * divides bucket entropy); sub-buckets still hot after refinement
    * clique-join with the verify filter fused into the same stage.
    *
    * The whole index-and-verify pipeline runs over the DISTINCT
    * SIGNATURE VALUES, not the rows: near-dup corpora repeat
    * signatures massively (one exact-duplicate cluster = one value),
    * so banding rows would re-verify every value pair |cluster_a|·
    * |cluster_b| times and the candidate stream would go quadratic in
    * the duplication factor. Value pairs expand back to id pairs in
    * one output-sized join at the end (plus the intra-value cliques,
    * which ARE the answer for exact-duplicate clusters) — measured
    * 17.2 s → 1.3 s at sf0.1 on the clustered conformance corpus
    * (together with the native [[graft.functions.SimHash32]] replacing
    * the interpreted nested-HOF signature build).
    */
  def hammingNeighborPairs(
      df: DataFrame, id: String, bits: String, maxDist: Int,
      totalBits: Int = 32, hotCap: Int = 64): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1 (0 = exact-key groupBy)")
    require(totalBits >= maxDist + 1 && totalBits <= 63,
      s"totalBits must be in [${maxDist + 1}, 63]")
    val nBands = maxDist + 1
    // distinct guards duplicate (id, bits) input rows: without it both
    // the cross expansion and the intra-value clique join would emit
    // each id pair once per duplicate row (the row-level predecessor
    // ended in a final distinct; the value-level rewrite must dedup its
    // membership table instead — ADVICE r7)
    val members = df.select(col(bits).as("__v"), col(id).as("__gid"))
      .distinct()
    val vdf = members.select(col("__v")).distinct()
    val keyed = vdf
      .select(col("__v"),
        explode(hammingBandKeys(col("__v"), maxDist, totalBits)).as("__k"))
      .select(col("__v"),
        col("__k.band").as("__band"), col("__k.bv").as("__bv"))
    val sizes = keyed.groupBy(col("__band"), col("__bv"))
      .agg(count(lit(1)).as("__n"))
    val withSize = keyed.join(sizes, Seq("__band", "__bv"))
    def verifiedValuePairs(t: DataFrame, joinKeys: Seq[String]): DataFrame = {
      val l = t.select(joinKeys.map(col) :+ col("__v").as("__va"): _*)
      val r = t.select(joinKeys.map(col) :+ col("__v").as("__vb"): _*)
      l.join(r, joinKeys)
        .filter(col("__va") < col("__vb"))
        .select(col("__va"), col("__vb"),
          bit_count(col("__va").bitwiseXOR(col("__vb")))
            .cast("long").as("dist"))
        .filter(col("dist") <= maxDist)
    }
    val cold = verifiedValuePairs(withSize.filter(col("__n") <= hotCap),
      Seq("__band", "__bv"))
    // Hot buckets: compact the bits OUTSIDE the agreeing band
    // (low part | high part shifted down) and band the compacted value
    // again. The band index is data-dependent, so the compaction is a
    // literal-per-branch conditional chain over the (small) band count.
    val hot = withSize.filter(col("__n") > hotCap)
    val remWidth = (0 until nBands).map { b =>
      val lo = b * totalBits / nBands
      val hi = (b + 1) * totalBits / nBands
      totalBits - (hi - lo)
    }.min // equal-split bands differ by <=1 bit; min width keeps keys valid
    val rem = (0 until nBands).foldLeft(lit(0L)) { (acc, b) =>
      val lo = b * totalBits / nBands
      val hi = (b + 1) * totalBits / nBands
      val lowMask = if (lo == 0) 0L else (1L << lo) - 1L
      val compact = col("__v").bitwiseAND(lit(lowMask))
        .bitwiseOR(shiftleft(shiftrightunsigned(col("__v"), hi), lo))
      when(col("__band") === b, compact).otherwise(acc)
    }
    val hotRefined = hot
      .withColumn("__k2",
        explode(hammingBandKeys(rem, maxDist, remWidth)))
      .select(col("__band"), col("__bv"),
        col("__k2.band").as("__band2"), col("__k2.bv").as("__bv2"),
        col("__v"))
    val hotPairs = verifiedValuePairs(hotRefined,
      Seq("__band", "__bv", "__band2", "__bv2"))
    // value-level dedup (a pair can surface from both band levels),
    // then ONE output-sized expansion back to ids; intra-value cliques
    // (dist 0) come straight from the membership table
    val valuePairs = cold.union(hotPairs).distinct()
    val cross = valuePairs
      .join(members.select(col("__v").as("__va"),
        col("__gid").as("__ia")), Seq("__va"))
      .join(members.select(col("__v").as("__vb"),
        col("__gid").as("__ib")), Seq("__vb"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"), col("dist"))
    val same = members
      .join(members.withColumnRenamed("__gid", "__gid2"), Seq("__v"))
      .filter(col("__gid") < col("__gid2"))
      .select(col("__gid").as("id_a"), col("__gid2").as("id_b"),
        lit(0L).as("dist"))
    cross.union(same)
  }
}
