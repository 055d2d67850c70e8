package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{BucketingOps, DedupOps, SimilarityOps, TextOps}
import graft.movies.PostingIndex

/** The shared index-maintenance contract
  * ([[graft.ops.IndexMaintenance]]) drilled differentially across all
  * three stored serving-index families at once — the d1c531b sink
  * pattern applied to indexes: one seeded random sequence of
  * append / UPSERT-BY-ID / remove / compact ops per family, an
  * in-memory Map[id → version] as the live-set model, and at every
  * checkpoint the maintained index must be equivalent to a FRESH
  * BUILD over the model's live versions. A drift in any of
  * refresh-append equivalence, replace semantics (an upserted id's
  * OLD version must stop serving), re-add-after-delete (the r12
  * seq-ordered tombstones — a later upsert beats an earlier delete on
  * every family now), tombstone invisibility, compact-folds-exactly,
  * or empty-collapse shows up as a model mismatch without
  * hand-writing the case.
  */
class IndexMaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260815L)

  /** Split 1..240 into an initial corpus + append batches. Removals
    * target live ids plus one definitely-absent id (absent ids must be
    * ignored); upserts REPLACE random live ids (version bump) and,
    * when one exists, RE-ADD a previously removed id — legal on every
    * family since the seq-ordered tombstones (VERDICT r11 #1).
    */
  private def driveOps(
      appendChunks: Iterator[Seq[Long]],
      model: scala.collection.mutable.Map[Long, Int],
      append: Seq[Long] => Unit,
      upsert: Seq[(Long, Int)] => Unit,
      remove: Seq[Long] => Unit,
      compact: () => Unit,
      check: () => Unit,
      steps: Int): Unit = {
    val removed = scala.collection.mutable.Set.empty[Long]
    for (step <- 1 to steps) {
      rnd.nextInt(6) match {
        case 0 | 1 if appendChunks.hasNext =>
          val chunk = appendChunks.next()
          append(chunk); chunk.foreach(model(_) = 0)
        case 2 =>
          val victims =
            rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(4)) :+ 999999L
          remove(victims)
          victims.foreach { v =>
            if (model.contains(v)) { model -= v; removed += v; () }
          }
        case 3 | 4 =>
          val replace = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(3))
          val readd = rnd.shuffle(removed.toSeq).take(1)
          val batch = (replace ++ readd).distinct
            .map(id => id -> (model.getOrElse(id, -1) + 1))
          if (batch.nonEmpty) {
            upsert(batch)
            batch.foreach { case (id, v) =>
              model(id) = v; removed -= id; ()
            }
          }
        case _ =>
          compact()
      }
      if (step % 2 == 0 || step == steps) check()
    }
  }

  test("LSH band-key index: seeded append/upsert/remove/compact drill " +
       "≡ fresh build over the live (id → version) model at every " +
       "checkpoint — replaced ids serve ONLY their new signature, " +
       "deleted ids re-enter via a later upsert") {
    val sig0 = DedupOps.minhashSignatures(
      Tables.load(spark, sfDir, "documents").filter($"doc_id" < 240)
        .select($"doc_id", TextOps.shingleHashes($"text", 3).as("hashes")),
      "doc_id", "hashes", 16).localCheckpoint()
    val table = "graft_maint_lsh"
    val ids = sig0.select($"doc_id").as[Long].collect().sorted
    val (init, rest) = ids.splitAt(ids.length / 2)
    val chunks = rest.grouped(math.max(1, rest.length / 4)).map(_.toSeq)
    val model = scala.collection.mutable.Map(init.map(_ -> 0): _*)
    // version v of an id's signature: a deterministic perturbation of
    // the real minhash — any change to the sig changes its band keys,
    // which is exactly what a re-shingled document does
    def ofIds(pairs: Seq[(Long, Int)]): DataFrame =
      sig0.join(pairs.toDF("doc_id", "__v"), Seq("doc_id"))
        .select($"doc_id",
          transform($"sig", h => h + $"__v" * 7919L).as("sig"))
    BucketingOps.writeBucketed(
      DedupOps.lshBandKeyTable(ofIds(init.toSeq.map(_ -> 0)),
        "doc_id", "sig", bands = 4, rows = 4),
      table, Seq("band", "bh"), nBuckets = 4)
    def keyset(df: DataFrame) = df.select($"band", $"bh", $"doc_id")
      .as[(Int, Long, Long)].collect().toSet
    driveOps(
      chunks, model,
      append = s => DedupOps.refreshLshIndex(table,
        ofIds(s.map(_ -> 0)), "doc_id", "sig", 4, 4, nBuckets = 4),
      upsert = batch => DedupOps.upsertIntoLshIndex(spark, table,
        ofIds(batch), "doc_id", "sig", 4, 4, nBuckets = 4),
      remove = ids => DedupOps.removeFromLshIndex(spark, table,
        ids.toDF("doc_id"), "doc_id"),
      compact = () => DedupOps.compactLshIndex(spark, table, "doc_id", 4),
      check = () => {
        val fresh = DedupOps.lshBandKeyTable(
          ofIds(model.toSeq), "doc_id", "sig", 4, 4)
        assert(keyset(DedupOps.activeLshIndex(spark, table, "doc_id"))
          === keyset(fresh))
      },
      steps = 12)
  }

  test("IVF×PQ stored index: seeded append/upsert/remove/compact drill " +
       "≡ fresh ivfPqIndex over the live (id → version) model; a " +
       "removed id never surfaces at ANY probe depth; an upserted id " +
       "serves its NEW codes; compaction rewrites only affected cells") {
    val centers = Array.tabulate(4)(c =>
      Array.tabulate(64)(i => if (i == c * 16) 8.0 else 0.0))
    val codebooks = Array.tabulate(2)(sp => Array.tabulate(4)(c =>
      Array.tabulate(32)(i => ((sp * 31 + c * 7 + i) % 5 - 2).toDouble)))
    val emb = Tables.load(spark, sfDir, "embeddings")
      .filter($"vec_id" < 240).select($"vec_id", $"embedding")
      .localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_maint_ivf").toString + "/idx"
    val ids = emb.select($"vec_id").as[Long].collect().sorted
    val (init, rest) = ids.splitAt(ids.length / 2)
    val chunks = rest.grouped(math.max(1, rest.length / 4)).map(_.toSeq)
    val model = scala.collection.mutable.Map(init.map(_ -> 0): _*)
    // version v of a vector: the re-embedded payload (deterministic
    // shift — same expression on the fresh-build side, so codes match
    // iff the maintained index serves the CURRENT version)
    def ofIds(pairs: Seq[(Long, Int)]): DataFrame =
      emb.join(pairs.toDF("vec_id", "__v"), Seq("vec_id"))
        .select($"vec_id",
          transform($"embedding", x => x + $"__v".cast("float"))
            .as("embedding"))
    SimilarityOps.ivfPqIndex(ofIds(init.toSeq.map(_ -> 0)),
        "vec_id", "embedding", centers, codebooks)
      .write.partitionBy("cell").parquet(dir)
    def rows(df: DataFrame) = df
      .select($"vec_id", $"cell".cast("int"),
        concat_ws(",", $"codes".cast("array<string>")))
      .as[(Long, Int, String)].collect().toSet
    val queries = emb.orderBy($"vec_id").limit(3)
      .select($"vec_id".as("qid"), $"embedding".as("qv")).localCheckpoint()
    driveOps(
      chunks, model,
      append = s => SimilarityOps.refreshIvfPqIndex(dir,
        ofIds(s.map(_ -> 0)), "vec_id", "embedding", centers, codebooks),
      upsert = batch => SimilarityOps.upsertIntoIvfPqIndex(dir,
        ofIds(batch), "vec_id", "embedding", centers, codebooks),
      remove = s => SimilarityOps.removeFromIvfPqIndex(dir,
        s.toDF("vec_id"), "vec_id"),
      compact = () => SimilarityOps.compactIvfPqIndex(spark, dir,
        "vec_id"),
      check = () => {
        val fresh = SimilarityOps.ivfPqIndex(ofIds(model.toSeq),
          "vec_id", "embedding", centers, codebooks)
        assert(rows(SimilarityOps.activeIvfPqIndex(spark, dir, "vec_id"))
          === rows(fresh))
        // the PROBE face: at every depth, the stored serve over the
        // maintained layout ≡ the in-memory multi face over the fresh
        // index — so a removed id cannot surface anywhere and an
        // upserted id ranks by its CURRENT vector
        for (nProbe <- Seq(1, 4)) {
          val got = SimilarityOps.ivfPqTopKMultiStored(spark, dir,
              "vec_id", ofIds(model.toSeq), "vec_id", "embedding",
              queries, "qid", "qv", centers, codebooks,
              nProbe = nProbe, shortlist = 16, k = 5)
            .select($"qid", $"rank", $"vec_id")
            .as[(Long, Long, Long)].collect().toSet
          val ref = SimilarityOps.ivfPqTopKMulti(fresh, "vec_id",
              ofIds(model.toSeq), "vec_id", "embedding",
              queries, "qid", "qv", centers, codebooks,
              nProbe = nProbe, shortlist = 16, k = 5)
            .select($"qid", $"rank", $"vec_id")
            .as[(Long, Long, Long)].collect().toSet
          assert(got === ref, s"stored≠fresh at nProbe=$nProbe")
          assert(got.forall(t => model.contains(t._3)),
            s"removed id served at nProbe=$nProbe")
        }
      },
      steps = 12)
    // affected-cells-only: fold any pending drill tombstones first,
    // then tombstone ONE id and compare the untouched cell dirs' file
    // listings across the compact — they must be identical
    SimilarityOps.compactIvfPqIndex(spark, dir, "vec_id")
    val victim = model.keys.head
    val victimCell = SimilarityOps.activeIvfPqIndex(spark, dir, "vec_id")
      .filter($"vec_id" === victim).select($"cell".cast("int"))
      .as[Int].head()
    def listing(cell: Int) = {
      val d = new java.io.File(s"$dir/cell=$cell")
      if (!d.exists()) Set.empty[String]
      else d.list().filter(_.startsWith("part-")).toSet
    }
    val before = (0 until 4).filter(_ != victimCell).map(listing)
    SimilarityOps.removeFromIvfPqIndex(dir,
      Seq(victim).toDF("vec_id"), "vec_id")
    SimilarityOps.compactIvfPqIndex(spark, dir, "vec_id")
    val after = (0 until 4).filter(_ != victimCell).map(listing)
    assert(after === before, "compaction touched an unaffected cell")
    assert(spark.read.parquet(dir)
      .filter($"vec_id" === victim).isEmpty,
      "compaction left the tombstoned row in the layout")
    // single-query stored face: same maintenance contract — equals the
    // in-memory probe over a fresh index on the survivors
    model -= victim
    val qv = emb.filter($"vec_id" === model.keys.min).select($"embedding")
      .head.getSeq[Float](0).map(_.toDouble).toArray
    val freshIdx = SimilarityOps.ivfPqIndex(ofIds(model.toSeq),
      "vec_id", "embedding", centers, codebooks)
    val single = SimilarityOps.ivfPqTopKStored(spark, dir, "vec_id",
        ofIds(model.toSeq), "vec_id", "embedding", qv, centers, codebooks,
        nProbe = 2, shortlist = 16, k = 5)
      .select($"vec_id").as[Long].collect().toSeq
    val singleRef = SimilarityOps.ivfPqTopK(freshIdx, "vec_id",
        ofIds(model.toSeq), "vec_id", "embedding", qv, centers, codebooks,
        nProbe = 2, shortlist = 16, k = 5)
      .select($"vec_id").as[Long].collect().toSeq
    assert(single === singleRef && !single.contains(victim))
    // duplicate-id upsert tripwire: loud, not silent two-version serve
    val dup = ofIds(Seq(model.keys.min -> 7))
      .unionByName(ofIds(Seq(model.keys.min -> 7)))
    val err = intercept[IllegalArgumentException] {
      SimilarityOps.upsertIntoIvfPqIndex(dir, dup,
        "vec_id", "embedding", centers, codebooks)
    }
    assert(err.getMessage.contains("unique"))
  }

  test("refresh lands at the seq HIGH-WATER mark: a deleted id " +
       "re-submitted through the REFRESH path serves again (it would " +
       "be silently masked at base seq — review-pass fix), on both " +
       "set-tombstone families") {
    // LSH leg
    val sig = Seq((1L, Seq(11L, 12L, 13L)), (2L, Seq(21L, 22L, 23L)))
      .toDF("doc_id", "sig").localCheckpoint()
    val table = "graft_maint_readd_lsh"
    BucketingOps.writeBucketed(
      DedupOps.lshBandKeyTable(sig, "doc_id", "sig", 3, 1),
      table, Seq("band", "bh"), nBuckets = 2)
    DedupOps.removeFromLshIndex(spark, table,
      Seq(2L).toDF("doc_id"), "doc_id")
    assert(DedupOps.activeLshIndex(spark, table, "doc_id")
      .filter($"doc_id" === 2L).isEmpty, "delete must hold")
    DedupOps.refreshLshIndex(table, sig.filter($"doc_id" === 2L),
      "doc_id", "sig", 3, 1, nBuckets = 2)
    assert(DedupOps.activeLshIndex(spark, table, "doc_id")
      .filter($"doc_id" === 2L).count() === 3L,
      "refresh after remove must re-add (high-water seq)")
    // ...and a LATER delete still wins over the refreshed rows
    DedupOps.removeFromLshIndex(spark, table,
      Seq(2L).toDF("doc_id"), "doc_id")
    assert(DedupOps.activeLshIndex(spark, table, "doc_id")
      .filter($"doc_id" === 2L).isEmpty,
      "a later delete must beat the refreshed rows")
    // IVF×PQ leg
    val centers = Array.tabulate(2)(c =>
      Array.tabulate(8)(i => if (i == 4 * c) 4.0 else 0.0))
    val codebooks = Array.tabulate(2)(sp => Array.tabulate(2)(cd =>
      Array.tabulate(4)(j => (sp + cd + j).toDouble)))
    val emb = Seq(
        (1L, Array.tabulate(8)(i => (i % 3).toFloat).toSeq),
        (2L, Array.tabulate(8)(i => ((i + 1) % 3).toFloat).toSeq))
      .toDF("vec_id", "embedding").localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_maint_readd_ivf").toString + "/idx"
    SimilarityOps.ivfPqIndex(emb, "vec_id", "embedding",
        centers, codebooks)
      .write.partitionBy("cell").parquet(dir)
    SimilarityOps.removeFromIvfPqIndex(dir,
      Seq(2L).toDF("vec_id"), "vec_id")
    assert(SimilarityOps.activeIvfPqIndex(spark, dir, "vec_id")
      .filter($"vec_id" === 2L).isEmpty)
    SimilarityOps.refreshIvfPqIndex(dir,
      emb.filter($"vec_id" === 2L), "vec_id", "embedding",
      centers, codebooks)
    assert(SimilarityOps.activeIvfPqIndex(spark, dir, "vec_id")
      .filter($"vec_id" === 2L).count() === 1L,
      "refresh after remove must re-add (high-water seq)")
    SimilarityOps.removeFromIvfPqIndex(dir,
      Seq(2L).toDF("vec_id"), "vec_id")
    assert(SimilarityOps.activeIvfPqIndex(spark, dir, "vec_id")
      .filter($"vec_id" === 2L).isEmpty,
      "a later delete must beat the refreshed rows")
  }

  test("seq sidecar: allocation is one JSON read (no tombstone-table " +
       "scan per op); deleting the sidecar falls back to the one-time " +
       "legacy derive from the tombstone table and re-seeds it; " +
       "compact clears it so the counter restarts at 0") {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val table = "graft_maint_sidecar_lsh"
    val sidecarPath = new java.io.File(s"$warehouse/$table" + "__maint.json")
    val sig = Seq((1L, Seq(11L, 12L, 13L)), (2L, Seq(21L, 22L, 23L)),
        (3L, Seq(31L, 32L, 33L)))
      .toDF("doc_id", "sig").localCheckpoint()
    BucketingOps.writeBucketed(
      DedupOps.lshBandKeyTable(sig, "doc_id", "sig", 3, 1),
      table, Seq("band", "bh"), nBuckets = 2)
    assert(!sidecarPath.exists(), "fresh build has no sidecar")
    // first op: legacy derive (no tombstones -> 0), sidecar seeded to 1
    DedupOps.removeFromLshIndex(spark, table,
      Seq(1L).toDF("doc_id"), "doc_id")
    assert(sidecarPath.exists(), "first op must seed the sidecar")
    // delete the sidecar: next op must legacy-derive from the
    // tombstone table (max seq 0 -> next 1) and the re-add still wins
    assert(sidecarPath.delete())
    DedupOps.upsertIntoLshIndex(spark, table,
      sig.filter($"doc_id" === 1L), "doc_id", "sig", 3, 1, nBuckets = 2)
    assert(sidecarPath.exists(), "legacy derive must re-seed the sidecar")
    assert(DedupOps.activeLshIndex(spark, table, "doc_id")
      .filter($"doc_id" === 1L).count() === 3L,
      "the re-add upsert (legacy-derived seq) must beat the delete")
    // a later remove allocates above the upsert's seq via the sidecar
    DedupOps.removeFromLshIndex(spark, table,
      Seq(1L).toDF("doc_id"), "doc_id")
    assert(DedupOps.activeLshIndex(spark, table, "doc_id")
      .filter($"doc_id" === 1L).isEmpty,
      "a later delete (sidecar-allocated seq) must beat the upsert")
    // compact clears the sidecar with the tombstones
    DedupOps.compactLshIndex(spark, table, "doc_id", 2)
    assert(!sidecarPath.exists(), "compact must clear the sidecar")
    assert(DedupOps.activeLshIndex(spark, table, "doc_id")
      .select($"doc_id").distinct().count() === 2L)
  }

  test("burned-seq recovery (review-pass r13): a refresh lands on a " +
       "seq a torn op reserved but never used; deleting the sidecar " +
       "then removing the refreshed id must still win — the legacy " +
       "derive covers ROW seqs, not just tombstones; and a corrupt " +
       "sidecar trips loudly instead of resetting the counter") {
    val centers = Array.tabulate(2)(c =>
      Array.tabulate(8)(i => if (i == 4 * c) 4.0 else 0.0))
    val codebooks = Array.tabulate(2)(sp => Array.tabulate(2)(cd =>
      Array.tabulate(4)(j => (sp + cd + j).toDouble)))
    val emb = Seq(
        (1L, Array.tabulate(8)(i => (i % 3).toFloat).toSeq),
        (3L, Array.tabulate(8)(i => ((i + 1) % 3).toFloat).toSeq))
      .toDF("vec_id", "embedding").localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_maint_burned").toString + "/idx"
    SimilarityOps.ivfPqIndex(emb.filter($"vec_id" === 1L),
        "vec_id", "embedding", centers, codebooks)
      .write.partitionBy("cell").parquet(dir)
    // op at seq 0 (tombstone lands, sidecar -> next 1)
    SimilarityOps.removeFromIvfPqIndex(dir,
      Seq(1L).toDF("vec_id"), "vec_id")
    // a TORN op burns seq 1: reserved in the sidecar, nothing written
    assert(graft.ops.SeqSidecar.alloc(spark, dir, 0L) === 1L)
    // refresh lands id 3 at the high-water mark — the burned seq 1
    SimilarityOps.refreshIvfPqIndex(dir,
      emb.filter($"vec_id" === 3L), "vec_id", "embedding",
      centers, codebooks)
    assert(SimilarityOps.activeIvfPqIndex(spark, dir, "vec_id")
      .filter($"vec_id" === 3L).count() === 1L)
    // the documented-safe recovery: delete the sidecar; the next op
    // must legacy-derive ABOVE the refresh row's seq (tombstone max is
    // only 0 — a tombstone-only derive would re-issue 1 and the
    // delete below would TIE the refresh row and lose)
    val sidecar = new java.io.File(dir + "__maint.json")
    assert(sidecar.exists() && sidecar.delete())
    SimilarityOps.removeFromIvfPqIndex(dir,
      Seq(3L).toDF("vec_id"), "vec_id")
    assert(SimilarityOps.activeIvfPqIndex(spark, dir, "vec_id")
      .filter($"vec_id" === 3L).isEmpty,
      "a delete after sidecar loss must beat a burned-seq refresh row")
    // corrupt sidecar (torn-write shape): loud require, not seq 0
    java.nio.file.Files.writeString(sidecar.toPath, "")
    val err = intercept[IllegalArgumentException] {
      SimilarityOps.removeFromIvfPqIndex(dir,
        Seq(1L).toDF("vec_id"), "vec_id")
    }
    assert(err.getMessage.contains("corrupt seq sidecar"))
  }

  test("IVF×PQ compact rewrites REFRESH rows too: a refreshed id in a " +
       "cell no tombstoned id touches is reset to base seq, so a " +
       "post-compact delete (seq counter restarted at 0) still wins — " +
       "the refresh-row/unaffected-cell seq-reset hole (ADVICE r12)") {
    // 4 well-separated cells; each id's vector routes to its own cell
    val centers = Array.tabulate(4)(c =>
      Array.tabulate(8)(i => if (i == 2 * c) 8.0 else 0.0))
    val codebooks = Array.tabulate(2)(sp => Array.tabulate(2)(cd =>
      Array.tabulate(4)(j => (sp + cd + j).toDouble)))
    def vecOf(cell: Int): Seq[Float] =
      Array.tabulate(8)(i => if (i == 2 * cell) 8.0f else 0.1f).toSeq
    def ofIds(pairs: (Long, Int)*): DataFrame =
      pairs.map { case (id, cell) => (id, vecOf(cell)) }
        .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_maint_refresh_hole").toString + "/idx"
    SimilarityOps.ivfPqIndex(ofIds(1L -> 0, 2L -> 1),
        "vec_id", "embedding", centers, codebooks)
      .write.partitionBy("cell").parquet(dir)
    // tombstone id 1 (cell 0) at seq 0, then refresh NEW id 3 into
    // cell 2 — a cell no tombstoned id touches; the refresh row lands
    // at the high-water seq (0) with no tombstone of its own
    SimilarityOps.removeFromIvfPqIndex(dir,
      Seq(1L).toDF("vec_id"), "vec_id")
    SimilarityOps.refreshIvfPqIndex(dir, ofIds(3L -> 2),
      "vec_id", "embedding", centers, codebooks)
    SimilarityOps.compactIvfPqIndex(spark, dir, "vec_id")
    // parity: the compacted layout must be row-identical (incl. seq)
    // to a fresh build over the live set — i.e. id 3's row was reset
    // to base seq even though its cell held no tombstoned id
    def rows(df: DataFrame) = df
      .select($"vec_id", $"cell".cast("int"), col(SimilarityOps.IvfSeqCol))
      .as[(Long, Int, Long)].collect().toSet
    assert(rows(spark.read.parquet(dir)) ===
      rows(SimilarityOps.ivfPqIndex(ofIds(2L -> 1, 3L -> 2),
        "vec_id", "embedding", centers, codebooks)),
      "compact must reset refresh rows in unaffected cells to base seq")
    // the kill shot: post-compact the counter restarts at 0 — the
    // delete of the refreshed id must still win
    SimilarityOps.removeFromIvfPqIndex(dir,
      Seq(3L).toDF("vec_id"), "vec_id")
    assert(SimilarityOps.activeIvfPqIndex(spark, dir, "vec_id")
      .filter($"vec_id" === 3L).isEmpty,
      "a deleted refreshed id must not keep serving after compact")
    // and an upsert instead of a delete serves exactly ONE version
    SimilarityOps.upsertIntoIvfPqIndex(dir, ofIds(2L -> 3),
      "vec_id", "embedding", centers, codebooks)
    assert(SimilarityOps.activeIvfPqIndex(spark, dir, "vec_id")
      .filter($"vec_id" === 2L).count() === 1L,
      "post-compact upsert must serve exactly one version")
  }

  test("refresh DURING a live upsert window (VERDICT r12 #7): the " +
       "refresh lands at the seq high-water mark == the concurrent " +
       "upsert's seq, and NO interleaving serves two versions of one " +
       "id — on both set-tombstone families, through later ops and " +
       "compact") {
    // LSH leg
    val sig = Seq(
        (1L, Seq(11L, 12L, 13L)), (2L, Seq(21L, 22L, 23L)),
        (3L, Seq(31L, 32L, 33L)))
      .toDF("doc_id", "sig").localCheckpoint()
    def sigOf(id: Long, v: Int) = sig.filter($"doc_id" === id)
      .select($"doc_id", transform($"sig", h => h + v * 7919L).as("sig"))
    val table = "graft_maint_live_window_lsh"
    BucketingOps.writeBucketed(
      DedupOps.lshBandKeyTable(sigOf(1L, 0).unionByName(sigOf(2L, 0)),
        "doc_id", "sig", 3, 1),
      table, Seq("band", "bh"), nBuckets = 2)
    // open the live window: delete 2 (seq 0), REPLACE 1 (seq 1)
    DedupOps.removeFromLshIndex(spark, table, Seq(2L).toDF("doc_id"),
      "doc_id")
    DedupOps.upsertIntoLshIndex(spark, table, sigOf(1L, 1),
      "doc_id", "sig", 3, 1, nBuckets = 2)
    // refresh NEW id 3 inside the window — lands AT the upsert's seq
    DedupOps.refreshLshIndex(table, sigOf(3L, 0),
      "doc_id", "sig", 3, 1, nBuckets = 2)
    def oneVersionEach(): Unit = {
      val counts = DedupOps.activeLshIndex(spark, table, "doc_id")
        .groupBy($"doc_id").count().as[(Long, Long)].collect().toMap
      assert(counts.keySet === Set(1L, 3L), s"live ids: $counts")
      assert(counts.values.forall(_ === 3L),
        s"every live id must serve exactly one version (3 band keys): " +
          s"$counts")
      // ...and id 1 serves its REPLACED keys, not the originals
      val keys1 = DedupOps.activeLshIndex(spark, table, "doc_id")
        .filter($"doc_id" === 1L).select($"bh").as[Long].collect().toSet
      val want1 = DedupOps.lshBandKeyTable(sigOf(1L, 1),
        "doc_id", "sig", 3, 1).select($"bh").as[Long].collect().toSet
      assert(keys1 === want1, "id 1 must serve only its new signature")
    }
    oneVersionEach()
    // the refreshed id is fully maintainable from here: replace then
    // delete, each serving exactly one/zero versions
    DedupOps.upsertIntoLshIndex(spark, table, sigOf(3L, 2),
      "doc_id", "sig", 3, 1, nBuckets = 2)
    assert(DedupOps.activeLshIndex(spark, table, "doc_id")
      .filter($"doc_id" === 3L).count() === 3L)
    DedupOps.compactLshIndex(spark, table, "doc_id", 2)
    val folded = DedupOps.activeLshIndex(spark, table, "doc_id")
      .select($"band", $"bh", $"doc_id").as[(Int, Long, Long)]
      .collect().toSet
    val fresh = DedupOps.lshBandKeyTable(
        sigOf(1L, 1).unionByName(sigOf(3L, 2)), "doc_id", "sig", 3, 1)
      .select($"band", $"bh", $"doc_id").as[(Int, Long, Long)]
      .collect().toSet
    assert(folded === fresh, "compact ≠ fresh build over the live set")
    // IVF×PQ leg — same window: delete 2, replace 1, refresh 3
    val centers = Array.tabulate(4)(c =>
      Array.tabulate(8)(i => if (i == 2 * c) 8.0 else 0.0))
    val codebooks = Array.tabulate(2)(sp => Array.tabulate(2)(cd =>
      Array.tabulate(4)(j => (sp + cd + j).toDouble)))
    def vecOf(id: Long, v: Int) = Seq((id,
      Array.tabulate(8)(i =>
        (if (i == 2 * (id % 4)) 8.0f else 0.1f) + v * 0.25f).toSeq))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_maint_live_window_ivf").toString + "/idx"
    SimilarityOps.ivfPqIndex(vecOf(1L, 0).unionByName(vecOf(2L, 0)),
        "vec_id", "embedding", centers, codebooks)
      .write.partitionBy("cell").parquet(dir)
    SimilarityOps.removeFromIvfPqIndex(dir, Seq(2L).toDF("vec_id"),
      "vec_id")
    SimilarityOps.upsertIntoIvfPqIndex(dir, vecOf(1L, 1),
      "vec_id", "embedding", centers, codebooks)
    SimilarityOps.refreshIvfPqIndex(dir, vecOf(3L, 0),
      "vec_id", "embedding", centers, codebooks)
    val act = SimilarityOps.activeIvfPqIndex(spark, dir, "vec_id")
      .groupBy($"vec_id").count().as[(Long, Long)].collect().toMap
    assert(act === Map(1L -> 1L, 3L -> 1L),
      s"live window must serve exactly one version per live id: $act")
    // and the refreshed id dies to a LATER delete despite sharing the
    // upsert's seq high-water
    SimilarityOps.removeFromIvfPqIndex(dir, Seq(3L).toDF("vec_id"),
      "vec_id")
    assert(SimilarityOps.activeIvfPqIndex(spark, dir, "vec_id")
      .filter($"vec_id" === 3L).isEmpty)
    SimilarityOps.compactIvfPqIndex(spark, dir, "vec_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"vec_id", $"cell".cast("int"),
        concat_ws(",", $"codes".cast("array<string>")))
      .as[(Long, Int, String)].collect().toSet
    assert(rows(spark.read.parquet(dir)) ===
      rows(SimilarityOps.ivfPqIndex(vecOf(1L, 1),
        "vec_id", "embedding", centers, codebooks)),
      "compact after the live window ≠ fresh build over the live set")
  }

  test("PostingIndex: seeded append/upsert/remove/compact drill ≡ " +
       "fresh buildTokenized over the live (id → version) model " +
       "(scores bit-for-bit)") {
    val all = (1L to 240L).map(i =>
      (i, s"word${i % 13} tag${i % 7} filler common row")).toDF("id", "text")
      .localCheckpoint()
    val tokens = Map("text" -> split($"text", "\\s+"))
    val weights = Map("text" -> 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_maint_pidx").toString + "/idx"
    val ids = (1L to 240L)
    val (init, rest) = ids.splitAt(ids.length / 2)
    val chunks = rest.grouped(math.max(1, rest.length / 4)).map(_.toSeq)
    val model = scala.collection.mutable.Map(init.map(_ -> 0): _*)
    // version v of a doc: extra version token (dl changes too — the
    // integer stats deltas must track it exactly)
    def ofIds(pairs: Seq[(Long, Int)]): DataFrame =
      all.join(pairs.toDF("id", "__v"), Seq("id"))
        .select($"id",
          concat($"text", lit(" rev"), $"__v").as("text"))
    var idx = PostingIndex.buildTokenized(ofIds(init.toSeq.map(_ -> 0)),
      dir, tokens, weights, idCol = "id",
      nTermBuckets = 4, nDocBuckets = 4)
    def ranked(df: DataFrame) = df.select($"id", $"score")
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    driveOps(
      chunks, model,
      append = s => idx = idx.upsert(ofIds(s.map(_ -> 0)), tokens),
      upsert = batch => idx = idx.upsert(ofIds(batch), tokens),
      remove = s => idx = idx.delete(s.toDF("id")),
      compact = () => idx = idx.compact(),
      check = () => {
        val fresh = PostingIndex.buildTokenized(ofIds(model.toSeq),
          java.nio.file.Files.createTempDirectory("graft_maint_ref")
            .toString + "/idx",
          tokens, weights, idCol = "id",
          nTermBuckets = 4, nDocBuckets = 4)
        for (terms <- Seq(Seq("word3", "tag5"), Seq("word11"),
            Seq("rev1")))
          assert(ranked(idx.scoreTerms(terms)) ===
            ranked(fresh.scoreTerms(terms)), s"terms=$terms")
      },
      steps = 12)
  }

  test("IVF×PQ scan-fraction audit (VERDICT r13 #3): audited faces " +
       "serve IDENTICAL rows; needsRetrain is silent at build state, " +
       "FIRES when churn crowds the probe past the designed band, " +
       "stays honest across compact, and goes silent again after a " +
       "retrain rebuild; stat-less legacy stores audit as None") {
    val dim = 16
    // base clusters spike at c*4 (the stale centers' axes); the
    // DRIFTED re-embedding spikes at c*4+2 — its internal 4-cluster
    // geometry is intact, but to the STALE centers every drifted
    // vector is equidistant (noise sits on dim 3 only, not on any
    // center axis), so ties route them ALL to cell 0: deterministic
    // crowding, the degenerate-probe failure mode the audit exists
    // to catch
    def vecOf(i: Long, drifted: Boolean): Array[Float] = {
      val spike = (i % 4).toInt * 4 + (if (drifted) 2 else 0)
      Array.tabulate(dim)(j =>
        (if (j == spike) 8.0f else 0.0f) +
          (if (j == 3) ((i * 7) % 5 - 2) * 0.05f else 0.0f))
    }
    val centers = Array.tabulate(4)(c =>
      Array.tabulate(dim)(j => if (j == c * 4) 8.0 else 0.0))
    val codebooks = Array.tabulate(2)(sp => Array.tabulate(4)(c =>
      Array.tabulate(8)(j => ((sp * 31 + c * 7 + j) % 5 - 2).toDouble)))
    val n = 200L
    def corpusOf(drifted: Boolean) =
      (0L until n).map(i => (i, vecOf(i, drifted)))
        .toDF("vec_id", "embedding").localCheckpoint()
    val base = corpusOf(false)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_maint_audit").toString + "/idx"
    SimilarityOps.writeIvfPqIndex(
      SimilarityOps.ivfPqIndex(base, "vec_id", "embedding",
        centers, codebooks), dir, "vec_id")
    def ids(df: DataFrame) =
      df.select($"vec_id").as[Long].collect().toSeq
    def servedAndAudit(corpus: DataFrame, d: String,
        cs: Array[Array[Double]], q: Array[Double]) =
      SimilarityOps.ivfPqTopKStoredAudited(spark, d, "vec_id",
        corpus, "vec_id", "embedding", q, cs, codebooks,
        nProbe = 1, shortlist = 16, k = 5)
    val qHealthy = vecOf(0L, drifted = false).map(_.toDouble)
    // HEALTHY build state: even 50/50/50/50 spread — the probe reads
    // exactly the designed one-cell fraction, no signal; and the
    // audited frame is the unaudited face's, row for row
    val (h, hAudit) = servedAndAudit(base, dir, centers, qHealthy)
    assert(ids(h) === ids(SimilarityOps.ivfPqTopKStored(spark, dir,
      "vec_id", base, "vec_id", "embedding", qHealthy, centers,
      codebooks, nProbe = 1, shortlist = 16, k = 5)),
      "the audited face must serve the identical frame")
    assert(hAudit.isDefined, "a built store must carry scan stats")
    assert(math.abs(hAudit.get.probedRowFrac - 0.25) < 1e-9 &&
      math.abs(hAudit.get.designedFrac - 0.25) < 1e-9 &&
      !hAudit.get.needsRetrain,
      s"healthy state must sit ON the designed band: ${hAudit.get}")
    // CHURN: every vector replaced by its drifted re-embedding
    // through the maintenance path — the stale centers crowd all 200
    // new rows into cell 0 (250 of 400 stored rows), and drifted
    // traffic probes exactly there
    val drifted = corpusOf(true)
    SimilarityOps.upsertIntoIvfPqIndex(dir, drifted, "vec_id",
      "embedding", centers, codebooks)
    val qDrift = vecOf(0L, drifted = true).map(_.toDouble)
    val (c1, cAudit) = servedAndAudit(drifted, dir, centers, qDrift)
    assert(ids(c1) === ids(SimilarityOps.ivfPqTopKStored(spark, dir,
      "vec_id", drifted, "vec_id", "embedding", qDrift, centers,
      codebooks, nProbe = 1, shortlist = 16, k = 5)),
      "audited ≡ unaudited on the maintained store too")
    assert(cAudit.isDefined &&
      math.abs(cAudit.get.probedRowFrac - 0.625) < 1e-9 &&
      cAudit.get.needsRetrain,
      s"100% churn must trip the tripwire (250/400 probed): $cAudit")
    // the MULTI audited face sees the same crowding (mean over the
    // batch — all three drifted queries probe cell 0)
    val queries = (0L to 2L).map(i => (i + 1000L, vecOf(i, true)))
      .toDF("qid", "qv").localCheckpoint()
    val (m1, mAudit) = SimilarityOps.ivfPqTopKMultiStoredAudited(
      spark, dir, "vec_id", drifted, "vec_id", "embedding",
      queries, "qid", "qv", centers, codebooks,
      nProbe = 1, shortlist = 16, k = 5)
    assert(m1.select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
      === SimilarityOps.ivfPqTopKMultiStored(spark, dir, "vec_id",
        drifted, "vec_id", "embedding", queries, "qid", "qv",
        centers, codebooks, nProbe = 1, shortlist = 16, k = 5)
        .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet,
      "audited multi ≡ unaudited multi")
    assert(mAudit.isDefined &&
      math.abs(mAudit.get.probedRowFrac - 0.625) < 1e-9 &&
      mAudit.get.needsRetrain,
      s"the batched audit must trip too: $mAudit")
    // COMPACT folds the tombstones (every old version dies, the three
    // emptied cells drop) but does NOT retrain: the designed band is
    // frozen, the counts update, and the signal stays honestly LOUD —
    // the whole corpus now lives in one cell (200/200 probed)
    SimilarityOps.compactIvfPqIndex(spark, dir, "vec_id")
    val (c2, pAudit) = servedAndAudit(drifted, dir, centers, qDrift)
    assert(ids(c2).nonEmpty)
    assert(pAudit.isDefined &&
      math.abs(pAudit.get.probedRowFrac - 1.0) < 1e-9 &&
      math.abs(pAudit.get.designedFrac - 0.25) < 1e-9 &&
      pAudit.get.needsRetrain,
      s"compact must keep the stats and the signal: $pAudit")
    // RETRAIN REBUILD — the prescribed remedy as ONE call
    // (retrainIvfPqIndex): train on the CURRENT (drifted) corpus,
    // rebuild into a FRESH dir, fresh band. The drifted clusters are
    // well-separated, so k-means finds the even spread again and the
    // signal clears against the retrained distribution.
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_maint_audit_rt").toString + "/idx"
    val (centers2, codebooks2) = SimilarityOps.retrainIvfPqIndex(
      drifted, "vec_id", "embedding", dir2,
      nList = 4, m = 2, codebookK = 4, sampleN = 200)
    val (rtDf, rtAudit) = SimilarityOps.ivfPqTopKStoredAudited(spark,
      dir2, "vec_id", drifted, "vec_id", "embedding", qDrift,
      centers2, codebooks2, nProbe = 1, shortlist = 16, k = 5)
    assert(ids(rtDf).nonEmpty)
    assert(rtAudit.isDefined &&
      rtAudit.get.probedRowFrac <= 0.35 &&
      !rtAudit.get.needsRetrain,
      s"a retrain rebuild must clear the signal: $rtAudit")
    // LEGACY store (raw write, no recorded stats): the audited face
    // serves but honestly audits None
    val dir3 = java.nio.file.Files
      .createTempDirectory("graft_maint_audit_legacy").toString + "/idx"
    SimilarityOps.ivfPqIndex(base, "vec_id", "embedding",
        centers, codebooks)
      .write.partitionBy("cell").parquet(dir3)
    val (l1, lAudit) = servedAndAudit(base, dir3, centers, qHealthy)
    assert(ids(l1).nonEmpty && lAudit.isEmpty,
      "a stat-less store must serve with audit None")
  }

  test("retrain CUTOVER drill (VERDICT r14 #2): the serve pointer " +
       "publishes generation 0, drift trips needsRetrain through the " +
       "pointer, retrainCutover swaps it atomically to a fresh " +
       "generation whose audit is clear, a reader holding the OLD " +
       "pointer keeps serving its retained layout unchanged, and the " +
       "old generation retires once it ages out of the retention " +
       "window") {
    import graft.ops.IvfPqCurrent
    val dim = 16
    // the audit leg's fixture: 4 well-separated clusters; the drifted
    // re-embedding keeps its internal geometry but crowds to cell 0
    // under the stale generation-0 quantization
    def vecOf(i: Long, drifted: Boolean): Array[Float] = {
      val spike = (i % 4).toInt * 4 + (if (drifted) 2 else 0)
      Array.tabulate(dim)(j =>
        (if (j == spike) 8.0f else 0.0f) +
          (if (j == 3) ((i * 7) % 5 - 2) * 0.05f else 0.0f))
    }
    val centers0 = Array.tabulate(4)(c =>
      Array.tabulate(dim)(j => if (j == c * 4) 8.0 else 0.0))
    val codebooks0 = Array.tabulate(2)(sp => Array.tabulate(4)(c =>
      Array.tabulate(8)(j => ((sp * 31 + c * 7 + j) % 5 - 2).toDouble)))
    val n = 200L
    def corpusOf(drifted: Boolean) =
      (0L until n).map(i => (i, vecOf(i, drifted)))
        .toDF("vec_id", "embedding").localCheckpoint()
    val base = corpusOf(false)
    val drifted = corpusOf(true)
    val root = java.nio.file.Files
      .createTempDirectory("graft_cutover").toString
    def layoutDirs(): Seq[String] = {
      val d = new java.io.File(root)
      d.list().toSeq.filter(_.matches("layout-\\d+")).sorted
    }
    def serveAudited(cur: IvfPqCurrent.Current, corpus: DataFrame,
        q: Array[Double]) =
      SimilarityOps.ivfPqTopKStoredAudited(spark, cur.dir, "vec_id",
        corpus, "vec_id", "embedding", q, cur.centers, cur.codebooks,
        nProbe = 1, shortlist = 16, k = 5)
    def idsOf(df: DataFrame) =
      df.select($"vec_id").as[Long].collect().toSeq

    // generation 0 publishes through the pointer; openCurrent hands
    // back one consistent (dir, quantization) — the round-trip is
    // exact (doubles survive the JSON pointer bit-for-bit)
    val cur0 = IvfPqCurrent.publish(base, "vec_id", "embedding", root,
      centers0, codebooks0)
    assert(cur0.version === 0L && cur0.dir.endsWith("layout-0"))
    val opened0 = IvfPqCurrent.openCurrent(spark, root)
    assert(opened0.version === 0L && opened0.dir === cur0.dir)
    assert(opened0.centers.map(_.toSeq).toSeq ===
      centers0.map(_.toSeq).toSeq)
    assert(opened0.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      codebooks0.map(_.map(_.toSeq).toSeq).toSeq)
    val qHealthy = vecOf(0L, drifted = false).map(_.toDouble)
    val (h0, a0) = serveAudited(opened0, base, qHealthy)
    assert(idsOf(h0).nonEmpty && a0.exists(!_.needsRetrain),
      s"generation 0 must serve clean: $a0")

    // drift through the MAINTENANCE path against the current dir —
    // the tripwire fires through the pointer-opened handle
    SimilarityOps.upsertIntoIvfPqIndex(opened0.dir, drifted, "vec_id",
      "embedding", centers0, codebooks0)
    val qDrift = vecOf(0L, drifted = true).map(_.toDouble)
    val (d0, dAudit) = serveAudited(opened0, drifted, qDrift)
    assert(dAudit.exists(_.needsRetrain),
      s"drift must trip the audit through the pointer: $dAudit")
    val oldHandleServed = idsOf(d0)

    // CUTOVER: retrain on the current corpus into layout-1 and swap.
    // The OLD handle was opened before the swap — a concurrent reader.
    val cur1 = IvfPqCurrent.retrainCutover(drifted, "vec_id",
      "embedding", root, nList = 4, m = 2, codebookK = 4,
      sampleN = 200)
    assert(cur1.version === 1L && cur1.dir.endsWith("layout-1"))
    assert(IvfPqCurrent.openCurrent(spark, root).version === 1L,
      "the pointer must serve the new generation")
    assert(layoutDirs() === Seq("layout-0", "layout-1"),
      "retainVersions=2 must keep the old generation on disk")
    // needsRetrain CLEARS through the swapped pointer (fresh stats,
    // fresh band, retrained quantization routes the drifted clusters)
    val curRead = IvfPqCurrent.openCurrent(spark, root)
    val (s1, a1) = serveAudited(curRead, drifted, qDrift)
    assert(idsOf(s1).nonEmpty && a1.exists(!_.needsRetrain),
      s"the audit must clear through the swapped pointer: $a1")
    // the concurrent OLD-pointer reader still serves, unchanged: its
    // retained layout was never touched by the cutover
    val (dAgain, _) = serveAudited(opened0, drifted, qDrift)
    assert(idsOf(dAgain) === oldHandleServed,
      "an old-pointer reader must keep serving its generation " +
        "bit-identically until it ages out")

    // RETIREMENT: the next cutover ages layout-0 out of the window
    val cur2 = IvfPqCurrent.retrainCutover(drifted, "vec_id",
      "embedding", root, nList = 4, m = 2, codebookK = 4,
      sampleN = 200)
    assert(cur2.version === 2L)
    assert(layoutDirs() === Seq("layout-1", "layout-2"),
      "the aged-out generation must retire with the cutover")
    assert(!new java.io.File(root, "layout-0__tombstones").exists() &&
      !new java.io.File(root, "layout-0__maint.json").exists(),
      "retirement must take the generation's side state with it")

    // a half-built HIGHER generation from a torn cutover (dir staged,
    // pointer never swapped) is debris the next cutover sweeps
    val torn = new java.io.File(root, "layout-9")
    assert(torn.mkdir())
    val cur3 = IvfPqCurrent.retrainCutover(drifted, "vec_id",
      "embedding", root, nList = 4, m = 2, codebookK = 4,
      sampleN = 200)
    assert(cur3.version === 3L && !torn.exists(),
      "torn-cutover debris above the pointer must sweep")
    assert(layoutDirs() === Seq("layout-2", "layout-3"))
  }

  test("frontier contract (VERDICT r14 #1): with an UNTRUNCATED " +
       "re-rank shortlist, recall@10 of the stored probe is monotone " +
       "non-decreasing in nProbe — each probe set is a superset of " +
       "the last and the re-rank is exact — and the full probe equals " +
       "brute force exactly; the partial probe genuinely loses " +
       "neighbors on a fixture whose true clusters split across cells") {
    val dim = 16
    // 4 true clusters of 50 points each, laid out as a fine LINE on
    // dim 3 (coord = within-cluster index × 0.1): a query's true
    // top-10 is its coord window. nList=8 Lloyd puts ~2 centers per
    // cluster, splitting each line near its middle — so a query AT
    // the split boundary has true neighbors on both sides and
    // nProbe=1 genuinely loses some
    def vecOf(i: Long): Array[Float] = {
      val spike = (i % 4).toInt * 4
      Array.tabulate(dim)(j =>
        (if (j == spike) 8.0f else 0.0f) +
          (if (j == 3) ((i / 4) % 50) * 0.1f else 0.0f))
    }
    val n = 200L
    val corpus = (0L until n).map(i => (i, vecOf(i)))
      .toDF("vec_id", "embedding").localCheckpoint()
    val sample = corpus.orderBy($"vec_id").limit(200)
      .select($"embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val centers = SimilarityOps.localLloyd(sample, k = 8,
      maxIter = 5, seed = 13L)
    val codebooks = SimilarityOps.trainPqCodebooks(sample, m = 2,
      k = 4, maxIter = 5, seed = 13L)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_frontier").toString + "/idx"
    SimilarityOps.writeIvfPqIndex(
      SimilarityOps.ivfPqIndex(corpus, "vec_id", "embedding",
        centers, codebooks), dir, "vec_id")
    // one query per cluster at line coord 2.4 (ids 96..99 — the
    // middle of each 0..4.9 line, right at a 2-way split's boundary)
    val queries = (0L to 3L).map(c => (c + 1000L, vecOf(96L + c)))
      .toDF("qid", "qv").localCheckpoint()
    def topSets(df: DataFrame): Map[Long, Set[Long]] =
      df.select($"qid", $"vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val want = topSets(SimilarityOps.bruteForceTopK(corpus, "vec_id",
      "embedding", queries, "qid", "qv", k = 10))
    def recallAt(nProbe: Int): Double = {
      // shortlist ≥ corpus: the ADC stage never truncates, so the
      // candidate set at nProbe+1 is a strict superset of nProbe's
      // and the exact re-rank makes recall provably monotone — the
      // assertion checks the IMPLEMENTATION holds the superset/
      // exact-re-rank contract (a fixed short shortlist can dip:
      // that's the measured trade-off in IndexMaintBench's frontier)
      val got = topSets(SimilarityOps.ivfPqTopKMultiStored(spark, dir,
        "vec_id", corpus, "vec_id", "embedding", queries, "qid", "qv",
        centers, codebooks, nProbe, shortlist = 256, k = 10))
      want.toSeq.map { case (q, w) =>
        (got.getOrElse(q, Set.empty) intersect w).size.toDouble / w.size
      }.sum / want.size
    }
    val recalls = Seq(1, 2, 4, 8).map(p => p -> recallAt(p))
    recalls.sliding(2).foreach { case Seq((p1, r1), (p2, r2)) =>
      assert(r1 <= r2 + 1e-12,
        s"recall must be monotone in nProbe: $p1→$r1 vs $p2→$r2 " +
          s"(all: $recalls)")
    }
    assert(recalls.last._2 === 1.0,
      s"full probe + untruncated shortlist must equal brute force: " +
        s"$recalls")
    assert(recalls.head._2 < 1.0,
      s"the fixture must make partial probes lossy, or the " +
        s"monotonicity leg proves nothing: $recalls")
  }

  test("scan-stats staleness marker (VERDICT r15 #5): a crash between " +
       "a maintenance op's row write and its stats fold leaves the " +
       "marker raised — the audited serve reports statsStale instead " +
       "of a silently-narrow band, a later healthy op does NOT " +
       "launder it, and compact re-derives the counts exactly " +
       "(preserving the designed band) and clears it") {
    import graft.ops.SeqSidecar
    val centers = Array.tabulate(4)(c =>
      Array.tabulate(8)(i => if (i == 2 * c) 8.0 else 0.0))
    val codebooks = Array.tabulate(2)(sp => Array.tabulate(2)(cd =>
      Array.tabulate(4)(j => (sp + cd + j).toDouble)))
    def vecOf(cell: Int): Seq[Float] =
      Array.tabulate(8)(i => if (i == 2 * cell) 8.0f else 0.1f).toSeq
    def ofIds(pairs: (Long, Int)*): DataFrame =
      pairs.map { case (id, cell) => (id, vecOf(cell)) }
        .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_maint_stale").toString + "/idx"
    SimilarityOps.writeIvfPqIndex(
      SimilarityOps.ivfPqIndex(ofIds(1L -> 0, 2L -> 1),
        "vec_id", "embedding", centers, codebooks), dir, "vec_id")
    val queries = Seq((-1L, vecOf(0))).toDF("qid", "qv")
    def auditOn(corpus: DataFrame): SimilarityOps.IvfScanAudit =
      SimilarityOps.ivfPqTopKMultiStoredAudited(spark, dir, "vec_id",
        corpus, "vec_id", "embedding", queries, "qid", "qv",
        centers, codebooks, nProbe = 2, shortlist = 8, k = 2)._2.get
    def sidecarCells(): Map[Int, Long] =
      SeqSidecar.readScan(spark, dir).get._1
    def actualCells(): Map[Int, Long] = spark.read.parquet(dir)
      .groupBy($"cell".cast("int")).count()
      .as[(Int, Long)].collect().toMap
    def designedFracs(): Seq[Double] =
      SeqSidecar.readScan(spark, dir).get._2
    // healthy build + healthy upsert: marker down, fold settled
    assert(!auditOn(ofIds(1L -> 0, 2L -> 1)).statsStale)
    SimilarityOps.upsertIntoIvfPqIndex(dir, ofIds(3L -> 2),
      "vec_id", "embedding", centers, codebooks)
    assert(!SeqSidecar.isScanStale(spark, dir),
      "a completed op must settle its own marker")
    assert(!auditOn(ofIds(1L -> 0, 2L -> 1, 3L -> 2)).statsStale)
    val bandAtBuild = designedFracs()
    // TORN upsert — the exact crash prefix: marker raised, tombstone
    // and rows landed at a fresh seq, fold never ran
    SeqSidecar.markScanStale(spark, dir)
    val seq = SeqSidecar.alloc(spark, dir, 0L)
    Seq(4L).toDF("vec_id")
      .withColumn(SimilarityOps.IvfSeqCol, lit(seq))
      .write.mode("append").parquet(dir + "__tombstones")
    SimilarityOps.ivfPqIndex(ofIds(4L -> 3),
        "vec_id", "embedding", centers, codebooks)
      .withColumn(SimilarityOps.IvfSeqCol, lit(seq))
      .write.mode("append").partitionBy("cell").parquet(dir)
    assert(sidecarCells() !== actualCells(),
      "the torn op must leave the counts genuinely undercounting — " +
        "or the drill proves nothing")
    val staleAudit = auditOn(ofIds(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
    assert(staleAudit.statsStale,
      "the audited serve must surface the unsettled marker")
    // a later HEALTHY op settles only its own mark — the crashed op's
    // +1 survives (the counter, not a boolean: no laundering)
    SimilarityOps.upsertIntoIvfPqIndex(dir, ofIds(5L -> 1),
      "vec_id", "embedding", centers, codebooks)
    assert(SeqSidecar.isScanStale(spark, dir),
      "a healthy op after the crash must not clear prior staleness")
    // compact: re-derives the counts from the layout (the raised
    // marker forces the full recount), preserves the designed band,
    // clears the marker; the folded store serves all live ids
    SimilarityOps.compactIvfPqIndex(spark, dir, "vec_id")
    assert(!SeqSidecar.isScanStale(spark, dir),
      "compact must clear the marker after re-deriving")
    assert(sidecarCells() === actualCells(),
      "compact must restore exact per-cell counts")
    assert(designedFracs() === bandAtBuild,
      "the designed build-time band must survive the re-derive — " +
        "compact does not retrain")
    assert(!auditOn(ofIds(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 1))
      .statsStale)
    assert(SimilarityOps.activeIvfPqIndex(spark, dir, "vec_id")
      .select($"vec_id").as[Long].collect().toSet ===
      Set(1L, 2L, 3L, 4L, 5L))

    // the no-tombstone corner that forced the full recount design: a
    // TORN REFRESH on a store that never allocated a seq lands rows at
    // BASE seq — invisible to compact's affected-cell set — and there
    // are no tombstones, so compact's early-return path must heal too
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_maint_stale2").toString + "/idx"
    SimilarityOps.writeIvfPqIndex(
      SimilarityOps.ivfPqIndex(ofIds(1L -> 0),
        "vec_id", "embedding", centers, codebooks), dir2, "vec_id")
    SeqSidecar.markScanStale(spark, dir2)
    SimilarityOps.ivfPqIndex(ofIds(6L -> 2),
        "vec_id", "embedding", centers, codebooks)
      .withColumn(SimilarityOps.IvfSeqCol, lit(SimilarityOps.IvfBaseSeq))
      .write.mode("append").partitionBy("cell").parquet(dir2)
    assert(SeqSidecar.isScanStale(spark, dir2))
    SimilarityOps.compactIvfPqIndex(spark, dir2, "vec_id")
    assert(!SeqSidecar.isScanStale(spark, dir2),
      "a no-tombstone compact must still heal a raised marker")
    assert(SeqSidecar.readScan(spark, dir2).get._1 ===
      spark.read.parquet(dir2).groupBy($"cell".cast("int")).count()
        .as[(Int, Long)].collect().toMap,
      "the base-seq torn-refresh rows must be counted after the heal")

    // the COMBINED corner (review-pass, this round): tombstone work
    // AND a base-seq torn refresh in a cell the affected set never
    // visits — compact's incremental update publishes (clearing the
    // live marker), so the full re-derive must key off the marker as
    // of op START or the unaffected cell stays undercounted forever
    val dir3 = java.nio.file.Files
      .createTempDirectory("graft_maint_stale3").toString + "/idx"
    SimilarityOps.writeIvfPqIndex(
      SimilarityOps.ivfPqIndex(ofIds(1L -> 0, 2L -> 1),
        "vec_id", "embedding", centers, codebooks), dir3, "vec_id")
    // torn refresh at base seq into cell 2 (no seq ever allocated, no
    // tombstone): marker raised, fold never ran
    SeqSidecar.markScanStale(spark, dir3)
    SimilarityOps.ivfPqIndex(ofIds(7L -> 2),
        "vec_id", "embedding", centers, codebooks)
      .withColumn(SimilarityOps.IvfSeqCol, lit(SimilarityOps.IvfBaseSeq))
      .write.mode("append").partitionBy("cell").parquet(dir3)
    // then a NORMAL delete elsewhere gives compact tombstone work
    SimilarityOps.removeFromIvfPqIndex(dir3,
      Seq(1L).toDF("vec_id"), "vec_id")
    SimilarityOps.compactIvfPqIndex(spark, dir3, "vec_id")
    assert(!SeqSidecar.isScanStale(spark, dir3))
    assert(SeqSidecar.readScan(spark, dir3).get._1 ===
      spark.read.parquet(dir3).groupBy($"cell".cast("int")).count()
        .as[(Int, Long)].collect().toMap,
      "a compact WITH tombstone work must still re-derive the " +
        "unaffected torn-refresh cell — the wasStale snapshot, not " +
        "the post-publish marker, gates the heal")
  }

  test("cutover on a MAINTAINED store (VERDICT r15 #2): the old " +
       "generation accumulates upserts + tombstones through " +
       "IvfPqIndexSink; retrainCutover rebuilds from the live " +
       "doc-of-record mid-composition — deleted-before-cutover ids " +
       "stay dead through the new generation, upserted vectors serve " +
       "their NEW values, a maintenance op racing the rebuild lands " +
       "in the corpus the rebuild reads or is refused by the lease, " +
       "and ghost/lost/double are all zero on the rebound sink") {
    import graft.ops.{IvfPqCurrent, SeqSidecar}
    import graft.cdc.WriterLease
    val dim = 8
    def vecOf(i: Long, ver: Int): Seq[Float] = {
      val spike = ((i % 4) * 2).toInt
      Array.tabulate(dim)(j =>
        (if (j == spike) 8.0f else 0.0f) +
          (if (j == 3) ((i * 7 + ver * 3) % 5 - 2) * 0.05f else 0.0f))
        .toSeq
    }
    // the live doc-of-record: id -> (current vector) — what the
    // reference's reindex daemon reads while the old index serves
    val model = scala.collection.mutable.Map[Long, Seq[Float]]()
    def liveDocs(): DataFrame =
      model.toSeq.sortBy(_._1).toDF("id", "v").localCheckpoint()
    val centers0 = Array.tabulate(4)(c =>
      Array.tabulate(dim)(j => if (j == 2 * c) 8.0 else 0.0))
    val codebooks0 = Array.tabulate(2)(sp => Array.tabulate(4)(cd =>
      Array.tabulate(4)(j => ((sp * 31 + cd * 7 + j) % 5 - 2).toDouble)))
    val root = java.nio.file.Files
      .createTempDirectory("graft_maint_cutover_live").toString + "/cur"
    val lease = WriterLease.acquire(spark, root, "daemon")
    (1L to 6L).foreach(i => model(i) = vecOf(i, 0))
    val cur0 = IvfPqCurrent.publish(liveDocs(), "id", "v", root,
      centers0, codebooks0, lease = Some(lease))
    val sink0 = IvfPqCurrent.sinkOnCurrent(spark, root, "id", "v",
      lease = Some(lease))
    assert(sink0.dir === cur0.dir)
    // tick 1 on the OLD generation: id 2 re-embeds, id 3 deleted
    model(2L) = vecOf(2L, 1); model.remove(3L)
    sink0.upsert(Seq((2L, model(2L))).toDF("id", "v"))
    sink0.delete(Seq(3L).toDF("id"))
    // tick 2: new id 7 arrives, id 5 deleted
    model(7L) = vecOf(7L, 0); model.remove(5L)
    sink0.upsert(Seq((7L, model(7L))).toDF("id", "v"))
    sink0.delete(Seq(5L).toDF("id"))
    // RACING leg (c), branch 1 — same writer, just before the rebuild
    // reads the doc store: the op lands in the corpus the rebuild
    // reads, so the new generation must serve it
    model(8L) = vecOf(8L, 0)
    sink0.upsert(Seq((8L, model(8L))).toDF("id", "v"))
    // RACING leg (c), branch 2 — a SECOND maintenance writer during
    // the cutover window: refused at acquire, before writing anything
    val raceErr = intercept[IllegalArgumentException] {
      WriterLease.acquire(spark, root, "racer")
    }
    assert(raceErr.getMessage.contains("held by 'daemon'"))
    // CUTOVER mid-composition: retrain + rebuild from the LIVE doc
    // store (upserts + deletes applied), atomic pointer swap
    val cur1 = IvfPqCurrent.retrainCutover(liveDocs(), "id", "v", root,
      nList = 4, m = 2, codebookK = 4, lease = Some(lease))
    assert(cur1.version === 1L)
    // the old-generation handle keeps serving through the cutover
    // (retainVersions=2) — a reader mid-flight is never torn
    assert(SimilarityOps.activeIvfPqIndex(spark, cur0.dir, "id")
      .select($"id").as[Long].collect().toSet === model.keySet.toSet)
    // REBIND (the daemon's restart face): one pointer read hands the
    // new dir + its quantization; post-cutover ticks maintain gen 1
    val sink1 = IvfPqCurrent.sinkOnCurrent(spark, root, "id", "v",
      lease = Some(lease))
    assert(sink1.dir === cur1.dir)
    assert(sink1.dir !== sink0.dir)
    // tick 3 on the NEW generation: id 2 re-embeds again, id 7
    // deleted, id 3 RE-ADDED (deleted before cutover — the re-add
    // must serve; staying dead applies to never-re-added ids)
    model(2L) = vecOf(2L, 2); model.remove(7L); model(3L) = vecOf(3L, 5)
    sink1.upsert(Seq((2L, model(2L)), (3L, model(3L))).toDF("id", "v"))
    sink1.delete(Seq(7L).toDF("id"))
    // ghost/lost/double over the maintained new generation: the live
    // encoded view must equal a FRESH ENCODE of the doc-of-record
    // under gen-1 quantization — every live id exactly once with its
    // CURRENT vector's codes; subsumes (a) id 5 dead, (b) id 2 serves
    // its newest value, (c1) id 8 present
    def enc(df: DataFrame) = SimilarityOps.ivfPqIndex(df, "id", "v",
        cur1.centers, cur1.codebooks)
      .select($"id", $"cell".cast("int"), $"codes")
      .as[(Long, Int, Seq[Int])].collect().toSet
    val served = sink1.read().get
      .select($"id", $"cell".cast("int"), $"codes")
      .as[(Long, Int, Seq[Int])].collect().toSeq
    assert(served.size === served.toSet.size &&
      served.map(_._1).distinct.size === served.size,
      s"double-serving ids: $served")
    assert(served.toSet === enc(liveDocs()),
      "the maintained new generation must equal a fresh encode of " +
        "the live doc store — zero ghosts, zero lost, new values only")
    assert(!served.exists(_._1 == 5L),
      "an id deleted before the cutover and never re-added stays dead")
    // serving referee on the composed store: id 2's NEWEST vector
    // finds id 2 first
    val hit = SimilarityOps.ivfPqTopKMultiStored(spark, cur1.dir, "id",
        liveDocs(), "id", "v",
        Seq((99L, model(2L))).toDF("qid", "qv"), "qid", "qv",
        cur1.centers, cur1.codebooks, nProbe = 4, shortlist = 16, k = 1)
      .select($"id").as[Long].collect().toSeq
    assert(hit === Seq(2L),
      "the upserted-then-cutover-then-upserted id must serve its " +
        "newest embedding")
    // the fresh generation's maintenance state is clean: gen-1 scan
    // stats were recorded by the rebuild and tick-3 folds settled
    assert(!SeqSidecar.isScanStale(spark, cur1.dir))
    lease.release()
  }

  test("analyzer-version cutover for the POSTING index (VERDICT r15 " +
       "#3): the serve pointer carries (generation dir, analyzer " +
       "version); a stemmer/case-folding bump reindexes aside and " +
       "swaps atomically — old-pointer readers keep serving their " +
       "generation, the rebound server tokenizes queries under the " +
       "NEW version, retirement sweeps exact names only, and a " +
       "second writer is refused at the lease") {
    import graft.movies.PostingCurrent
    import graft.cdc.WriterLease
    // analyzer v1 is case-SENSITIVE; v2 is the case-folding bump —
    // the text-side quantization change: v1 postings cannot serve
    // v2-analyzed queries
    val tokensV1 = Map("text" -> split($"text", "\\s+"))
    val tokensV2 = Map("text" -> split(lower($"text"), "\\s+"))
    val weights = Map("text" -> 1)
    val model = scala.collection.mutable.Map[Long, String](
      1L -> "Apple pie recipe", 2L -> "apple cider", 3L -> "Banana bread")
    def liveDocs(): DataFrame =
      model.toSeq.sortBy(_._1).toDF("id", "text").localCheckpoint()
    val root = java.nio.file.Files
      .createTempDirectory("graft_maint_pcur").toString + "/cur"
    val lease = WriterLease.acquire(spark, root, "daemon")
    val cur0 = PostingCurrent.reindexCutover(liveDocs(), root,
      tokensV1, weights, analyzerVersion = "case-v1",
      nTermBuckets = 4, nDocBuckets = 4, lease = Some(lease))
    assert(cur0.version === 0L && cur0.analyzerVersion === "case-v1")
    // maintain generation 0 (the live-delta state a cutover must
    // absorb via the doc-of-record): id 4 arrives
    model(4L) = "APPLE watch"
    val gen0 = cur0.open(spark)
      .upsert(Seq((4L, model(4L))).toDF("id", "text"), tokensV1)
    def ids(df: DataFrame): Set[Long] =
      df.select($"id").as[Long].collect().toSet
    // v1 analysis is case-sensitive: the same surface word splits
    // across three index terms — the serving gap the bump fixes
    assert(ids(gen0.scoreTerms(Seq("Apple"))) === Set(1L))
    assert(ids(gen0.scoreTerms(Seq("apple"))) === Set(2L))
    // ANALYZER BUMP: full reindex from the live doc store under v2,
    // atomic pointer swap
    val cur1 = PostingCurrent.reindexCutover(liveDocs(), root,
      tokensV2, weights, analyzerVersion = "fold-v2",
      nTermBuckets = 4, nDocBuckets = 4, lease = Some(lease))
    assert(cur1.version === 1L && cur1.analyzerVersion === "fold-v2")
    // the OLD handle keeps serving its generation bit-identically
    // through the swap (dir retained by retainVersions=2)
    assert(ids(gen0.scoreTerms(Seq("Apple"))) === Set(1L))
    // a server re-reading the pointer gets the new generation AND the
    // version that tells it to fold queries: "apple" now unifies all
    // case variants, including the doc upserted into gen 0 mid-life
    val server = PostingCurrent.openCurrent(spark, root)
    assert(server.analyzerVersion === "fold-v2")
    assert(ids(server.open(spark).scoreTerms(Seq("apple"))) ===
      Set(1L, 2L, 4L))
    // a second maintenance/reindex writer is refused at the lease,
    // before staging anything
    val err = intercept[IllegalArgumentException] {
      WriterLease.acquire(spark, root, "racer")
    }
    assert(err.getMessage.contains("held by 'daemon'"))
    // retirement discipline: stage torn-cutover debris + a foreign
    // dir, then cut over again — debris swept, exact names only, and
    // generation 0 ages out (retainVersions=2 keeps 1 and 2)
    val rootDir = new java.io.File(root)
    assert(new java.io.File(rootDir, "index-9").mkdir())
    assert(new java.io.File(rootDir, "index_backup").mkdir())
    val cur2 = PostingCurrent.reindexCutover(liveDocs(), root,
      tokensV2, weights, analyzerVersion = "fold-v3",
      nTermBuckets = 4, nDocBuckets = 4, lease = Some(lease))
    assert(cur2.version === 2L)
    val names = rootDir.list().toSet
    assert(!names.contains("index-9"),
      "torn-cutover debris above the pointer must sweep pre-build")
    assert(names.contains("index_backup"),
      "a foreign dir must never be touched (exact generated names only)")
    assert(!names.contains("index-0"),
      "generation 0 must age out of the retention window")
    assert(names.contains("index-1") && names.contains("index-2"))
    assert(ids(PostingCurrent.openCurrent(spark, root).open(spark)
      .scoreTerms(Seq("banana"))) === Set(3L))
    lease.release()
  }
}
