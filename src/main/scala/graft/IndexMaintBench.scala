package graft

import java.nio.file.{Files, Paths}

/** Index-MAINTENANCE scaling readout for ALL THREE stored serving-index
  * families (VERDICT r11 #4 — the LSH and IVF×PQ O(request) remove and
  * affected-cells compact claims become measured, not just spec'd),
  * plus the high-df serving-cost study (VERDICT r11 #3).
  *
  * Per scale factor and family: BUILD (the O(corpus) rebuild a
  * maintained index avoids), a FIXED-size UPSERT (must be ~flat in
  * corpus size — O(|batch|), the seq-tombstone discipline), a
  * fixed-size REMOVE (O(|request|) tombstone append), the SERVE over
  * the maintained index (live tombstones/segments in the read), and
  * COMPACT (the amortized fold), then the compacted serve.
  *
  * The `posting_df` rows measure BM25F serving cost vs term document
  * frequency at ×4/×16/×64 replications of the last dir's documents
  * (disjoint ids): a ~⅔-df stopword-grade term's candidate set IS most
  * of the corpus — posting pruning cannot help, the serve is a corpus
  * scan by construction — versus a ~0.2%-df selective term whose cost
  * tracks its posting list, versus the MIXED-query `scoreTermsTopK`
  * whose max-score pruning must skip the stopword scan (`topk_pruned`
  * records that it fired). One JSON line per run — the StreamBench
  * artifact pattern.
  *
  *   SPARK_GRAFT_MAINT_DIRS=/root/testdata/sf0.1,/tmp/scale/sf0.2,...
  *   sbt 'runMain graft.IndexMaintBench'
  */
object IndexMaintBench {
  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_MAINT_DIRS",
      "/root/testdata/sf0.1").split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus, "graft-index-maint-bench")
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.movies.PostingIndex
    import graft.ops.{BucketingOps, DedupOps, SimilarityOps, TextOps}

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val terms = Seq("spark", "query", "window")
    val results = scala.collection.mutable.ArrayBuffer.empty[Map[String, Any]]

    // dev filter (the Verify/Bench SPARK_GRAFT_ONLY parity):
    // SPARK_GRAFT_MAINT_SECTIONS=frontier,drift runs only those
    // sections; unset runs everything (the recorded artifact)
    val sections = sys.env.get("SPARK_GRAFT_MAINT_SECTIONS")
      .map(_.split(",").map(_.trim).toSet)
    def section(name: String)(body: => Unit): Unit =
      if (sections.forall(_.contains(name))) body

    for (sf <- dirs) section("families") {
      val docs = Tables.load(spark, sf, "documents")
        .select($"doc_id", $"text")
      val n = docs.count()

      // ---------------- PostingIndex (the r11 rows, kept comparable)
      val toks = TextOps.tokenize($"text")
      val tokens = Map(
        "title" -> slice(toks, 1, 5),
        "body" -> slice(toks, lit(6), size(toks)))
      val weights = Map("title" -> 4, "body" -> 1)
      locally {
        val dir = Files.createTempDirectory("graft_mb_pidx").toString + "/idx"
        var idx: PostingIndex = null
        val build = timed { idx = PostingIndex.buildTokenized(docs, dir,
          tokens, weights, idCol = "doc_id",
          nTermBuckets = 8, nDocBuckets = 8) }
        // FIXED 128-doc batch (new ids) — upsert cost must not grow
        // with the corpus behind it
        val batch = docs.orderBy($"doc_id").limit(128)
          .select(($"doc_id" + 100000000L).as("doc_id"), $"text")
          .localCheckpoint()
        val upsert = timed { idx = idx.upsert(batch, tokens) }
        val serveMaint = Seq.fill(2)(
          timed { idx.scoreTerms(terms).count(); () }).min
        val delIds = batch.select($"doc_id").limit(64).localCheckpoint()
        val delete = timed { idx = idx.delete(delIds) }
        val compact = timed { idx = idx.compact() }
        val serveCompacted = Seq.fill(2)(
          timed { idx.scoreTerms(terms).count(); () }).min
        results += Map("family" -> "posting", "sf" -> sf, "n_docs" -> n,
          "build" -> build, "upsert" -> upsert, "delete" -> delete,
          "serve_maintained" -> serveMaint, "compact" -> compact,
          "serve_compacted" -> serveCompacted)
      }

      // ---------------- LSH band-key index (VERDICT r11 #4)
      locally {
        val sig = DedupOps.minhashSignatures(
          docs.select($"doc_id",
            TextOps.shingleHashes($"text", 3).as("hashes")),
          "doc_id", "hashes", 16).localCheckpoint()
        val table = "graft_mb_lsh"
        val nBuckets = 8
        val build = timed { BucketingOps.writeBucketed(
          DedupOps.lshBandKeyTable(sig, "doc_id", "sig", 4, 4),
          table, Seq("band", "bh"), nBuckets) }
        // fixed 128-doc upsert (new ids, real signatures)
        val batch = sig.orderBy($"doc_id").limit(128)
          .select(($"doc_id" + 100000000L).as("doc_id"), $"sig")
          .localCheckpoint()
        val upsert = timed { DedupOps.upsertIntoLshIndex(spark, table,
          batch, "doc_id", "sig", 4, 4, nBuckets) }
        // serve = the q70 shape: a fixed 64-doc delta probed against
        // the ACTIVE (tombstone-filtered) index
        val delta = docs.orderBy($"doc_id").limit(64)
          .select(($"doc_id" + 200000000L).as("doc_id"), $"text")
        val deltaSig = DedupOps.minhashSignatures(
          delta.select($"doc_id",
            TextOps.shingleHashes($"text", 3).as("hashes")),
          "doc_id", "hashes", 16).localCheckpoint()
        def probe(): Unit = {
          DedupOps.lshCandidatePairsIncrementalIndexed(
            DedupOps.activeLshIndex(spark, table, "doc_id"),
            deltaSig, "doc_id", "sig", 4, 4).count(); ()
        }
        val serveMaint0 = Seq.fill(2)(timed(probe())).min
        val delIds = batch.select($"doc_id").limit(64).localCheckpoint()
        val remove = timed { DedupOps.removeFromLshIndex(spark, table,
          delIds, "doc_id") }
        val serveMaint = Seq.fill(2)(timed(probe())).min
        val compact = timed { DedupOps.compactLshIndex(spark, table,
          "doc_id", nBuckets) }
        val serveCompacted = Seq.fill(2)(timed(probe())).min
        results += Map("family" -> "lsh", "sf" -> sf, "n_docs" -> n,
          "build" -> build, "upsert" -> upsert, "delete" -> remove,
          "serve_upserted" -> serveMaint0,
          "serve_maintained" -> serveMaint, "compact" -> compact,
          "serve_compacted" -> serveCompacted)
      }

      // ---------------- IVF×PQ stored layout (VERDICT r11 #4)
      locally {
        val emb = Tables.load(spark, sf, "embeddings")
          .select($"vec_id", $"embedding")
        val nVec = emb.count()
        val centers = Array.tabulate(8)(c =>
          Array.tabulate(64)(i => if (i == c * 8) 8.0 else 0.0))
        val codebooks = Array.tabulate(2)(sp => Array.tabulate(4)(c =>
          Array.tabulate(32)(i => ((sp * 31 + c * 7 + i) % 5 - 2).toDouble)))
        val dir = Files.createTempDirectory("graft_mb_ivf").toString + "/idx"
        val build = timed { SimilarityOps.writeIvfPqIndex(
          SimilarityOps.ivfPqIndex(emb,
            "vec_id", "embedding", centers, codebooks), dir, "vec_id") }
        val batch = emb.orderBy($"vec_id").limit(128)
          .select(($"vec_id" + 100000000L).as("vec_id"), $"embedding")
          .localCheckpoint()
        val upsert = timed { SimilarityOps.upsertIntoIvfPqIndex(dir,
          batch, "vec_id", "embedding", centers, codebooks) }
        val qvec = emb.orderBy($"vec_id").select($"embedding")
          .head().getSeq[Float](0).map(_.toDouble).toArray
        def probe(): Unit = {
          SimilarityOps.ivfPqTopKStored(spark, dir, "vec_id",
            emb, "vec_id", "embedding", qvec, centers, codebooks,
            nProbe = 2, shortlist = 64, k = 10).count(); ()
        }
        val serveUpserted = Seq.fill(2)(timed(probe())).min
        val delIds = batch.select($"vec_id").limit(64).localCheckpoint()
        val remove = timed { SimilarityOps.removeFromIvfPqIndex(dir,
          delIds, "vec_id") }
        val serveMaint = Seq.fill(2)(timed(probe())).min
        // BATCHED maintained-ANN serving (VERDICT r13 #4): 8 queries
        // as a table through ivfPqTopKMultiStored on the MAINTAINED
        // store (live tombstones in the read) vs the per-query
        // single-face loop — the job-count amortization the posting
        // family's serve_topk_batch8 rows measure, for the vector
        // index (probed-cell partition filters stay PlansSpec-
        // asserted on this face).
        val annQs = emb.orderBy($"vec_id").limit(8)
          .select(($"vec_id" + 500000000L).as("qid"),
            $"embedding".as("qv"))
          .localCheckpoint()
        val serveAnnBatch = Seq.fill(2)(timed {
          SimilarityOps.ivfPqTopKMultiStored(spark, dir, "vec_id",
            emb, "vec_id", "embedding", annQs, "qid", "qv",
            centers, codebooks, nProbe = 2, shortlist = 64, k = 10)
            .count(); () }).min
        val annQVecs = annQs.select($"qv").collect()
          .map(_.getSeq[Float](0).map(_.toDouble).toArray)
        val serveAnnLoop = Seq.fill(2)(timed {
          annQVecs.foreach { q =>
            SimilarityOps.ivfPqTopKStored(spark, dir, "vec_id",
              emb, "vec_id", "embedding", q, centers, codebooks,
              nProbe = 2, shortlist = 64, k = 10).count(); ()
          } }).min
        val compact = timed { SimilarityOps.compactIvfPqIndex(spark,
          dir, "vec_id") }
        val serveCompacted = Seq.fill(2)(timed(probe())).min
        results += Map("family" -> "ivfpq", "sf" -> sf, "n_docs" -> nVec,
          "build" -> build, "upsert" -> upsert, "delete" -> remove,
          "serve_upserted" -> serveUpserted,
          "serve_maintained" -> serveMaint, "compact" -> compact,
          "serve_compacted" -> serveCompacted,
          "serve_ann_batch8" -> serveAnnBatch,
          "serve_ann_loop8" -> serveAnnLoop)
      }
    }

    // ---------------- high-df serving cost (VERDICT r11 #3): a
    // stopword-grade term's candidates ≈ corpus/2 — pruning cannot
    // help; a selective term's cost tracks its posting list. Corpus
    // ladder: the LAST dir's documents replicated ×4/×16/×64 with
    // disjoint ids; 'graftcommon' injected on even ids (~50% df),
    // 'graftrare' on ids ≡ 0 (mod 503) (~0.2% df).
    section("posting_df") {
      val base = Tables.load(spark, dirs.last, "documents")
        .select($"doc_id", $"text")
      val baseN = base.count()
      for (k <- Seq(4, 16, 64)) {
        // 'graftcommon' on ids ≢ 0 (mod 3): df ≈ 2N/3, safely ABOVE the
        // df ≤ N/2 selective cut (an exactly-half term sits ON the
        // boundary and counts selective — the rule is ≤)
        val corpus = (0 until k).map(c =>
            base.select(($"doc_id" + c * 10000000L).as("doc_id"), $"text"))
          .reduce(_ unionByName _)
          .select($"doc_id", concat($"text",
            when($"doc_id" % 3 =!= 0, " graftcommon").otherwise(""),
            when($"doc_id" % 503 === 0, " graftrare").otherwise(""))
            .as("text"))
        val n = k * baseN
        val toks = TextOps.tokenize($"text")
        val tokens = Map(
          "title" -> slice(toks, 1, 5),
          "body" -> slice(toks, lit(6), size(toks)))
        val dir = Files.createTempDirectory("graft_mb_df").toString + "/idx"
        var idx: PostingIndex = null
        // bucket counts sized to the box's parallelism (the 100 TB
        // discipline: buckets ≈ cluster slots) — the build's bucket-
        // aligned sort shuffle then uses every core
        val build = timed { idx = PostingIndex.buildTokenized(corpus, dir,
          tokens, Map("title" -> 4, "body" -> 1), idCol = "doc_id",
          nTermBuckets = 32, nDocBuckets = 32) }
        var nCommon = 0L
        var nRare = 0L
        val serveCommon = Seq.fill(2)(timed {
          nCommon = idx.scoreTerms(Seq("graftcommon")).count() }).min
        val serveRare = Seq.fill(2)(timed {
          nRare = idx.scoreTerms(Seq("graftrare")).count() }).min
        // the max-score pruned top-k over the MIXED query: the
        // stopword-grade term's posting scan is provably skippable
        // here, so this reading must track the RARE term's cost, not
        // the corpus (the win scoreTermsTopK exists for)
        var topkPruned = true
        val serveTopk = Seq.fill(2)(timed {
          val (res, fired) = idx.scoreTermsTopKImpl(
            Seq("graftrare", "graftcommon"), 10)
          topkPruned &&= fired
          res.count(); () }).min
        // MAINTAINED-state row (VERDICT r12 #1): put the index in the
        // CDC steady state — one live upsert + one live delete segment
        // — and serve the same mixed query through scoreTermsTopK. The
        // pruned branch must still fire (dfs corrected from the live
        // log) at a cost tracking the rare term + the log, not the
        // stopword corpus scan.
        val batch = corpus.orderBy($"doc_id").limit(128)
          .select(($"doc_id" + 900000000L).as("doc_id"),
            concat($"text", lit(" graftrare")).as("text"))
          .localCheckpoint()
        idx = idx.upsert(batch, tokens)
        idx = idx.delete(batch.select($"doc_id").limit(64))
        var topkPrunedMaint = true
        val serveTopkMaint = Seq.fill(2)(timed {
          val (res, fired) = idx.scoreTermsTopKImpl(
            Seq("graftrare", "graftcommon"), 10)
          topkPrunedMaint &&= fired
          res.count(); () }).min
        // BATCHED top-k (scoreTermsTopKMulti) vs the per-query loop on
        // the same MAINTAINED index: 8 mixed queries in one batch —
        // the driver-job amortization the multi faces exist for, now
        // with per-query max-score pruning
        val topkQs = (1 to 8).map(i =>
            (i.toLong, Seq("graftrare", "graftcommon")))
          .toDF("qid", "terms").localCheckpoint()
        var batchPruned = 0
        val serveTopkBatch = Seq.fill(2)(timed {
          val (res, safe) = idx.scoreTermsTopKMultiImpl(
            topkQs, "qid", "terms", 10)
          batchPruned = safe.size
          res.count(); () }).min
        val serveTopkLoop = Seq.fill(2)(timed {
          (1 to 8).foreach { _ =>
            idx.scoreTermsTopK(Seq("graftrare", "graftcommon"), 10)
              .count(); ()
          } }).min
        // POST-REFRESH row (VERDICT r13 #1): bulk-refresh a fixed
        // batch of NEW docs into the maintained index — the pruned
        // top-k must KEEP firing (the side table absorbs the delta as
        // appended +count rows, folded at read) at the rare-term cost
        // class, never fall back to the stopword corpus scan.
        val refreshBatch = corpus.orderBy($"doc_id").limit(128)
          .select(($"doc_id" + 950000000L).as("doc_id"),
            concat($"text", lit(" graftrare")).as("text"))
          .localCheckpoint()
        idx = idx.refresh(refreshBatch, tokens)
        var topkPrunedPostRefresh = true
        val serveTopkPostRefresh = Seq.fill(2)(timed {
          val (res, fired) = idx.scoreTermsTopKImpl(
            Seq("graftrare", "graftcommon"), 10)
          topkPrunedPostRefresh &&= fired
          res.count(); () }).min
        results += Map("family" -> "posting_df", "n_docs" -> n,
          "build" -> build,
          "serve_common_df" -> serveCommon, "matches_common" -> nCommon,
          "serve_rare_df" -> serveRare, "matches_rare" -> nRare,
          "serve_topk_mixed" -> serveTopk,
          "topk_pruned" -> topkPruned,
          "serve_topk_maintained" -> serveTopkMaint,
          "topk_pruned_maintained" -> topkPrunedMaint,
          "serve_topk_batch8" -> serveTopkBatch,
          "serve_topk_loop8" -> serveTopkLoop,
          "batch8_pruned_queries" -> batchPruned,
          "serve_topk_postrefresh" -> serveTopkPostRefresh,
          "topk_pruned_postrefresh" -> topkPrunedPostRefresh)
      }
    }

    // ---------------- no-compact op LADDER (VERDICT r12 #2): K
    // consecutive fixed-size maintenance ops with NO compact in
    // between. Seq allocation is one SeqSidecar JSON read per op, so
    // late ops must cost what early ops cost (ratio ≈ 1); before the
    // sidecar, every op re-scanned the mergeSchema-read tombstone dir
    // — O(K²) file opens across the window, a growing ratio.
    section("ladders") {
      val docs = Tables.load(spark, dirs.last, "documents")
        .select($"doc_id", $"text")
      val kOps = 32
      def ladder(family: String, op: Int => Unit): Unit = {
        val times = (0 until kOps).map(i => timed(op(i)))
        val h = kOps / 4
        val first = times.take(h).sum / h
        val last = times.takeRight(h).sum / h
        results += Map("family" -> (family + "_ladder"),
          "k_ops" -> kOps, "first_quarter_mean" -> first,
          "last_quarter_mean" -> last,
          "op_ratio" -> (last / first))
      }
      locally {
        val sig = DedupOps.minhashSignatures(
          docs.orderBy($"doc_id").limit(kOps * 32)
            .select($"doc_id", TextOps.shingleHashes($"text", 3).as("hashes")),
          "doc_id", "hashes", 16).localCheckpoint()
        val table = "graft_mb_lsh_ladder"
        BucketingOps.writeBucketed(
          DedupOps.lshBandKeyTable(sig, "doc_id", "sig", 4, 4),
          table, Seq("band", "bh"), nBuckets = 8)
        ladder("lsh", i => DedupOps.upsertIntoLshIndex(spark, table,
          sig.orderBy($"doc_id").limit(32)
            .select(($"doc_id" + (i + 1) * 1000000L).as("doc_id"), $"sig"),
          "doc_id", "sig", 4, 4, nBuckets = 8))
      }
      locally {
        val emb = Tables.load(spark, dirs.last, "embeddings")
          .select($"vec_id", $"embedding").localCheckpoint()
        val centers = Array.tabulate(8)(c =>
          Array.tabulate(64)(i => if (i == c * 8) 8.0 else 0.0))
        val codebooks = Array.tabulate(2)(sp => Array.tabulate(4)(c =>
          Array.tabulate(32)(i => ((sp * 31 + c * 7 + i) % 5 - 2).toDouble)))
        val dir = Files.createTempDirectory("graft_mb_ivf_ladder")
          .toString + "/idx"
        SimilarityOps.writeIvfPqIndex(
          SimilarityOps.ivfPqIndex(emb, "vec_id", "embedding",
            centers, codebooks), dir, "vec_id")
        ladder("ivfpq", i => SimilarityOps.upsertIntoIvfPqIndex(dir,
          emb.orderBy($"vec_id").limit(32)
            .select(($"vec_id" + (i + 1) * 1000000L).as("vec_id"),
              $"embedding"),
          "vec_id", "embedding", centers, codebooks))
      }
    }

    // ---------------- ANN recall DRIFT under frozen quantization
    // (VERDICT r12 #4): upsertIntoIvfPqIndex re-encodes with the
    // FROZEN centers/codebooks — correct by contract, but at CDC
    // timescales the corpus drifts away from the training distribution
    // and partial-probe recall decays SILENTLY (cells stop matching
    // the data's true clusters; codes lose resolution off-codebook).
    // Measure it: replace 0/25/50/100% of the vectors with a shifted
    // distribution through the maintenance path, then recall@10 of the
    // maintained stored probe vs brute force at FIXED nProbe. The
    // guidance these rows back: when drifted-traffic recall drops
    // below the product's floor (the 50%-churn row is the early
    // warning), re-train ON A REBUILD — never swap quantization under
    // a live layout (old codes become undecodable).
    section("drift") {
      // a CLUSTERED view of the embeddings table (the raw synthetic
      // vectors are isotropic — there is no structure for drift to
      // break, recall is flat by construction): 8 well-separated
      // cluster spikes keyed by id, the table's own floats as
      // intra-cluster noise. IVF earns its recall on exactly this
      // shape, so quantization staleness becomes measurable.
      val raw = Tables.load(spark, dirs.last, "embeddings")
        .select($"vec_id", $"embedding")
      val emb = raw.select($"vec_id",
        transform(sequence(lit(0), lit(63)), i =>
          (element_at($"embedding", i + 1) * lit(0.5f) +
            when(i === pmod($"vec_id", lit(8)).cast("int") * lit(8), lit(8.0f))
              .otherwise(lit(0.0f))).cast("float")).as("embedding"))
        .localCheckpoint()
      // quantization TRAINED on the un-drifted corpus (bounded driver
      // sample, the q37 discipline) — that's the point of the audit:
      // the training distribution is frozen at build time, the corpus
      // then drifts away from it through the maintenance path
      val sample = emb.orderBy($"vec_id").limit(512)
        .select($"embedding").collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      val centers = SimilarityOps.localLloyd(sample, k = 8,
        maxIter = 5, seed = 13L)
      val codebooks = SimilarityOps.trainPqCodebooks(sample, m = 8,
        k = 16, maxIter = 5, seed = 13L)
      // the drifted re-embedding: a dimension PERMUTATION (array
      // reverse). It preserves the drifted set's internal geometry
      // exactly (all pairwise dot products and norms survive a
      // permutation), so the true-neighbor structure is as findable as
      // the original — but the FROZEN cells/codebooks were trained on
      // the unpermuted axes and now mis-route it. That isolates the
      // quantization-staleness effect from task hardness: a retrain
      // on the drifted corpus MUST recover the baseline.
      def shifted(df: org.apache.spark.sql.DataFrame) =
        df.select($"vec_id", reverse($"embedding").as("embedding"))
      for (churnPct <- Seq(0, 25, 50, 100)) {
        val dir = Files.createTempDirectory(s"graft_mb_drift$churnPct")
          .toString + "/idx"
        SimilarityOps.writeIvfPqIndex(
          SimilarityOps.ivfPqIndex(emb, "vec_id", "embedding",
            centers, codebooks), dir, "vec_id")
        val churned = emb.filter(pmod($"vec_id", lit(100)) < churnPct)
        val n = churned.count()
        if (n > 0)
          SimilarityOps.upsertIntoIvfPqIndex(dir, shifted(churned),
            "vec_id", "embedding", centers, codebooks)
        // current corpus = churned rows shifted, rest original
        val corpus = emb.filter(pmod($"vec_id", lit(100)) >= churnPct)
          .unionByName(shifted(churned)).localCheckpoint()
        // query traffic TRACKS the corpus (the CDC reality: queries
        // come from the same drifting distribution as the documents):
        // 16 probes sampled from the CURRENT corpus, qids disjoint
        // from the corpus id space (bruteForceTopK excludes id==qid)
        val queries = corpus.orderBy($"vec_id").limit(16)
          .select(($"vec_id" - 1000000L).as("qid"),
            $"embedding".as("qv")).localCheckpoint()
        // the AUDITED face (VERDICT r13 #3): same served frame, plus
        // the sidecar-stats scan audit whose needsRetrain flag must
        // fire exactly where the measured drift does
        val (gotDf, gotAudit) = SimilarityOps.ivfPqTopKMultiStoredAudited(
          spark, dir, "vec_id", corpus, "vec_id", "embedding",
          queries, "qid", "qv", centers, codebooks,
          nProbe = 2, shortlist = 64, k = 10)
        val got = gotDf
          .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
        val want = SimilarityOps.bruteForceTopK(corpus, "vec_id",
            "embedding", queries, "qid", "qv", k = 10)
          .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
        val recall = (got intersect want).size.toDouble /
          math.max(1, want.size)
        // SCAN FRACTION — the second drift failure mode and the one
        // recall alone hides: drifted vectors are roughly equidistant
        // to every stale centroid, so they crowd into few cells (ties
        // to the lower id), and a probe there degenerates toward a
        // full-corpus ADC scan. avg over queries of |rows in the
        // query's probed cells| / |corpus|.
        val cellCounts = spark.read.parquet(dir)
          .groupBy($"cell".cast("int").as("c")).count()
          .as[(Int, Long)].collect().toMap
        val total = cellCounts.values.sum.toDouble
        val scanFrac = {
          val fr = queries.select($"qv").collect().map { r =>
            val q = r.getSeq[Float](0).map(_.toDouble).toArray
            SimilarityOps.ivfRoute(q, centers, 2)
              .map(c => cellCounts.getOrElse(c, 0L)).sum / total
          }
          fr.sum / fr.length
        }
        results += Map("family" -> "ivfpq_drift",
          "churn_pct" -> churnPct, "n_churned" -> n,
          "n_probe" -> 2, "recall_at_10" -> recall,
          "scan_frac" -> scanFrac,
          "audit_frac" -> gotAudit.map(_.probedRowFrac).getOrElse(-1.0),
          "audit_designed" ->
            gotAudit.map(_.designedFrac).getOrElse(-1.0),
          "audit_needs_retrain" ->
            gotAudit.exists(_.needsRetrain))
        // the prescribed remedy, proven: at full churn, RE-TRAIN the
        // quantization on the current corpus and REBUILD — recall must
        // recover to the un-drifted baseline's band
        if (churnPct == 100) {
          val sample2 = corpus.orderBy($"vec_id").limit(512)
            .select($"embedding").collect()
            .map(_.getSeq[Float](0).map(_.toDouble).toArray)
          val centers2 = SimilarityOps.localLloyd(sample2, k = 8,
            maxIter = 5, seed = 13L)
          val codebooks2 = SimilarityOps.trainPqCodebooks(sample2,
            m = 8, k = 16, maxIter = 5, seed = 13L)
          val dir2 = Files.createTempDirectory("graft_mb_drift_rt")
            .toString + "/idx"
          SimilarityOps.writeIvfPqIndex(
            SimilarityOps.ivfPqIndex(corpus, "vec_id", "embedding",
              centers2, codebooks2), dir2, "vec_id")
          val (got2Df, got2Audit) =
            SimilarityOps.ivfPqTopKMultiStoredAudited(spark, dir2,
              "vec_id", corpus, "vec_id", "embedding",
              queries, "qid", "qv", centers2, codebooks2,
              nProbe = 2, shortlist = 64, k = 10)
          val got2 = got2Df
            .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
          val recall2 = (got2 intersect want).size.toDouble /
            math.max(1, want.size)
          val cellCounts2 = spark.read.parquet(dir2)
            .groupBy($"cell".cast("int").as("c")).count()
            .as[(Int, Long)].collect().toMap
          val total2 = cellCounts2.values.sum.toDouble
          val scanFrac2 = {
            val fr = queries.select($"qv").collect().map { r =>
              val q = r.getSeq[Float](0).map(_.toDouble).toArray
              SimilarityOps.ivfRoute(q, centers2, 2)
                .map(c => cellCounts2.getOrElse(c, 0L)).sum / total2
            }
            fr.sum / fr.length
          }
          results += Map("family" -> "ivfpq_drift_retrained",
            "churn_pct" -> churnPct, "n_probe" -> 2,
            "recall_at_10" -> recall2, "scan_frac" -> scanFrac2,
            "audit_frac" ->
              got2Audit.map(_.probedRowFrac).getOrElse(-1.0),
            "audit_designed" ->
              got2Audit.map(_.designedFrac).getOrElse(-1.0),
            "audit_needs_retrain" ->
              got2Audit.exists(_.needsRetrain))
        }
      }
    }

    // ---------------- ANN serving DESIGN-POINT FRONTIER (VERDICT r14
    // #1): the drift audit's nProbe=2/nList=8 config is a toy point —
    // an operator serving ivfPqTopKStored picks the ONE knob that
    // trades recall against the 100 TB scan bill, and the repo
    // recorded no alternative. Sweep nList × nProbe × re-rank
    // shortlist over a 20k/80k/320k clustered-corpus ladder and record
    // (recall@10 vs brute force, probed-row fraction from the audit,
    // serve seconds) per design point. The recommended operating band
    // these rows back is stated in the ivfPqTopKStored scaladoc.
    section("frontier") {
      val raw = Tables.load(spark, dirs.last, "embeddings")
        .select($"vec_id", $"embedding")
      val baseN = raw.count()
      for (mult <- Seq(10, 40, 160)) {
        // clustered LOW-INTRINSIC-DIMENSION view at scale (replicas
        // get disjoint ids): 8 spike clusters plus a 6-dim noise
        // manifold — ONE noise dim per PQ subspace (dims 1, 9, 17,
        // 25, 33, 41; values are the base table's floats ×4, rotated
        // by id so replicas are distinct). Two fixture lessons are
        // baked in here, both MEASURED on rejected cuts: (a) 64-dim
        // isotropic noise concentrates pairwise distances, so recall
        // is ADC-resolution-bound and FLAT in nProbe (plateaued
        // 0.56-0.69 even at a 100% scan) — real corpora have low
        // intrinsic dimension; (b) a manifold packed into ONE
        // subspace collapses ADC's joint resolution to k codewords
        // TOTAL, so true neighbors drown in quantization ties and
        // recall FALLS as nProbe adds tie candidates past a fixed
        // shortlist — PQ's resolution is the product across
        // subspaces, which is the entire reason it works; the
        // fixture must spread signal the way trained/rotated real
        // embeddings do.
        // replica id stride 9,999,991 is ≢ 0 (mod 8) and (mod 64), so
        // replicas land in different clusters WITH different noise
        // rotations — a stride ≡ 0 (mod 64) made every replica an
        // exact duplicate and recall measured duplicate retrieval.
        // Vectors are NORMALIZED: the stored faces' ADC shortlist is
        // a dot-product stage serving a cosine ranking — faithful
        // exactly on unit-norm corpora (the standard embedding
        // practice, and the real embeddings table is unit-norm); on
        // an unnormalized fixture the shortlist systematically favors
        // large-norm rows and recall collapses with scale (measured
        // on a rejected cut of this fixture).
        val rawVec = transform(sequence(lit(0), lit(63)), i =>
          when(i === pmod($"vec_id", lit(8)).cast("int") * lit(8),
              lit(8.0d)).otherwise(lit(0.0d)) +
            when(pmod(i, lit(8)) === 1 && i <= 41,
              element_at($"embedding",
                pmod($"vec_id" + i.cast("long") * lit(7L),
                  lit(64L)).cast("int") + 1).cast("double") * lit(4.0d))
              .otherwise(lit(0.0d)))
        val corpus = (0 until mult).map(c =>
            raw.select(($"vec_id" + c * 9999991L).as("vec_id"),
              $"embedding"))
          .reduce(_ unionByName _)
          .select($"vec_id", rawVec.as("__v"))
          .select($"vec_id",
            transform($"__v", x => (x / sqrt(aggregate($"__v",
              lit(0.0d), (a, y) => a + y * y))).cast("float"))
              .as("embedding"))
          .repartition(32).localCheckpoint()
        val nVecs = mult * baseN
        // 16 probes drawn from the corpus distribution; qids strictly
        // negative so they can NEVER collide with a corpus id (the
        // brute-force referee excludes corpusId == queryId — a
        // colliding qid would silently drop a true candidate from the
        // referee only, skewing recall)
        val queries = corpus
          .orderBy(xxhash64($"vec_id", lit(7L)).asc, $"vec_id".asc)
          .limit(16)
          .select((-$"vec_id" - 1L).as("qid"),
            $"embedding".as("qv")).localCheckpoint()
        val want = SimilarityOps.bruteForceTopK(corpus, "vec_id",
            "embedding", queries, "qid", "qv", k = 10)
          .select($"qid", $"vec_id").as[(Long, Long)].collect()
          .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
        // 4096-row training sample (vs the maintenance rows' 512):
        // 256 codewords per subspace want ≥ ~16 samples each, and
        // the serving recommendation should not be bottlenecked on
        // an undertrained quantizer. Hoisted out of the nList ×
        // codebookK loops (ADVICE r15): it depends only on the
        // corpus — one driver collect per scale, not six
        val sample = corpus
          .orderBy(xxhash64($"vec_id", lit(13L)).asc, $"vec_id".asc)
          .limit(4096).select($"embedding").collect()
          .map(_.getSeq[Float](0).map(_.toDouble).toArray)
        for (nList <- Seq(8, 32, 128);
             codebookK <- Seq(64, 256)) {
          val centers = SimilarityOps.localLloyd(sample, k = nList,
            maxIter = 5, seed = 13L)
          // codebook resolution is the FOURTH knob (measured on a
          // rejected k=64-only cut: at 320k the recall ceiling was
          // 0.71 at ANY probe depth and shortlist — the ADC error
          // band's candidate count grows with corpus density until
          // code resolution, not routing, binds; k=256 is the remedy)
          val codebooks = SimilarityOps.trainPqCodebooks(sample, m = 8,
            k = codebookK, maxIter = 5, seed = 13L)
          val dir = Files.createTempDirectory(s"graft_mb_fr$mult")
            .toString + "/idx"
          val build = timed { SimilarityOps.writeIvfPqIndex(
            SimilarityOps.ivfPqIndex(corpus, "vec_id", "embedding",
              centers, codebooks), dir, "vec_id") }
          // shortlist spans 6×k to 100×k: the ADC error band's
          // candidate count GROWS with corpus density, so the
          // re-rank depth that saturates recall is scale-dependent —
          // exactly what an operator needs priced (see the frontier
          // scaladoc band on ivfPqTopKStored)
          for (nProbe <- Seq(1, 2, 4, 8, 16).filter(_ <= nList);
               shortlist <- Seq(64, 256, 1024)) {
            var audit: Option[SimilarityOps.IvfScanAudit] = None
            var got = Map.empty[Long, Set[Long]]
            val serve = Seq.fill(2)(timed {
              val (df, a) = SimilarityOps.ivfPqTopKMultiStoredAudited(
                spark, dir, "vec_id", corpus, "vec_id", "embedding",
                queries, "qid", "qv", centers, codebooks,
                nProbe, shortlist, k = 10)
              audit = a
              got = df.select($"qid", $"vec_id").as[(Long, Long)]
                .collect().groupBy(_._1)
                .map { case (q, a2) => q -> a2.map(_._2).toSet }
            }).min
            val recall = want.toSeq.map { case (q, w) =>
              (got.getOrElse(q, Set.empty) intersect w).size.toDouble /
                math.max(1, w.size)
            }.sum / want.size
            results += Map("family" -> "ivfpq_frontier",
              "n_vecs" -> nVecs, "n_list" -> nList,
              "codebook_k" -> codebookK,
              "n_probe" -> nProbe, "shortlist" -> shortlist,
              "build" -> build, "serve_sec" -> serve,
              "recall_at_10" -> recall,
              "probed_frac" ->
                audit.map(_.probedRowFrac).getOrElse(-1.0),
              "designed_frac" ->
                audit.map(_.designedFrac).getOrElse(-1.0))
          }
        }
      }
    }

    // ---------------- frontier EXTENSION into the band the r15
    // scaladoc prescribed but never measured (VERDICT r15 #1): the
    // r15 grid capped at nList=128 / shortlist=1024 while recommending
    // nList ≈ √N and shortlist ~100×k — at 320k no measured config
    // reached recall@10 ≥ 0.9, and recall INVERTED in nProbe at fixed
    // shortlist 1024 (0.888 → 0.863 at 2→4): more probing floods a
    // too-shallow ADC shortlist with near-tie candidates and pushes
    // true neighbors out BEFORE the exact re-rank — shortlist
    // CROWDING, not routing saturation. This sweep measures the
    // recommended region itself — nList 128..1024 × shortlist
    // 1024..25600 at the 320k rung plus a 1.28M rung — so the
    // operating band carries measured values only.
    section("frontierx") {
      val raw = Tables.load(spark, dirs.last, "embeddings")
        .select($"vec_id", $"embedding")
      val baseN = raw.count()
      for (mult <- Seq(160, 640)) {
        // the SAME clustered low-intrinsic-dimension fixture as the
        // r15 frontier (identical per-id vectors, so rows are
        // comparable across the two families), replicated via explode
        // instead of a mult-way union: at 640 replicas a union plan
        // is Catalyst-hostile; an explode is one projection
        val rawVec = transform(sequence(lit(0), lit(63)), i =>
          when(i === pmod($"vec_id", lit(8)).cast("int") * lit(8),
              lit(8.0d)).otherwise(lit(0.0d)) +
            when(pmod(i, lit(8)) === 1 && i <= 41,
              element_at($"embedding",
                pmod($"vec_id" + i.cast("long") * lit(7L),
                  lit(64L)).cast("int") + 1).cast("double") * lit(4.0d))
              .otherwise(lit(0.0d)))
        val corpus = raw
          .select($"vec_id".as("base_id"), $"embedding",
            explode(sequence(lit(0), lit(mult - 1))).as("__c"))
          .select(($"base_id" + $"__c".cast("long") * lit(9999991L))
            .as("vec_id"), $"embedding")
          .select($"vec_id", rawVec.as("__v"))
          .select($"vec_id",
            transform($"__v", x => (x / sqrt(aggregate($"__v",
              lit(0.0d), (a, y) => a + y * y))).cast("float"))
              .as("embedding"))
          .repartition(32).localCheckpoint()
        val nVecs = mult * baseN
        val queries = corpus
          .orderBy(xxhash64($"vec_id", lit(7L)).asc, $"vec_id".asc)
          .limit(16)
          .select((-$"vec_id" - 1L).as("qid"),
            $"embedding".as("qv")).localCheckpoint()
        val want = SimilarityOps.bruteForceTopK(corpus, "vec_id",
            "embedding", queries, "qid", "qv", k = 10)
          .select($"qid", $"vec_id").as[(Long, Long)].collect()
          .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
        for (nList <- Seq(128, 256, 512, 1024)) {
          // codebookK frozen at the r15 winner (256); the training
          // sample GROWS with nList so the router is never
          // undertrained (≥16 samples per routing centroid)
          val sampleN = math.max(4096, 16 * nList)
          val sample = corpus
            .orderBy(xxhash64($"vec_id", lit(13L)).asc, $"vec_id".asc)
            .limit(sampleN).select($"embedding").collect()
            .map(_.getSeq[Float](0).map(_.toDouble).toArray)
          val centers = SimilarityOps.localLloyd(sample, k = nList,
            maxIter = 5, seed = 13L)
          val codebooks = SimilarityOps.trainPqCodebooks(sample, m = 8,
            k = 256, maxIter = 5, seed = 13L)
          val dir = Files.createTempDirectory(s"graft_mb_frx$mult")
            .toString + "/idx"
          val build = timed { SimilarityOps.writeIvfPqIndex(
            SimilarityOps.ivfPqIndex(corpus, "vec_id", "embedding",
              centers, codebooks), dir, "vec_id") }
          for (nProbe <- Seq(2, 4, 8, 16);
               shortlist <- Seq(1024, 4096, 8192, 25600)) {
            var audit: Option[SimilarityOps.IvfScanAudit] = None
            var got = Map.empty[Long, Set[Long]]
            val serve = Seq.fill(2)(timed {
              val (df, a) = SimilarityOps.ivfPqTopKMultiStoredAudited(
                spark, dir, "vec_id", corpus, "vec_id", "embedding",
                queries, "qid", "qv", centers, codebooks,
                nProbe, shortlist, k = 10)
              audit = a
              got = df.select($"qid", $"vec_id").as[(Long, Long)]
                .collect().groupBy(_._1)
                .map { case (q, a2) => q -> a2.map(_._2).toSet }
            }).min
            val recall = want.toSeq.map { case (q, w) =>
              (got.getOrElse(q, Set.empty) intersect w).size.toDouble /
                math.max(1, w.size)
            }.sum / want.size
            results += Map("family" -> "ivfpq_frontier_ext",
              "n_vecs" -> nVecs, "n_list" -> nList,
              "codebook_k" -> 256,
              "n_probe" -> nProbe, "shortlist" -> shortlist,
              "build" -> build, "serve_sec" -> serve,
              "recall_at_10" -> recall,
              "probed_frac" ->
                audit.map(_.probedRowFrac).getOrElse(-1.0),
              "designed_frac" ->
                audit.map(_.designedFrac).getOrElse(-1.0))
          }
        }
      }
    }

    def j(v: Any): String = v match {
      case s: String => "\"" + s + "\""
      // Locale.ROOT: the f-interpolator honors the default locale, and
      // a comma-decimal locale would emit unparseable JSON
      case d: Double =>
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
      case x => x.toString
    }
    val json = results.map(_.map { case (k, v) => j(k) + ":" + j(v) }
      .mkString("{", ",", "}")).mkString("[", ",", "]")
    println(json)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_MAINT_OUT",
      "_index_maint.json")
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
  }
}
