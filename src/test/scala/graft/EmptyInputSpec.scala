package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Degenerate-input sweep: every pair-generating / iterative operator
  * must return an EMPTY (not failing, not null-row) result on empty
  * input — at 100 TB, per-partition emptiness is routine (a filter that
  * matched nothing upstream, an empty date partition), so operators are
  * exercised with zero rows constantly even when the corpus is huge.
  */
class EmptyInputSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val noDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val noVecs =
    Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")

  test("dedup family returns empty on an empty corpus") {
    assert(DedupOps.dropExactDuplicates(noDocs, "doc_id", "text")
      .count() === 0)
    val sh = noDocs.select($"doc_id",
      TextOps.shingleHashes($"text", 3).as("sh"))
    assert(DedupOps.sharedShingleCountsBounded(sh, "doc_id", "sh", 500)
      .count() === 0)
    assert(DedupOps.jaccardSimilarPairs(sh, "doc_id", "sh", 500)
      .count() === 0)
    val sig = DedupOps.minhashSignatures(sh, "doc_id", "sh", 8)
    assert(sig.count() === 0)
    assert(DedupOps.lshCandidatePairs(sig, "doc_id", "sig", 4, 2)
      .count() === 0)
  }

  test("connectedComponents and dropNearDuplicates handle empty graphs") {
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(GraphOps.connectedComponents(noPairs, "id_a", "id_b")
      .count() === 0)
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    // no pairs -> nothing is a duplicate -> everything survives
    assert(GraphOps.dropNearDuplicates(docs, "doc_id", noPairs)
      .count() === 2)
  }

  test("similarity family returns empty on an empty corpus or query set") {
    assert(SimilarityOps.lshNeighborPairs(
      noVecs, "vec_id", "embedding", nBits = 4, minCosMicro = 0,
      nTables = 2).count() === 0)
    val corpus = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val noQueries = Seq.empty[(Long, Seq[Float])].toDF("query_id", "qvec")
    assert(SimilarityOps.bruteForceTopK(
      corpus, "vec_id", "embedding", noQueries, "query_id", "qvec",
      k = 3).count() === 0)
  }

  test("PostingIndex on an empty corpus: builds, scores empty with the " +
       "full schema, reopens") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pidx_empty").toString
    val idx = graft.movies.PostingIndex.buildTokenized(
      noDocs, dir, tokens = Map("text" -> split(col("text"), "\\s+")),
      weights = Map("text" -> 1), idCol = "doc_id",
      nTermBuckets = 4, nDocBuckets = 4)
    val out = idx.scoreTerms(Seq("anything"))
    assert(out.columns.toSeq === Seq("doc_id", "text", "score"))
    assert(out.count() === 0)
    val re = graft.movies.PostingIndex.open(spark, dir)
    assert(re.scoreTerms(Seq("x")).count() === 0)
  }

  test("curation family: empty input and all-duplicate input") {
    assert(CurationOps.dedupParagraphsGlobal(noDocs, "doc_id", "text")
      .count() === 0)
    assert(CurationOps.evalOverlap(
      noDocs, "doc_id", "text", noDocs, "text", 3).count() === 0)
    assert(CurationOps.stratifiedSample(
      noDocs, "doc_id", "text", "s", Map("en" -> 500)).count() === 0)
    // text shorter than the shingle width -> zero shingles, no pairs
    val tiny = Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text")
    val sh = tiny.select($"doc_id",
      TextOps.shingleHashes($"text", 3).as("sh"))
    assert(DedupOps.sharedShingleCountsBounded(sh, "doc_id", "sh", 500)
      .count() === 0)
  }

  test("round-4 ops: empty corpora/graphs/query sets degrade to empty") {
    // pageRank: empty edge set -> empty ranks, no divide-by-zero on N
    val noEdges = Seq.empty[(String, String)].toDF("src", "dst")
    assert(GraphOps.pageRank(noEdges, "src", "dst", iters = 3)
      .count() === 0)
    // chunking / tf-idf / rarity / mixture over an empty corpus
    assert(TextOps.chunkDocs(noDocs, "doc_id", "text", 32, 8)
      .count() === 0)
    assert(TextOps.tfIdfTopTerms(noDocs, "doc_id", "text", 5)
      .count() === 0)
    assert(CurationOps.rarityScorePpm(noDocs, "doc_id", "text")
      .count() === 0)
    assert(CurationOps.mixtureSample(
      noDocs, "doc_id", "text", Map("en" -> 500000L), 10L, "s")
      .count() === 0)
    // BPE learning on an empty corpus: zero merges, no error
    assert(BpeOps.learnMerges(noDocs, "text", 5) === Seq.empty)
    // quantized ANN with an empty query set / empty corpus
    val corpus = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val noQ = Seq.empty[(Long, Seq[Float])].toDF("query_id", "qvec")
    assert(SimilarityOps.quantizedTopK(
      corpus, "vec_id", "embedding", noQ, "query_id", "qvec", 3)
      .count() === 0)
    assert(SimilarityOps.quantizedTopK(
      noVecs, "vec_id", "embedding",
      corpus.select($"vec_id".as("query_id"), $"embedding".as("qvec")),
      "query_id", "qvec", 3).count() === 0)
    // validation on an empty table: checks run, totals are zero, pass
    val emptyOrders = Seq.empty[(Long, Double)].toDF("k", "price")
    val rep = ValidationOps.runChecks(emptyOrders,
      Seq("k_not_null" -> ValidationOps.notNull($"k"))).collect().head
    assert(rep.getLong(1) === 0L && rep.getLong(2) === 0L &&
      rep.getBoolean(3))
  }

  test("round-5 ops: empty inputs degrade to empty, not errors") {
    // star CC on an empty graph: converges immediately, empty labels
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(GraphOps.connectedComponentsStar(noPairs, "id_a", "id_b")
      .count() === 0)
    // self-loop-only graph: no inter-node edges, empty labels
    assert(GraphOps.connectedComponentsStar(
      Seq((3L, 3L)).toDF("id_a", "id_b"), "id_a", "id_b").count() === 0)
    // convergence-probed PageRank on an empty graph
    val noEdges = Seq.empty[(String, String)].toDF("src", "dst")
    assert(GraphOps.pageRankConverged(noEdges, "src", "dst",
      tolerance = 0L).count() === 0)
    // local BPE training on an empty corpus: zero merges
    assert(BpeOps.learnMergesLocal(noDocs, "text", 5) === Seq.empty)
    // trie encoder on an empty frame and an empty merge list
    assert(BpeOps.encodeWithMerges(
      noDocs.select($"text".as("word")), "word", Seq.empty).count() === 0)
    val pieces = BpeOps.encodeWithMerges(
      Seq("ab").toDF("word"), "word", Seq.empty)
      .head.getSeq[String](1)
    assert(pieces === Seq("a", "b"))
    // SearchIndex over an empty corpus: build succeeds, queries empty
    val emptyDocs = Seq.empty[(String, String, String, Double,
        Seq[String], Seq[String], Seq[String], Seq[String])]
      .toDF("id", "title", "description", "imdb_rating",
        "genres_names", "actors_names", "writers_names", "directors_names")
    val idx = graft.movies.SearchIndex.build(emptyDocs)
    assert(idx.score("anything").count() === 0)
    assert(idx.search(None).count() === 0)
    // bounded LSH helpers with a sub-2 cap are rejected loudly
    val sig = DedupOps.minhashSignatures(
      noDocs.select($"doc_id", TextOps.shingleHashes($"text", 3).as("sh")),
      "doc_id", "sh", 8)
    intercept[IllegalArgumentException] {
      DedupOps.lshCandidatePairs(sig, "doc_id", "sig", 4, 2, maxBucket = 1)
        .count()
    }
  }

  test("round-5 model/curation ops return empty (or all-zero) on " +
       "empty input") {
    // bigram LM: empty corpus -> empty model, empty scores, vocab 0
    val model = LmOps.bigramModel(noDocs, "doc_id", "text")
    assert(model.count() === 0)
    assert(LmOps.scoreByBigramLm(noDocs, "doc_id", "text", model,
      LmOps.vocabSize(noDocs, "text")).count() === 0)
    // classifier: empty frame in, empty frame out
    assert(ClassifierOps.classify(noDocs, "doc_id", "text",
      ClassifierOps.knuthWeights(64), 0L, "e1").count() === 0)
    // bloom: empty build side -> all-zero filter that matches nothing
    val bloom = SketchOps.bloomBuild(
      noDocs.select($"doc_id"), "doc_id", 256, 3, "e2")
    assert(bloom.forall(_ === 0L))
    assert(Seq(1L, 2L).toDF("doc_id")
      .filter(SketchOps.bloomMightContain($"doc_id", bloom, 3, "e2"))
      .count() === 0)
    // snapshot diff: both empty -> empty; one empty -> all added/removed
    assert(SnapshotOps.diffStatus(noDocs, noDocs,
      Seq("doc_id"), Seq("text")).count() === 0)
    val one = Seq((1L, "x")).toDF("doc_id", "text")
    assert(SnapshotOps.diffStatus(noDocs, one, Seq("doc_id"), Seq("text"))
      .select($"status").as[String].collect().toSeq === Seq("added"))
    // sampling/upsampling/batching: empty in, empty out
    assert(CurationOps.prioritySample(
      noDocs.withColumn("w", lit(1L)), "doc_id", "w", "e3", 5).count() === 0)
    assert(CurationOps.upsampleMixture(noDocs, "doc_id", "text",
      Map("x" -> 1000000L), "e4").count() === 0)
    assert(IdOps.bucketedBatches(
      noDocs.withColumn("len", lit(1L)), "len", "doc_id", 32L, 8L,
      "bucket", "batch").count() === 0)
    // DSIR: empty target AND source -> empty ratio table, zero scores
    val ratios = CurationOps.importanceRatios(noDocs, noDocs, "text", 64, "e5")
    assert(ratios.count() === 0)
    assert(CurationOps.dsirScore(one, "doc_id", "text", ratios, 64, "e5")
      .select($"score_micro").as[Long].head() === 0L)
  }

  test("round-6 ops degrade on empty input: quantile sketch, A-ES " +
       "sample, IVF-PQ serving over an empty index") {
    import graft.ops.{CurationOps, SimilarityOps, SketchOps}
    val noRows = Seq.empty[(Long, Long)].toDF("id", "v")
    // quantile sketch: empty in, empty out; merge of empties is empty;
    // estimates over an empty sketch are empty (no rank exists)
    val sk = SketchOps.quantileSketch(noRows, "id", "v", 16, "e6")
    assert(sk.count() === 0)
    assert(SketchOps.mergeQuantileSketches(sk, sk, "v", 16).count() === 0)
    assert(SketchOps.quantileEstimates(sk, "v", Seq(500000L)).count() === 0)
    // A-ES sample: empty in, empty out
    assert(CurationOps.weightedSampleAes(
      noRows.withColumn("w", lit(1L)), "id", "w", "e7", 5).count() === 0)
    // IVF-PQ: an empty index serves an empty result (route still works)
    val centers = Array.tabulate(2)(c =>
      Array.tabulate(4)(i => if (i == c * 2) 4.0 else 0.0))
    val codebooks = Array.tabulate(2)(sp => Array.tabulate(2)(c =>
      Array.tabulate(2)(i => (sp + c + i).toDouble)))
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("id", "vec")
    val emptyIdx = SimilarityOps.ivfPqIndex(
      noVecs, "id", "vec", centers, codebooks)
    assert(emptyIdx.count() === 0)
    assert(SimilarityOps.ivfPqTopK(
      emptyIdx, "id", noVecs, "id", "vec",
      Array(1.0, 0.0, 0.0, 0.0), centers, codebooks,
      nProbe = 1, shortlist = 5, k = 5).count() === 0)
  }

  test("round-7 ops degrade on empty input: grouped count-min, profile, " +
       "containment pairs, linkage scoring, PMI") {
    import graft.ops.LinkageOps.FieldRule
    val noTerms = Seq.empty[(String, String)].toDF("lang", "term")
    val sk = SketchOps.countMinSketchGrouped(
      noTerms, Seq("lang"), "term", 2, 8, "e7g")
    assert(sk.count() === 0)
    assert(SketchOps.mergeCountMinSketchesGrouped(sk, sk, Seq("lang"))
      .count() === 0)
    assert(SketchOps.countMinEstimateGrouped(
      sk, Seq(("en", "x")).toDF("lang", "term"), Seq("lang"),
      "term", 2, 8, "e7g").collect().map(_.getLong(2)).toSeq === Seq(0L))
    // profile of zero rows is empty (the family contract: empty in,
    // empty out — no group keys exist to hang zero-count rows on)
    assert(ProfileOps.profile(
      Seq.empty[(Long, String)].toDF("id", "v"), Seq("id", "v"))
      .count() === 0)
    val noSh = Seq.empty[(Long, Seq[Long])].toDF("doc_id", "hashes")
    assert(DedupOps.containmentPairs(noSh, "doc_id", "hashes", 500)
      .count() === 0)
    val noPairs = Seq.empty[(String, String)].toDF("a_f", "b_f")
    assert(LinkageOps.fellegiSunterScore(noPairs,
      Seq(FieldRule("f", "a_f", "b_f", 0, 1000L, -1000L)),
      500L, -500L).count() === 0)
    assert(LmOps.pmiBigrams(noDocs, "doc_id", "text", 1L).count() === 0)
  }

  test("round-7 batch-2 operators return empty (or all-kept) on empty " +
       "inputs") {
    val noFeats = Seq.empty[(Long, Seq[Long])].toDF("id", "feats")
    assert(DedupOps.weightedJaccardPairs(noFeats, "id", "feats", 500)
      .count() === 0)
    assert(DedupOps.sparseCosinePairs(noFeats, "id", "feats", 490000)
      .count() === 0)
    val noEvents =
      Seq.empty[(Long, Long, String)].toDF("user_id", "tu", "event_type")
    assert(FunnelOps.funnel(noEvents, "user_id", "tu", "event_type",
      Seq("view", "click"), 1000L).count() === 0)
    val noTsEvents = Seq.empty[(Long, java.sql.Timestamp, String)]
      .toDF("user_id", "ts", "event_type")
    assert(FunnelOps.cohortRetention(noTsEvents, "user_id", "ts", "day",
      Some(col("event_type") === "purchase")).count() === 0)
    val noEdges = Seq.empty[(String, String)].toDF("src", "dst")
    assert(GraphOps.hits(noEdges, "src", "dst", rounds = 2).count() === 0)
    // blocklist: empty docs → empty; empty BLOCKLIST → every doc kept
    val bl = Seq("bad").toDF("term")
    assert(CurationOps.blocklistFilter(noDocs, "doc_id", "text",
      bl, "term", 100L).count() === 0)
    val docs = Seq((1L, "all clean")).toDF("doc_id", "text")
    val keptAll = CurationOps.blocklistFilter(docs, "doc_id", "text",
      Seq.empty[String].toDF("term"), "term", 0L)
    assert(keptAll.filter(col("kept")).count() === 1)
    assert(CurationOps.robustClip(
      Seq.empty[(String, Long)].toDF("g", "v"), "g", "v").count() === 0)
    val noBaskets = Seq.empty[(Long, Long)].toDF("b", "i")
    assert(AssocOps.itemLift(noBaskets, "b", "i", minCo = 1).count() === 0)
    assert(GraphOps.labelPropagation(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b", 2).count() === 0)
    assert(SearchOps.phraseMatches(noDocs, "doc_id", "text",
      Seq("a", "b"), 2).count() === 0)
    assert(SearchOps.symspellMatches(
      Seq.empty[String].toDF("term"), "term",
      Seq("q").toDF("query"), "query").count() === 0)
  }

  test("round-7 batch-3 operators degrade on empty input") {
    import graft.ops.{EvalOps, SeriesOps, TemporalOps}
    val noSeries = Seq.empty[(String, Long, Long)].toDF("s", "p", "x")
    assert(SeriesOps.olsTrend(noSeries, "s", "p", "x").count() === 0)
    assert(SeriesOps.theilSenSlope(noSeries, "s", "p", "x")
      .count() === 0)
    val noStates = Seq.empty[(Long, Long, Long, String)]
      .toDF("k", "t", "id", "st")
    assert(SeriesOps.transitionMatrix(noStates, "k", "t", "id", "st")
      .count() === 0)
    assert(TemporalOps.intervalUnion(
      Seq.empty[(String, Long, Long)].toDF("k", "s", "e"),
      "k", "s", "e").count() === 0)
    val noScores = Seq.empty[(Long, Boolean)].toDF("score", "label")
    assert(EvalOps.prCurve(noScores, "score", "label").count() === 0)
    assert(EvalOps.ndcgAtK(
      Seq.empty[(String, Long, Long, Long)].toDF("g", "sc", "rel", "id"),
      "g", "sc", "rel", "id", 5).count() === 0)
    assert(EvalOps.chiSquareIndependence(
      Seq.empty[(String, String)].toDF("a", "b"), "a", "b")
      .count() === 0)
    assert(GraphOps.weightedSeedDistances(
      Seq.empty[(Long, Long, Long)].toDF("a", "b", "w"), "a", "b", "w",
      Seq(1L).toDF("s"), "s", 2).count() === 1) // the seed itself
  }

  test("round-8 operators degrade on empty input") {
    import graft.ops.{CurationOps, IdOps, SimilarityOps}
    val noEdges = Seq.empty[(String, String)].toDF("o", "p")
    assert(GraphOps.bipartiteLinkScores(noEdges, "o", "p").count() === 0)
    val noDocs = Seq.empty[(Long, String)].toDF("id", "t")
    assert(CurationOps.gopherQualityFlags(noDocs, "id", "t")
      .count() === 0)
    assert(CurationOps.repetitionStats(noDocs, "id", "t").count() === 0)
    assert(CurationOps.temperatureMixtureSample(
      Seq.empty[(Long, String)].toDF("id", "cls"), "id", "cls",
      100L, "s").count() === 0)
    val noCand = Seq.empty[(Long, Array[Float], Long)]
      .toDF("id", "emb", "rel")
    assert(SimilarityOps.mmrTopK(noCand, "id", "emb", "rel",
      k = 3, lambdaPpm = 500000L).count() === 0)
    assert(IdOps.prefixMaxes(
      Seq.empty[(Long, Long)].toDF("k", "v"), Seq("v"), Seq("m"),
      inclusive = false, "k").count() === 0)
  }

  test("round-8 batch-2 operators degrade on empty input") {
    import graft.ops.{ClassifierOps, SearchOps, SeriesOps, SimilarityOps}
    val noDocs = Seq.empty[(Long, String, String)]
      .toDF("id", "text", "lang")
    val m = ClassifierOps.nbTrain(noDocs, "text", "lang")
    assert(m.tokenLogs.count() === 0 && m.classStats.count() === 0)
    assert(ClassifierOps.nbPredict(
      noDocs.select($"id", $"text"), "id", "text", m).count() === 0)
    val noRank = Seq.empty[(Long, Long, Long)].toDF("q", "id", "r")
    assert(SearchOps.rrfFuse(Seq(noRank), "q", "id", "r").count() === 0)
    val noPts = Seq.empty[(Long, Array[Float], Long)]
      .toDF("id", "emb", "cl")
    assert(SimilarityOps.simplifiedSilhouette(
      noPts, "id", "emb", "cl").count() === 0)
    val noTrans = Seq.empty[(String, String, Long)].toDF("f", "t", "p")
    assert(SeriesOps.stationaryDistribution(
      noTrans, "f", "t", "p", 2).count() === 0)
    assert(graft.ops.BpeOps.wordPieceEncode(
      Seq.empty[(Long, String)].toDF("id", "text"), "id", "text",
      Seq("a" -> 1L), maxPiece = 1).count() === 0)
  }

  test("round-8 batch-3 operators degrade on empty input") {
    import graft.ops.{EvalOps, GraphOps, SimilarityOps}
    val noScores = Seq.empty[(Long, Boolean)].toDF("p", "y")
    assert(EvalOps.calibrationBins(noScores, "p", "y").count() === 0)
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("id", "emb")
    assert(SimilarityOps.embeddingCovariance(noVecs, "emb")
      .count() === 0)
    val noPairs = Seq.empty[(Long, Long)].toDF("a", "b")
    val noLbl = Seq.empty[(Long, Long)].toDF("id", "c")
    assert(GraphOps.modularity(noPairs, "a", "b", noLbl, "id", "c")
      .count() === 0)
    assert(SimilarityOps.bitextMutualPairs(
      noVecs.select($"id".as("lid"), $"emb"), "lid", "emb",
      noVecs.select($"id".as("rid"), $"emb"), "rid", "emb",
      k = 2).count() === 0)
    // identical id column names would make the output ambiguous —
    // the op must fail fast, not return a two-same-name frame
    intercept[IllegalArgumentException] {
      SimilarityOps.bitextMutualPairs(
        noVecs, "id", "emb", noVecs, "id", "emb", k = 2)
    }
  }
}
