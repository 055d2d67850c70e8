package graft

import org.apache.spark.sql.functions._

/** Model-application + corpus-maintenance ops added in round 5:
  * bigram-LM scoring (LmOps), hashed linear classifier (ClassifierOps),
  * bloom-pruned joins (SketchOps.bloom*), snapshot diff (SnapshotOps).
  * The conformance gates (q123–q126) hash-check values against DuckDB;
  * these tests pin the semantic properties the gates can't see —
  * no-false-negative guarantees, pruning effectiveness, referee
  * equivalence on hand-computable fixtures.
  */
class ModelOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------------------- LM

  test("bigram LM: hand-computed smoothed probabilities on a tiny " +
       "corpus (referee equivalence)") {
    import graft.ops.LmOps
    // corpus: "a b a b" and "a b c". bigrams: (a,b)x3, (b,a)x1, (b,c)x1.
    // contexts: a->3, b->2. vocab = {a,b,c} = 3.
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val model = LmOps.bigramModel(docs, "doc_id", "text")
    val got = LmOps.scoreByBigramLm(docs, "doc_id", "text", model,
        LmOps.vocabSize(docs, "text"))
      .orderBy($"doc_id")
      .as[(Long, Long, Long)].collect()
    // p(ab) = 1e6*(3+1)/(3+3) = 666666; p(ba) = 1e6*(1+1)/(2+3) = 400000
    // p(bc) = 1e6*(1+1)/(2+3) = 400000
    // doc1: (666666 + 400000 + 666666) / 3 = 577777
    // doc2: (666666 + 400000) / 2 = 533333
    assert(got.toSeq === Seq((1L, 3L, 577777L), (2L, 2L, 533333L)))
  }

  test("bigram LM: docs shorter than two tokens score 0 and survive " +
       "(no dropped rows)") {
    import graft.ops.LmOps
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val got = LmOps.scoreByBigramLm(docs, "doc_id", "text",
        LmOps.bigramModel(docs, "doc_id", "text"),
        LmOps.vocabSize(docs, "text"))
      .orderBy($"doc_id").as[(Long, Long, Long)].collect()
    assert(got.length === 3)
    assert(got(0) === ((1L, 0L, 0L)) && got(1) === ((2L, 0L, 0L)))
    assert(got(2)._2 === 1L && got(2)._3 > 0L)
  }

  test("bigram LM: unseen bigrams back off to uniform 1e6/(0+V) " +
       "instead of failing") {
    import graft.ops.LmOps
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text") // V = 2
    val eval = Seq((9L, "q z")).toDF("doc_id", "text")
    val got = LmOps.scoreByBigramLm(eval, "doc_id", "text",
        LmOps.bigramModel(train, "doc_id", "text"),
        LmOps.vocabSize(train, "text"))
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq === Seq((9L, 1L, 500000L))) // 1e6*1/(0+2)
  }

  test("bigram LM: unseen bigram with a SEEN head takes the true " +
       "Laplace value 1e6/(c(w1)+V), not the uniform floor") {
    import graft.ops.LmOps
    // train "a b a b": c(a,b)=2, c(b,a)=1; contexts a->2, b->1; V=2.
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val eval = Seq((9L, "a z")).toDF("doc_id", "text")
    val got = LmOps.scoreByBigramLm(eval, "doc_id", "text",
        LmOps.bigramModel(train, "doc_id", "text"),
        LmOps.vocabSize(train, "text"))
      .as[(Long, Long, Long)].collect()
    // (a,z) unseen but a IS a model context: 1e6*(0+1)/(2+2) = 250000
    // (a denormalized-model-only join would have given 1e6/(0+2)=500000)
    assert(got.toSeq === Seq((9L, 1L, 250000L)))
  }

  test("bigram PMI: hand-checked Q20 values on a tiny corpus, " +
       "minCount prunes, partitioning-invariant") {
    import graft.ops.LmOps
    // corpus "a b a b c a b": tokens a×3 b×3 c×1, Nt=7; bigrams
    // (a,b)×3 (b,a)×1 (b,c)×1 (c,a)×1, Nb=6
    val docs = Seq((1L, "a b a b c a b")).toDF("doc_id", "text")
    def ref(v: Long): Long = {
      val p = 63 - java.lang.Long.numberOfLeadingZeros(v)
      var y = if (p <= 30) v << (30 - p) else v >> (p - 30)
      var acc = 0L
      for (_ <- 1 to 20) {
        val y2 = (y * y) >> 30
        if (y2 >= (1L << 31)) { y = y2 / 2; acc = acc * 2 + 1 }
        else { y = y2; acc = acc * 2 }
      }
      p.toLong * (1L << 20) + acc
    }
    def pmi(cb: Long, c1: Long, c2: Long) =
      ref(cb) + 2 * ref(7L) - ref(6L) - ref(c1) - ref(c2)
    val got = LmOps.pmiBigrams(docs, "doc_id", "text", minCount = 1L)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.keys.toSet ===
      Set(("a", "b"), ("b", "a"), ("b", "c"), ("c", "a")))
    assert(got(("a", "b")) === (("a", "b", 3L, 3L, 3L, pmi(3, 3, 3))))
    assert(got(("b", "c")) === (("b", "c", 1L, 3L, 1L, pmi(1, 3, 1))))
    // minCount prunes BEFORE scoring
    val pruned = LmOps.pmiBigrams(docs, "doc_id", "text", minCount = 2L)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(pruned.map(r => (r._1, r._2)).toSet === Set(("a", "b")))
    // partitioning never changes a deterministic integer result
    val re = LmOps.pmiBigrams(docs.repartition(5), "doc_id", "text", 1L)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(re === got.values.toSet)
  }

  test("bigram LM: sharded training merges exactly — " +
       "merge(model(A), model(B)) == model(A ++ B)") {
    import graft.ops.LmOps
    val a = Seq((1L, "a b a b"), (2L, "b c d")).toDF("doc_id", "text")
    val b = Seq((3L, "a b c"), (4L, "c d c")).toDF("doc_id", "text")
    val merged = LmOps.mergeBigramModels(
        LmOps.bigramModel(a, "doc_id", "text"),
        LmOps.bigramModel(b, "doc_id", "text"))
      .as[(String, String, Long, Long)].collect().toSet
    val direct = LmOps.bigramModel(a.unionByName(b), "doc_id", "text")
      .as[(String, String, Long, Long)].collect().toSet
    assert(merged === direct)
  }

  // -------------------------------------------------------- classifier

  test("hashed linear classifier: score equals brute-force driver " +
       "replay of the same hash/weights (referee equivalence)") {
    import graft.ops.ClassifierOps
    val dim = 64
    val w = ClassifierOps.knuthWeights(dim)
    val docs = Seq((1L, "the quick brown fox"), (2L, "lazy dog"),
      (3L, "")).toDF("doc_id", "text")
    val got = ClassifierOps.classify(docs, "doc_id", "text", w, 100L, "t1")
      .orderBy($"doc_id")
      .select($"doc_id", $"n_feats", $"score_micro").as[(Long, Long, Long)]
      .collect()
    def polyHash(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    def score(text: String): (Long, Long) = {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      (toks.length.toLong,
        100L + toks.map(t => w((polyHash(t + ":t1") % dim).toInt)).sum)
    }
    got.foreach { case (id, n, s) =>
      val text = Map(1L -> "the quick brown fox", 2L -> "lazy dog", 3L -> "")(id)
      assert((n, s) === score(text), s"doc $id")
    }
  }

  test("hashed linear classifier: NULL text degrades to the bias " +
       "(n_feats 0, no NULL/-1 leakage)") {
    import graft.ops.ClassifierOps
    val w = ClassifierOps.knuthWeights(64)
    val docs = Seq((1L, Option("a b")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = ClassifierOps.classify(docs, "doc_id", "text", w, 7L, "nz")
      .orderBy($"doc_id")
      .select($"doc_id", $"n_feats", $"score_micro", $"label")
      .as[(Long, Long, Long, Long)].collect()
    assert(got(1) === ((2L, 0L, 7L, 1L)), "NULL doc must score the bias")
    assert(got(0)._2 === 2L)
  }

  test("hashed linear classifier: stacked salts decorrelate (same doc, " +
       "different feature namespaces give different scores)") {
    import graft.ops.ClassifierOps
    val w = ClassifierOps.knuthWeights(1024)
    val docs = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val s1 = ClassifierOps.classify(docs, "doc_id", "text", w, 0L, "saltA")
      .select($"score_micro").as[Long].head()
    val s2 = ClassifierOps.classify(docs, "doc_id", "text", w, 0L, "saltB")
      .select($"score_micro").as[Long].head()
    assert(s1 !== s2)
  }

  // ------------------------------------------------------------- bloom

  test("bloom filter: zero false negatives on every inserted key, and " +
       "FP rate on disjoint probes stays near theory") {
    import graft.ops.SketchOps
    val keys = (0L until 2000L).map(k => s"key$k").toDF("k")
    val bloom = SketchOps.bloomBuild(keys, "k", 1 << 15, 3, "bt")
    val probesIn = keys
    val inHits = probesIn
      .filter(SketchOps.bloomMightContain($"k", bloom, 3, "bt")).count()
    assert(inHits === 2000L, "false negative — must be impossible")
    val probesOut = (0L until 10000L).map(k => s"other$k").toDF("k")
    val fpHits = probesOut
      .filter(SketchOps.bloomMightContain($"k", bloom, 3, "bt")).count()
    // m/n = 16.4 bits/key, k=3 => theoretical FP ~ 0.55%; allow 4x.
    assert(fpHits < 220L, s"FP rate too high: $fpHits/10000")
  }

  test("bloom filters merge algebraically: OR of per-shard filters " +
       "equals the filter of the union") {
    import graft.ops.SketchOps
    val a = (0L until 500L).map(k => s"s$k").toDF("k")
    val b = (400L until 900L).map(k => s"s$k").toDF("k")
    val merged = SketchOps.bloomMerge(
      SketchOps.bloomBuild(a, "k", 1 << 12, 3, "bm"),
      SketchOps.bloomBuild(b, "k", 1 << 12, 3, "bm"))
    val direct = SketchOps.bloomBuild(a.unionByName(b), "k", 1 << 12, 3, "bm")
    assert(merged.toSeq === direct.toSeq)
  }

  test("bloom-pruned join == plain join on testdata (pruning is " +
       "semantically transparent), and the filter actually prunes") {
    import graft.ops.SketchOps
    val orders = Tables.load(spark, sfDir, "orders")
    val dim = Tables.load(spark, sfDir, "customer")
      .filter($"c_acctbal" > 9000)
    val bloom = SketchOps.bloomBuild(
      dim.select($"c_custkey"), "c_custkey", 1 << 14, 3, "bj")
    val pruned = orders
      .filter(SketchOps.bloomMightContain($"o_custkey", bloom, 3, "bj"))
    val got = pruned.join(dim, $"o_custkey" === $"c_custkey").count()
    val want = orders.join(dim, $"o_custkey" === $"c_custkey").count()
    assert(got === want)
    // the pruned fact stream must be a small superset of true matches
    val total = orders.count()
    val kept = pruned.count()
    assert(kept < total / 2, s"filter kept $kept of $total — not pruning")
    assert(kept >= want, "pruned stream lost a true match")
  }

  // ----------------------------------------------------- snapshot diff

  test("snapshot diff: added/removed/changed/unchanged classification " +
       "on a hand-built pair of snapshots, null-safe content") {
    import graft.ops.SnapshotOps
    val oldSnap = Seq(
      (1L, Option("a")), (2L, Option("b")), (3L, Option("c")),
      (4L, None)).toDF("id", "body")
    val newSnap = Seq(
      (2L, Option("b")), (3L, Option("CHANGED")), (4L, Option("")),
      (5L, Option("new"))).toDF("id", "body")
    val got = SnapshotOps
      .diffStatus(oldSnap, newSnap, Seq("id"), Seq("body"))
      .orderBy($"id").as[(Long, String)].collect().toSeq
    assert(got === Seq(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "changed", // NULL -> "" must read as changed, not unchanged
      5L -> "added"))
  }

  test("snapshot diff: identical snapshots are all-unchanged (hash " +
       "compare introduces no spurious deltas at sf0.001)") {
    import graft.ops.SnapshotOps
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"lang")
    val statuses = SnapshotOps
      .diffStatus(docs, docs, Seq("doc_id"), Seq("text", "lang"))
      .groupBy($"status").count().as[(String, Long)].collect().toMap
    assert(statuses.keySet === Set("unchanged"))
    assert(statuses("unchanged") === docs.count())
  }

  test("skipgramCounts: hand-counted window pairs; window=1 ≡ " +
       "canonicalized bigrams; self-pairs from repeats; " +
       "partitioning-invariant") {
    import graft.ops.LmOps
    // "a b c a": window 2 position pairs (1,2)(1,3)(2,3)(2,4)(3,4) →
    // tokens ab ac bc ba ca → canonical ab:2 ac:1 bc:1 ac:1 → and
    // (1,3)=ac, (2,4)=ba→ab, (3,4)=ca→ac: ab 2, ac 2, bc 1
    val docs = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val w2 = LmOps.skipgramCounts(docs, "doc_id", "text", window = 2)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(w2 === Map(("a", "b") -> 2L, ("a", "c") -> 2L,
      ("b", "c") -> 1L))
    // window=1 is exactly the adjacent-bigram multiset, canonicalized
    val big = LmOps.bigrams(docs, "doc_id", "text")
      .select(least($"w1", $"w2").as("a"), greatest($"w1", $"w2").as("b"))
      .groupBy($"a", $"b").count()
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val w1 = LmOps.skipgramCounts(docs, "doc_id", "text", window = 1)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(w1 === big)
    // repeated token inside the window → genuine self-pair
    val rep = LmOps.skipgramCounts(
        Seq((1L, "x y x")).toDF("doc_id", "text"), "doc_id", "text", 2)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(rep(("x", "x")) === 1L && rep(("x", "y")) === 2L)
    // pairs never cross documents; partitioning-invariant
    val two = Seq((1L, "p q"), (2L, "q r")).toDF("doc_id", "text")
    Seq(1, 5).foreach { p =>
      val got = LmOps.skipgramCounts(two.repartition(p),
          "doc_id", "text", 3)
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got === Map(("p", "q") -> 1L, ("q", "r") -> 1L), s"p=$p")
    }
  }
  // ---------------------------------------------------- naive bayes

  test("naive bayes: predictions and Q20 scores equal a full driver " +
       "replay of the closed-form model (referee equivalence)") {
    import graft.ops.ClassifierOps
    val trainDocs = Seq(("a", "x x y"), ("a", "x z"),
      ("b", "y y"), ("b", "y z z"))
    val testDocs = Map(1L -> "x x", 2L -> "y y y", 3L -> "q q", 4L -> "")
    val model = ClassifierOps.nbTrain(
      trainDocs.toDF("lang", "text"), "text", "lang")
    val got = ClassifierOps.nbPredict(
        testDocs.toSeq.toDF("doc_id", "text"), "doc_id", "text", model)
      .orderBy($"doc_id")
      .as[(Long, String, Long)].collect()

    val lg = (v: Long) => graft.ops.EvalOps.log2Q20Host(v)
    def toks(s: String) = s.split("\\s+").filter(_.nonEmpty).toSeq
    val cnt = trainDocs.flatMap { case (c, t) => toks(t).map(c -> _) }
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val tc = cnt.groupBy(_._1._1)
      .map { case (c, m) => c -> m.values.sum }
    val vocab = cnt.keys.map(_._2).toSet.size.toLong
    val nc = trainDocs.groupBy(_._1)
      .map { case (c, xs) => c -> xs.size.toLong }
    def score(text: String, c: String): Long = {
      val ts = toks(text)
      lg(nc(c)) - lg(trainDocs.size.toLong) -
        ts.size.toLong * lg(tc(c) + vocab) +
        ts.groupBy(identity).map { case (t, xs) =>
          xs.size.toLong * lg(cnt.getOrElse((c, t), 0L) + 1L) }.sum
    }
    got.foreach { case (id, pred, s) =>
      val best = Seq("a", "b").map(c => (score(testDocs(id), c), c)).max
      assert((pred, s) === ((best._2, best._1)), s"doc $id")
    }
    // sanity on the semantics, not just the replay
    assert(got.find(_._1 == 1L).get._2 === "a") // x-heavy doc -> class a
    assert(got.find(_._1 == 2L).get._2 === "b") // y-heavy doc -> class b
    // empty doc scores the prior alone; equal priors tie to the
    // lexicographically larger label (q246 struct-max convention)
    assert(got.find(_._1 == 4L).get._2 === "b")
  }

  test("naive bayes: fully-OOV docs rank classes by verbosity alone " +
       "(the factored-out denominator is the only signal)") {
    import graft.ops.ClassifierOps
    // class a: 2 train tokens; class b: 5 -> den(a) < den(b), so an
    // all-unseen doc must score higher under a (same prior mass)
    val model = ClassifierOps.nbTrain(
      Seq(("a", "x y"), ("b", "u v w u v")).toDF("lang", "text"),
      "text", "lang")
    val got = ClassifierOps.nbPredict(
        Seq((1L, "zz zz zz")).toDF("doc_id", "text"),
        "doc_id", "text", model)
      .as[(Long, String, Long)].collect()
    assert(got.head._2 === "a")
  }

  test("naive bayes: shard-trained counts merge EXACTLY to the full " +
       "retrain (sufficient-statistics identity)") {
    import graft.ops.ClassifierOps
    val full = Seq(("a", "x x y"), ("a", "x z"), ("b", "y y"),
      ("b", "y z z")).toDF("lang", "text")
    val s1 = full.filter($"text".startsWith("x"))
    val s2 = full.filter(!$"text".startsWith("x"))
    val merged = ClassifierOps.nbMergeCounts(
      ClassifierOps.nbCounts(s1, "text", "lang"),
      ClassifierOps.nbCounts(s2, "text", "lang"))
    val direct = ClassifierOps.nbCounts(full, "text", "lang")
    def tok(c: ClassifierOps.NbCounts) = c.tokenCounts
      .as[(String, String, Long)].collect().toSet
    def doc(c: ClassifierOps.NbCounts) = c.docCounts
      .as[(String, Long)].collect().toSet
    assert(tok(merged) === tok(direct))
    assert(doc(merged) === doc(direct))
  }

  test("naive bayes: top log-odds tokens surface each class's " +
       "exclusive vocabulary first") {
    import graft.ops.ClassifierOps
    val counts = ClassifierOps.nbCounts(
      Seq(("a", "aa aa aa shared"), ("b", "bb bb bb shared"))
        .toDF("lang", "text"), "text", "lang")
    val got = ClassifierOps.nbTopTokens(counts, k = 1)
      .select($"label", $"token").as[(String, String)].collect().toMap
    assert(got === Map("a" -> "aa", "b" -> "bb"))
  }
}
