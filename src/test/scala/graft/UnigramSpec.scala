package graft

import org.apache.spark.sql.functions._
import graft.ops.{BpeOps, EvalOps}

/** Unigram-LM (SentencePiece, Kudo 2018) Viterbi encoding and hard-EM
  * training vs sequential plain-Scala referees — same integer Q20
  * arithmetic, same (score, length) tie-break, same shrink schedule.
  */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private val Unk = -30L * 1048576L

  // ---- referee: per-word Viterbi over a (piece -> (id, score)) map ----
  private def refEncode(
      word0: String, vocab: Map[String, (Long, Long)], maxPiece: Int,
      maxWordLen: Int): (Vector[Long], Long) = {
    val w = word0.take(maxWordLen)
    val n = w.length
    val score = Array.ofDim[Long](n + 1)
    val bl = Array.ofDim[Int](n + 1)
    val pid = Array.ofDim[Long](n + 1)
    for (i <- 1 to n) {
      var bestS = Long.MinValue; var bestL = 0; var bestP = 0L
      for (l <- 1 to math.min(maxPiece, i)) {
        val hit = vocab.get(w.substring(i - l, i))
        val cand: Option[(Long, Long)] =
          if (l == 1)
            Some(hit.map { case (id, s) => (id, s) }.getOrElse((-1L, Unk)))
          else hit
        cand.foreach { case (p, s) =>
          val tot = score(i - l) + s
          if (tot > bestS || (tot == bestS && l > bestL)) {
            bestS = tot; bestL = l; bestP = p
          }
        }
      }
      score(i) = bestS; bl(i) = bestL; pid(i) = bestP
    }
    var ids = List.empty[Long]; var p = n
    while (p > 0) { ids = pid(p) :: ids; p -= bl(p) }
    (ids.toVector, if (n == 0) 0L else score(n))
  }

  private val HandVocab: Seq[(String, Long, Long)] =
    ('a' to 'z').zipWithIndex.map { case (c, i) =>
      (c.toString, (i + 1).toLong, -12L * 1048576L) } ++
      Seq(("spark", 34L, -11L * 1048576L),
        ("spa", 35L, -4L * 1048576L), ("rk", 36L, -4L * 1048576L),
        ("ab", 40L, -5L * 1048576L), ("ba", 41L, -5L * 1048576L),
        ("aba", 42L, -10L * 1048576L))

  private def encodeTexts(
      texts: Seq[String], vocab: Seq[(String, Long, Long)],
      maxPiece: Int, maxWordLen: Int = 16) =
    BpeOps.unigramEncode(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        "doc_id", "text", vocab, maxPiece, maxWordLen)
      .orderBy($"doc_id", $"word_idx")
      .select($"word", $"piece_ids", $"score")
      .collect().map(r => (r.getString(0),
        r.getSeq[Long](1).toVector, r.getLong(2)))

  test("Viterbi beats greedy: spa+rk outscores the longer piece spark " +
       "(the case that separates unigram from WordPiece longest-match)") {
    val Array((w, ids, s)) = encodeTexts(Seq("spark"), HandVocab, 5)
    assert(w === "spark")
    assert(ids === Vector(35L, 36L)) // spa + rk = -8 Q20 beats spark -11
    assert(s === -8L * 1048576L)
    // greedy WordPiece on the same pieces takes "spark" whole
    val wp = BpeOps.wordPieceEncode(
        Seq((1L, "spark")).toDF("doc_id", "text"), "doc_id", "text",
        HandVocab.map { case (p, id, _) => (p, id) }, maxPiece = 5)
      .select($"piece_ids").head().getSeq[Long](0)
    assert(wp === Seq(34L))
  }

  test("tie-break: equal total score prefers the longer piece") {
    // "aba": aba = -10; ab+a = -5-12 = -17; a+ba = -17; via singles -36.
    // Craft equality: with ab=-5, a=-12 vs aba=-17 -> make aba=-17 too
    val v = Seq(("a", 1L, -12L), ("b", 2L, -12L),
      ("ab", 3L, -5L), ("aba", 4L, -17L))
    val Array((_, ids, s)) = encodeTexts(Seq("aba"), v, 3)
    assert(s === -17L)
    assert(ids === Vector(4L)) // the single length-3 piece wins the tie
  }

  test("UNK fallback per position and truncation contract") {
    val v = Seq(("a", 1L, -2L), ("b", 2L, -3L))
    // "axb": a, UNK(x), b
    val Array((_, ids, s)) = encodeTexts(Seq("axb"), v, 2)
    assert(ids === Vector(1L, -1L, 2L))
    assert(s === -2L + Unk + -3L)
    // maxWordLen=2: only the first two chars encode
    val Array((w2, ids2, _)) = encodeTexts(Seq("aab"), v, 2, maxWordLen = 2)
    assert(w2 === "aa" && ids2 === Vector(1L, 1L))
  }

  test("unigramEncode ≡ sequential Viterbi referee on real corpus words " +
       "(trained-style vocab), incl. per-word scores") {
    val docs = Tables.load(spark, sfDir, "documents").limit(40)
      .select($"doc_id", $"text")
    val vocab = BpeOps.unigramTrainViterbi(
      docs, "text", maxPiece = 4, vocabSize = 160, rounds = 2,
      seedVocab = 400)
    assert(vocab.nonEmpty)
    val vm = vocab.map { case (p, id, s) => p -> (id, s) }.toMap
    val got = BpeOps.unigramEncode(docs, "doc_id", "text", vocab,
        maxPiece = 4)
      .select($"word", $"piece_ids", $"score").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (ids, s) = refEncode(r.getString(0), vm, 4, 16)
      assert(r.getSeq[Long](1).toVector === ids, s"word=${r.getString(0)}")
      assert(r.getLong(2) === s, s"word=${r.getString(0)}")
    }
  }

  // ---- referee: the full trainer, sequential ----
  private def refTrain(
      texts: Seq[String], maxPiece: Int, vocabSize: Int, rounds: Int,
      seedVocab: Int, maxWordLen: Int): Seq[(String, Long, Long)] = {
    val lg = (v: Long) => EvalOps.log2Q20Host(v)
    val wc = texts.flatMap(_.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    if (wc.isEmpty) return Seq.empty
    val cand = scala.collection.mutable.Map
      .empty[String, Long].withDefaultValue(0L)
    for ((w, n) <- wc; l <- 1 to maxPiece; s <- 0 to w.length - l)
      cand(w.substring(s, s + l)) += n
    val singles = cand.toSeq.filter(_._1.length == 1).sortBy(_._1)
    val multis = cand.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, seedVocab - singles.size))
    def rescore(cs: Seq[(String, Long)]): Seq[(String, Long)] = {
      val total = cs.map(_._2).sum
      cs.map { case (p, c) => p -> (lg(c) - lg(total)) }
    }
    var cur = rescore(singles ++ multis)
    var round = 0
    var converged = false
    while (round < rounds && !converged) {
      val vocabNow = cur.zipWithIndex.map { case ((p, s), i) =>
        (p, i.toLong, s) }
      val vm = vocabNow.map { case (p, id, s) => p -> (id, s) }.toMap
      val pieceOf = vocabNow.map { case (p, id, _) => id -> p }.toMap
      val usage = scala.collection.mutable.Map
        .empty[String, Long].withDefaultValue(0L)
      for ((w, n) <- wc) {
        val (ids, _) = refEncode(w, vm, maxPiece, maxWordLen)
        ids.filter(_ >= 0).foreach(id => usage(pieceOf(id)) += n)
      }
      val singleKept = singles.map { case (p, _) =>
        p -> math.max(usage.getOrElse(p, 0L), 1L) }
      val target = math.max(vocabSize, math.ceil(cur.size * 0.8).toInt)
      val multiKept = cur.collect {
        case (p, _) if p.length > 1 && usage.contains(p) =>
          p -> usage(p) }
        .sortBy { case (p, u) => (-u, p) }
        .take(math.max(0, target - singleKept.size))
      val next = rescore(singleKept ++ multiKept)
      converged = next.map(_._1).toSet == cur.map(_._1).toSet &&
        cur.size <= target
      cur = next
      round += 1
    }
    val scoreOf = cur.toMap
    cur.map(_._1).sorted.zipWithIndex.map { case (p, i) =>
      (p, (i + 1).toLong, scoreOf(p)) }
  }

  // ---- referee: sequential forward–backward E-step with the ENGINE's
  // own integer tables (BpeOps.hostLse / hostExp2Q20) and candidate
  // fold order (length maxPiece..2, then the single) ----
  private def refEmUsage(
      word0: String, vm: Map[String, (Long, Long)], maxPiece: Int,
      maxWordLen: Int): Map[Long, Long] = {
    val w = word0.take(maxWordLen)
    val n = w.length
    if (n == 0) return Map.empty
    def lseAcc(acc: Option[Long], v: Long): Option[Long] =
      Some(acc.fold(v)(BpeOps.hostLse(_, v)))
    val alpha = Array.ofDim[Long](n + 1)
    for (i <- 1 to n) {
      var acc: Option[Long] = None
      for (l <- maxPiece to 2 by -1 if i >= l)
        vm.get(w.substring(i - l, i)).foreach { case (_, s) =>
          acc = lseAcc(acc, alpha(i - l) + s) }
      val s1 = vm.get(w.substring(i - 1, i)).map(_._2).getOrElse(Unk)
      alpha(i) = lseAcc(acc, alpha(i - 1) + s1).get
    }
    val beta = Array.ofDim[Long](n + 1)
    for (i <- n - 1 to 0 by -1) {
      var acc: Option[Long] = None
      for (l <- maxPiece to 2 by -1 if i + l <= n)
        vm.get(w.substring(i, i + l)).foreach { case (_, s) =>
          acc = lseAcc(acc, s + beta(i + l)) }
      val s1 = vm.get(w.substring(i, i + 1)).map(_._2).getOrElse(Unk)
      beta(i) = lseAcc(acc, s1 + beta(i + 1)).get
    }
    val z = alpha(n)
    val usage = scala.collection.mutable.Map
      .empty[Long, Long].withDefaultValue(0L)
    for (i <- 1 to n; l <- 1 to math.min(maxPiece, i)) {
      val hit = vm.get(w.substring(i - l, i))
      if (l == 1 || hit.isDefined) {
        val (pid, s) =
          if (l == 1) hit.getOrElse((-1L, Unk)) else hit.get
        if (pid >= 0)
          usage(pid) += BpeOps.hostExp2Q20(alpha(i - l) + s + beta(i) - z)
      }
    }
    usage.toMap
  }

  private def refTrainEm(
      texts: Seq[String], maxPiece: Int, vocabSize: Int, rounds: Int,
      seedVocab: Int, maxWordLen: Int): Seq[(String, Long, Long)] = {
    val lg = (v: Long) => EvalOps.log2Q20Host(v)
    val wc = texts.flatMap(_.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    if (wc.isEmpty) return Seq.empty
    val cand = scala.collection.mutable.Map
      .empty[String, Long].withDefaultValue(0L)
    for ((w, n) <- wc; l <- 1 to maxPiece; s <- 0 to w.length - l)
      cand(w.substring(s, s + l)) += n
    val singles = cand.toSeq.filter(_._1.length == 1).sortBy(_._1)
    val multis = cand.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, seedVocab - singles.size))
    def rescore(cs: Seq[(String, Long)]): Seq[(String, Long)] = {
      val total = cs.map(_._2).sum
      cs.map { case (p, c) => p -> (lg(c) - lg(total)) }
    }
    var cur = rescore(singles ++ multis)
    var round = 0
    var converged = false
    while (round < rounds && !converged) {
      val vocabNow = cur.zipWithIndex.map { case ((p, s), i) =>
        (p, i.toLong, s) }
      val vm = vocabNow.map { case (p, id, s) => p -> (id, s) }.toMap
      val pieceOf = vocabNow.map { case (p, id, _) => id -> p }.toMap
      val usage = scala.collection.mutable.Map
        .empty[String, Long].withDefaultValue(0L)
      for ((w, n) <- wc)
        refEmUsage(w, vm, maxPiece, maxWordLen).foreach {
          case (id, u) => usage(pieceOf(id)) += u * n }
      val singleKept = singles.map { case (p, _) =>
        p -> math.max(usage.getOrElse(p, 0L), 1L) }
      val target = math.max(vocabSize, math.ceil(cur.size * 0.8).toInt)
      val multiKept = cur.collect {
        case (p, _) if p.length > 1 && usage(p) > 0L => p -> usage(p) }
        .sortBy { case (p, u) => (-u, p) }
        .take(math.max(0, target - singleKept.size))
      val next = rescore(singleKept ++ multiKept)
      converged = next.map(_._1).toSet == cur.map(_._1).toSet &&
        cur.size <= target
      cur = next
      round += 1
    }
    val scoreOf = cur.toMap
    cur.map(_._1).sorted.zipWithIndex.map { case (p, i) =>
      (p, (i + 1).toLong, scoreOf(p)) }
  }

  test("Q20 lse/exp2 integer tables: exact landmarks (lse of equals " +
       "adds exactly one bit; exp2 of 0/-1 is exact)") {
    assert(BpeOps.hostLse(-5L << 20, -5L << 20) === -4L << 20)
    assert(BpeOps.hostExp2Q20(0L) === 1L << 20)
    assert(BpeOps.hostExp2Q20(-1L << 20) === 1L << 19)
    assert(BpeOps.hostExp2Q20(-40L << 20) === 0L)
    // monotone: a bigger gap shrinks the correction
    assert(BpeOps.hostLse(0L, -1L << 20) > BpeOps.hostLse(0L, -2L << 20))
    // BigInt-ranged log2 (the overflow-proof EM usage path): exact on
    // powers of two past the Long range, and == the Long replica
    // inside it — the M-step's values are unchanged where Longs fit
    assert(BpeOps.log2Q20Big(BigInt(1) << 100) === 100L << 20)
    for (v <- Seq(1L, 7L, 1048576L, (1L << 61) + 12345L))
      assert(BpeOps.log2Q20Big(BigInt(v)) === EvalOps.log2Q20Host(v), v)
  }

  test("unigramTrainEm ≡ sequential forward–backward referee " +
       "bit-for-bit on a real corpus sample; deterministic under " +
       "repartition") {
    val docs = Tables.load(spark, sfDir, "documents").limit(30)
      .select($"text").cache()
    val texts = docs.collect().map(_.getString(0)).toSeq
    val expected = refTrainEm(texts, maxPiece = 4, vocabSize = 110,
      rounds = 2, seedVocab = 250, maxWordLen = 16)
    val got = BpeOps.unigramTrainEm(docs, "text", maxPiece = 4,
      vocabSize = 110, rounds = 2, seedVocab = 250)
    assert(got === expected)
    val got2 = BpeOps.unigramTrainEm(docs.repartition(7), "text",
      maxPiece = 4, vocabSize = 110, rounds = 2, seedVocab = 250)
    assert(got2 === expected)
    docs.unpersist()
  }

  test("the divergence soft-EM fixes (planted): on 'aba', the two " +
       "segmentations ab+a and a+ba tie — hard-EM gives ALL count to " +
       "the tie-break winner and kills the loser in one round; soft-EM " +
       "splits the posterior mass and keeps BOTH pieces alive with " +
       "equal scores") {
    val df = Seq("aba aba aba aba").toDF("text")
    val hard = BpeOps.unigramTrainViterbi(df, "text", maxPiece = 2,
      vocabSize = 4, rounds = 1, seedVocab = 8)
    val soft = BpeOps.unigramTrainEm(df, "text", maxPiece = 2,
      vocabSize = 4, rounds = 1, seedVocab = 8)
    val hardMultis = hard.map(_._1).filter(_.length > 1).toSet
    val softMultis = soft.map(_._1).filter(_.length > 1).toSet
    assert(hardMultis.size === 1 &&
      (hardMultis === Set("ab") || hardMultis === Set("ba")),
      s"hard-EM keeps only the tie winner, got $hardMultis")
    assert(softMultis === Set("ab", "ba"),
      s"soft-EM must keep both tied pieces, got $softMultis")
    // symmetric evidence → identical scores
    val scoreOf = soft.map(t => t._1 -> t._3).toMap
    assert(scoreOf("ab") === scoreOf("ba"))
  }

  test("unigramTrainViterbi ≡ sequential referee bit-for-bit on a real " +
       "corpus sample; deterministic under repartition") {
    val docs = Tables.load(spark, sfDir, "documents").limit(50)
      .select($"text").cache()
    val texts = docs.collect().map(_.getString(0)).toSeq
    val expected = refTrain(texts, maxPiece = 4, vocabSize = 120,
      rounds = 3, seedVocab = 300, maxWordLen = 16)
    val got = BpeOps.unigramTrainViterbi(docs, "text", maxPiece = 4,
      vocabSize = 120, rounds = 3, seedVocab = 300)
    assert(got === expected)
    val got2 = BpeOps.unigramTrainViterbi(docs.repartition(7), "text",
      maxPiece = 4, vocabSize = 120, rounds = 3, seedVocab = 300)
    assert(got2 === expected)
    docs.unpersist()
  }

  test("trainer: shrink schedule reaches the target; singles survive " +
       "with zero usage; empty corpus -> empty vocabulary") {
    val df = Seq("abab abab abab cd").toDF("text")
    val v = BpeOps.unigramTrainViterbi(df, "text", maxPiece = 3,
      vocabSize = 6, rounds = 5, seedVocab = 30)
    val pieces = v.map(_._1)
    assert(pieces.filter(_.length == 1).toSet === Set("a", "b", "c", "d"))
    assert(v.map(_._2) === (1L to v.size.toLong)) // dense ids, piece order
    assert(v.forall(_._3 <= 0L))
    // 'c'/'d' are never chosen once "cd" enters the vocab, yet survive
    assert(pieces.contains("cd") || pieces.toSet === Set("a", "b", "c", "d"))
    val empty = BpeOps.unigramTrainViterbi(
      Seq.empty[String].toDF("text"), "text", 3, 6, 2, seedVocab = 10)
    assert(empty.isEmpty)
    // null / empty text rows encode to zero word rows
    val enc = BpeOps.unigramEncode(
      Seq((1L, null.asInstanceOf[String]), (2L, "  ")).toDF("doc_id", "text"),
      "doc_id", "text", HandVocab, 5)
    assert(enc.count() === 0L)
  }

  test("contract violations fail fast") {
    val df = Seq((1L, "ab")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      BpeOps.unigramEncode(df, "doc_id", "text", Seq.empty, 3) }
    intercept[IllegalArgumentException] { // dup piece
      BpeOps.unigramEncode(df, "doc_id", "text",
        Seq(("a", 1L, -1L), ("a", 2L, -1L)), 3) }
    intercept[IllegalArgumentException] { // positive score
      BpeOps.unigramEncode(df, "doc_id", "text", Seq(("a", 1L, 1L)), 3) }
    intercept[IllegalArgumentException] { // reserved id
      BpeOps.unigramEncode(df, "doc_id", "text", Seq(("a", -1L, -1L)), 3) }
    intercept[IllegalArgumentException] { // piece longer than maxPiece
      BpeOps.unigramEncode(df, "doc_id", "text", Seq(("abcd", 1L, -1L)), 3) }
  }
}
