package graft

import org.apache.spark.sql.functions._
import graft.ops.BpeOps

/** BPE merge learning vs a sequential plain-Scala referee implementing
  * the published algorithm directly — same tie-break, same in-order
  * non-overlapping merge semantics.
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // ---- referee: sequential BPE over a word-frequency map ----
  private def mergeSeq(
      syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toVector
  }

  private def refereeMerges(
      words: Map[String, Long], k: Int): Seq[(String, String)] = {
    var dict: Map[Vector[String], Long] =
      words.map { case (w, n) => w.split("").filter(_.nonEmpty).toVector -> n }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < k && !done) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, w) <- dict; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += w
      if (counts.isEmpty) done = true
      else {
        val ((a, b), _) = counts.toSeq
          .minBy { case ((a, b), w) => (-w, a, b) }
        merges += ((a, b))
        dict = dict.map { case (s, w) => mergeSeq(s, a, b) -> w }
      }
    }
    merges.toSeq
  }

  test("learnMerges: hand-checked tiny corpus, early exhaustion") {
    val df = Seq("aa aa ab").toDF("text")
    // dict: aa(2)=[a,a], ab(1)=[a,b]; pairs (a,a)->2, (a,b)->1
    // merge 1 = (a,a) -> dict [aa](2), [a,b](1); merge 2 = (a,b);
    // then no pairs remain -> stops at 2 despite k=5
    assert(BpeOps.learnMerges(df, "text", 5) ===
      Seq(("a", "a"), ("a", "b")))
  }

  test("learnMerges ≡ sequential referee on a real corpus sample (k=8), " +
       "including fused-symbol merges; deterministic under repartition") {
    val docs = Tables.load(spark, sfDir, "documents").limit(60)
      .select($"text").cache()
    val words = docs
      .select(explode(split($"text", "\\s+")).as("w"))
      .filter($"w" =!= "").groupBy($"w").count()
      .as[(String, Long)].collect().toMap
    val expect = refereeMerges(words, 8)
    val got = BpeOps.learnMerges(docs, "text", 8)
    assert(got === expect)
    // multi-char fused symbols must appear by merge 8 on real text
    assert(expect.exists { case (a, b) => a.length > 1 || b.length > 1 })
    val got7 = BpeOps.learnMerges(docs.repartition(7), "text", 8)
    assert(got7 === expect)
  }

  test("learnMergesLocal ≡ sequential referee at k=1000 on a real corpus " +
       "sample, and ≡ the distributed learner on its k=8 prefix") {
    val docs = Tables.load(spark, sfDir, "documents").limit(200)
      .select($"text").cache()
    val words = docs
      .select(explode(split($"text", "\\s+")).as("w"))
      .filter($"w" =!= "").groupBy($"w").count()
      .as[(String, Long)].collect().toMap
    val expect = refereeMerges(words, 1000)
    val got = BpeOps.learnMergesLocal(docs, "text", 1000)
    assert(got === expect)
    // the distributed round-per-merge learner agrees on a short prefix
    // (running it for 1000 rounds is exactly the cost this path removes)
    assert(BpeOps.learnMerges(docs, "text", 8) === expect.take(8))
  }

  test("encodeWithMerges ≡ applyMerges on a trained multi-level merge " +
       "list over real words, including null handling") {
    val docs = Tables.load(spark, sfDir, "documents").limit(120)
      .select($"text").cache()
    val merges = BpeOps.learnMergesLocal(docs, "text", 64)
    assert(merges.size === 64)
    val words = docs
      .select(explode(split($"text", "\\s+")).as("word"))
      .filter($"word" =!= "").distinct().limit(400)
      .unionByName(Seq[String](null).toDF("word"))
    val both = BpeOps.encodeWithMerges(words, "word", merges, "fast")
      .withColumn("expr", when($"word".isNotNull,
        BpeOps.applyMerges($"word", merges)))
    assert(both.filter(not($"fast" <=> $"expr")).count() === 0)
    assert(both.filter($"word".isNull).select($"fast".isNull)
      .as[Boolean].head())
  }

  test("encodeWithMerges handles a 30k-entry merge table (the " +
       "production tokenizer size applyMerges' expression tree cannot)") {
    // all ordered pairs over 174 chars = 30102 merges, every part a
    // single char — a well-formed table by construction
    val alphabet = (0 until 174).map(i => ('Ѐ' + i).toChar.toString)
    val merges: Seq[(String, String)] =
      for (a <- alphabet; b <- alphabet if a != b) yield (a, b)
    assert(merges.size > 30000)
    val rnd = new scala.util.Random(11)
    val wordsSeq = (0 until 50).map { _ =>
      (0 until (3 + rnd.nextInt(40)))
        .map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
    }
    // referee: plain-Scala chained folds in learned order
    val rank = merges.zipWithIndex.toMap
    def refEncode(w: String): Vector[String] =
      merges.zipWithIndex.foldLeft(
        w.split("").filter(_.nonEmpty).toVector) {
        case (s, ((a, b), r)) =>
          // skip merges whose parts can't be present (fold over 30k
          // entries per word is the referee's cost, not the engine's)
          if (s.exists(_ == a)) mergeSeq(s, a, b) else s
      }
    val got = BpeOps.encodeWithMerges(
        wordsSeq.toDF("word").repartition(4), "word", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector)
      .toMap
    wordsSeq.distinct.foreach { w =>
      assert(got(w) === refEncode(w), s"pieces for '$w'")
      assert(got(w).mkString === w, "concatenation invariant")
    }
  }

  test("applyMerges: encoding each distinct word with the learned list " +
       "reproduces the trained dictionary's final symbol sequences") {
    val corpus = Seq("banana bandana ban anna banana ban").toDF("text")
    val merges = BpeOps.learnMerges(corpus, "text", 6)
    // referee final dict
    val words = "banana bandana ban anna banana ban".split(" ")
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    var dict = words.map { case (w, n) =>
      w -> w.split("").filter(_.nonEmpty).toVector }
    merges.foreach { case (a, b) =>
      dict = dict.map { case (w, s) => w -> mergeSeq(s, a, b) } }
    val got = words.keys.toSeq.toDF("word")
      .select($"word", BpeOps.applyMerges($"word", merges).as("pieces"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector)
      .toMap
    dict.foreach { case (w, s) =>
      assert(got(w) === s, s"pieces for '$w'")
      assert(s.mkString === w, "concatenation invariant")
    }
  }

  test("wordPieceEncode: greedy longest-match equals a sequential " +
       "driver referee on hand cases and random words; char fallback " +
       "emits UNK and advances one") {
    import graft.ops.BpeOps
    val vocab = ('a' to 'z').zipWithIndex.map { case (c, i) =>
      c.toString -> (i + 1).toLong } ++
      Seq("qu" -> 30L, "ery" -> 31L, "ta" -> 32L, "ble" -> 33L,
        "spark" -> 34L, "str" -> 35L, "eam" -> 36L, "er" -> 40L)
    val vm = vocab.toMap
    def referee(w: String): Seq[Long] = {
      var p = 0
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (p < w.length) {
        val l = (5 to 1 by -1).find(l =>
          p + l <= w.length && vm.contains(w.substring(p, p + l)))
        out += l.map(n => vm(w.substring(p, p + n))).getOrElse(-1L)
        p += l.getOrElse(1)
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(287)
    val alphabet = "abelmqrstuy7"  // includes a non-vocab char '7'
    val words = Seq("table", "query", "stream", "spark", "er", "x7z") ++
      (0 until 40).map(_ => (0 until 1 + rnd.nextInt(10))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val docs = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val got = BpeOps.wordPieceEncode(docs, "id", "text", vocab,
        maxPiece = 5, maxWordLen = 16)
      .orderBy($"id")
      .select($"id", $"word", $"piece_ids")
      .as[(Long, String, Seq[Long])].collect()
    got.foreach { case (_, w, ids) =>
      assert(ids === referee(w), s"word '$w'")
    }
    // greedy hand checks
    val byWord = got.map(g => g._2 -> g._3).toMap
    assert(byWord("table") === Seq(32L, 33L))
    assert(byWord("query") === Seq(30L, 31L))
    assert(byWord("x7z") === Seq(24L, -1L, 26L)) // char, UNK, char
  }
}
