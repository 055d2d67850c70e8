package graft.ops

import graft.ops.Checkpointer._
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Distributed BPE (byte-pair-encoding) merge learning — tokenizer
  * training as a Spark pipeline.
  *
  * Classic BPE (Sennrich et al. 2016, public algorithm) iterates:
  * count adjacent symbol pairs over the word-frequency dictionary,
  * merge the most frequent pair everywhere, repeat. The Spark shaping:
  *
  *  - The corpus collapses to a WORD DICTIONARY first (one shuffle) —
  *    vocabulary-sized no matter the corpus (10⁸ words at web scale,
  *    not 10¹² tokens), so every subsequent merge round runs on the
  *    small aggregate, never rescanning the corpus.
  *  - Each round: pair counts = one map-side-combined groupBy over the
  *    dict; argmax = 1-row collect (count desc, then lexicographic —
  *    deterministic under ties); the merge rewrite is a per-row left
  *    fold (HOF aggregate) over each word's symbol array.
  *  - The evolving dict is localCheckpoint'ed per round to truncate
  *    the k-deep lineage (k merge rounds would otherwise recompute
  *    round 1's fold k times).
  *
  * The fold applies merges left-to-right and non-overlapping ("aaa"
  * with merge (a,a) → [aa, a]) — exactly the reference algorithm's
  * in-order scan. BpeSpec proves equivalence against a sequential
  * plain-Scala implementation on real corpus samples.
  */
object BpeOps {

  /** Corpus → (symbols, weight) word dictionary: each distinct
    * whitespace token, split to characters, weighted by occurrence
    * count. The one corpus-sized pass in the whole pipeline.
    */
  def wordDict(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(filter(split(col(textCol), "\\s+"), t => t =!= ""))
        .as("__word"))
      .groupBy(col("__word"))
      .agg(count(lit(1)).as("weight"))
      .select(filter(split(col("__word"), ""), s => s =!= "").as("symbols"),
        col("weight"))

  /** Weighted adjacent-pair counts over the dict: (a, b, w). */
  def pairCounts(dict: DataFrame): DataFrame =
    dict
      .select(explode(zip_with(
          // length = size clamps to n-1; Int.MaxValue would overflow
          // slice's internal start+length arithmetic to an empty result
          col("symbols"),
          slice(col("symbols"), lit(2), size(col("symbols"))),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"),
        col("weight"))
      .filter(col("p.b").isNotNull)
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("weight")).as("w"))

  /** One merge fold: rewrite a symbol array replacing every in-order,
    * non-overlapping occurrence of (a, b) with the fused symbol a+b.
    */
  private def mergeFold(symbols: Column, a: String, b: String): Column =
    aggregate(
      symbols,
      array().cast("array<string>"),
      (acc, s) => when(
        size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Apply one learned merge to the whole dictionary. */
  def mergeOnce(dict: DataFrame, a: String, b: String): DataFrame =
    dict.select(mergeFold(col("symbols"), a, b).as("symbols"), col("weight"))

  /** Learn `k` merges from a corpus, one Spark round per merge. Returns
    * the ordered merge list — the tokenizer artifact. Stops early if no
    * pair remains (every word fused to one symbol).
    *
    * This is the ALL-DISTRIBUTED demo path: fine for ablation-sized k,
    * but a production 32k-merge vocabulary would be 32k sequential
    * cluster rounds on a dict that fits in driver memory — use
    * [[learnMergesLocal]] for that (identical output, one corpus pass).
    */
  def learnMerges(
      df: DataFrame, textCol: String, k: Int): Seq[(String, String)] = {
    require(k >= 0, "k must be >= 0")
    var dict = wordDict(df, textCol).graftCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < k && !exhausted) {
      val top = pairCounts(dict)
        .orderBy(col("w").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val next = mergeOnce(dict, a, b).graftCheckpoint()
        dict.unpersist()   // bound executor storage to 2 dict copies
        dict = next
      }
    }
    merges.toSeq
  }

  /** PRODUCTION merge learning: one distributed corpus pass builds the
    * word dictionary (vocabulary-sized regardless of corpus size — 10⁸
    * distinct words at web scale, not 10¹² tokens), the dict is pulled
    * to the driver (a BOUNDED collect, guarded by `maxVocab`), and the
    * merge loop runs locally with incremental pair-count maintenance —
    * no per-merge cluster round, so a 32k-merge vocabulary costs one
    * Spark job plus seconds of driver CPU instead of 32k sequential
    * scheduler round-trips.
    *
    * Output is IDENTICAL to [[learnMerges]] (same counts, same
    * count-desc-then-lexicographic tie-break, same in-order
    * non-overlapping rewrite); BpeSpec proves both against the
    * sequential referee.
    */
  def learnMergesLocal(
      df: DataFrame, textCol: String, k: Int,
      maxVocab: Int = 8000000): Seq[(String, String)] = {
    require(k >= 0, "k must be >= 0")
    val rows = wordDict(df, textCol).limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"word dictionary exceeds maxVocab=$maxVocab — raise the cap " +
        "(driver memory permitting) or pre-filter rare words")
    val words = rows.map(r =>
      (r.getSeq[String](0).toArray, r.getLong(1)))
    learnMergesSequential(words, k)
  }

  /** Driver-local BPE trainer over a word dictionary: incremental
    * pair-count updates (only words containing the merged pair are
    * rewritten, found via a pair→word posting index) and a
    * lazy-deletion priority queue for the argmax — the standard
    * efficient trainer shape, O(Σ rewrites · word length) overall
    * instead of O(k · vocab) full rescans.
    */
  private[ops] def learnMergesSequential(
      words: Array[(Array[String], Long)], k: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val syms = words.map(_._1.to(mutable.ArrayBuffer))
    val weight = words.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val postings = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def bump(p: (String, String), w: Long, i: Int): Unit = {
      val c = counts.getOrElse(p, 0L) + w
      if (c <= 0L) counts.remove(p) else counts(p) = c
      if (w > 0) postings.getOrElseUpdate(p, mutable.Set.empty) += i
    }
    for (i <- words.indices; j <- 0 until syms(i).length - 1)
      bump((syms(i)(j), syms(i)(j + 1)), weight(i), i)
    // max by (count desc, a asc, b asc) with lazy deletion: every count
    // change pushes a fresh entry; stale entries are skipped on pop by
    // re-checking against the live map.
    // PriorityQueue pops the ordering's MAX; the wanted entry is the
    // MIN of (-w, a, b), so reverse that ordering.
    val ord = Ordering.by[(Long, String, String), (Long, String, String)] {
      case (w, a, b) => (-w, a, b)
    }.reverse
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)
    counts.foreach { case ((a, b), w) => heap.enqueue((w, a, b)) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    while (merges.size < k && heap.nonEmpty) {
      val (w, a, b) = heap.dequeue()
      if (counts.get((a, b)).contains(w)) {
        merges += ((a, b))
        val touched = mutable.Set.empty[(String, String)]
        val holders = postings.remove((a, b)).getOrElse(mutable.Set.empty)
        for (i <- holders) {
          val s = syms(i)
          // subtract the word's old pair contributions, rewrite
          // in-order non-overlapping, add the new ones
          if (s.length > 1 &&
              (0 until s.length - 1).exists(j => s(j) == a && s(j + 1) == b)) {
            for (j <- 0 until s.length - 1) {
              bump((s(j), s(j + 1)), -weight(i), i)
              touched += ((s(j), s(j + 1)))
            }
            val out = mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < s.length) {
              if (j + 1 < s.length && s(j) == a && s(j + 1) == b) {
                out += (a + b); j += 2
              } else { out += s(j); j += 1 }
            }
            syms(i) = out
            for (j <- 0 until out.length - 1) {
              bump((out(j), out(j + 1)), weight(i), i)
              touched += ((out(j), out(j + 1)))
            }
          }
        }
        counts.remove((a, b))
        touched.foreach { p =>
          counts.get(p).foreach(c => heap.enqueue((c, p._1, p._2)))
        }
      }
    }
    merges.toSeq
  }

  /** Tokenize a word column with a learned merge list: split to chars,
    * then apply each merge in learned order as chained folds — pure
    * per-row expression, no shuffle.
    *
    * Expression depth grows with |merges|, so this is the SMALL-list
    * encode path (gate demos, ablations, sub-hundred merge tables); a
    * production tokenizer with 30k+ merges belongs in
    * [[encodeWithMerges]] — a broadcast rank-table `mapPartitions`
    * encoder with the same output contract, cost independent of
    * |merges|.
    */
  def applyMerges(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(filter(split(word, ""), s => s =!= "")) {
      case (syms, (a, b)) => mergeFold(syms, a, b)
    }

  /** Encode one word against a merge-rank table: repeatedly find the
    * LOWEST-RANK pair present and rewrite all its in-order
    * non-overlapping occurrences. For any TRAINED merge list (each
    * merge's parts are single chars or earlier fusions — the only lists
    * training can emit) this is exactly the chained-fold semantics of
    * [[applyMerges]]: a later merge can never create an occurrence of
    * an earlier pair that the fold would have missed, because the
    * earlier pair's parts already existed when it was learned. BpeSpec
    * checks the equivalence on trained lists and on a 30k-entry table.
    */
  private[ops] def encodeWord(
      word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var s = word.split("").filter(_.nonEmpty)
    var done = false
    while (!done && s.length > 1) {
      var best = Int.MaxValue
      var bi = -1
      var j = 0
      while (j < s.length - 1) {
        val r = ranks.getOrElse((s(j), s(j + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = j }
        j += 1
      }
      if (bi < 0) done = true
      else {
        val (a, b) = (s(bi), s(bi + 1))
        val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += s(i); i += 1 }
        }
        s = out.toArray
      }
    }
    s.toSeq
  }

  /** PRODUCTION encode: append a `pieces` array column tokenizing
    * `wordCol` with a learned merge table of ANY size. The table ships
    * once per executor as a broadcast rank map and rows encode in a
    * `mapPartitions` pass — per-word cost scales with word length (the
    * per-round pair scan), NOT with |merges|, where the chained-fold
    * [[applyMerges]] builds a |merges|-deep expression tree and breaks
    * past a few hundred entries. Null words yield null pieces.
    */
  def encodeWithMerges(
      df: DataFrame, wordCol: String, merges: Seq[(String, String)],
      outCol: String = "pieces"): DataFrame = {
    val schema = df.schema
      .add(outCol, ArrayType(StringType, containsNull = false))
    val idx = df.schema.fieldIndex(wordCol)
    val bc = df.sparkSession.sparkContext
      .broadcast(merges.zipWithIndex.toMap)
    df.mapPartitions { it =>
      val ranks = bc.value
      it.map { r =>
        val w = r.getString(idx)
        val pieces = if (w == null) null else encodeWord(w, ranks)
        Row.fromSeq(r.toSeq :+ pieces)
      }
    }(Encoders.row(schema))
  }

  /** Greedy longest-match WordPiece encoding (Wu et al. 2016's
    * tokenization rule) against a broadcast piece vocabulary — the
    * greedy sibling of the BPE merge-fold encoder above; together they
    * cover both mainstream subword families.
    *
    * Per word, from position p: take the LONGEST vocab piece matching
    * at p (lengths maxPiece..1); an unmatched position emits UNK(-1)
    * and advances one char — the char-fallback variant (SentencePiece
    * byte-fallback style), which degrades per-position instead of
    * voiding the whole word (document the difference from the
    * whole-word-[UNK] BERT convention).
    *
    * Shape: the vocabulary ships as a literal map (KBs–MBs — the
    * hashing-trick argument from the linear classifier), and encoding
    * is a pure per-row bounded fold (`aggregate` over maxWordLen
    * steps, each trying maxPiece map lookups) — zero shuffles, runs in
    * the scan stage; the per-word `rem ≥ l` guard is semantic, not
    * cosmetic (a truncated substring would otherwise greedy-match a
    * SHORTER piece through a longer-length probe).
    *
    * Contracts: vocab pieces are unique, non-empty, ≤ maxPiece chars;
    * words longer than maxWordLen encode only their first maxWordLen
    * fold steps (size the cap to the tokenizer's word-length bound).
    *
    * Output: one row per word occurrence — (idCol, word_idx, word,
    * piece_ids array<long>) in document order.
    */
  def wordPieceEncode(
      docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Long)], maxPiece: Int,
      maxWordLen: Int = 16): DataFrame = {
    require(vocab.nonEmpty, "empty vocabulary")
    require(vocab.map(_._1).distinct.size == vocab.size,
      "vocabulary pieces must be unique")
    require(vocab.forall { case (p, _) =>
      p.nonEmpty && p.length <= maxPiece },
      s"pieces must be 1..$maxPiece chars")
    val vm = typedLit(vocab.toMap)
    def encodeWord(w: Column): Column = {
      val init = struct(lit(1L).as("p"),
        array().cast("array<bigint>").as("ids"))
      aggregate(
        sequence(lit(1), lit(maxWordLen)),
        init,
        (acc, _) => {
          val p = acc.getField("p")
          val ids = acc.getField("ids")
          val rem = length(w).cast("long") - p + 1L
          val hits = (maxPiece to 1 by -1).map { l =>
            l -> when(rem >= l,
              try_element_at(vm, w.substr(p.cast("int"), lit(l))))
          }
          val id = coalesce(hits.map(_._2) :+ lit(-1L): _*)
          val adv = coalesce(hits.map { case (l, h) =>
            when(h.isNotNull, lit(l.toLong)) } :+ lit(1L): _*)
          when(p > length(w).cast("long"), acc)
            .otherwise(struct((p + adv).as("p"),
              concat(ids, array(id)).as("ids")))
        }).getField("ids")
    }
    docs
      .select(col(idCol),
        posexplode(filter(split(col(textCol), "\\s+"), t => t =!= ""))
          .as(Seq("word_idx", "word")))
      .select(col(idCol), col("word_idx").cast("long").as("word_idx"),
        col("word"), encodeWord(col("word")).as("piece_ids"))
  }

  // ────────────── Unigram LM (SentencePiece family, Kudo 2018) ──────────────

  /** Shared structural contract for a unigram vocabulary literal:
    * (piece, id, scoreQ20). Scores are integer Q20 log2-probabilities
    * (≤ 0, [[graft.functions.GraftColumns.binLog2Q20]] scale) so the
    * whole Viterbi DP is exact BIGINT arithmetic — rankings are
    * engine-portable, never a float ulp apart.
    */
  private def requireUnigramVocab(
      vocab: Seq[(String, Long, Long)], maxPiece: Int,
      unkScore: Long): Unit = {
    require(vocab.nonEmpty, "empty vocabulary")
    require(vocab.map(_._1).distinct.size == vocab.size,
      "vocabulary pieces must be unique")
    require(vocab.forall { case (p, _, _) =>
      p.nonEmpty && p.length <= maxPiece },
      s"pieces must be 1..$maxPiece chars")
    require(vocab.forall(_._2 >= 0L),
      "piece ids must be >= 0 (-1 is reserved for UNK)")
    require(vocab.forall(_._3 <= 0L) && unkScore <= 0L,
      "scores are log-probabilities: must be <= 0")
  }

  /** Viterbi DP over word positions 1..maxWordLen: position i's cell
    * is the best (score, bl, pid) over every piece that could END at
    * i — vocab pieces of length 2..maxPiece matching `w[i-l+1..i]`,
    * plus the always-valid length-1 step (the vocab single, or UNK
    * `pid = -1` at `unkScore` when the char is out-of-vocabulary —
    * encoding is total for any input). `bl` is the chosen piece
    * length (the backpointer). Tie-break: equal score prefers the
    * LONGER piece — candidates at one position have distinct lengths,
    * so (score, bl) is a total order and `array_max`'s lexicographic
    * struct comparison decides deterministically.
    *
    * A bounded per-row fold (`aggregate` over maxWordLen steps ×
    * maxPiece map lookups): zero shuffles, runs inside the scan
    * stage. Positions past `length(w)` leave the accumulator as-is,
    * so the result array has exactly `length(w)` cells.
    */
  private def unigramDp(
      w: Column, vm: Column, maxPiece: Int, maxWordLen: Int,
      unkScore: Long): Column =
    aggregate(
      sequence(lit(1), lit(maxWordLen)),
      array().cast("array<struct<score:bigint,bl:int,pid:bigint>>"),
      (acc, i) => {
        // prev(l) only evaluates under an i >= l guard, so the
        // element_at index is always >= 1 (ANSI-safe)
        def prev(l: Int) = when(i === l, lit(0L))
          .otherwise(element_at(acc, (i - l).cast("int"))
            .getField("score"))
        val multi = (maxPiece to 2 by -1).map { l =>
          val hit = try_element_at(vm,
            w.substr((i - l + 1).cast("int"), lit(l)))
          when(i >= l && hit.isNotNull,
            struct((prev(l) + hit.getField("_2")).as("score"),
              lit(l).as("bl"), hit.getField("_1").as("pid")))
        }
        val hit1 = try_element_at(vm, w.substr(i.cast("int"), lit(1)))
        val single = struct(
          (prev(1) + coalesce(hit1.getField("_2"), lit(unkScore)))
            .as("score"),
          lit(1).as("bl"),
          coalesce(hit1.getField("_1"), lit(-1L)).as("pid"))
        val best = array_max(array((multi :+ single): _*))
        when(i > length(w), acc).otherwise(concat(acc, array(best)))
      })

  /** Backtrack the DP: from position n, repeatedly step back by the
    * chosen piece length, prepending its id — n bounded steps. `dp`
    * MUST be a materialized column attribute, not the DP expression
    * itself (it is read twice per step — the q260 lambda
    * re-evaluation trap).
    */
  private def unigramBacktrack(
      dp: Column, n: Column, maxWordLen: Int): Column =
    aggregate(
      sequence(lit(1), lit(maxWordLen)),
      struct(n.as("p"), array().cast("array<bigint>").as("ids")),
      (st, _) => {
        val p = st.getField("p")
        val cell = element_at(dp, p)
        when(p <= 0, st).otherwise(struct(
          (p - cell.getField("bl")).as("p"),
          concat(array(cell.getField("pid")), st.getField("ids"))
            .as("ids")))
      }).getField("ids")

  /** Unigram-LM Viterbi encoding (Kudo 2018 — the SentencePiece model
    * family used by T5/LLaMA-class tokenizers): the third mainstream
    * subword family next to the BPE merge-fold and greedy WordPiece
    * encoders above. Unlike both, segmentation is GLOBALLY optimal —
    * each word becomes the piece sequence maximizing the sum of piece
    * log-probabilities (integer Q20), found by a Viterbi DP; a
    * crafted vocabulary where two short pieces outscore one long one
    * genuinely separates this from greedy longest-match (spec-pinned).
    *
    * Contracts: vocabulary per [[requireUnigramVocab]]; words longer
    * than `maxWordLen` encode their first `maxWordLen` chars (the
    * [[wordPieceEncode]] truncation contract — the returned `word`
    * column is the truncated form actually encoded). Null/absent
    * text yields no rows (posexplode of nothing).
    *
    * Output: one row per word occurrence — (idCol, word_idx, word,
    * piece_ids array<long>, score) in document order, where `score`
    * is the word's best total log-probability (the unigram-LM
    * log-likelihood — doubles as a perplexity-style quality signal).
    */
  def unigramEncode(
      docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Long, Long)], maxPiece: Int,
      maxWordLen: Int = 16,
      unkScore: Long = -30L * 1048576L): DataFrame = {
    requireUnigramVocab(vocab, maxPiece, unkScore)
    val vm = typedLit(vocab.map { case (p, id, s) => p -> (id, s) }.toMap)
    docs
      .select(col(idCol),
        posexplode(filter(split(col(textCol), "\\s+"), t => t =!= ""))
          .as(Seq("word_idx", "word")))
      .select(col(idCol), col("word_idx").cast("long").as("word_idx"),
        col("word").substr(lit(1), lit(maxWordLen)).as("word"))
      .withColumn("__dp",
        unigramDp(col("word"), vm, maxPiece, maxWordLen, unkScore))
      .select(col(idCol), col("word_idx"), col("word"),
        unigramBacktrack(col("__dp"), length(col("word")).cast("int"),
          maxWordLen).as("piece_ids"),
        element_at(col("__dp"), length(col("word")).cast("int"))
          .getField("score").as("score"))
  }

  /** Corpus → (word, weight) occurrence dictionary — the unigram
    * trainer's one corpus-sized pass (the [[wordDict]] collapse, kept
    * as whole words for substring candidate extraction).
    */
  def unigramWordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(filter(split(col(textCol), "\\s+"), t => t =!= ""))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("weight"))

  /** Seed statistics: every 1..maxPiece-char substring of every dict
    * word, weighted by the word's corpus count. Dict-sized input
    * (vocabulary-scale at any corpus size), bounded per-word
    * expansion (≤ len·maxPiece substrings per word).
    */
  def unigramSeedCandidates(
      wordCounts: DataFrame, maxPiece: Int): DataFrame = {
    val w = col("word")
    val subs = flatten(array((1 to maxPiece).map { l =>
      when(length(w) >= l,
        transform(sequence(lit(1), length(w) - l + 1),
          p => w.substr(p, lit(l))))
        .otherwise(array().cast("array<string>"))
    }: _*))
    wordCounts.select(explode(subs).as("piece"), col("weight"))
      .groupBy(col("piece")).agg(sum(col("weight")).as("cnt"))
  }

  /** Dict-encode face used by the trainer (and by referee specs):
    * append Viterbi `piece_ids` for `wordCol` under the same
    * truncation contract as [[unigramEncode]].
    */
  private[graft] def unigramEncodeWords(
      df: DataFrame, wordCol: String, vocab: Seq[(String, Long, Long)],
      maxPiece: Int, maxWordLen: Int, unkScore: Long): DataFrame = {
    requireUnigramVocab(vocab, maxPiece, unkScore)
    val vm = typedLit(vocab.map { case (p, id, s) => p -> (id, s) }.toMap)
    df.withColumn("__w", col(wordCol).substr(lit(1), lit(maxWordLen)))
      .withColumn("__dp",
        unigramDp(col("__w"), vm, maxPiece, maxWordLen, unkScore))
      .withColumn("piece_ids",
        unigramBacktrack(col("__dp"), length(col("__w")).cast("int"),
          maxWordLen))
      .drop("__w", "__dp")
  }

  /** Q20 log2 over arbitrary-precision counts: drop low bits until the
    * value fits the 62-bit window log2Q20Host accepts, add the shift
    * back as whole bits. The dropped bits sit below the Q20 resolution
    * (≤ 2⁻⁴² relative), so for long-ranged inputs this IS log2Q20Host
    * — the BigInt range only exists so soft-EM's weighted Q20 masses
    * cannot silently wrap a Long at corpus scale.
    */
  private[graft] def log2Q20Big(v: BigInt): Long = {
    require(v >= 1, s"log2Q20Big needs v >= 1, got $v")
    val k = math.max(0, v.bitLength - 62)
    EvalOps.log2Q20Host((v >> k).toLong) + k.toLong * (1L << 20)
  }

  /** Re-score a (piece, count) set as Q20 log2(count/total) via the
    * host-side binLog2Q20 replica — both engines then consume the
    * same integer literals (the ndcgWeights idiom).
    */
  private def unigramRescore(
      counts: Seq[(String, BigInt)]): Seq[(String, Long)] = {
    val total = counts.map(_._2).sum
    counts.map { case (p, c) =>
      p -> (log2Q20Big(c) - log2Q20Big(total)) }
  }

  // ── Q20 integer log-sum-exp / exp2 (the soft-EM arithmetic) ──
  //
  // Soft EM needs Σ of probabilities under log-space scores. We keep
  // the trainer's exactness discipline by doing BOTH in deterministic
  // integer Q20: lse(a,b) = max + T_lse(Δ) and 2^(g/Q) = T_exp(frac)»int,
  // where the two tables are integer literals built once on the host
  // (StrictMath — bit-identical on every JVM) and shared verbatim by
  // the engine expressions and the UnigramSpec referee. Quantization
  // (Δ and frac at 2^14 steps) costs ≤ ~1% per op — irrelevant to EM,
  // which only needs consistent relative mass — while keeping every
  // ranking decision exact-integer and engine ≡ referee bit-for-bit.

  private val LseQuantShift = 14 // Q20 diffs quantize to 1/64-bit steps

  /** T_lse(i) = round(Q·log2(1 + 2^(−i/64))): the log-sum-exp
    * correction for a quantized score difference; 0 past the table.
    */
  private[graft] lazy val unigramLseTable: IndexedSeq[Long] =
    IndexedSeq.tabulate(26 * 64 + 1) { i =>
      math.round((1L << 20).toDouble *
        StrictMath.log1p(StrictMath.pow(2.0, -i / 64.0)) /
        StrictMath.log(2.0))
    }

  /** T_exp(i) = round(Q·2^(−i/64)) for the fractional part of a
    * negative Q20 exponent.
    */
  private[graft] lazy val unigramExpFracTable: IndexedSeq[Long] =
    IndexedSeq.tabulate(64)(i =>
      math.round((1L << 20).toDouble * StrictMath.pow(2.0, -i / 64.0)))

  /** Host replica of the engine's lse — the referee arithmetic. */
  private[graft] def hostLse(a: Long, b: Long): Long = {
    val hi = math.max(a, b)
    val idx = ((hi - math.min(a, b)) >> LseQuantShift).toInt
    hi + (if (idx < unigramLseTable.length) unigramLseTable(idx) else 0L)
  }

  /** Host replica of the engine's 2^(g/Q) in Q20 (g clamped ≤ 0). */
  private[graft] def hostExp2Q20(g: Long): Long = {
    val m = -math.min(g, 0L)
    // compare the integer part as a Long BEFORE narrowing: for
    // |g| ≥ 2^51 an Int truncation of (m >> 20) could wrap negative,
    // bypass the ≥ 21 guard and feed a negative shift — the engine's
    // exp2Q20Col compares the Long, so the referee must too
    val ipL = m >> 20
    if (ipL >= 21L) 0L
    else unigramExpFracTable(((m & ((1L << 20) - 1L)) >>
      LseQuantShift).toInt) >> ipL.toInt
  }

  /** Engine lse over nullable candidates: null means "no path". */
  private def lseCol(a: Column, b: Column): Column =
    when(a.isNull, b).otherwise(when(b.isNull, a).otherwise {
      val hi = greatest(a, b)
      val d = hi - least(a, b)
      hi + coalesce(
        try_element_at(typedLit(unigramLseTable),
          (shiftright(d, LseQuantShift) + 1).cast("int")),
        lit(0L))
    })

  private lazy val pow2Lit =
    typedLit(IndexedSeq.tabulate(22)(1L << _))

  /** Engine 2^(g/Q) in Q20, g clamped ≤ 0 — integer-exact division by
    * a power-of-two table (variable shifts aren't in the Column API;
    * the double division is exact: numerator ≤ 2^20).
    */
  private def exp2Q20Col(g: Column): Column = {
    val m = -least(g, lit(0L))
    val ip = shiftright(m, 20)
    val fIdx = shiftright(m.bitwiseAND(lit((1L << 20) - 1L)),
      LseQuantShift)
    when(ip >= 21, lit(0L)).otherwise(
      floor(element_at(typedLit(unigramExpFracTable),
        (fIdx + 1).cast("int")) /
        element_at(pow2Lit, (ip + 1).cast("int"))).cast("long"))
  }

  /** Forward pass: α(i) = lse over every piece ending at i of
    * α(i−l) + s(piece), UNK fallback on the single char — the
    * [[unigramDp]] lattice with max replaced by lse. Candidate fold
    * order (length maxPiece..2, then the single) is part of the
    * arithmetic contract (lse is quantized, so association order
    * matters) — the UnigramSpec referee folds in the same order.
    */
  private def unigramAlpha(
      w: Column, vm: Column, maxPiece: Int, maxWordLen: Int,
      unkScore: Long): Column =
    aggregate(
      sequence(lit(1), lit(maxWordLen)),
      array().cast("array<bigint>"),
      (acc, i) => {
        def prev(l: Int) = when(i === l, lit(0L))
          .otherwise(element_at(acc, (i - l).cast("int")))
        val multi = (maxPiece to 2 by -1).map { l =>
          val hit = try_element_at(vm,
            w.substr((i - l + 1).cast("int"), lit(l)))
          when(i >= l && hit.isNotNull, prev(l) + hit.getField("_2"))
        }
        val hit1 = try_element_at(vm, w.substr(i.cast("int"), lit(1)))
        val single =
          prev(1) + coalesce(hit1.getField("_2"), lit(unkScore))
        val a = (multi :+ single).reduce(lseCol)
        when(i > length(w), acc).otherwise(concat(acc, array(a)))
      })

  /** Backward pass: β(i) = lse over every piece starting at i+1 of
    * s(piece) + β(i+l), β(n) = 0. Accumulates in reverse: the result
    * array's k-th cell (1-based) is β(n−k+1), so β(i) =
    * cell(n−i+1). Same candidate order contract as [[unigramAlpha]].
    */
  private def unigramBeta(
      w: Column, vm: Column, maxPiece: Int, maxWordLen: Int,
      unkScore: Long): Column =
    aggregate(
      sequence(lit(1), lit(maxWordLen)),
      array(lit(0L)),
      (acc, j) => {
        val n = length(w)
        def nxt(l: Int) = element_at(acc, (j - l + 1).cast("int"))
        val multi = (maxPiece to 2 by -1).map { l =>
          val hit = try_element_at(vm,
            w.substr((n - j + 1).cast("int"), lit(l)))
          when(lit(l) <= j && hit.isNotNull, nxt(l) + hit.getField("_2"))
        }
        val hit1 = try_element_at(vm,
          w.substr((n - j + 1).cast("int"), lit(1)))
        val single =
          nxt(1) + coalesce(hit1.getField("_2"), lit(unkScore))
        val b = (multi :+ single).reduce(lseCol)
        when(j > n, acc).otherwise(concat(acc, array(b)))
      })

  /** Posterior piece-occurrence masses: for every lattice edge (a
    * piece of length l ending at position i), γ = α(i−l) + s + β(i) −
    * Z with Z = α(n), emitted as (pid, 2^γ in Q20) — the word's
    * expected piece counts before weighting. UNK edges carry
    * pid = −1 (filtered by the usage aggregation, like hard-EM).
    * `alpha`/`beta` MUST be materialized column attributes (the q260
    * lambda re-evaluation trap).
    */
  private def unigramGamma(
      w: Column, vm: Column, alpha: Column, beta: Column,
      maxPiece: Int, maxWordLen: Int, unkScore: Long): Column = {
    val n = length(w)
    val z = element_at(alpha, n.cast("int"))
    flatten(transform(sequence(lit(1), lit(maxWordLen)), i => {
      val cands = (1 to maxPiece).map { l =>
        val hit = try_element_at(vm,
          w.substr((i - l + 1).cast("int"), lit(l)))
        val aprev = when(i === l, lit(0L))
          .otherwise(try_element_at(alpha, (i - l).cast("int")))
        val s =
          if (l == 1) coalesce(hit.getField("_2"), lit(unkScore))
          else hit.getField("_2")
        val pid =
          if (l == 1) coalesce(hit.getField("_1"), lit(-1L))
          else hit.getField("_1")
        val bv = try_element_at(beta, (n - i + 1).cast("int"))
        val ok =
          if (l == 1) i <= n
          else i <= n && i >= lit(l) && hit.isNotNull
        when(ok, struct(pid.as("pid"),
          exp2Q20Col(aprev + s + bv - z).as("c")))
      }
      filter(array(cands: _*), e => e.isNotNull)
    }))
  }

  /** Soft-EM E-step: expected piece-usage counts over the word dict,
    * in Q20 fixed point (Σ_words weight · Σ_edges 2^γ). One dict-sized
    * pass: the α/β folds and the γ emission all run inside the scan
    * stage; the only shuffle is the |vocab|-sized usage groupBy.
    */
  private[graft] def unigramEmUsage(
      wordCounts: DataFrame, vocab: Seq[(String, Long, Long)],
      maxPiece: Int, maxWordLen: Int, unkScore: Long): DataFrame = {
    requireUnigramVocab(vocab, maxPiece, unkScore)
    val vm = typedLit(vocab.map { case (p, id, s) => p -> (id, s) }.toMap)
    wordCounts
      .withColumn("__w", col("word").substr(lit(1), lit(maxWordLen)))
      .withColumn("__a",
        unigramAlpha(col("__w"), vm, maxPiece, maxWordLen, unkScore))
      .withColumn("__b",
        unigramBeta(col("__w"), vm, maxPiece, maxWordLen, unkScore))
      .select(col("weight"),
        explode(unigramGamma(col("__w"), vm, col("__a"), col("__b"),
          maxPiece, maxWordLen, unkScore)).as("g"))
      .filter(col("g.pid") >= 0L)
      .groupBy(col("g.pid").as("pid"))
      // decimal accumulation: weight × Q20 mass per edge, summed over
      // the dict — a Long would silently wrap once one piece's
      // weighted mass passes 2⁶³ (≈8.8e12 weighted occurrences)
      .agg(sum(col("g.c").cast("decimal(38,0)") *
        col("weight").cast("decimal(38,0)")).as("u"))
  }

  /** Unigram-LM vocabulary training with SOFT-EM expected counts —
    * Kudo 2018's actual E-step: forward–backward posterior masses
    * over the segmentation lattice instead of [[unigramTrainViterbi]]'s
    * winner-take-all Viterbi counts, in the same exact-integer Q20
    * arithmetic (quantized lse/exp2 tables above). The divergence this
    * fixes (UnigramSpec plants it): when two segmentations of a word
    * tie, hard-EM gives ALL count to the tie-break winner and the
    * loser's pieces die in one round even when the corpus genuinely
    * supports both; soft-EM splits the mass, keeping both alive for
    * the shrink schedule to judge on real evidence. Same seed, shrink
    * schedule, flooring and convergence rules as the Viterbi face —
    * which stays the referee (and the q290 encode gate is
    * training-agnostic, so it is untouched).
    */
  def unigramTrainEm(
      df: DataFrame, textCol: String, maxPiece: Int, vocabSize: Int,
      rounds: Int, seedVocab: Int = 4096, maxWordLen: Int = 16,
      unkScore: Long = -30L * 1048576L): Seq[(String, Long, Long)] =
    unigramTrain(df, textCol, maxPiece, vocabSize, rounds, seedVocab,
      maxWordLen, unkScore, em = true)

  /** Unigram-LM vocabulary training by Viterbi rounds — Kudo 2018's
    * EM alternation with the E-step's expected counts replaced by
    * Viterbi-best counts (hard-EM): the deterministic integer
    * variant — soft-EM forward–backward needs transcendental
    * log-sum-exp, which is not engine-portable.
    *
    *  - Seed: all 1..maxPiece-char substrings of the word dict, kept
    *    to the top `seedVocab` by corpus count (count desc, piece asc
    *    tie-break). ALL single chars are always kept regardless of
    *    budget — they make encoding total.
    *  - Per round: Viterbi-encode the DICT (never the corpus — the
    *    wordDict collapse), count piece usage weighted by word
    *    frequency, keep all singles (usage floored at 1) plus the
    *    top multis by (usage desc, piece asc) up to
    *    max(vocabSize, ⌈0.8·current⌉) — SentencePiece's own gradual
    *    shrink schedule — and re-score survivors as Q20
    *    log2(usage/total). Multis with zero usage drop immediately.
    *  - Stops early once the vocabulary is at `vocabSize` and a
    *    round no longer changes it.
    *
    * All distributed work is dict-sized: one encode pass + one
    * groupBy per round. Driver state is the vocabulary itself
    * (≤ seedVocab + alphabet entries — the learnMergesLocal
    * bounded-dict argument). Empty corpus → empty vocabulary.
    *
    * Returns (piece, id, scoreQ20) with ids 1..N in piece order —
    * feed straight to [[unigramEncode]]. UnigramSpec proves the whole
    * loop ≡ a sequential plain-Scala referee, bit-for-bit.
    */
  def unigramTrainViterbi(
      df: DataFrame, textCol: String, maxPiece: Int, vocabSize: Int,
      rounds: Int, seedVocab: Int = 4096, maxWordLen: Int = 16,
      unkScore: Long = -30L * 1048576L): Seq[(String, Long, Long)] =
    unigramTrain(df, textCol, maxPiece, vocabSize, rounds, seedVocab,
      maxWordLen, unkScore, em = false)

  /** Shared trainer loop — `em` selects the E-step (soft expected
    * counts vs Viterbi-best counts); seed, shrink schedule, flooring,
    * convergence and output shape are identical.
    */
  private def unigramTrain(
      df: DataFrame, textCol: String, maxPiece: Int, vocabSize: Int,
      rounds: Int, seedVocab: Int, maxWordLen: Int,
      unkScore: Long, em: Boolean): Seq[(String, Long, Long)] = {
    require(maxPiece >= 1, "maxPiece must be >= 1")
    require(vocabSize >= 1, "vocabSize must be >= 1")
    require(rounds >= 0, "rounds must be >= 0")
    require(seedVocab >= vocabSize, "seedVocab must be >= vocabSize")
    val wc = unigramWordCounts(df, textCol).graftCheckpoint()
    try {
      val seed = unigramSeedCandidates(wc, maxPiece).graftCheckpoint()
      val singles = seed.filter(length(col("piece")) === 1)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        .sortBy(_._1)
      if (singles.isEmpty) return Seq.empty // empty corpus
      val multisTop = seed.filter(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece").asc)
        .limit(math.max(0, seedVocab - singles.size))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      seed.unpersist()
      var cur: Seq[(String, Long)] = unigramRescore(
        (singles ++ multisTop).map { case (p, c) => p -> BigInt(c) })
      var round = 0
      var converged = false
      while (round < rounds && !converged) {
        val vocabNow = cur.zipWithIndex.map { case ((p, s), i) =>
          (p, i.toLong, s) }
        val pieceOf = vocabNow.map { case (p, i, _) => i -> p }.toMap
        val usageDf =
          if (em) unigramEmUsage(wc, vocabNow, maxPiece, maxWordLen,
            unkScore)
          else unigramEncodeWords(wc, "word", vocabNow,
              maxPiece, maxWordLen, unkScore)
            .select(explode(col("piece_ids")).as("pid"), col("weight"))
            .filter(col("pid") >= 0L)
            .groupBy(col("pid")).agg(sum(col("weight")).as("u"))
        // EM usage sums DECIMAL (weight × Q20 mass would wrap a Long
        // once one piece's weighted mass passes 2⁶³ — reachable for
        // top single-char pieces at the corpus scale this trainer
        // targets); both faces land in BigInt for the M-step
        val usageRows = usageDf
          .filter(col("u") > 0L) // a posterior mass rounding to 0 == unused
          .collect().map(r => pieceOf(r.getLong(0)) ->
            (if (em) BigInt(r.getDecimal(1).toBigInteger)
             else BigInt(r.getLong(1))))
          .toMap
        val singleKept = singles.map { case (p, _) =>
          p -> usageRows.getOrElse(p, BigInt(0)).max(BigInt(1)) }
        val target = math.max(vocabSize,
          math.ceil(cur.size * 0.8).toInt)
        val multiKept = cur.collect {
          case (p, _) if p.length > 1 && usageRows.contains(p) =>
            p -> usageRows(p) }
          .sortBy { case (p, u) => (-u, p) }
          .take(math.max(0, target - singleKept.size))
        val next = unigramRescore(singleKept ++ multiKept)
        converged = next.map(_._1).toSet == cur.map(_._1).toSet &&
          cur.size <= target
        cur = next
        round += 1
      }
      val scoreOf = cur.toMap
      cur.map(_._1).sorted.zipWithIndex.map { case (p, i) =>
        (p, (i + 1).toLong, scoreOf(p)) }
    } finally { wc.unpersist(); () }
  }
}
