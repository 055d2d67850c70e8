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
}
