package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Learn `k` merges from a corpus. Returns the ordered merge list —
    * the tokenizer artifact. Stops early if no pair remains (every word
    * fused to one symbol).
    */
  def learnMerges(
      df: DataFrame, textCol: String, k: Int): Seq[(String, String)] = {
    require(k >= 0, "k must be >= 0")
    var dict = wordDict(df, textCol).localCheckpoint()
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
        val next = mergeOnce(dict, a, b).localCheckpoint()
        dict.unpersist()   // bound executor storage to 2 dict copies
        dict = next
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
    * production tokenizer with 30k+ merges would blow the expression
    * tree and belongs in a broadcast-trie `mapPartitions` encoder —
    * same output contract, swap point documented here on purpose.
    */
  def applyMerges(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(filter(split(word, ""), s => s =!= "")) {
      case (syms, (a, b)) => mergeFold(syms, a, b)
    }
}
