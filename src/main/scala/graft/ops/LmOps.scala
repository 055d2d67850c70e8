package graft.ops

import graft.ops.Checkpointer._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftColumns

/** Statistical n-gram language-model training and scoring — the CCNet /
  * RedPajama-style "perplexity filter" stage of a pre-training data
  * pipeline: train a smoothed bigram model on a (reference or self)
  * corpus, score every document by its mean token-transition
  * probability, and filter on the score.
  *
  * Determinism contract: no floats. The Laplace-smoothed probability of
  * each bigram occurrence is held in integer micros
  * (`1e6·(c(w1,w2)+1) div (c(w1)+V)`), and a document's score is the
  * integer mean over its bigram occurrences — a monotone proxy for
  * (negative) perplexity at fixed document length that two engines
  * replay bit-for-bit (exact `div` end to end; see
  * [[GraftColumns.longDiv]]).
  *
  * 100 TB shape:
  *   - training is ONE map-side-combined `groupBy` pass over the
  *     exploded bigram stream (the materialized bigram-count table);
  *     context counts and the model join derive from that table — the
  *     model is a stored table, never collected to the driver, and
  *     shard models fold via [[mergeBigramModels]];
  *   - scoring is TWO equi-joins of the document bigram stream: one on
  *     (w1, w2) for the bigram count, one on w1 against the
  *     vocabulary-sized context table for the true Laplace denominator —
  *     plus the per-document re-aggregation. The vocabulary size rides
  *     along as a broadcast 1-row aggregate (same pattern as q96's
  *     corpus-size scalar);
  *   - unseen bigrams (scoring a corpus the model wasn't trained on)
  *     degrade with TRUE Laplace backoff: a missing (w1, w2) row whose
  *     context w1 is in the model scores `1e6·1 div (c(w1)+V)` (the
  *     normalized conditional), and only a fully-unknown w1 falls back
  *     to the uniform `1e6·1 div (0+V)`. For self-scoring (the
  *     conformance gate) every bigram is present, so the scores are
  *     identical to the single-join form.
  */
object LmOps {

  /** Non-empty whitespace tokens — matches the oracle's
    * `list_filter(string_split_regex(text,'\s+'), t -> t <> '')`.
    */
  private def toks(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Adjacent-token pairs, in order, with multiplicity; empty array
    * for documents of fewer than two tokens. zip_with over SHIFTED
    * SLICES, not transform+element_at: here the token array sits in
    * argument position and is evaluated once per row, where an
    * expression referenced inside a `transform` lambda is re-evaluated
    * on every element access after projection collapse — per-document
    * cost quadratic (re-tokenizing the text L times for L bigrams;
    * measured 30× on the sf0.1 bench for the embedded form and ~14×
    * for element_at even over a pre-bound column, q260 incident).
    */
  private def bigramArrayOf(tk: Column): Column =
    zip_with(
      slice(tk, lit(1), greatest(size(tk) - 1, lit(0))),
      slice(tk, lit(2), greatest(size(tk) - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))

  /** Column names the LM frames mint; the id column must not collide. */
  private val Reserved =
    Set("w1", "w2", "cb", "cu", "__bg", "__tk", "__p", "__sp", "__v",
      "__cu1", "n_bigrams", "score_micro")

  /** Exploded bigram occurrences: one row per adjacent token pair per
    * document (with multiplicity). Columns: idCol, w1, w2.
    */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    require(!Reserved(idCol), s"idCol '$idCol' collides with LM columns")
    docs
      .select(col(idCol), toks(col(textCol)).as("__tk"))
      .select(col(idCol), explode(bigramArrayOf(col("__tk"))).as("__bg"))
      .select(col(idCol), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
  }

  /** Train a Laplace-smoothed bigram model: (w1, w2, cb, cu) where cb is
    * the bigram count and cu the context count (occurrences of w1 as a
    * bigram head). The context count is denormalized onto each bigram row
    * at train time (model-sized join) so scoring needs a single lookup
    * join.
    */
  def bigramModel(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // ONE corpus pass: the bigram-count table is materialized
    // (localCheckpoint — distributed, model-sized; the stored-model
    // shape a production pipeline would persist to a table), and the
    // context counts derive from it (cu = Σ_w2 cb) instead of a second
    // pass over the corpus.
    val bc = bigrams(docs, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      .graftCheckpoint()
    val cc = bc.groupBy(col("w1")).agg(sum(col("cb")).as("cu"))
    bc.join(cc, Seq("w1"))
  }

  /** Merge two bigram models (trained with [[bigramModel]] on disjoint
    * or overlapping corpus shards): bigram counts add, and context
    * counts re-derive from the merged bigram table — so
    * `merge(model(A), model(B)) == model(A ∪ B)` exactly. This is what
    * makes training incremental at 100 TB: shards/days train
    * independently and fold together with one model-sized aggregation,
    * never re-touching the corpus.
    */
  def mergeBigramModels(m1: DataFrame, m2: DataFrame): DataFrame = {
    val bc = m1.select(col("w1"), col("w2"), col("cb"))
      .unionByName(m2.select(col("w1"), col("w2"), col("cb")))
      .groupBy(col("w1"), col("w2")).agg(sum(col("cb")).as("cb"))
      .graftCheckpoint()
    val cc = bc.groupBy(col("w1")).agg(sum(col("cb")).as("cu"))
    bc.join(cc, Seq("w1"))
  }

  /** Corpus vocabulary size as a 1-row frame (distinct tokens) — kept
    * in-plan for a broadcast crossJoin at score time rather than a
    * driver collect.
    */
  def vocabSize(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(toks(col(textCol))).as("__t"))
      .agg(count_distinct(col("__t")).as("__v"))

  /** Score documents by mean smoothed bigram probability in micros.
    * Output: idCol, n_bigrams (occurrences), score_micro — documents
    * with fewer than two tokens score 0 with n_bigrams 0.
    *
    * Laplace backoff is exact for cross-corpus scoring: the context
    * count c(w1) is joined separately on w1 (vocabulary-sized table
    * derived from the model), so an unseen bigram whose head w1 IS in
    * the model scores `1e6·1 div (c(w1)+V)` — the properly-normalized
    * conditional — rather than the uniform `1e6·1 div (0+V)` that a
    * single denormalized-model join would give. Self-scoring results
    * are unchanged (every bigram row matches, carrying the same cu).
    */
  def scoreByBigramLm(
      docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, vocab: DataFrame): DataFrame = {
    require(!Reserved(idCol), s"idCol '$idCol' collides with LM columns")
    // Per-head context counts: the model denormalizes cu onto every
    // (w1, w2) row, so one distinct-by-w1 pass recovers the table.
    val ctx = model.groupBy(col("w1")).agg(max(col("cu")).as("__cu1"))
    // explode_OUTER keeps <2-token documents as a single null-bigram row,
    // so every document survives in ONE corpus pass — no join-back scan.
    // The null row contributes nothing: count(w1) skips it, the guarded
    // __p stays null, and the all-null sum coalesces to score 0.
    docs
      .select(col(idCol), toks(col(textCol)).as("__tk"))
      .select(col(idCol), explode_outer(bigramArrayOf(col("__tk"))).as("__bg"))
      .select(col(idCol), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
      .join(model.select(col("w1"), col("w2"), col("cb")),
        Seq("w1", "w2"), "left_outer")
      .join(ctx, Seq("w1"), "left_outer")
      .crossJoin(broadcast(vocab))
      .select(col(idCol), col("w1"),
        when(col("w1").isNotNull,
          GraftColumns.longDiv(
            lit(1000000L) * (coalesce(col("cb"), lit(0L)) + lit(1L)),
            coalesce(col("__cu1"), lit(0L)) + col("__v"))).as("__p"))
      .groupBy(col(idCol))
      .agg(count(col("w1")).as("n_bigrams"), sum(col("__p")).as("__sp"))
      .select(col(idCol),
        col("n_bigrams"),
        coalesce(GraftColumns.longDiv(col("__sp"), col("n_bigrams")), lit(0L))
          .as("score_micro"))
  }

  /** Pointwise mutual information per bigram, Q20 fixed point — the
    * collocation/association readout over the corpus LM stats:
    *
    *   PMI = log2 p(w1,w2) − log2 p(w1) − log2 p(w2)
    *       = log2 cb + 2·log2 Nt − log2 Nb − log2 c1 − log2 c2
    *
    * computed as FIVE separate [[GraftColumns.binLog2Q20]] calls (never
    * the product form `cb·Nt²/(Nb·c1·c2)`, whose numerator overflows
    * Long at web-corpus counts). No transcendentals — the q153 oracle
    * replays the identical integer recurrence in SQL.
    *
    * Scale: unigram and bigram counts are map-side-combined aggregates;
    * the two count totals are 1-row aggregates of the MODEL-sized count
    * tables (never a second corpus pass) broadcast in-plan; the c1/c2
    * attach is two equi-joins against the vocab-sized unigram table.
    * `minCount` prunes the bigram table BEFORE the joins — rare-pair
    * PMI is noise (famously explodes for hapax pairs) and would
    * dominate the join input.
    */
  def pmiBigrams(
      docs: DataFrame, idCol: String, textCol: String,
      minCount: Long): DataFrame = {
    require(minCount >= 1L, "minCount must be >= 1")
    val lg = GraftColumns.binLog2Q20 _
    val uc = docs.select(explode(toks(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("cu"))
      .graftCheckpoint()
    val nt = uc.agg(sum(col("cu")).as("__nt"))
    val bc = bigrams(docs, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      .graftCheckpoint()
    val nb = bc.agg(sum(col("cb")).as("__nb"))
    bc.filter(col("cb") >= minCount)
      .join(uc.select(col("t").as("w1"), col("cu").as("c1")), Seq("w1"))
      .join(uc.select(col("t").as("w2"), col("cu").as("c2")), Seq("w2"))
      .crossJoin(broadcast(nt))
      .crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("cb"), col("c1"), col("c2"),
        (lg(col("cb")) + lit(2L) * lg(col("__nt")) - lg(col("__nb"))
          - lg(col("c1")) - lg(col("c2"))).as("pmi_q20"))
  }

  /** Skip-gram co-occurrence pairs (the word2vec context window,
    * counted): unordered token pairs within `window` positions of each
    * other, canonicalized (w_a ≤ w_b). Where [[pmiBigrams]] sees only
    * ADJACENT pairs, the window catches collocations that tolerate
    * interveners ("strong … tea").
    *
    * Scale shape: positions meet through an EQUI-join on
    * (doc, pos + offset) with the offsets 1..window exploded — cost is
    * |tokens|·window, linear in the corpus — never a |pos_a − pos_b| ≤
    * w inequality join (per-doc quadratic, the sorted-blocking lesson
    * of q147). Counts are map-side combined on the canonical pair key.
    *
    * Output: (w_a, w_b, cnt) with w_a ≤ w_b (self-pairs from repeated
    * tokens included — they are genuine co-occurrences).
    */
  def skipgramCounts(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val pos = docs
      .select(col(idCol).as("__d"),
        posexplode(toks(col(textCol))).as(Seq("__p", "__t")))
    val shifted = pos.select(col("__d"),
        explode(sequence(lit(1), lit(window))).as("__off"),
        col("__p"), col("__t"))
      .select(col("__d"), (col("__p") + col("__off")).as("__p2"),
        col("__t").as("__tl"))
    shifted
      .join(pos.select(col("__d"), col("__p").as("__p2"),
        col("__t").as("__tr")), Seq("__d", "__p2"))
      .select(least(col("__tl"), col("__tr")).as("w_a"),
        greatest(col("__tl"), col("__tr")).as("w_b"))
      .groupBy(col("w_a"), col("w_b"))
      .agg(count(lit(1)).as("cnt"))
  }
}
