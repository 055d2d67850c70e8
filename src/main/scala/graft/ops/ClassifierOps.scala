package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftColumns

/** Hashed-feature linear classifier application — the fastText-style
  * quality/domain classifier stage of a pre-training pipeline (score
  * every document with a learned linear model over hashed token
  * features; keep or route by label).
  *
  * Training happens offline; what the engine owns is APPLYING the model
  * to 100 TB, and the right shape for that is: weights live in a single
  * flat array of `dim` integer-micro values (the hashing trick bounds
  * the feature space, so the model is KBs–MBs no matter the corpus),
  * shipped to executors as a literal/broadcast array, and the score is
  * a pure per-row expression — `bias + Σ_t w[polyHash(t·salt) mod dim]`
  * via the `aggregate` HOF over the token array. Zero shuffles, zero
  * joins, zero UDFs: the whole classifier runs inside the scan stage at
  * whole-stage-codegen speed.
  *
  * Determinism contract: weights and bias are integer micros, the
  * feature hash is the portable polynomial hash, and the score is an
  * integer sum — bit-replayable in any engine with the same hash.
  */
object ClassifierOps {

  /** Non-empty whitespace tokens (matches the oracle's list_filter).
    * NULL text degrades to the empty token array — so a NULL document
    * scores exactly the bias with n_feats 0 instead of propagating NULL
    * through the score and a -1 through size().
    */
  private def toksNonEmpty(text: Column): Column =
    filter(split(coalesce(text, lit("")), "\\s+"), t => t =!= "")

  /** Hashed feature buckets of each token occurrence (with
    * multiplicity): `pmod(polyHash(token || ':' || salt), dim)`. The
    * salt namespaces the feature space so stacked models (quality,
    * domain, toxicity…) don't alias each other's buckets.
    */
  def featureBuckets(text: Column, dim: Int, salt: String): Column =
    transform(toksNonEmpty(text),
      t => pmod(GraftColumns.polyHash(concat(t, lit(":" + salt))),
        lit(dim.toLong)))

  /** Linear score in integer micros: `bias + Σ_t weights(bucket(t))`,
    * computed entirely per-row with the weights as a literal array.
    */
  def linearScoreMicro(
      text: Column, weightsMicro: Array[Long], biasMicro: Long,
      salt: String): Column = {
    require(weightsMicro.nonEmpty, "weights must be non-empty")
    val w = typedLit(weightsMicro)
    aggregate(
      featureBuckets(text, weightsMicro.length, salt),
      lit(biasMicro),
      (acc, b) => acc + element_at(w, (b + lit(1L)).cast("int")))
  }

  /** Deterministic pseudo-trained weight table for tests/gates: bucket b
    * weighs `((b·2654435761) mod 2001) − 1000` micros (Knuth
    * multiplicative spread over [−1000, 1000]) — trivially replayable in
    * SQL on any engine.
    */
  def knuthWeights(dim: Int): Array[Long] =
    Array.tabulate(dim)(b => ((b.toLong * 2654435761L) % 2001L) - 1000L)

  /** Apply the classifier to a document frame. Output: idCol, n_feats
    * (token occurrences scored), score_micro, label (1 ⇔ score > 0 —
    * the sigmoid-at-0.5 decision boundary of a binary linear model).
    */
  def classify(
      docs: DataFrame, idCol: String, textCol: String,
      weightsMicro: Array[Long], biasMicro: Long, salt: String): DataFrame =
    docs
      .select(col(idCol),
        size(featureBuckets(col(textCol), weightsMicro.length, salt))
          .cast("long").as("n_feats"),
        linearScoreMicro(col(textCol), weightsMicro, biasMicro, salt)
          .as("score_micro"))
      .withColumn("label",
        when(col("score_micro") > 0, lit(1L)).otherwise(lit(0L)))

  /** Multinomial Naive Bayes model in Q20 fixed-point binary logs.
    * `tokenLogs` (label, token, lg_cnt1) holds lg(count+1) for every
    * OBSERVED (class, token) pair only — Laplace-1 makes the unobserved
    * pair's numerator lg(0+1) = 0, so absent rows contribute exactly
    * nothing and the model table stays |observed pairs|-sized (the
    * per-class denominator factors out of the token sum; see
    * `nbPredict`). `classStats` (label, prior, den) is |classes| rows:
    * prior = lg(n_c) − lg(N), den = lg(T_c + V).
    */
  final case class NbModel(tokenLogs: DataFrame, classStats: DataFrame)

  /** Train a multinomial NB classifier IN the engine (the training
    * companion to the apply-only fastText face above — e.g. a language
    * or domain router learned from a labeled slice of the corpus).
    *
    * Everything is map-side-combinable aggregation: token counts per
    * (class, token), class totals, vocabulary size and doc counts are
    * one groupBy each; no windows, no iteration — NB's closed-form MLE
    * is why it is THE classifier you can train on 100 TB in one pass.
    * Scalars (V, N) fold in as broadcast 1-row aggregates (q96 scalar
    * pattern). All likelihoods are Q20 integer logs (binLog2Q20), so
    * scores replay bit-for-bit in any engine with the same recurrence.
    *
    * Smoothing: Laplace-1 over the TRAIN vocabulary V; an apply-time
    * token never seen in ANY class contributes lg(1) − den(c) per
    * occurrence — the den(c) part rides the per-doc token count, so
    * fully-OOV tokens still discriminate by class verbosity only
    * (standard multinomial-NB-with-add-one semantics).
    */
  def nbTrain(
      train: DataFrame, textCol: String, labelCol: String): NbModel =
    nbModel(nbCounts(train, textCol, labelCol))

  /** The model's ALGEBRAIC form — raw (class, token) occurrence counts
    * plus per-class doc counts. Counts merge by plain addition, which
    * is what makes NB maintenance incremental: shard-train, union,
    * sum — no renormalization pass (the log transform happens once, in
    * `nbModel`). The q89/q237 incremental≡recomputed discipline.
    */
  final case class NbCounts(tokenCounts: DataFrame, docCounts: DataFrame)

  def nbCounts(
      train: DataFrame, textCol: String, labelCol: String): NbCounts = {
    val tok = train.select(col(labelCol).as("label"),
      explode(toksNonEmpty(col(textCol))).as("token"))
    NbCounts(
      tok.groupBy(col("label"), col("token"))
        .agg(count(lit(1)).as("cnt")),
      train.groupBy(col(labelCol).as("label"))
        .agg(count(lit(1)).as("ndocs")))
  }

  /** Merge count shards (a batch model + a delta, or N shards): union
    * + sum per key. `nbModel(nbMergeCounts(a, b))` is EXACTLY
    * `nbTrain` over the concatenated corpora — counts are the
    * sufficient statistics, so the identity is algebraic, not
    * approximate (spec-proven in ModelOpsSpec).
    */
  def nbMergeCounts(a: NbCounts, b: NbCounts): NbCounts =
    NbCounts(
      a.tokenCounts.unionByName(b.tokenCounts)
        .groupBy(col("label"), col("token"))
        .agg(sum(col("cnt")).as("cnt")),
      a.docCounts.unionByName(b.docCounts)
        .groupBy(col("label")).agg(sum(col("ndocs")).as("ndocs")))

  /** Finalize counts into the Q20 log-space model (see `NbModel`). */
  def nbModel(counts: NbCounts): NbModel = {
    val lg = GraftColumns.binLog2Q20 _
    val cnt = counts.tokenCounts
    val tc = cnt.groupBy(col("label")).agg(sum(col("cnt")).as("__tc"))
    val v = cnt.select(col("token")).distinct()
      .agg(count(lit(1)).as("__v"))
    val nc = counts.docCounts
      .select(col("label"), col("ndocs").as("__nc"))
    val n = counts.docCounts.agg(sum(col("ndocs")).as("__n"))
    val tokenLogs = cnt.select(col("label"), col("token"),
      lg(col("cnt") + 1L).as("lg_cnt1"))
    val classStats = nc
      .join(tc, Seq("label"))
      .crossJoin(broadcast(v)).crossJoin(broadcast(n))
      .select(col("label"),
        (lg(col("__nc")) - lg(col("__n"))).as("prior"),
        lg(col("__tc") + col("__v")).as("den"))
    NbModel(tokenLogs, classStats)
  }

  /** Per-class most-discriminative tokens by Laplace-smoothed log-odds
    * against the REST of the corpus — the standard "what did the
    * model learn?" readout (and a corpus-slice keyword extractor):
    *
    *   lo(c,t) = [lg(cnt_c+1) − lg(T_c+V)] − [lg(cnt_r+1) − lg(T_r+V)]
    *
    * with cnt_r/T_r the complement counts (derived by subtraction from
    * the token/class totals — no second pass over the corpus). Output:
    * top `k` per class by (log-odds desc, token), with rank. All Q20
    * integer; the per-class window runs over the vocabulary-sized
    * count table, never the corpus.
    */
  def nbTopTokens(counts: NbCounts, k: Int): DataFrame = {
    val lg = GraftColumns.binLog2Q20 _
    val cnt = counts.tokenCounts
    val tc = cnt.groupBy(col("label")).agg(sum(col("cnt")).as("__tc"))
    val tt = cnt.groupBy(col("token")).agg(sum(col("cnt")).as("__tt"))
    val v = cnt.select(col("token")).distinct()
      .agg(count(lit(1)).as("__v"))
    val sumTc = tc.agg(sum(col("__tc")).as("__sum"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label"))
      .orderBy(col("log_odds").desc, col("token").asc)
    cnt
      .join(tt, Seq("token"))
      .join(broadcast(tc), Seq("label"))
      .crossJoin(broadcast(v)).crossJoin(broadcast(sumTc))
      .select(col("label"), col("token"),
        ((lg(col("cnt") + 1L) - lg(col("__tc") + col("__v"))) -
          (lg(col("__tt") - col("cnt") + 1L) -
            lg(col("__sum") - col("__tc") + col("__v"))))
          .as("log_odds"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("label"), col("rank").cast("long").as("rank"),
        col("token"), col("log_odds"))
  }

  /** Score and label a test frame against an `NbModel`:
    *
    *   score(d, c) = prior(c) − ntok(d)·den(c) + Σ_t tf(d,t)·lg_cnt1(c,t)
    *
    * (the per-class denominator multiplies out of the token sum, which
    * is what lets unobserved (c,t) pairs cost nothing). The token-sum
    * term is ONE equi-join of the doc-token stream against the model
    * on `token` — inverted-index shaped, never doc×vocab; the dense
    * (doc × class) grid exists only for the |classes|-row broadcast
    * cross and the final argmax. Prediction is the q246 struct-max
    * idiom (ties → lexicographically larger label), map-side
    * combinable, no window.
    *
    * Output: (idCol, predicted, score) — best class + its Q20 score.
    *
    * Input contract: `idCol` is UNIQUE per row (it keys the per-doc
    * token aggregation; duplicate ids would merge documents — the
    * hammingNeighborPairs contract class).
    */
  def nbPredict(
      test: DataFrame, idCol: String, textCol: String,
      model: NbModel): DataFrame = {
    val toks = test.select(col(idCol),
      explode(toksNonEmpty(col(textCol))).as("token"))
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("__tf"))
    val hits = tf
      .join(model.tokenLogs, Seq("token"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("__tf") * col("lg_cnt1")).as("__hit"))
    val ntok = test.select(col(idCol),
      size(toksNonEmpty(col(textCol))).cast("long").as("__nt"))
    val scored = ntok
      .crossJoin(broadcast(model.classStats))
      .join(hits, Seq(idCol, "label"), "left")
      .select(col(idCol), col("label"),
        (col("prior") - col("__nt") * col("den") +
          coalesce(col("__hit"), lit(0L))).as("__score"))
    scored.groupBy(col(idCol))
      .agg(max(struct(col("__score"), col("label"))).as("__best"))
      .select(col(idCol), col("__best.label").as("predicted"),
        col("__best.__score").as("score"))
  }
}
