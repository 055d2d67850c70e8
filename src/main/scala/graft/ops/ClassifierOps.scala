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
}
