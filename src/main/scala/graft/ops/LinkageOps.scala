package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-linkage scoring — the decision stage that follows candidate
  * generation ([[BlockingOps]] sorted-neighborhood blocking produces
  * the pairs; this classifies them).
  *
  * Fellegi–Sunter (1969): each compared field contributes a log-odds
  * weight — log(m/u) on agreement, log((1−m)/(1−u)) on disagreement,
  * where m = P(agree | match) and u = P(agree | non-match) — and the
  * pair's total score is the sum, thresholded into
  * match / possible / non-match. The m/u probabilities are MODEL
  * PARAMETERS estimated offline (classically by EM over the candidate
  * set); like the hashed-classifier weights (ClassifierOps), they
  * enter the plan as integer-milli literals, so scoring is pure
  * integer adds + a levenshtein per field inside the scan stage — no
  * joins, no shuffles beyond what the candidate generator already did,
  * and bit-replayable by any engine.
  */
object LinkageOps {

  /** One field comparison: agreement = levenshtein(colA, colB) ≤
    * `maxDist` (0 = exact match), nulls never agree. `agreeMilli` /
    * `disagreeMilli` are the FS log-odds weights in integer milli
    * (agreement weights positive, disagreement negative, by
    * construction of log(m/u) for m > u).
    */
  final case class FieldRule(
      name: String, colA: String, colB: String, maxDist: Int,
      agreeMilli: Long, disagreeMilli: Long)

  /** Score candidate `pairs`: adds one boolean `agree_<name>` per rule,
    * `score_milli` = Σ (agree ? agreeMilli : disagreeMilli), and
    * `decision` ∈ match / possible / nonmatch by the two thresholds.
    */
  def fellegiSunterScore(
      pairs: DataFrame, rules: Seq[FieldRule],
      upperMilli: Long, lowerMilli: Long): DataFrame = {
    require(rules.nonEmpty, "need at least one field rule")
    require(upperMilli >= lowerMilli, "upper threshold below lower")
    def agreeCol(r: FieldRule): Column =
      when(col(r.colA).isNull || col(r.colB).isNull, lit(false))
        .otherwise(levenshtein(col(r.colA), col(r.colB)) <= r.maxDist)
    val withAgree = rules.foldLeft(pairs)((df, r) =>
      df.withColumn(s"agree_${r.name}", agreeCol(r)))
    val score = rules.map(r =>
      when(col(s"agree_${r.name}"), lit(r.agreeMilli))
        .otherwise(lit(r.disagreeMilli))).reduce(_ + _)
    withAgree
      .withColumn("score_milli", score)
      .withColumn("decision",
        when(col("score_milli") >= upperMilli, lit("match"))
          .when(col("score_milli") <= lowerMilli, lit("nonmatch"))
          .otherwise(lit("possible")))
  }
}
