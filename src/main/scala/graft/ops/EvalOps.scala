package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation metrics at corpus scale — the readout stage for
  * the curation models ([[ClassifierOps]], [[LmOps]]): a quality/toxicity
  * filter is deployed on a threshold, and the threshold comes from the
  * ROC curve of its scores against labeled data.
  *
  * Scale design: everything here runs over the score VALUE HISTOGRAM
  * (the q163/q168 pattern) — one map-side-combined aggregation reduces
  * the corpus to |distinct scores| rows, and the ordered cumulative
  * walks that domain, never raw rows. A billion-document eval set with
  * integer scores costs one shuffle to the histogram; if the score
  * domain itself is huge (raw micros), equi-depth bucket the scores
  * first (q171) — the curve is then exact per bucket boundary.
  */
object EvalOps {

  /** Exact ROC curve + AUC in one pass, integer-exact (engine-replayable).
    *
    * One row per distinct score, descending-threshold convention
    * (predict positive when score ≥ threshold):
    * (score, pos, neg, tp, fp, tpr_ppm, fpr_ppm, auc_ppm) with
    * tp/fp the inclusive cumulative counts from the top and the rates
    * in parts-per-million via exact integral division.
    *
    * `auc_ppm` (constant across rows — attached as an in-plan 1-row
    * scalar, the q121/q167 pattern) is the exact Mann–Whitney statistic
    * with midrank tie handling:
    * `AUC·2PN = Σ_s pos_s·(2·negBelow_s + neg_s)`, negBelow_s = N − fp_s
    * — ties contribute half, reproduced as integer arithmetic scaled by
    * 2 so nothing is halved. Null auc_ppm iff a class is empty.
    */
  def rocAnalysis(
      df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val div = graft.functions.GraftColumns.longDiv _
    val hist = df
      .groupBy(col(scoreCol).cast("long").as("score"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("neg"))
    // ordered walk over DISTINCT scores (domain-sized, not corpus-sized;
    // see object scaladoc for the huge-domain mitigation)
    val wDesc = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = hist
      .withColumn("tp", sum(col("pos")).over(wDesc))
      .withColumn("fp", sum(col("neg")).over(wDesc))
    val totals = hist.agg(
      coalesce(sum(col("pos")), lit(0L)).as("__p"),
      coalesce(sum(col("neg")), lit(0L)).as("__n"))
    val withTot = pts.crossJoin(broadcast(totals))
    // a single-class eval set has no ranking to score: every divisor
    // guards to NULL (ANSI mode throws on a bare div-by-zero)
    def safeDiv(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column) =
      when(den > 0L, div(num, den))
    val auc = withTot.agg(
      safeDiv(sum(col("pos") *
          (lit(2L) * (col("__n") - col("fp")) + col("neg"))) * 1000000L,
        lit(2L) * max(col("__p")) * max(col("__n"))).as("auc_ppm"))
    withTot.crossJoin(broadcast(auc))
      .select(col("score"), col("pos"), col("neg"), col("tp"), col("fp"),
        safeDiv(col("tp") * 1000000L, col("__p")).as("tpr_ppm"),
        safeDiv(col("fp") * 1000000L, col("__n")).as("fpr_ppm"),
        col("auc_ppm"))
  }

  /** Per-group exact AUC — [[rocAnalysis]]'s Mann–Whitney statistic with
    * the histogram walk PARTITIONED by the group key, so no global
    * ordered window exists at any scale (per-slice model monitoring:
    * AUC per language / source / time bucket). Output: one row per
    * group (group, pos, neg, auc_ppm); auc_ppm NULL for single-class
    * groups.
    */
  def rocAucGrouped(
      df: DataFrame, groupCol: String, scoreCol: String,
      labelCol: String): DataFrame = {
    val div = graft.functions.GraftColumns.longDiv _
    val hist = df
      .groupBy(col(groupCol), col(scoreCol).cast("long").as("score"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("neg"))
    val wCum = Window.partitionBy(col(groupCol))
      .orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    val pts = hist
      .withColumn("fp", sum(col("neg")).over(wCum))
      .withColumn("__n", sum(col("neg")).over(wAll))
    pts.groupBy(col(groupCol))
      .agg(
        sum(col("pos")).as("pos"),
        min(col("__n")).as("neg"),
        sum(col("pos") *
          (lit(2L) * (col("__n") - col("fp")) + col("neg"))).as("__u2"))
      .select(col(groupCol), col("pos"), col("neg"),
        when(col("pos") > 0L && col("neg") > 0L,
          div(col("__u2") * 1000000L,
            lit(2L) * col("pos") * col("neg"))).as("auc_ppm"))
  }

  /** Cumulative Poisson(1) distribution in floored ppm for k = 0..8 —
    * the literal inverse-CDF table for [[poissonBootstrapMeans]]. A
    * hash-uniform u ∈ [0, 1e6) maps to multiplicity
    * w = |{c ∈ table : c ≤ u}| (≤ 9; the &lt; 2e-6 tail mass collapses
    * into w = 9). Fixed literals on both engines — the sampling design
    * is deterministic, so fidelity to true Poisson beyond ppm is
    * irrelevant to correctness.
    */
  val PoissonCdfPpm: Array[Long] = Array(
    367879L, 735758L, 919698L, 981011L, 996340L,
    999405L, 999916L, 999989L, 999998L)

  /** Poisson bootstrap (Chamandy et al. 2012, the only bootstrap that
    * works on a corpus you cannot hold or index globally): replica b
    * gives row r multiplicity w ~ Poisson(1), here DERANDOMIZED as the
    * literal inverse-CDF of a portable hash of (id, b, salt) — so every
    * engine, run, and partitioning draws the identical resample. One
    * corpus pass emits all B replicas (explode ×B, map-side-combined
    * sums); a naive bootstrap would rescan the corpus B times and need
    * a global index for with-replacement draws.
    *
    * Output: one row per replica (replica, n_eff, value_sum,
    * mean_milli) — the replica-mean distribution, whose spread IS the
    * sampling uncertainty of the corpus mean (quantile it downstream,
    * e.g. via q140's sketch or a plain sort at B rows).
    */
  def poissonBootstrapMeans(
      df: DataFrame, idCol: String, valueCol: String, replicas: Int,
      salt: String): DataFrame = {
    require(replicas >= 1, "need at least one replica")
    val div = graft.functions.GraftColumns.longDiv _
    val cdf = typedLit(PoissonCdfPpm)
    val u = pmod(
      graft.functions.GraftColumns.polyHash(
        concat(col(idCol).cast("string"), lit(":"),
          col("replica").cast("string"), lit(":" + salt))),
      lit(1000000L))
    df.select(col(idCol), col(valueCol).cast("long").as("__v"),
        explode(sequence(lit(0), lit(replicas - 1))).as("replica"))
      .withColumn("__w", size(filter(cdf, c => c <= u)).cast("long"))
      .groupBy(col("replica"))
      .agg(sum(col("__w")).as("n_eff"),
        sum(col("__w") * col("__v")).as("value_sum"))
      .select(col("replica").cast("long").as("replica"),
        col("n_eff"), col("value_sum"),
        when(col("n_eff") > 0L,
          div(col("value_sum") * 1000L, col("n_eff"))).as("mean_milli"))
  }
}
