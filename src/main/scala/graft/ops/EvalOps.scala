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
  * walks that domain, never raw rows. The walk itself is a
  * range-partitioned prefix sum ([[IdOps.prefixSums]]), NOT a global
  * ordered window — so even an unbounded score domain (raw micros,
  * growing with the corpus) never funnels through one reducer. The
  * per-group variants partition by the group key instead.
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
    // ordered walk over DISTINCT scores as a range-partitioned prefix
    // sum (IdOps.prefixSums): exact, and parallel-reducer even when the
    // score domain itself grows with the corpus (raw micros) — no
    // global ordered window exists at any scale. Descending convention
    // via the negated key.
    val pts = IdOps.prefixSums(
        hist.withColumn("__ns", -col("score")),
        Seq("pos", "neg"), Seq("tp", "fp"), inclusive = true, "__ns")
      .drop("__ns")
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
      salt: String): DataFrame =
    poissonBootstrapMeansGrouped(
      df.withColumn("__g", lit(1L)), "__g", idCol, valueCol,
      replicas, salt).drop("__g")

  /** Per-group [[poissonBootstrapMeans]] (per-slice uncertainty in the
    * same single corpus pass): the replica draw is STILL keyed on
    * (id, replica, salt) alone, so a row's multiplicity is identical
    * whichever slicing consumes it — slices of one bootstrap, not
    * independent bootstraps per group.
    * Output: (group, replica, n_eff, value_sum, mean_milli).
    */
  def poissonBootstrapMeansGrouped(
      df: DataFrame, groupCol: String, idCol: String, valueCol: String,
      replicas: Int, salt: String): DataFrame = {
    require(replicas >= 1, "need at least one replica")
    val div = graft.functions.GraftColumns.longDiv _
    val cdf = typedLit(PoissonCdfPpm)
    val u = pmod(
      graft.functions.GraftColumns.polyHash(
        concat(col(idCol).cast("string"), lit(":"),
          col("replica").cast("string"), lit(":" + salt))),
      lit(1000000L))
    df.select(col(groupCol), col(idCol),
        col(valueCol).cast("long").as("__v"),
        explode(sequence(lit(0), lit(replicas - 1))).as("replica"))
      .withColumn("__w", size(filter(cdf, c => c <= u)).cast("long"))
      .groupBy(col(groupCol), col("replica"))
      .agg(sum(col("__w")).as("n_eff"),
        sum(col("__w") * col("__v")).as("value_sum"))
      .select(col(groupCol), col("replica").cast("long").as("replica"),
        col("n_eff"), col("value_sum"),
        when(col("n_eff") > 0L,
          div(col("value_sum") * 1000L, col("n_eff"))).as("mean_milli"))
  }

  /** Precision / recall / F1 at every threshold — [[rocAnalysis]]'s
    * companion over the same score VALUE HISTOGRAM (one row per
    * distinct score, predict-positive-when-≥): P = tp/(tp+fp),
    * R = tp/pos_total, and F1 via its pair-count identity
    * `F1 = 2·tp / (2·tp + fp + fn)` — one exact integral division,
    * no rounded-P/rounded-R recombination. All counts cumulative from
    * the top; ppm scaling; guarded divisors → NULL on empty classes.
    * Output: (score, tp, fp, fn, precision_ppm, recall_ppm, f1_ppm).
    */
  def prCurve(
      df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val div = graft.functions.GraftColumns.longDiv _
    val hist = df
      .groupBy(col(scoreCol).cast("long").as("score"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("neg"))
    val totals = hist.agg(
      coalesce(sum(col("pos")), lit(0L)).as("__p"))
    def safeDiv(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column) =
      when(den > 0L, div(num, den))
    // same range-partitioned descending walk as rocAnalysis — no global
    // ordered window even on an unbounded score domain
    IdOps.prefixSums(
        hist.withColumn("__ns", -col("score")),
        Seq("pos", "neg"), Seq("tp", "fp"), inclusive = true, "__ns")
      .drop("__ns")
      .crossJoin(broadcast(totals))
      .select(col("score"), col("tp"), col("fp"),
        (col("__p") - col("tp")).as("fn"),
        safeDiv(col("tp") * 1000000L, col("tp") + col("fp"))
          .as("precision_ppm"),
        safeDiv(col("tp") * 1000000L, col("__p")).as("recall_ppm"),
        safeDiv(lit(2L) * col("tp") * 1000000L,
          lit(2L) * col("tp") + col("fp") + (col("__p") - col("tp")))
          .as("f1_ppm"))
  }

  /** Host-side replica of `GraftColumns.binLog2Q20`'s integer
    * recurrence (PolyHashSpec's referee) — used to PRECOMPUTE literal
    * position-discount tables for [[ndcgAtK]] at plan-build time, so
    * both engines consume identical literals instead of re-deriving
    * logs at run time for what are only k small constants.
    */
  private[graft] def log2Q20Host(v: Long): Long = {
    require(v >= 1, s"log2Q20Host needs v >= 1, got $v")
    val p = 63 - java.lang.Long.numberOfLeadingZeros(v)
    var y = if (p <= 30) v << (30 - p) else v >> (p - 30)
    var acc = 0L
    for (_ <- 1 to 20) {
      val y2 = (y * y) >> 30
      if (y2 >= (1L << 31)) { y = y2 / 2; acc = acc * 2 + 1 }
      else { y = y2; acc = acc * 2 }
    }
    p.toLong * (1L << 20) + acc
  }

  /** Position-discount weights for [[ndcgAtK]]: w(i) = 1e6·2^20 div
    * log2Q20(i+1) for 1-based rank i — w(1) = 1e6 exactly (log2(2) is
    * exact in Q20), monotone decreasing, integer.
    */
  private[graft] def ndcgWeights(k: Int): Array[Long] =
    Array.tabulate(k)(i =>
      (1000000L << 20) / log2Q20Host(i.toLong + 2L))

  /** Adamic–Adar basket weights for [[GraphOps.bipartiteLinkScores]]:
    * 1-based entry s = 1e6·2^20 div log2Q20(s) for basket size s ≥ 2
    * (entry 1 is an unused 0 — size-1 baskets emit no wedges). Literal
    * on both engines, same idiom as [[ndcgWeights]].
    */
  private[graft] def aaWeightsMicro(maxBasket: Int): Array[Long] =
    Array.tabulate(maxBasket)(i =>
      if (i == 0) 0L else (1000000L << 20) / log2Q20Host(i + 1L))

  /** NDCG@k ranking quality per query group (search/reranker eval,
    * the ranking complement to the classification metrics above):
    * DCG = Σ_{i≤k} rel_i · w(i) with the Q20-log literal discounts of
    * [[ndcgWeights]]; IDCG re-ranks the same rows by relevance
    * (graded, integer ≥ 0); ndcg_ppm = DCG·1e6 div IDCG, NULL when the
    * group has no relevant row. `tieCol` pins both orderings totally so
    * every engine ranks identically.
    *
    * Two per-group row_number windows + one domain-sized aggregate.
    * Scale: group size is the CANDIDATE-SET size (a reranker's few
    * hundred rows), not the corpus; for corpus-wide groups cut to the
    * top rows per group first (q56's TakeOrdered-per-group shape) —
    * only ranks ≤ k contribute.
    * Output: (group, n_rows, dcg_micro, idcg_micro, ndcg_ppm).
    */
  def ndcgAtK(
      df: DataFrame, groupCol: String, scoreCol: String, relCol: String,
      tieCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 100, "k in [1, 100]")
    val div = graft.functions.GraftColumns.longDiv _
    val weights = typedLit(ndcgWeights(k))
    val wSys = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    val wIdeal = Window.partitionBy(col(groupCol))
      .orderBy(col(relCol).desc, col(tieCol).asc)
    df
      .withColumn("__rs", row_number().over(wSys))
      .withColumn("__ri", row_number().over(wIdeal))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__rs") <= k,
          col(relCol).cast("long") * element_at(weights, col("__rs")))
          .otherwise(0L)).as("dcg_micro"),
        sum(when(col("__ri") <= k,
          col(relCol).cast("long") * element_at(weights, col("__ri")))
          .otherwise(0L)).as("idcg_micro"))
      .withColumn("ndcg_ppm",
        when(col("idcg_micro") > 0L,
          div(col("dcg_micro") * 1000000L, col("idcg_micro"))))
  }

  /** Pearson chi-square independence test over two categorical columns
    * (feature association / dataset-drift screening): one
    * map-side-combined groupBy reduces the corpus to the |A|×|B|
    * contingency table; margins and N ride as window aggregates over
    * that DOMAIN-sized table; per cell, expected count e·1000 =
    * r·c·1000 div N and contribution χ²·1000 ≈ (o·1000 − e_milli)²
    * div e_milli — pure integer, engine-replayable (milli scaling
    * bounds: exact-enough to 1e-3 relative while keeping
    * (N·1000)² &lt; 2^63, i.e. N ≲ 3e6; coarsen the scaling or bucket
    * counts beyond that). The total and Cramér's V² (ppm, χ²/(N·(min
    * dim − 1))) attach as an in-plan 1-row scalar (q179 pattern).
    * Output: one row per cell (a, b, o, e_milli, cell_chi2_milli,
    * chi2_milli, dof, cramers_v2_ppm).
    */
  def chiSquareIndependence(
      df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val div = graft.functions.GraftColumns.longDiv _
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val wA = Window.partitionBy(col("a"))
    val wB = Window.partitionBy(col("b"))
    val wAll = Window.partitionBy()
    val scored = cells
      .withColumn("__r", sum(col("o")).over(wA))
      .withColumn("__c", sum(col("o")).over(wB))
      .withColumn("__n", sum(col("o")).over(wAll))
      .withColumn("__na", size(collect_set(col("a")).over(wAll)).cast("long"))
      .withColumn("__nb", size(collect_set(col("b")).over(wAll)).cast("long"))
      .withColumn("e_milli", div(col("__r") * col("__c") * 1000L, col("__n")))
      .withColumn("__d", col("o") * 1000L - col("e_milli"))
      .withColumn("cell_chi2_milli",
        when(col("e_milli") > 0L,
          div(col("__d") * col("__d"), col("e_milli"))).otherwise(0L))
    val tot = scored.agg(
      sum(col("cell_chi2_milli")).as("chi2_milli"),
      ((max(col("__na")) - 1L) * (max(col("__nb")) - 1L)).as("dof"),
      when(max(col("__n")) * (least(max(col("__na")), max(col("__nb"))) - 1L) > 0L,
        div(sum(col("cell_chi2_milli")) * 1000L,
          max(col("__n")) * (least(max(col("__na")), max(col("__nb"))) - 1L)))
        .as("cramers_v2_ppm"))
    scored.crossJoin(broadcast(tot))
      .select(col("a"), col("b"), col("o"), col("e_milli"),
        col("cell_chi2_milli"), col("chi2_milli"), col("dof"),
        col("cramers_v2_ppm"))
  }

  /** Probability-calibration readout for a ppm-scored binary
    * classifier: equal-width reliability bins (predicted-probability
    * mean vs empirical positive rate), Brier score, and expected
    * calibration error — the "is the score a probability?" audit that
    * belongs next to the q179 ROC (rank quality says nothing about
    * calibration; Guo et al. 2017's diagnosis).
    *
    * Shape: the corpus reduces to `nBins` rows in ONE map-side
    * -combined groupBy (bin = ⌊p·nBins/1e6⌋ clamped); Brier rides the
    * same pass as a global aggregate and both scalars attach as
    * in-plan broadcast 1-row crosses (q179 pattern). No windows, no
    * per-row state — bounded-domain by construction.
    *
    * Exactness contract: brier_ppm2 = Σ(p − y·1e6)² div N (ppm² units;
    * Σ of 1e12-bounded terms — Long-safe to N ≈ 9e6, rescale upstream
    * past that); ece_ppm = Σ_b n_b·|mean_p − pos_rate| div N computed
    * from the ROUNDED per-bin stats, so every reported number is a
    * pure integer function of the inputs on any engine.
    *
    * Output: one row per non-empty bin (bin, n, mean_p_ppm,
    * pos_rate_ppm, brier_ppm2, ece_ppm), ordered by caller.
    *
    * Input contract: probPpmCol ∈ [0, 1e6] (a probability; values
    * outside the range would mint garbage bins — clamp upstream).
    */
  def calibrationBins(
      scored: DataFrame, probPpmCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "need at least two bins")
    val div = graft.functions.GraftColumns.longDiv _
    val b = scored.select(
      least(div(col(probPpmCol) * nBins, lit(1000000L)),
        lit(nBins - 1L)).as("bin"),
      col(probPpmCol).as("__p"),
      when(col(labelCol), 1L).otherwise(0L).as("__y"))
    val bins = b.groupBy(col("bin")).agg(
      count(lit(1)).as("n"),
      div(sum(col("__p")), count(lit(1))).as("mean_p_ppm"),
      div(sum(col("__y")) * 1000000L, count(lit(1))).as("pos_rate_ppm"))
    val brier = b.agg(
      div(sum((col("__p") - col("__y") * 1000000L) *
        (col("__p") - col("__y") * 1000000L)), count(lit(1)))
        .as("brier_ppm2"),
      count(lit(1)).as("__nt"))
    val ece = bins.crossJoin(broadcast(brier.select(col("__nt"))))
      .agg(div(sum(col("n") * abs(col("mean_p_ppm") -
        col("pos_rate_ppm"))), min(col("__nt"))).as("ece_ppm"))
    bins
      .crossJoin(broadcast(brier.select(col("brier_ppm2"))))
      .crossJoin(broadcast(ece))
      .select(col("bin"), col("n"), col("mean_p_ppm"),
        col("pos_rate_ppm"), col("brier_ppm2"), col("ece_ppm"))
  }
}
