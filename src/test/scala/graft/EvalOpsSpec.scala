package graft

import org.apache.spark.sql.functions._
import graft.ops.EvalOps

/** ROC/AUC readout (EvalOps.rocAnalysis): hand-computed midrank tie
  * handling, degenerate separations, and an exact integer referee over
  * random scores (the Mann–Whitney pair count computed brute-force on
  * the driver must equal the histogram-window form bit-for-bit).
  */
class EvalOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def auc(rows: Seq[(Long, Boolean)]): Option[Long] = {
    val out = EvalOps.rocAnalysis(
      rows.toDF("score", "label"), "score", "label")
      .select($"auc_ppm").distinct().collect()
    assert(out.length == 1, "auc_ppm must be constant across rows")
    Option(out.head.get(0)).map(_.asInstanceOf[Long])
  }

  test("hand-computed AUC with a tie: midrank = half credit") {
    // pos scores {3,2}, neg {2,1}: 3 wins + 1 tie of 4 pairs = 0.875
    assert(auc(Seq((3L, true), (2L, true), (2L, false), (1L, false)))
      .contains(875000L))
  }

  test("perfect separation is exactly 1e6; total inversion exactly 0") {
    assert(auc(Seq((5L, true), (4L, true), (2L, false), (1L, false)))
      .contains(1000000L))
    assert(auc(Seq((1L, true), (2L, false))).contains(0L))
  }

  test("all scores identical: AUC is exactly 1/2") {
    assert(auc(Seq((7L, true), (7L, true), (7L, false))).contains(500000L))
  }

  test("single-class input yields null AUC, not a crash") {
    assert(auc(Seq((3L, true), (1L, true))).isEmpty)
  }

  test("exact integer referee on random scores with heavy ties") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(400)(i =>
      (rnd.nextInt(20).toLong, rnd.nextBoolean()))
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val u2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val expected = u2 * 1000000L / (2L * pos.size * neg.size)
    assert(auc(rows).contains(expected))
  }

  test("grouped AUC: each slice equals the solo computation on it") {
    val rnd = new scala.util.Random(19)
    val rows = Seq.tabulate(500)(i =>
      ("g" + (i % 4), rnd.nextInt(15).toLong, rnd.nextBoolean()))
    val grouped = EvalOps.rocAucGrouped(
        rows.toDF("g", "score", "label"), "g", "score", "label")
      .collect()
      .map(r => r.getString(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    assert(grouped.keySet == Set("g0", "g1", "g2", "g3"))
    grouped.foreach { case (g, a) =>
      assert(a == auc(rows.filter(_._1 == g).map(t => (t._2, t._3))),
        s"group $g")
    }
  }

  test("grouped AUC: a single-class group is NULL without poisoning others") {
    val rows = Seq(("a", 3L, true), ("a", 1L, false),
      ("b", 5L, true), ("b", 2L, true))
    val out = EvalOps.rocAucGrouped(
        rows.toDF("g", "score", "label"), "g", "score", "label")
      .collect().map(r => r.getString(0) -> Option(r.get(3))).toMap
    assert(out("a").contains(1000000L) && out("b").isEmpty)
  }

  test("poisson bootstrap: exact driver referee + partitioning invariance") {
    def polyRef(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
    val rows = Seq.tabulate(300)(i => (i.toLong, (i % 37).toLong * 3))
    val expected = (0 until 8).map { b =>
      val ws = rows.map { case (id, v) =>
        val u = polyRef(s"$id:$b:s1") % 1000000L
        (EvalOps.PoissonCdfPpm.count(_ <= u).toLong, v)
      }
      val nEff = ws.map(_._1).sum
      val vs = ws.map { case (w, v) => w * v }.sum
      (b.toLong, nEff, vs, vs * 1000L / nEff)
    }
    for (parts <- Seq(1, 7)) {
      val got = EvalOps.poissonBootstrapMeans(
          rows.toDF("id", "v").repartition(parts), "id", "v",
          replicas = 8, salt = "s1")
        .orderBy("replica")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got == expected, s"parts=$parts")
    }
  }

  test("poisson bootstrap: mean multiplicity concentrates near 1") {
    val rows = Seq.tabulate(1000)(i => (i.toLong, 1L))
    val effs = EvalOps.poissonBootstrapMeans(
        rows.toDF("id", "v"), "id", "v", replicas = 16, salt = "conc")
      .collect().map(_.getAs[Long]("n_eff"))
    assert(effs.length == 16)
    // Poisson(1) sum over 1000 rows: sd ≈ 32, so ±5 sd ≈ ±160
    assert(effs.forall(e => e > 840 && e < 1160),
      s"n_eff out of band: ${effs.mkString(",")}")
  }

  test("curve is a valid staircase: cumulative, bounded, complete") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(300)(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(3) == 0))
    val pts = EvalOps.rocAnalysis(rows.toDF("score", "label"),
        "score", "label")
      .orderBy($"score".desc)
      .select($"score", $"pos", $"neg", $"tp", $"fp",
        $"tpr_ppm", $"fpr_ppm")
      .collect()
    val p = rows.count(_._2).toLong
    val n = rows.size - p
    var (tp, fp) = (0L, 0L)
    pts.foreach { r =>
      tp += r.getLong(1); fp += r.getLong(2)
      assert(r.getLong(3) == tp && r.getLong(4) == fp)
      assert(r.getLong(5) == tp * 1000000L / p)
      assert(r.getLong(6) == fp * 1000000L / n)
    }
    assert(tp == p && fp == n)
  }

  test("prCurve: hand-computed precision/recall/F1, and F1 equals the " +
       "pair-count identity (never rounded-P/rounded-R recombination)") {
    // scores: pos {5,3}, neg {4}: thresholds 5,4,3
    val got = EvalOps.prCurve(
        Seq((5L, true), (4L, false), (3L, true)).toDF("score", "label"),
        "score", "label")
      .orderBy($"score".desc)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (5L, 1L, 0L, 1L, 1000000L, 500000L, 666666L),
      (4L, 1L, 1L, 1L, 500000L, 500000L, 500000L),
      (3L, 2L, 1L, 0L, 666666L, 1000000L, 800000L)))
    // referee on random data: f1 == 2tp*1e6 div (2tp+fp+fn) exactly
    val rnd = new scala.util.Random(5)
    val rows = Seq.tabulate(300)(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(3) == 0))
    EvalOps.prCurve(rows.toDF("score", "label"), "score", "label")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .foreach { case (_, tp2, fp2, fn2, _, _, f1) =>
        assert(f1 === 2 * tp2 * 1000000L / (2 * tp2 + fp2 + fn2))
      }
  }

  test("ndcgAtK: the system ranking equal to the ideal scores exactly " +
       "1e6; a fully inverted ranking scores below; double referee") {
    // group g: rels 3,2,1 — perfect when score order matches rel order
    val perfect = Seq(("g", 30L, 3L, 1L), ("g", 20L, 2L, 2L),
      ("g", 10L, 1L, 3L))
    val inverted = Seq(("g", 10L, 3L, 1L), ("g", 20L, 2L, 2L),
      ("g", 30L, 1L, 3L))
    def run(rows: Seq[(String, Long, Long, Long)]) =
      EvalOps.ndcgAtK(rows.toDF("g", "score", "rel", "id"),
          "g", "score", "rel", "id", k = 10)
        .as[(String, Long, Long, Long, Long)].head()
    assert(run(perfect)._5 === 1000000L)
    val inv = run(inverted)
    assert(inv._5 < 1000000L && inv._5 > 0L)
    // double-precision referee within Q20 rounding slack (≤ ~20 ppm)
    val w = (1 to 3).map(i => 1e6 / (math.log(i + 1) / math.log(2)))
    val dcg = 1L * w(0) + 2 * w(1) + 3 * w(2)
    val idcg = 3 * w(0) + 2 * w(1) + 1 * w(2)
    val expected = dcg / idcg * 1e6
    assert(math.abs(inv._5 - expected) < 100,
      s"got ${inv._5}, referee $expected")
  }

  test("ndcgAtK: only the top k contribute; zero-relevance group " +
       "yields NULL ndcg; ties pinned by the tiebreak column") {
    // k=1: only the best-scored row counts, ideal takes the max rel
    val rows = Seq(("g", 10L, 1L, 1L), ("g", 20L, 0L, 2L))
    val k1 = EvalOps.ndcgAtK(rows.toDF("g", "score", "rel", "id"),
        "g", "score", "rel", "id", k = 1)
      .select($"dcg_micro", $"idcg_micro", $"ndcg_ppm")
      .as[(Long, Long, Option[Long])].head()
    assert(k1 === ((0L, 1000000L, Some(0L))))
    val zero = EvalOps.ndcgAtK(
        Seq(("z", 1L, 0L, 1L)).toDF("g", "score", "rel", "id"),
        "g", "score", "rel", "id", k = 5)
      .select($"ndcg_ppm").as[Option[Long]].head()
    assert(zero.isEmpty)
    // score ties: tiebreak asc decides rank on both system and ideal
    val tied = Seq(("t", 10L, 2L, 1L), ("t", 10L, 0L, 2L))
    val tg = EvalOps.ndcgAtK(tied.toDF("g", "score", "rel", "id"),
        "g", "score", "rel", "id", k = 1)
      .select($"ndcg_ppm").as[Option[Long]].head()
    assert(tg === Some(1000000L)) // id 1 (rel 2) ranks first in both
  }

  test("chiSquareIndependence: exactly proportional table gives zero " +
       "chi2; hand-computed 2x2; margins and dof correct") {
    // perfectly independent 2x2: rows 10/30 in both columns
    val ind = Seq.fill(10)(("a1", "b1")) ++ Seq.fill(30)(("a1", "b2")) ++
      Seq.fill(10)(("a2", "b1")) ++ Seq.fill(30)(("a2", "b2"))
    val gi = EvalOps.chiSquareIndependence(
        ind.toDF("x", "y"), "x", "y")
      .select($"chi2_milli", $"dof", $"cramers_v2_ppm").distinct()
      .as[(Long, Long, Long)].head()
    assert(gi === ((0L, 1L, 0L)))
    // dependent 2x2: [30,10;10,30], N=80, margins all 40
    // e = 20 for every cell, chi2 = 4*(10^2/20) = 20 -> 20000 milli
    val dep = Seq.fill(30)(("a1", "b1")) ++ Seq.fill(10)(("a1", "b2")) ++
      Seq.fill(10)(("a2", "b1")) ++ Seq.fill(30)(("a2", "b2"))
    val gd = EvalOps.chiSquareIndependence(
        dep.toDF("x", "y"), "x", "y")
      .orderBy($"a", $"b").collect()
    assert(gd.length === 4)
    val first = gd.head
    assert(first.getLong(2) === 30L) // o
    assert(first.getLong(3) === 20000L) // e_milli
    assert(first.getLong(4) === 5000L) // (10*1000)^2 / 20000
    assert(gd.forall(_.getLong(5) === 20000L)) // total chi2_milli
    assert(gd.forall(_.getLong(6) === 1L)) // dof
    // V^2 = chi2/(N*(min-1)) = 20/80 = 0.25 -> 250000 ppm
    assert(gd.forall(_.getLong(7) === 250000L))
  }

  test("RBO suffix-table identity: sum of per-doc S[max(ra,rb)] equals " +
       "the literal double sum over depths (random rankings), and " +
       "identical rankings score the full truncated mass") {
    val s = graft.queries.AnalyticsQueries.RboSuffixMilli
    val w = Iterator.iterate(100000L)(x => x * 9 / 10).take(50).toArray
    val cd = Array.tabulate(50)(i => w(i) * 1000 / (i + 1))
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 20) {
      // two top-50 rankings over a 120-doc universe
      val docs = rnd.shuffle((1 to 120).toList)
      val a = rnd.shuffle(docs).take(50).zipWithIndex
        .map { case (d, i) => d -> (i + 1) }.toMap
      val b = rnd.shuffle(docs).take(50).zipWithIndex
        .map { case (d, i) => d -> (i + 1) }.toMap
      val direct = (1 to 50).map { d =>
        val inter = a.count { case (doc, ra) =>
          ra <= d && b.get(doc).exists(_ <= d) }
        cd(d - 1) * inter
      }.sum
      val folded = a.keySet.intersect(b.keySet)
        .toSeq.map(doc => s(math.max(a(doc), b(doc)) - 1)).sum
      assert(folded === direct)
    }
    // identical rankings: RBO ≈ sum of all w_d (truncated mass; the
    // c_d = w_d·1000 div d truncation costs < d per term, so the folded
    // total sits within a couple of ppm below Σw)
    val ident = (1 to 50).map(d => s(d - 1)).sum / 1000
    assert(ident <= w.sum && ident >= w.sum - 2)
    assert(w.sum > 990000L && w.sum < 1000000L)
  }

  test("Benford literals: each is floor(log10(1+1/d)*1e6) and the " +
       "distribution sums to ~1e6") {
    val b = graft.queries.AnalyticsQueries.BenfordPpm
    for (d <- 1 to 9) {
      val exact = math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong
      assert(b(d - 1) === exact, s"digit $d")
    }
    assert(b.sum >= 999990L && b.sum <= 1000000L)
  }

  test("calibrationBins: hand-computed bins, Brier and ECE; a " +
       "perfectly calibrated scorer has near-zero ECE") {
    import graft.ops.EvalOps
    // 4 rows in bin 2 (p=250000): 1 positive -> pos_rate 250000 ==
    // mean_p (perfectly calibrated bin); 2 rows in bin 9 (p=900000):
    // both positive -> gap 100000
    val scored = Seq(
      (250000L, true), (250000L, false), (250000L, false),
      (250000L, false), (900000L, true), (900000L, true))
      .toDF("p", "y")
    val got = EvalOps.calibrationBins(scored, "p", "y", nBins = 10)
      .orderBy($"bin")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // brier = (3*(250000^2) + (750000^2) + 2*(100000^2)) / 6
    val brier = (3L * 250000L * 250000L + 750000L * 750000L +
      2L * 100000L * 100000L) / 6L
    // ece = (4*|250000-250000| + 2*|900000-1000000|) / 6
    val ece = (2L * 100000L) / 6L
    assert(got === Seq(
      (2L, 4L, 250000L, 250000L, brier, ece),
      (9L, 2L, 900000L, 1000000L, brier, ece)))
    // p = 1e6 clamps into the top bin instead of minting bin 10
    val clamp = EvalOps.calibrationBins(
        Seq((1000000L, true)).toDF("p", "y"), "p", "y", nBins = 10)
      .select($"bin").as[Long].collect().toSeq
    assert(clamp === Seq(9L))
  }
}
