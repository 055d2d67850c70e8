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
}
