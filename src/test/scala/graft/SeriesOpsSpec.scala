package graft

import graft.ops.SeriesOps

class SeriesOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def series(rows: (String, Long, Long)*) =
    rows.toDF("s", "p", "x")

  test("cusum: window identity ≡ the sequential max(0, s+dev) " +
       "recurrence (driver referee), partitioning-invariant") {
    val rnd = new scala.util.Random(41)
    val rows = for (s <- Seq("a", "b"); p <- 1L to 40L)
      yield (s, p, (50 + rnd.nextInt(30)).toLong)
    val bySeries = rows.groupBy(_._1)
    val expected = bySeries.flatMap { case (s, v) =>
      val xs = v.sortBy(_._2).map(_._3)
      val target = xs.sum / xs.size
      var acc = 0L
      v.sortBy(_._2).map { case (_, p, x) =>
        acc = math.max(0L, acc + (x - target))
        (s, p) -> ((x, target, acc))
      }
    }
    Seq(1, 7).foreach { np =>
      val got = SeriesOps.cusum(series(rows: _*).repartition(np),
          "s", "p", "x")
        .as[(String, Long, Long, Long, Long, Boolean)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
      assert(got === expected, s"partitions=$np")
    }
  }

  test("cusum: a sustained level shift is flagged, a transient spike " +
       "of comparable height is not (the point of CUSUM over " +
       "per-period thresholds)") {
    // steady 100/period for 20 periods, then +10 sustained for 10 —
    // the drift accumulates to ~70 against target 103, crossing the
    // 500‰ fence (≈52) in the tail
    val shift = (1L to 20L).map(p => ("shift", p, 100L)) ++
      (21L to 30L).map(p => ("shift", p, 110L))
    // one +50 period (5× the shift's step) — peaks at 49, under the
    // fence, and decays back
    val spike = (1L to 30L).map(p =>
      ("spike", p, if (p == 15L) 150L else 100L))
    val got = SeriesOps.cusum(series((shift ++ spike): _*),
        "s", "p", "x", kMilli = 500L)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    val flaggedShift = got.filter(r => r._1 == "shift" && r._6).map(_._2)
    val flaggedSpike = got.filter(r => r._1 == "spike" && r._6).map(_._2)
    assert(flaggedShift.nonEmpty && flaggedShift.forall(_ > 20L),
      s"shift tail must flag: ${got.filter(_._1 == "shift").toSeq}")
    assert(flaggedSpike.isEmpty,
      s"single spike must not flag: ${got.filter(_._1 == "spike").toSeq}")
  }

  test("cusum: degenerate inputs — empty, single period") {
    assert(SeriesOps.cusum(series(), "s", "p", "x").count() === 0)
    val one = SeriesOps.cusum(series(("a", 1L, 7L)), "s", "p", "x")
      .as[(String, Long, Long, Long, Long, Boolean)].head()
    assert(one === (("a", 1L, 7L, 7L, 0L, false)))
  }
}
