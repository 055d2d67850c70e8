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

  test("olsTrend: exact on a perfect line, NULL on a single point, " +
       "and matches the closed-form fractions on a hand fixture") {
    // y = 3x + 10 exactly
    val line = (1L to 5L).map(x => ("line", x, 3 * x + 10))
    // hand fixture: (0,1),(1,3),(2,2) -> slope = 1/2, intercept = 3/2
    val hand = Seq(("hand", 0L, 1L), ("hand", 1L, 3L), ("hand", 2L, 2L))
    val single = Seq(("one", 4L, 9L))
    val got = SeriesOps.olsTrend(
        series((line ++ hand ++ single): _*), "s", "p", "x")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got("line") === ((5L, Some(3000000L), Some(10000000L))))
    assert(got("hand") === ((3L, Some(500000L), Some(1500000L))))
    assert(got("one") === ((1L, None, None)))
  }

  test("theilSenSlope: one corrupted period drags OLS but not the " +
       "pairwise-slope median; exact lower-median semantics") {
    // y = 2x for 11 periods, except one wild outlier at the endpoint
    // (an outlier at the mean x would leave OLS slope untouched)
    val rows = (1L to 11L).map(x =>
      ("r", x, if (x == 11L) 1000L else 2 * x))
    val ts = SeriesOps.theilSenSlope(series(rows: _*), "s", "p", "x")
      .as[(String, Long, Long)].head()
    assert(ts._2 === 55L) // C(11,2) pairs
    assert(ts._3 === 2000L) // robust: exactly slope 2 in milli
    val ols = SeriesOps.olsTrend(series(rows: _*), "s", "p", "x")
      .select($"slope_micro").as[Long].head()
    assert(math.abs(ols - 2000000L) > 1000000L,
      s"OLS should be dragged by the outlier, got $ols")
    // exact lower median on an even pair count: slopes {1,2,3} from
    // points (0,0),(1,1),(2,3) -> pairs (0,1)=1000,(1,2)=2000,(0,2)=1500
    // sorted [1000,1500,2000], lower median = row (3+1)/2 = 2 -> 1500
    val even = SeriesOps.theilSenSlope(
        series(("e", 0L, 0L), ("e", 1L, 1L), ("e", 2L, 3L)), "s", "p", "x")
      .as[(String, Long, Long)].head()
    assert(even === (("e", 3L, 1500L)))
  }

  test("transitionMatrix: hand-counted handoffs, per-state ppm " +
       "normalization, and tie order pinned by the tiebreak column") {
    val df = Seq(
      // user 1: A -> B -> A -> C  (ties on t=2 pinned by id)
      (1L, 1L, 10L, "A"), (1L, 2L, 20L, "B"), (1L, 2L, 21L, "A"),
      (1L, 3L, 30L, "C"),
      // user 2: A -> B
      (2L, 1L, 40L, "A"), (2L, 2L, 50L, "B"))
      .toDF("k", "t", "id", "st")
    val got = SeriesOps.transitionMatrix(df, "k", "t", "id", "st")
      .orderBy($"from_state", $"to_state")
      .as[(String, String, Long, Long)].collect().toSeq
    // transitions: A->B ×2, B->A ×1, A->C ×1 (from the tie: B then A,
    // so B->A and A->C)
    assert(got === Seq(
      ("A", "B", 2L, 666666L), ("A", "C", 1L, 333333L),
      ("B", "A", 1L, 1000000L)))
  }

  test("stationaryDistribution: symmetric chain stays uniform; " +
       "absorbing state drains; sink states leak mass (documented)") {
    import graft.ops.SeriesOps
    val sym = Seq(("a", "a", 500000L), ("a", "b", 500000L),
      ("b", "a", 500000L), ("b", "b", 500000L)).toDF("f", "t", "p")
    val g1 = SeriesOps.stationaryDistribution(sym, "f", "t", "p", 3)
      .orderBy($"round", $"state").as[(Long, String, Long)]
      .collect().toSeq
    assert(g1 === Seq((1L, "a", 500000L), (1L, "b", 500000L),
      (2L, "a", 500000L), (2L, "b", 500000L),
      (3L, "a", 500000L), (3L, "b", 500000L)))

    val abs = Seq(("a", "b", 1000000L), ("b", "b", 1000000L))
      .toDF("f", "t", "p")
    val g2 = SeriesOps.stationaryDistribution(abs, "f", "t", "p", 2)
      .orderBy($"round", $"state").as[(Long, String, Long)]
      .collect().toSeq
    assert(g2 === Seq((1L, "a", 0L), (1L, "b", 1000000L),
      (2L, "a", 0L), (2L, "b", 1000000L)))

    // c never transitions out: its round-1 mass disappears in round 2
    val sink = Seq(("a", "c", 1000000L)).toDF("f", "t", "p")
    val g3 = SeriesOps.stationaryDistribution(sink, "f", "t", "p", 2)
      .orderBy($"round", $"state").as[(Long, String, Long)]
      .collect().toSeq
    assert(g3 === Seq((1L, "a", 0L), (1L, "c", 500000L),
      (2L, "a", 0L), (2L, "c", 0L)))
  }
}
