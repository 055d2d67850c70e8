package graft

import org.apache.spark.sql.functions._
import graft.ops.FunnelOps

class FunnelOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "tu", "event_type")

  test("funnel: greedy-earliest chain, horizon anchored at stage 1, " +
       "strictly-after ordering, keys without stage 1 excluded") {
    val events = ev(
      // u1: clean full chain
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      // u2: click BEFORE the first view never counts; purchase needs
      // a click, so the chain stops at stage 1
      (2L, 100L, "view"), (2L, 50L, "click"), (2L, 400L, "purchase"),
      // u3: purchase beyond the horizon (t1 + 1000) → stage 2
      (3L, 100L, "view"), (3L, 200L, "click"), (3L, 5000L, "purchase"),
      // u4: no view at all → not in the output
      (4L, 10L, "click"), (4L, 20L, "purchase"),
      // u5: click outside the horizon → stage 1
      (5L, 100L, "view"), (5L, 1200L, "click"),
      // u6: purchase at 120 precedes the click at 150 — the chain must
      // take the later purchase at 160 (strictly after the click)
      (6L, 100L, "view"), (6L, 150L, "click"), (6L, 120L, "purchase"),
      (6L, 160L, "purchase"))
    val got = FunnelOps.funnel(events, "user_id", "tu", "event_type",
        Seq("view", "click", "purchase"), horizonUs = 1000L)
      .select($"user_id", $"ts_1_us", $"ts_2_us", $"ts_3_us", $"stage")
      .as[(Long, Long, Option[Long], Option[Long], Int)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 100L, Some(200L), Some(300L), 3)))
    assert(got(2L) === ((2L, 100L, None, None, 1)))
    assert(got(3L) === ((3L, 100L, Some(200L), None, 2)))
    assert(!got.contains(4L))
    assert(got(5L) === ((5L, 100L, None, None, 1)))
    assert(got(6L) === ((6L, 100L, Some(150L), Some(160L), 3)))
  }

  test("funnel: earliest stage-1 event anchors the window even when a " +
       "later entry would convert (greedy-earliest, documented)") {
    // first view at 0 has no click in [1, 1000]; the view at 5000 would
    // have one — greedy semantics still anchor at 0
    val events = ev(
      (1L, 0L, "view"), (1L, 5000L, "view"), (1L, 5100L, "click"))
    val got = FunnelOps.funnel(events, "user_id", "tu", "event_type",
        Seq("view", "click"), horizonUs = 1000L)
      .select($"ts_1_us", $"ts_2_us", $"stage")
      .as[(Long, Option[Long], Int)].head()
    assert(got === ((0L, None, 1)))
  }

  test("funnel: degenerate inputs — empty events, single stage") {
    val empty = ev()
    assert(FunnelOps.funnel(empty, "user_id", "tu", "event_type",
      Seq("view", "click"), 10L).count() === 0L)
    val one = FunnelOps.funnel(ev((9L, 5L, "view"), (9L, 1L, "view")),
        "user_id", "tu", "event_type", Seq("view"), 10L)
      .select($"user_id", $"ts_1_us", $"stage")
      .as[(Long, Long, Int)].collect().toSeq
    assert(one === Seq((9L, 1L, 1)))
  }

  test("cohortRetention: day cohorts anchored on the filtered event, " +
       "forward-looking offsets, cohort_size from qualifying keys only") {
    def ts(day: Int, h: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    val events = Seq(
      // u1 buys on day 2 (active days 1,2,4); day-1 activity is BEFORE
      // the cohort anchor and must not appear
      (1L, ts(1), "view"), (1L, ts(2), "purchase"), (1L, ts(4), "view"),
      // u2 buys on day 2 as well (active days 2,3)
      (2L, ts(2), "purchase"), (2L, ts(3), "click"),
      // u3 never buys → no cohort, excluded entirely
      (3L, ts(1), "view"), (3L, ts(5), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = FunnelOps.cohortRetention(events, "user_id", "ts",
        unit = "day", cohortFilter = Some(col("event_type") === "purchase"))
      .select($"cohort", $"period_offset", $"active", $"cohort_size",
        $"retention_milli")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("2024-01-02", 0L, 2L, 2L, 1000L), // both buyers active day 2
      ("2024-01-02", 1L, 1L, 2L, 500L),  // u2 on day 3
      ("2024-01-02", 2L, 1L, 2L, 500L))) // u1 on day 4
  }

  test("cohortRetention: week unit truncates to ISO Monday and offset 0 " +
       "covers the whole cohort week") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // 2024-01-01 is a Monday; days 3 and 7 are the same ISO week,
    // day 8 the next
    val events = Seq(
      (1L, ts(3), "purchase"), (1L, ts(7), "view"), (1L, ts(8), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = FunnelOps.cohortRetention(events, "user_id", "ts",
        unit = "week", cohortFilter = None)
      .select($"cohort", $"period_offset", $"active")
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L)))
  }
}
