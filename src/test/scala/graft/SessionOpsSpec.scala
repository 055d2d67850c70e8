package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.SessionOps
import graft.streaming.EventStreamOps
import graft.streaming.EventStreamOps.Event

class SessionOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("sessionize: gaps strictly greater than the gap break sessions; " +
       "boundaries, counts and cent-sums are exact") {
    val e = Seq(
      // user 1: [10,12,14] then gap 100s -> [120], gap exactly 10s joins
      (1L, 1L, 10_000_000L, 1.25), (1L, 2L, 12_000_000L, 0.5),
      (1L, 3L, 14_000_000L, 2.0), (1L, 4L, 120_000_000L, 4.0),
      (1L, 5L, 130_000_000L, 1.0), // exactly 10s after -> same session
      // user 2: single event
      (2L, 6L, 11_000_000L, 3.0)
    ).toDF("user_id", "event_id", "ts_us", "value")
    val out = SessionOps.sessionize(
        e, "user_id", "ts_us", gapUs = 10_000_000L,
        tieCol = "event_id", valueCol = "value")
      .orderBy("user_id", "session_idx")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq === Seq(
      (1L, 1L, 10_000_000L, 14_000_000L, 3L, 375L),
      (1L, 2L, 120_000_000L, 130_000_000L, 2L, 500L),
      (2L, 1L, 11_000_000L, 11_000_000L, 1L, 300L)))
  }

  test("sessionize plans exactly one shuffle: the rollup reuses the " +
       "window's hash partitioning") {
    val e = Seq((1L, 1L, 10L, 1.0)).toDF("user_id", "event_id", "ts_us", "value")
    // count on the plan STRING — the AQE wrapper hides its inner plan
    // from TreeNode.collect
    val plan = SessionOps.sessionize(
      e, "user_id", "ts_us", 10L, "event_id", "value")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange ".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"expected 1 exchange (key partitioning reused), got $exchanges:\n$plan")
  }

  test("batch sessionize matches the streaming flatMapGroupsWithState " +
       "sessionizer on closed sessions") {
    // values are multiples of 0.25 -> double sums are exact, so the
    // streaming Double totals and the batch cent-sums compare exactly
    val events = Seq(
      Event(1, 1, "click", 1.25, ts(10)), Event(2, 1, "click", 0.5, ts(12)),
      Event(3, 1, "view", 2.0, ts(13)),
      Event(4, 1, "view", 4.0, ts(60)), // > 5s gap: second session
      Event(5, 2, "click", 3.0, ts(11)), Event(6, 2, "click", 0.25, ts(14)),
      Event(7, 3, "view", 1.5, ts(20)))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreamOps.sessionize(mem.toDS(), gapMs = 5000)
      .writeStream.format("memory").queryName("sess_equiv")
      .outputMode(OutputMode.Append).start()
    val streamed =
      try {
        mem.addData(events: _*)
        q.processAllAvailable()
        // sentinel far past every lastTs+gap flushes all open sessions
        mem.addData(Event(99, 9, "flush", 0.0, ts(10_000)))
        q.processAllAvailable()
        spark.table("sess_equiv").as[EventStreamOps.SessionOut]
          .collect().filter(_.user_id != 9L)
          .map(s => (s.user_id, s.n_events,
            math.round(s.total_value * 100)))
          .sorted.toSeq
      } finally q.stop()

    val batch = SessionOps.sessionize(
        events.toDS().toDF()
          .select($"user_id", $"event_id",
            unix_micros($"ts").as("ts_us"), $"value"),
        "user_id", "ts_us", gapUs = 5_000_000L,
        tieCol = "event_id", valueCol = "value")
      .select($"user_id", $"n_events", $"value_c")
      .as[(Long, Long, Long)].collect().sorted.toSeq

    assert(streamed === batch,
      "streaming and batch sessionization must agree on closed sessions")
  }

  test("Spark's native session_window agrees with SessionOps.sessionize") {
    val rnd = new scala.util.Random(17)
    val gapUs = 1800L * 1000000L
    val rows = Seq.tabulate(600) { i =>
      (i.toLong, (i % 23).toLong,
        // clustered arrivals so multi-event sessions actually form
        1700000000000000L + (i % 23) * 3600000000L +
          rnd.nextInt(6) * 600000000L + rnd.nextInt(1000000),
        rnd.nextDouble() * 10)
    } ++ Seq(
      // boundary pins (probed): diff == gap MERGES in native
      // session_window, SessionOps, and the q183 oracle alike;
      // diff == gap + 1us splits
      (9000L, 900L, 1700000000000000L, 1.0),
      (9001L, 900L, 1700000000000000L + gapUs, 1.0),
      (9002L, 901L, 1700000000000000L, 1.0),
      (9003L, 901L, 1700000000000000L + gapUs + 1L, 1.0))
    val df = rows.toDF("event_id", "user_id", "ts_us", "value")
    val native = df
      .select($"user_id", timestamp_micros($"ts_us").as("ts"),
        round($"value" * 100, 0).cast("long").as("value_c"))
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), sum($"value_c").as("value_c"))
      .select($"user_id", unix_micros($"sw.start").as("session_start_us"),
        (unix_micros($"sw.end") - gapUs).as("session_end_us"),
        $"n_events", $"value_c")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val ours = SessionOps.sessionize(df, "user_id", "ts_us", gapUs,
        tieCol = "event_id", valueCol = "value")
      .select($"user_id", $"session_start_us", $"session_end_us",
        $"n_events", $"value_c")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(native.nonEmpty && native.exists(_._4 > 1))
    assert(native === ours,
      "native session_window must produce the identical session set")
    val u900 = native.filter(_._1 == 900L)
    assert(u900.length == 1 && u900.head._4 == 2L,
      "diff == gap must merge")
    assert(native.count(_._1 == 901L) == 2, "diff == gap + 1us must split")
  }
}
