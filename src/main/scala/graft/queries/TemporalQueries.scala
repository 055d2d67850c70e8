package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Checkpointer._
import graft.ops.{FunnelOps, RangeJoinOps, TemporalOps}

/** Temporal/window conformance suite over `events`.
  *
  * Timestamps compare as integer microseconds (`unix_micros` /
  * `epoch_us`) on both engines — TIMESTAMP(NANOS) parquet plus engine
  * session-TZ differences make raw timestamp equality fragile, integer
  * micros are exact.
  */
object TemporalQueries {

  /** α = 0.3 EWMA lag weights in ppm, 8 taps: w₀ = 300000,
    * w_{j+1} = w_j·7 div 10 — a pure integer recurrence, so both
    * engines consume identical literals (the q185 table pattern).
    * (Declared before `all`: the q195 oracle string interpolates it
    * at object init.)
    */
  val EwmaWeightsPpm: Array[Long] =
    Iterator.iterate(300000L)(x => x * 7 / 10).take(8).toArray

  val all: Seq[GraftQuery] = Seq(

    // Ordered funnel (FunnelOps.funnel): per user, the earliest
    // view → click → purchase chain where each step is strictly after
    // the previous one and within 24 h of the FIRST view (conversion
    // window anchored at entry). Greedy-earliest chain semantics; each
    // stage is one filtered min-agg / key equi-join — raw events never
    // travel past the first shuffle.
    GraftQuery(
      "q159_funnel",
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
        |s1 AS (
        |  SELECT user_id, MIN(tu) AS ts_1_us
        |  FROM e WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT s1.user_id, ts_1_us,
        |    MIN(CASE WHEN e.tu > ts_1_us
        |          AND e.tu <= ts_1_us + 86400000000 THEN e.tu END)
        |      AS ts_2_us
        |  FROM s1 LEFT JOIN e
        |    ON e.user_id = s1.user_id AND e.event_type = 'click'
        |  GROUP BY 1, 2),
        |s3 AS (
        |  SELECT s2.user_id, ts_1_us, ts_2_us,
        |    MIN(CASE WHEN e.tu > ts_2_us
        |          AND e.tu <= ts_1_us + 86400000000 THEN e.tu END)
        |      AS ts_3_us
        |  FROM s2 LEFT JOIN e
        |    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
        |  GROUP BY 1, 2, 3)
        |SELECT user_id, ts_1_us, ts_2_us, ts_3_us,
        |  1 + CAST(ts_2_us IS NOT NULL AS INTEGER)
        |    + CAST(ts_3_us IS NOT NULL AS INTEGER) AS stage
        |FROM s3 ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .select($"user_id", $"event_type", unix_micros($"ts").as("tu"))
      FunnelOps.funnel(e, "user_id", "tu", "event_type",
          stages = Seq("view", "click", "purchase"),
          horizonUs = 86400000000L)
        .orderBy($"user_id")
    },

    // Cohort retention (FunnelOps.cohortRetention): users cohorted by
    // the DAY of their first purchase, matrix of distinct-day activity
    // at day offsets (forward-looking). date_trunc day + exact datediff
    // div — no timestamp arithmetic crosses the engines.
    GraftQuery(
      "q160_retention",
      """WITH f AS (
        |  SELECT user_id,
        |    CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort_d
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |a AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', ts) AS DATE) AS p
        |  FROM events),
        |m AS (
        |  SELECT cohort_d, date_diff('day', cohort_d, p) AS period_offset,
        |    COUNT(*) AS active
        |  FROM f JOIN a USING (user_id)
        |  WHERE p >= cohort_d GROUP BY 1, 2),
        |sz AS (SELECT cohort_d, COUNT(*) AS cohort_size FROM f GROUP BY 1)
        |SELECT strftime(m.cohort_d, '%Y-%m-%d') AS cohort,
        |  CAST(period_offset AS BIGINT) AS period_offset, active,
        |  cohort_size, (active*1000)//cohort_size AS retention_milli
        |FROM m JOIN sz USING (cohort_d)
        |ORDER BY cohort, period_offset""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "events")
      FunnelOps.cohortRetention(e, "user_id", "ts", unit = "day",
          cohortFilter = Some($"event_type" === "purchase"))
        .orderBy($"cohort", $"period_offset")
    },

    // Last-touch attribution: every purchase credited to the user's
    // latest preceding click's campaign channel (props.k mod 5), no
    // click → 'organic'; revenue rollup per channel. The as-of join is
    // TemporalOps.asofJoin's union+window carry (ONE shuffle — no
    // per-purchase probe join); the channel rides the carried struct.
    GraftQuery(
      "q166_attribution",
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(round(value*100) AS BIGINT) AS value_c
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, epoch_us(ts) AS cts,
        |    'ch' || (CAST(regexp_extract(props, '[0-9]+') AS BIGINT) % 5)
        |      AS channel
        |  FROM events WHERE event_type = 'click'),
        |j AS (
        |  SELECT p.user_id, p.ts_us, p.value_c, c.channel
        |  FROM p ASOF LEFT JOIN c
        |    ON p.user_id = c.user_id AND p.ts_us >= c.cts)
        |SELECT COALESCE(channel, 'organic') AS channel,
        |  COUNT(*) AS n_purchases, CAST(SUM(value_c) AS BIGINT) AS revenue_c
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val e = Tables.load(s, dir, "events")
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", unix_micros($"ts").as("ts_us"),
          round($"value" * 100, 0).cast("long").as("value_c"))
      val kSchema = StructType(Seq(StructField("k", LongType)))
      val clicks = e.filter($"event_type" === "click")
        .select($"user_id", unix_micros($"ts").as("click_ts_us"),
          concat(lit("ch"),
            (from_json($"props", kSchema).getField("k") % 5)
              .cast("string")).as("channel"))
      TemporalOps.asofJoin(purchases, clicks,
          Seq("user_id"), "ts_us", "click_ts_us")
        .select(coalesce($"channel", lit("organic")).as("channel"),
          $"value_c")
        .groupBy($"channel")
        .agg(count(lit(1)).as("n_purchases"),
          sum($"value_c").as("revenue_c"))
        .orderBy($"channel")
    },

    // Freshness-weighted scoring: per user, event value decayed by a
    // step half-life (factor = 1e6 >> weeks-of-age, shift clamped so
    // it can never wrap Java's mod-64 shift) against the corpus max
    // date — the max enters as an in-plan 1-row broadcast scalar.
    // Integer shifts replay exactly; a float exp() would not.
    GraftQuery(
      "q167_time_decay",
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
        |    CAST(round(value*100) AS BIGINT) AS value_c
        |  FROM events),
        |mx AS (SELECT MAX(d) AS mxd FROM e),
        |w AS (
        |  SELECT user_id, value_c,
        |    (CAST(1000000 AS BIGINT)
        |      >> LEAST(date_diff('day', d, mxd)//7, 20)) AS factor
        |  FROM e CROSS JOIN mx)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(value_c) AS BIGINT) AS raw_c,
        |  CAST(SUM(value_c*factor) AS BIGINT) AS decayed_micro_c
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .select($"user_id", to_date($"ts").as("d"),
          round($"value" * 100, 0).cast("long").as("value_c"))
      val mx = e.agg(max($"d").as("__mx"))
      e.crossJoin(broadcast(mx))
        .withColumn("factor", expr(
          "shiftright(CAST(1000000 AS BIGINT), " +
            "CAST(least(datediff(__mx, d) DIV 7, 20) AS INT))"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          sum($"value_c").as("raw_c"),
          sum($"value_c" * $"factor").as("decayed_micro_c"))
        .orderBy($"user_id")
    },

    // CUSUM change detection (SeriesOps.cusum) on per-type daily event
    // counts — the ingestion watchdog. The sequential-looking
    // recurrence s_t = max(0, s_{t−1} + (x_t − target)) is computed as
    // cum_t − min(0, running-min cum): two plain window passes over
    // the per-period rollup, no stateful scan — so the oracle replays
    // it with the same two windows.
    GraftQuery(
      "q169_cusum_anomaly",
      """WITH s AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT *, SUM(x) OVER (PARTITION BY event_type)
        |    // COUNT(*) OVER (PARTITION BY event_type) AS target
        |  FROM s),
        |c AS (
        |  SELECT *, SUM(x - target)
        |    OVER (PARTITION BY event_type ORDER BY d) AS cum
        |  FROM t),
        |m AS (
        |  SELECT *, LEAST(MIN(cum)
        |    OVER (PARTITION BY event_type ORDER BY d), 0) AS runmin
        |  FROM c)
        |SELECT event_type, strftime(d, '%Y-%m-%d') AS day, x,
        |  CAST(target AS BIGINT) AS target,
        |  CAST(cum - runmin AS BIGINT) AS cusum,
        |  (cum - runmin)*1000 > 500*target AS flagged
        |FROM m ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      import s.implicits._
      val daily = Tables.load(s, dir, "events")
        .groupBy($"event_type", to_date($"ts").as("d"))
        .agg(count(lit(1)).as("x"))
      graft.ops.SeriesOps.cusum(daily, "event_type", "d", "x",
          kMilli = 500L)
        .select($"event_type", date_format($"d", "yyyy-MM-dd").as("day"),
          $"x", $"target", $"cusum", $"flagged")
        .orderBy($"event_type", $"day")
    },

    // As-of join: every purchase paired with the user's latest click at
    // or before it (left-outer). DuckDB's native ASOF JOIN is the
    // oracle for TemporalOps.asofJoin's union+window formulation.
    GraftQuery(
      "q43_asof_join",
      """WITH p AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(round(value*100) AS BIGINT) AS value_c
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_ts_us
        |  FROM events WHERE event_type = 'click')
        |SELECT p.user_id, p.event_id, p.ts_us, p.value_c,
        |  c.click_id, c.click_ts_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts_us >= c.click_ts_us
        |ORDER BY p.user_id, p.ts_us, p.event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "events")
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
          round($"value" * 100, 0).cast("long").as("value_c"))
      val clicks = e.filter($"event_type" === "click")
        .select($"user_id", $"event_id".as("click_id"),
          unix_micros($"ts").as("click_ts_us"))
      TemporalOps.asofJoin(
          purchases, clicks, Seq("user_id"), "ts_us", "click_ts_us",
          matchedTsCol = Some("click_ts_us"))
        .orderBy($"user_id", $"ts_us", $"event_id")
    },

    // §2.5 window analytics (beyond the reference, which has none):
    // row_number, lag, running sum per user in (ts, id) total order.
    GraftQuery(
      "q44_window_analytics",
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id) AS rn,
        |  lag(CAST(round(value*100) AS BIGINT)) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id) AS prev_value_c,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id) AS BIGINT) AS run_value_c
        |FROM events
        |ORDER BY user_id, rn""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy(unix_micros($"ts").asc, $"event_id".asc)
      val valueC = round($"value" * 100, 0).cast("long")
      Tables.load(s, dir, "events")
        .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
          row_number().over(w).cast("long").as("rn"),
          lag(valueC, 1).over(w).as("prev_value_c"),
          sum(valueC).over(w).as("run_value_c"))
        .orderBy($"user_id", $"rn")
    },

    // Interval-containment join: clicks inside the hour before each
    // purchase, per user — RangeJoinOps binning vs DuckDB's plain
    // inequality join. Aggregated so the result stays small at any SF.
    GraftQuery(
      "q45_interval_join",
      """WITH p AS (
        |  SELECT user_id, event_id AS purchase_id,
        |    epoch_us(ts) - 3600000000 AS s_us, epoch_us(ts) AS e_us
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, epoch_us(ts) AS t_us
        |  FROM events WHERE event_type = 'click')
        |SELECT p.user_id, p.purchase_id, COUNT(c.t_us) AS n_clicks,
        |  MAX(c.t_us) AS last_click_us
        |FROM p JOIN c ON p.user_id = c.user_id
        |  AND c.t_us BETWEEN p.s_us AND p.e_us
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "events")
      val intervals = e.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("purchase_id"),
          (unix_micros($"ts") - 3600000000L).as("s_us"),
          unix_micros($"ts").as("e_us"))
      val points = e.filter($"event_type" === "click")
        .select($"user_id", unix_micros($"ts").as("t_us"))
      RangeJoinOps.intervalJoin(
          points, intervals, Seq("user_id"), "t_us", "s_us", "e_us",
          binWidth = 3600000000L)
        .groupBy($"user_id", $"purchase_id")
        .agg(count($"t_us").as("n_clicks"), max($"t_us").as("last_click_us"))
        .orderBy($"user_id", $"purchase_id")
    },

    // SCD2 interval build: per-customer order-version log → validity
    // intervals (valid_to = next version's ts, null while current) —
    // the warehouse read shape that pairs with the as-of join (q43).
    // Timestamps travel as integer micros; the open interval's null
    // valid_to and the is_current flag are both in the hash.
    GraftQuery(
      "q104_scd2_intervals",
      """SELECT o_custkey, o_orderkey, o_orderstatus,
        |  epoch_us(o_orderdate) AS valid_from_us,
        |  lead(epoch_us(o_orderdate), 1) OVER
        |    (PARTITION BY o_custkey
        |     ORDER BY o_orderdate, o_orderkey) AS valid_to_us,
        |  lead(epoch_us(o_orderdate), 1) OVER
        |    (PARTITION BY o_custkey
        |     ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, valid_from_us, o_orderkey""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      import graft.ops.TemporalOps
      TemporalOps.scd2Intervals(
          Tables.load(s, dir, "orders").filter($"o_custkey" < 100),
          "o_custkey", "o_orderdate", "o_orderkey")
        .select($"o_custkey", $"o_orderkey", $"o_orderstatus",
          // o_orderdate is TIMESTAMP_NTZ; UTC session tz makes the cast
          // a no-op reinterpretation (q18's pattern)
          unix_micros($"valid_from".cast("timestamp")).as("valid_from_us"),
          unix_micros($"valid_to".cast("timestamp")).as("valid_to_us"),
          $"is_current")
        .orderBy($"o_custkey", $"valid_from_us", $"o_orderkey")
    },

    // Time-weighted average price (TWAP): per event type, each value
    // holds until the next observation (lead window), weighted by its
    // holding duration in seconds; the final observation carries zero
    // weight (no forward interval). twap_c = Σ value_c·dur_s div Σ dur_s
    // — the step-function integral in exact integer arithmetic, one
    // key-partitioned window + one rollup (no shuffle beyond the key).
    GraftQuery(
      "q180_twap",
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS ts_us,
        |    CAST(round(value*100) AS BIGINT) AS value_c
        |  FROM events),
        |d AS (
        |  SELECT event_type, value_c,
        |    (lead(ts_us, 1) OVER (PARTITION BY event_type
        |       ORDER BY ts_us, value_c) - ts_us) // 1000000 AS dur_s
        |  FROM e)
        |SELECT event_type, COUNT(*) AS n_obs,
        |  CAST(SUM(COALESCE(dur_s, 0)) AS BIGINT) AS total_s,
        |  CAST(SUM(value_c * COALESCE(dur_s, 0))
        |    // SUM(COALESCE(dur_s, 0)) AS BIGINT) AS twap_c
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val w = Window.partitionBy($"event_type")
        .orderBy($"ts_us", $"value_c")
      val d = Tables.load(s, dir, "events")
        .select($"event_type", unix_micros($"ts").as("ts_us"),
          round($"value" * 100, 0).cast("long").as("value_c"))
        .withColumn("dur_s",
          coalesce(div(lead($"ts_us", 1).over(w) - $"ts_us",
            lit(1000000L)), lit(0L)))
      d.groupBy($"event_type")
        .agg(count(lit(1)).as("n_obs"),
          sum($"dur_s").as("total_s"),
          // a single-observation group has zero holding time: NULL twap
          // (matches DuckDB's NULL on // 0; ANSI Spark would throw)
          when(sum($"dur_s") > 0L,
            div(sum($"value_c" * $"dur_s"), sum($"dur_s")))
            .as("twap_c"))
        .orderBy($"event_type")
    },

    // Linear multi-touch attribution (complements q166's last-touch):
    // every click in the 24h window before a purchase shares the credit
    // equally — credit = 1e6 div n_clicks micros per click, rolled up
    // per campaign channel. The window match is RangeJoinOps
    // .intervalJoin's bin-bucketed EQUI-join (purchase intervals
    // exploded to hour bins), never a per-user position inequality
    // join; unmatched purchases fall to 'organic' via an anti-join.
    GraftQuery(
      "q181_linear_attribution",
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS pts,
        |    CAST(round(value*100) AS BIGINT) AS value_c
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, epoch_us(ts) AS cts,
        |    'ch' || (CAST(regexp_extract(props, '[0-9]+') AS BIGINT) % 5)
        |      AS channel
        |  FROM events WHERE event_type = 'click'),
        |m AS (
        |  SELECT p.user_id, p.pts, p.value_c, c.channel
        |  FROM p JOIN c ON c.user_id = p.user_id
        |    AND c.cts >= p.pts - 86400000000 AND c.cts <= p.pts),
        |nm AS (SELECT user_id, pts, COUNT(*) AS n FROM m GROUP BY 1, 2),
        |credits AS (
        |  SELECT m.channel, 1000000 // nm.n AS credit_micro,
        |    m.value_c // nm.n AS value_share_c
        |  FROM m JOIN nm ON nm.user_id = m.user_id AND nm.pts = m.pts
        |  UNION ALL
        |  SELECT 'organic', 1000000, p.value_c
        |  FROM p ANTI JOIN m ON m.user_id = p.user_id AND m.pts = p.pts)
        |SELECT channel, COUNT(*) AS n_touches,
        |  CAST(SUM(credit_micro) AS BIGINT) AS credit_micro,
        |  CAST(SUM(value_share_c) AS BIGINT) AS value_share_c
        |FROM credits GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val div = graft.functions.GraftColumns.longDiv _
      val e = Tables.load(s, dir, "events")
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", unix_micros($"ts").as("pts"),
          round($"value" * 100, 0).cast("long").as("value_c"),
          (unix_micros($"ts") - 86400000000L).as("w_start"),
          unix_micros($"ts").as("w_end"))
      val kSchema = StructType(Seq(StructField("k", LongType)))
      val clicks = e.filter($"event_type" === "click")
        .select($"user_id", unix_micros($"ts").as("cts"),
          concat(lit("ch"),
            (from_json($"props", kSchema).getField("k") % 5)
              .cast("string")).as("channel"))
      val matched = graft.ops.RangeJoinOps.intervalJoin(
          clicks, purchases, Seq("user_id"), "cts", "w_start", "w_end",
          binWidth = 3600000000L)
        .select($"user_id", $"pts", $"value_c", $"channel")
      val perPurchase = matched.groupBy($"user_id", $"pts")
        .agg(count(lit(1)).as("__n"))
      val credits = matched
        .join(perPurchase, Seq("user_id", "pts"))
        .select($"channel", div(lit(1000000L), $"__n").as("credit_micro"),
          div($"value_c", $"__n").as("value_share_c"))
        .unionByName(purchases
          .join(matched.select($"user_id", $"pts").distinct(),
            Seq("user_id", "pts"), "left_anti")
          .select(lit("organic").as("channel"),
            lit(1000000L).as("credit_micro"),
            $"value_c".as("value_share_c")))
      credits.groupBy($"channel")
        .agg(count(lit(1)).as("n_touches"),
          sum($"credit_micro").as("credit_micro"),
          sum($"value_share_c").as("value_share_c"))
        .orderBy($"channel")
    },

    // Spark's NATIVE session_window operator (batch face): 30-minute
    // inactivity gap per user, window = [first event, last event + gap)
    // — the engine-native form of q55's hand-built gaps-and-islands
    // sessionization (SessionOps), gated so the built-in operator's
    // exact session-boundary semantics are hash-checked too. The
    // oracle replays it as the classic lag/cumsum island detection.
    GraftQuery(
      "q183_session_window",
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(round(value*100) AS BIGINT) AS value_c
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts_us, value_c,
        |    CASE WHEN lag(ts_us) OVER
        |        (PARTITION BY user_id ORDER BY ts_us) IS NULL
        |      OR ts_us - lag(ts_us) OVER
        |        (PARTITION BY user_id ORDER BY ts_us) > 1800000000
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM e),
        |s AS (
        |  SELECT user_id, ts_us, value_c,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us)
        |      AS sid
        |  FROM m)
        |SELECT user_id, CAST(MIN(ts_us) AS BIGINT) AS session_start_us,
        |  CAST(MAX(ts_us) + 1800000000 AS BIGINT) AS session_end_us,
        |  COUNT(*) AS n_events, CAST(SUM(value_c) AS BIGINT) AS value_c
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .select($"user_id", $"ts",
          round($"value" * 100, 0).cast("long").as("value_c"))
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), sum($"value_c").as("value_c"))
        .select($"user_id",
          unix_micros($"sw.start").as("session_start_us"),
          unix_micros($"sw.end").as("session_end_us"),
          $"n_events", $"value_c")
        .orderBy($"user_id", $"session_start_us")
    },

    // Rolling 7-day distinct actives per day (DAU/WAU-style): each
    // (user, active-day) pair votes for the 7 report days it covers —
    // a bounded ×7 explode into an EQUI-grouped distinct count, never
    // a day-range inequality join and never a sliding distinct window
    // (distinct doesn't decompose over frames). Report days restricted
    // to observed days via a semi-join.
    GraftQuery(
      "q184_rolling_actives",
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE)
        |    AS d
        |  FROM events),
        |spine AS (SELECT DISTINCT d AS day FROM ud),
        |ex AS (
        |  SELECT user_id, d + CAST(u.i AS INTEGER) AS day
        |  FROM ud, UNNEST(generate_series(0, 6)) AS u(i)),
        |r AS (
        |  SELECT day, COUNT(DISTINCT user_id) AS active_7d
        |  FROM ex SEMI JOIN spine USING (day) GROUP BY 1),
        |d1 AS (SELECT d AS day, COUNT(*) AS active_1d FROM ud GROUP BY 1)
        |SELECT strftime(r.day, '%Y-%m-%d') AS day, d1.active_1d,
        |  r.active_7d
        |FROM r JOIN d1 ON d1.day = r.day
        |ORDER BY day""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ud = Tables.load(s, dir, "events")
        .select($"user_id", to_date($"ts").as("d")).distinct()
      val spine = ud.select($"d".as("day")).distinct()
      val rolling = ud
        .select($"user_id",
          explode(sequence($"d", date_add($"d", 6))).as("day"))
        .join(spine, Seq("day"), "left_semi")
        .groupBy($"day")
        .agg(countDistinct($"user_id").as("active_7d"))
      val daily = ud.groupBy($"d".as("day"))
        .agg(count(lit(1)).as("active_1d"))
      rolling.join(daily, Seq("day"))
        .select(date_format($"day", "yyyy-MM-dd").as("day"),
          $"active_1d", $"active_7d")
        .orderBy($"day")
    },

    // Per-series OLS trend (SeriesOps.olsTrend): daily event counts per
    // type regressed on the epoch-day index from the four sufficient
    // statistics — ONE map-side-combined aggregation per series, no
    // window, no matrix math; slope/intercept in exact integer micros
    // (div truncation matches across engines, negatives included).
    GraftQuery(
      "q187_ols_trend",
      """WITH r AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    COUNT(*) AS y
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, COUNT(*) AS n, SUM(day) AS sx,
        |    SUM(y) AS sy, SUM(day*y) AS sxy, SUM(day*day) AS sxx
        |  FROM r GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CASE WHEN n*sxx - sx*sx > 0 THEN
        |    CAST((n*sxy - sx*sy)*1000000 // (n*sxx - sx*sx) AS BIGINT)
        |  END AS slope_micro,
        |  CASE WHEN n*sxx - sx*sx > 0 THEN
        |    CAST((sy*1000000
        |        - ((n*sxy - sx*sy)*1000000 // (n*sxx - sx*sx))*sx)
        |      // n AS BIGINT)
        |  END AS intercept_micro
        |FROM s ORDER BY event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val rollup = Tables.load(s, dir, "events")
        .select($"event_type",
          div(unix_micros($"ts"), lit(86400000000L)).as("day"))
        .groupBy($"event_type", $"day")
        .agg(count(lit(1)).as("y"))
      graft.ops.SeriesOps.olsTrend(rollup, "event_type", "day", "y")
        .orderBy($"event_type")
    },

    // Theil-Sen robust trend (SeriesOps.theilSenSlope): the exact lower
    // median of all pairwise slopes over the same daily rollup — the
    // estimator one corrupted day cannot drag where q187's OLS follows
    // any outlier. Pairs self-equi-join the PERIOD-DOMAIN rollup
    // (O(days²), never event volume); the median picks row ⌈m/2⌉ of the
    // per-series slope ordering.
    GraftQuery(
      "q188_theil_sen",
      """WITH r AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    COUNT(*) AS y
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type,
        |    (b.y - a.y)*1000 // (b.day - a.day) AS slope
        |  FROM r a JOIN r b ON a.event_type = b.event_type
        |    AND a.day < b.day),
        |q AS (
        |  SELECT event_type, slope,
        |    row_number() OVER (PARTITION BY event_type ORDER BY slope)
        |      AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS m
        |  FROM p)
        |SELECT event_type, CAST(m AS BIGINT) AS n_pairs,
        |  CAST(slope AS BIGINT) AS slope_milli
        |FROM q WHERE rn = (m + 1) // 2
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val rollup = Tables.load(s, dir, "events")
        .select($"event_type",
          div(unix_micros($"ts"), lit(86400000000L)).as("day"))
        .groupBy($"event_type", $"day")
        .agg(count(lit(1)).as("y"))
      graft.ops.SeriesOps.theilSenSlope(rollup, "event_type", "day", "y")
        .orderBy($"event_type")
    },

    // First-order Markov transition matrix (SeriesOps.transitionMatrix):
    // per-user event-type handoffs via ONE lead window over a total
    // per-key order (ties pinned by event_id), counts map-side combined,
    // row-normalized in ppm over the |states|²-row count table — the
    // clickstream "what happens after X" readout.
    GraftQuery(
      "q189_markov_transitions",
      """WITH o AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS next_type
        |  FROM events),
        |c AS (
        |  SELECT event_type AS from_state, next_type AS to_state,
        |    COUNT(*) AS n
        |  FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_state, to_state, CAST(n AS BIGINT) AS n,
        |  CAST(n*1000000 // SUM(n) OVER (PARTITION BY from_state)
        |    AS BIGINT) AS p_ppm
        |FROM c ORDER BY from_state, to_state""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .select($"user_id", unix_micros($"ts").as("tu"), $"event_id",
          $"event_type")
      graft.ops.SeriesOps.transitionMatrix(
          e, "user_id", "tu", "event_id", "event_type")
        .orderBy($"from_state", $"to_state")
    },

    // Stationary distribution of the q189 chain by power iteration
    // (SeriesOps.stationaryDistribution): 3 fixed rounds of
    // x·P in integer ppm with per-term floors — the q106 PageRank
    // replay discipline on the |states|²-bounded transition table
    // (corpus-free rounds). The oracle unrolls all three rounds as
    // chained CTEs over the q189 oracle's own matrix.
    GraftQuery(
      "q272_markov_stationary",
      """WITH o AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS next_type
        |  FROM events),
        |c AS (
        |  SELECT event_type AS f, next_type AS t, COUNT(*) AS n
        |  FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |tm AS (
        |  SELECT f, t, n*1000000 // SUM(n) OVER (PARTITION BY f) AS p
        |  FROM c),
        |st AS (SELECT DISTINCT s FROM
        |  (SELECT f AS s FROM tm UNION SELECT t FROM tm)),
        |kk AS (SELECT COUNT(*) AS k FROM st),
        |x0 AS (SELECT s AS state, 1000000 // k AS m FROM st, kk),
        |a1 AS (SELECT tm.t AS state, SUM(x0.m * tm.p // 1000000) AS m
        |       FROM tm JOIN x0 ON x0.state = tm.f GROUP BY 1),
        |x1 AS (SELECT st.s AS state, COALESCE(a1.m, 0) AS m
        |       FROM st LEFT JOIN a1 ON a1.state = st.s),
        |a2 AS (SELECT tm.t AS state, SUM(x1.m * tm.p // 1000000) AS m
        |       FROM tm JOIN x1 ON x1.state = tm.f GROUP BY 1),
        |x2 AS (SELECT st.s AS state, COALESCE(a2.m, 0) AS m
        |       FROM st LEFT JOIN a2 ON a2.state = st.s),
        |a3 AS (SELECT tm.t AS state, SUM(x2.m * tm.p // 1000000) AS m
        |       FROM tm JOIN x2 ON x2.state = tm.f GROUP BY 1),
        |x3 AS (SELECT st.s AS state, COALESCE(a3.m, 0) AS m
        |       FROM st LEFT JOIN a3 ON a3.state = st.s)
        |SELECT round, state, CAST(m AS BIGINT) AS mass_ppm FROM (
        |  SELECT CAST(1 AS BIGINT) AS round, state, m FROM x1
        |  UNION ALL SELECT CAST(2 AS BIGINT), state, m FROM x2
        |  UNION ALL SELECT CAST(3 AS BIGINT), state, m FROM x3)
        |ORDER BY round, state""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .select($"user_id", unix_micros($"ts").as("tu"), $"event_id",
          $"event_type")
      val tm = graft.ops.SeriesOps.transitionMatrix(
        e, "user_id", "tu", "event_id", "event_type")
      graft.ops.SeriesOps.stationaryDistribution(
          tm, "from_state", "to_state", "p_ppm", rounds = 3)
        .orderBy($"round", $"state")
    },

    // Month-over-month revenue growth in ppm — the executive trend
    // readout. The lag window runs over the MONTH SPINE (calendar
    // -bounded domain, the q203 contract), never the event stream;
    // first month's growth is NULL (no prior), in the hash.
    GraftQuery(
      "q284_mom_growth",
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |      AS rev_c
        |  FROM orders GROUP BY 1)
        |SELECT month, rev_c,
        |  CAST((rev_c - lag(rev_c) OVER (ORDER BY month)) * 1000000
        |    // lag(rev_c) OVER (ORDER BY month) AS BIGINT)
        |    AS growth_ppm
        |FROM m ORDER BY month""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val w = Window.orderBy($"month")
      Tables.load(s, dir, "orders")
        .select(date_format($"o_orderdate", "yyyy-MM").as("month"),
          round($"o_totalprice" * 100, 0).cast("long").as("v"))
        .groupBy($"month").agg(sum($"v").as("rev_c"))
        .withColumn("growth_ppm",
          div(($"rev_c" - lag($"rev_c", 1).over(w)) * 1000000L,
            lag($"rev_c", 1).over(w)))
        .orderBy($"month")
    },

    // Interval-union coverage (TemporalOps.intervalUnion): per user,
    // merge the overlapping [event, event + 30 min) activity intervals
    // and report the union — islands + total covered seconds — the
    // "total active time" readout that double-counting Σ(end − start)
    // gets wrong. Two window passes over one per-key shuffle.
    GraftQuery(
      "q190_interval_coverage",
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) // 1000000 AS s,
        |    epoch_us(ts) // 1000000 + 1800 AS e
        |  FROM events),
        |m AS (
        |  SELECT user_id, s, e,
        |    MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
        |  FROM iv),
        |b AS (
        |  SELECT user_id, s, e,
        |    SUM(CASE WHEN pe IS NULL OR s > pe THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS island
        |  FROM m),
        |g AS (
        |  SELECT user_id, island, COUNT(*) AS cnt, MIN(s) AS ms,
        |    MAX(e) AS me
        |  FROM b GROUP BY 1, 2)
        |SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS n_intervals,
        |  CAST(COUNT(*) AS BIGINT) AS n_islands,
        |  CAST(SUM(me - ms) AS BIGINT) AS covered
        |FROM g GROUP BY 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val iv = Tables.load(s, dir, "events")
        .select($"user_id",
          div(unix_micros($"ts"), lit(1000000L)).as("s"))
        .withColumn("e", $"s" + 1800L)
      graft.ops.TemporalOps.intervalUnion(iv, "user_id", "s", "e")
        .orderBy($"user_id")
    },

    // Position-based (U-shaped 40/20/40) multi-touch attribution —
    // completes the attribution family (q166 last-touch, q181 linear,
    // q167 time-decay): first and last click before a purchase get
    // 40% credit each, middles share the remaining 20%; n=1 → 100%,
    // n=2 → 50/50. Same bin-bucketed interval EQUI-join as q181; the
    // per-purchase rank is a window over the purchase's own clicks
    // (basket-sized, never corpus-sized).
    GraftQuery(
      "q194_position_attribution",
      """WITH p AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS pts,
        |    CAST(round(value*100) AS BIGINT) AS value_c
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS cts,
        |    'ch' || (CAST(regexp_extract(props, '[0-9]+') AS BIGINT) % 5)
        |      AS channel
        |  FROM events WHERE event_type = 'click'),
        |m AS (
        |  SELECT p.user_id, p.pts, p.value_c, c.channel, c.cts,
        |    c.click_id
        |  FROM p JOIN c ON c.user_id = p.user_id
        |    AND c.cts >= p.pts - 86400000000 AND c.cts <= p.pts),
        |rk AS (
        |  SELECT channel, value_c,
        |    row_number() OVER (PARTITION BY user_id, pts
        |      ORDER BY cts, click_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id, pts) AS n
        |  FROM m),
        |credits AS (
        |  SELECT channel,
        |    CASE WHEN n = 1 THEN 1000000
        |         WHEN n = 2 THEN 500000
        |         WHEN rn = 1 OR rn = n THEN 400000
        |         ELSE 200000 // (n - 2) END AS credit_micro
        |  FROM rk
        |  UNION ALL
        |  SELECT 'organic', 1000000
        |  FROM p ANTI JOIN m ON m.user_id = p.user_id AND m.pts = p.pts)
        |SELECT channel, COUNT(*) AS n_touches,
        |  CAST(SUM(credit_micro) AS BIGINT) AS credit_micro
        |FROM credits GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val div = graft.functions.GraftColumns.longDiv _
      val e = Tables.load(s, dir, "events")
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", unix_micros($"ts").as("pts"),
          round($"value" * 100, 0).cast("long").as("value_c"),
          (unix_micros($"ts") - 86400000000L).as("w_start"),
          unix_micros($"ts").as("w_end"))
      val kSchema = StructType(Seq(StructField("k", LongType)))
      val clicks = e.filter($"event_type" === "click")
        .select($"user_id", unix_micros($"ts").as("cts"),
          $"event_id".as("click_id"),
          concat(lit("ch"),
            (from_json($"props", kSchema).getField("k") % 5)
              .cast("string")).as("channel"))
      val matched = graft.ops.RangeJoinOps.intervalJoin(
          clicks, purchases, Seq("user_id"), "cts", "w_start", "w_end",
          binWidth = 3600000000L)
        .select($"user_id", $"pts", $"channel", $"cts", $"click_id")
      val wRank = Window.partitionBy($"user_id", $"pts")
        .orderBy($"cts", $"click_id")
      val wAll = Window.partitionBy($"user_id", $"pts")
      val credits = matched
        .withColumn("rn", row_number().over(wRank))
        .withColumn("n", count(lit(1)).over(wAll))
        .select($"channel",
          when($"n" === 1L, 1000000L)
            .when($"n" === 2L, 500000L)
            .when($"rn" === 1 || $"rn" === $"n", 400000L)
            .otherwise(div(lit(200000L), $"n" - 2L)).as("credit_micro"))
        .unionByName(purchases
          .join(matched.select($"user_id", $"pts").distinct(),
            Seq("user_id", "pts"), "left_anti")
          .select(lit("organic").as("channel"),
            lit(1000000L).as("credit_micro")))
      credits.groupBy($"channel")
        .agg(count(lit(1)).as("n_touches"),
          sum($"credit_micro").as("credit_micro"))
        .orderBy($"channel")
    },

    // Truncated EWMA smoothing: s(d) = Σ_{j=0..7} w_j · x(d−j) div 1000
    // with the exact integer weight recurrence w_0 = 300000 ppm,
    // w_{j+1} = w_j·7 div 10 (α = 0.3 — most-recent-heavy smoothing).
    // NO sequential recurrence and NO window: each observed day votes
    // for the ≤ 8 report days it covers (the q184 bounded-explode
    // shape), restricted to observed days — one explode + one groupBy,
    // embarrassingly parallel at any scale. Early days smooth over
    // partial windows; n_terms says how partial.
    GraftQuery(
      "q195_ewma",
      s"""WITH r AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    COUNT(*) AS y
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT ${TemporalQueries.EwmaWeightsPpm
                 .mkString("[", ", ", "]")} AS w),
        |ex AS (
        |  SELECT event_type, day + u.j AS rday, y, w.w[u.j + 1] AS wj
        |  FROM r CROSS JOIN w, UNNEST(generate_series(0, 7)) AS u(j)),
        |spine AS (SELECT DISTINCT event_type, day FROM r)
        |SELECT ex.event_type, CAST(ex.rday AS BIGINT) AS day,
        |  COUNT(*) AS n_terms,
        |  CAST(SUM(y * wj) // 1000 AS BIGINT) AS ewma_milli
        |FROM ex JOIN spine ON spine.event_type = ex.event_type
        |  AND spine.day = ex.rday
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val rollup = Tables.load(s, dir, "events")
        .select($"event_type",
          div(unix_micros($"ts"), lit(86400000000L)).as("day"))
        .groupBy($"event_type", $"day")
        .agg(count(lit(1)).as("y"))
        .graftCheckpoint() // two consumers (votes + spine), tiny table
      val votes = rollup
        .select($"event_type", $"day", $"y",
          posexplode(typedLit(TemporalQueries.EwmaWeightsPpm)))
        .select($"event_type", ($"day" + $"pos").as("day"), $"y",
          $"col".as("wj"))
      val spine = rollup.select($"event_type", $"day")
      votes.join(spine, Seq("event_type", "day"))
        .groupBy($"event_type", $"day")
        .agg(count(lit(1)).as("n_terms"),
          div(sum($"y" * $"wj"), lit(1000L)).as("ewma_milli"))
        .orderBy($"event_type", $"day")
    },

    // Dense-spine zero fill: per (type, day) counts INCLUDING explicit
    // zero rows for silent days — the report shape dashboards and
    // downstream window math need (q74 forward-fills VALUES; this
    // fills PERIODS). Spine = distinct types × distinct days — both
    // DOMAIN-sized, so the cross is a broadcast of bounded dims, never
    // a corpus product; counts attach by left join + coalesce 0.
    GraftQuery(
      "q203_zero_fill",
      """WITH r AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    COUNT(*) AS n
        |  FROM events WHERE event_type <> 'error' GROUP BY 1, 2),
        |types AS (SELECT DISTINCT event_type FROM r),
        |days AS (
        |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day
        |  FROM events)
        |SELECT t.event_type, CAST(d.day AS BIGINT) AS day,
        |  CAST(COALESCE(r.n, 0) AS BIGINT) AS n
        |FROM types t CROSS JOIN days d
        |LEFT JOIN r ON r.event_type = t.event_type AND r.day = d.day
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val e = Tables.load(s, dir, "events")
        .select($"event_type",
          div(unix_micros($"ts"), lit(86400000000L)).as("day"))
        .graftCheckpoint() // feeds rollup + both spine dims
      // 'error' events excluded from the ROLLUP but not the day spine:
      // guarantees genuinely missing (type, day) cells exist to fill
      val rollup = e.where($"event_type" =!= "error")
        .groupBy($"event_type", $"day").agg(count(lit(1)).as("n"))
      val types = rollup.select($"event_type").distinct()
      val days = e.select($"day").distinct()
      types.crossJoin(broadcast(days))
        .join(rollup, Seq("event_type", "day"), "left")
        .select($"event_type", $"day", coalesce($"n", lit(0L)).as("n"))
        .orderBy($"event_type", $"day")
    },

    // Lag-k autocovariance/autocorrelation of the daily count series,
    // k = 1..7: pairs (x_t, x_{t+k}) meet through an EQUI-join on
    // day+k (offsets exploded — the q170 position-join shape, never a
    // self-inequality join); per (type, k) the five sufficient sums
    // reduce in one map-side-combined pass. cov_milli is exact
    // integer; r2 is the scaled-division form (both engines replay
    // the identical truncation steps).
    GraftQuery(
      "q204_autocorr",
      """WITH r AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    COUNT(*) AS y
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type, u.k, a.y AS ya, b.y AS yb
        |  FROM r a, UNNEST(generate_series(1, 7)) AS u(k)
        |  JOIN r b ON b.event_type = a.event_type
        |    AND b.day = a.day + u.k),
        |s AS (
        |  SELECT event_type, k, COUNT(*) AS n, SUM(ya) AS sa,
        |    SUM(yb) AS sb, SUM(ya*yb) AS sab, SUM(ya*ya) AS saa,
        |    SUM(yb*yb) AS sbb
        |  FROM p GROUP BY 1, 2)
        |SELECT event_type, CAST(k AS BIGINT) AS k,
        |  CAST(n AS BIGINT) AS n,
        |  CAST((n*sab - sa*sb) * 1000 // (n*n) AS BIGINT) AS cov_milli,
        |  CASE WHEN ((n*saa - sa*sa) // 1000) * ((n*sbb - sb*sb) // 1000)
        |        // 1000000 > 0 THEN
        |    CAST(CASE WHEN n*sab - sa*sb < 0 THEN -1 ELSE 1 END
        |      * (((n*sab - sa*sb) // 1000) * ((n*sab - sa*sb) // 1000))
        |      // (((n*saa - sa*sa) // 1000) * ((n*sbb - sb*sb) // 1000)
        |         // 1000000) AS BIGINT)
        |  END AS r2_signed_ppm
        |FROM s ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val r = Tables.load(s, dir, "events")
        .select($"event_type",
          div(unix_micros($"ts"), lit(86400000000L)).as("day"))
        .groupBy($"event_type", $"day")
        .agg(count(lit(1)).as("y"))
        .graftCheckpoint() // both sides of the lag join
      val a = r.select($"event_type", $"day", $"y".as("ya"),
          explode(sequence(lit(1L), lit(7L))).as("k"))
        .withColumn("bday", $"day" + $"k")
      val stats = a
        .join(r.select($"event_type", $"day".as("bday"), $"y".as("yb")),
          Seq("event_type", "bday"))
        .groupBy($"event_type", $"k")
        .agg(count(lit(1)).as("n"), sum($"ya").as("sa"),
          sum($"yb").as("sb"), sum($"ya" * $"yb").as("sab"),
          sum($"ya" * $"ya").as("saa"), sum($"yb" * $"yb").as("sbb"))
      val num = $"n" * $"sab" - $"sa" * $"sb"
      val va = $"n" * $"saa" - $"sa" * $"sa"
      val vb = $"n" * $"sbb" - $"sb" * $"sb"
      val denScaled = div(div(va, lit(1000L)) * div(vb, lit(1000L)),
        lit(1000000L))
      stats.select($"event_type", $"k", $"n",
          div(num * 1000L, $"n" * $"n").as("cov_milli"),
          when(denScaled > 0L,
            (when(num < 0L, -1L).otherwise(1L)) *
              div(div(num, lit(1000L)) * div(num, lit(1000L)), denScaled))
            .as("r2_signed_ppm"))
        .orderBy($"event_type", $"k")
    },

    // Top session paths (clickstream sequence mining): sessionize by
    // 30-min gaps (q183's islands), concatenate each session's
    // event-type sequence in (ts, event_id) order, count paths, top 20
    // with a total order. The path build is an order-free aggregation:
    // collect structs, array_sort (total struct order), then project —
    // no order-sensitive collect_list anywhere; path cardinality is
    // bounded by session length.
    GraftQuery(
      "q209_session_paths",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events),
        |m AS (
        |  SELECT *, CASE WHEN lag(ts_us) OVER
        |      (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
        |    OR ts_us - lag(ts_us) OVER
        |      (PARTITION BY user_id ORDER BY ts_us, event_id)
        |        > 1800000000
        |    THEN 1 ELSE 0 END AS is_new
        |  FROM e),
        |s AS (
        |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id) AS sid
        |  FROM m),
        |paths AS (
        |  SELECT user_id, sid,
        |    string_agg(event_type, '>' ORDER BY ts_us, event_id)
        |      AS path
        |  FROM s GROUP BY 1, 2)
        |SELECT path, COUNT(*) AS n_sessions
        |FROM paths GROUP BY 1
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val sess = Tables.load(s, dir, "events")
        .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
          $"event_type")
        .withColumn("is_new",
          when(lag($"ts_us", 1).over(w).isNull ||
            $"ts_us" - lag($"ts_us", 1).over(w) > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum($"is_new").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy($"user_id", $"sid")
        .agg(array_join(
          transform(
            array_sort(collect_list(
              struct($"ts_us", $"event_id", $"event_type"))),
            x => x.getField("event_type")), ">").as("path"))
        .groupBy($"path").agg(count(lit(1)).as("n_sessions"))
        .orderBy($"n_sessions".desc, $"path")
        .limit(20)
    },

    // Forecast-accuracy readout (MAE / sMAPE / pinball): naive
    // previous-observation forecast over the per-type daily series,
    // scored with the three standard loss families in exact integer
    // arithmetic — pinball at q=0.9 is max(900·e, −100·e) milli, the
    // asymmetric loss a quantile forecaster is graded on. One lag
    // window over the domain-sized rollup + one rollup.
    GraftQuery(
      "q211_forecast_eval",
      """WITH r AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    COUNT(*) AS y
        |  FROM events GROUP BY 1, 2),
        |f AS (
        |  SELECT event_type, y,
        |    lag(y) OVER (PARTITION BY event_type ORDER BY day) AS yhat
        |  FROM r),
        |e AS (
        |  SELECT event_type, y, yhat, y - yhat AS err
        |  FROM f WHERE yhat IS NOT NULL)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(abs(err)) * 1000 // COUNT(*) AS BIGINT) AS mae_milli,
        |  CAST(SUM(CASE WHEN y + yhat > 0 THEN
        |      abs(err) * 2000000 // (y + yhat) ELSE 0 END)
        |    // COUNT(*) AS BIGINT) AS smape_ppm,
        |  CAST(SUM(GREATEST(err * 900, err * -100)) // COUNT(*)
        |    AS BIGINT) AS pinball90_milli
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val e = Tables.load(s, dir, "events")
        .select($"event_type",
          div(unix_micros($"ts"), lit(86400000000L)).as("day"))
        .groupBy($"event_type", $"day").agg(count(lit(1)).as("y"))
        .withColumn("yhat", lag($"y", 1).over(w))
        .where($"yhat".isNotNull)
        .withColumn("err", $"y" - $"yhat")
      e.groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          div(sum(abs($"err")) * 1000L, count(lit(1))).as("mae_milli"),
          div(sum(when($"y" + $"yhat" > 0L,
            div(abs($"err") * 2000000L, $"y" + $"yhat")).otherwise(0L)),
            count(lit(1))).as("smape_ppm"),
          div(sum(greatest($"err" * 900L, $"err" * -100L)),
            count(lit(1))).as("pinball90_milli"))
        .orderBy($"event_type")
    },

    // A/B test readout: users split into arms by id parity, converted
    // = any ≥$150 purchase (plain any-purchase saturates — every user
    // buys eventually); the 2×2 arm × converted contingency through
    // EvalOps.chiSquareIndependence — the two-proportion z² test IS
    // this χ² (z² = χ² on a 2×2), so the q193 machinery gives the
    // significance readout with zero new math. One per-user reduction
    // + a 4-row domain table.
    GraftQuery(
      "q213_ab_test",
      """WITH u AS (
        |  SELECT user_id,
        |    'arm' || CAST(user_id % 2 AS VARCHAR) AS a,
        |    CASE WHEN MAX(CASE WHEN event_type = 'purchase'
        |        AND round(value*100) >= 15000
        |      THEN 1 ELSE 0 END) = 1 THEN 'yes' ELSE 'no' END AS b
        |  FROM events GROUP BY user_id),
        |cells AS (SELECT a, b, COUNT(*) AS o FROM u GROUP BY 1, 2),
        |dims AS (
        |  SELECT COUNT(DISTINCT a) AS na, COUNT(DISTINCT b) AS nb
        |  FROM cells),
        |m AS (
        |  SELECT a, b, o,
        |    SUM(o) OVER (PARTITION BY a) AS r,
        |    SUM(o) OVER (PARTITION BY b) AS c,
        |    SUM(o) OVER () AS n
        |  FROM cells),
        |sc AS (
        |  SELECT a, b, o, n, r*c*1000 // n AS e_milli,
        |    CASE WHEN r*c*1000 // n > 0 THEN
        |      (o*1000 - r*c*1000 // n) * (o*1000 - r*c*1000 // n)
        |        // (r*c*1000 // n)
        |    ELSE 0 END AS cell
        |  FROM m),
        |tot AS (
        |  SELECT CAST(SUM(cell) AS BIGINT) AS chi2_milli,
        |    CAST((MIN(dims.na) - 1) * (MIN(dims.nb) - 1) AS BIGINT)
        |      AS dof,
        |    CASE WHEN MIN(sc.n)
        |        * (LEAST(MIN(dims.na), MIN(dims.nb)) - 1) > 0 THEN
        |      CAST(SUM(cell) * 1000
        |        // (MIN(sc.n)
        |           * (LEAST(MIN(dims.na), MIN(dims.nb)) - 1)) AS BIGINT)
        |    END AS cramers_v2_ppm
        |  FROM sc CROSS JOIN dims)
        |SELECT a, b, CAST(o AS BIGINT) AS o,
        |  CAST(e_milli AS BIGINT) AS e_milli,
        |  CAST(cell AS BIGINT) AS cell_chi2_milli,
        |  tot.chi2_milli, tot.dof, tot.cramers_v2_ppm
        |FROM sc CROSS JOIN tot ORDER BY a, b""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val u = Tables.load(s, dir, "events")
        .groupBy($"user_id")
        .agg(max(when($"event_type" === "purchase" &&
            round($"value" * 100, 0) >= 15000, 1L).otherwise(0L))
          .as("conv"))
        .select(concat(lit("arm"), pmod($"user_id", lit(2L))).as("arm"),
          when($"conv" === 1L, "yes").otherwise("no").as("converted"))
      graft.ops.EvalOps.chiSquareIndependence(u, "arm", "converted")
        .orderBy($"a", $"b")
    },

    // Kaplan–Meier survival of signup→purchase conversion time,
    // censored at a 7-day horizon: the churn/time-to-event readout.
    // Product-limit survival is a PRODUCT of ratios — computed in
    // LOG space as Σ (lg(n−d) − lg n) over event days with the Q20
    // integer log recurrence, so the whole curve is exact integers
    // (engine-replayable where a float product never would be). The
    // corpus reduces to the per-day (events, censored) histogram; the
    // at-risk walk and the log-sum are windows over that ≤8-row
    // domain. If a day ever exhausts the risk set (n == d, S → 0) the
    // log is undefined: the clamp keeps arithmetic total and the `ok`
    // flag NULLs the curve from that day on (not reachable with a
    // censoring horizon).
    GraftQuery(
      "q214_kaplan_meier",
      s"""WITH e AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
         |s0 AS (
         |  SELECT user_id, MIN(tu) AS sts FROM e
         |  WHERE event_type = 'signup' GROUP BY 1),
         |j AS (
         |  SELECT s0.user_id, MIN(s0.sts) AS sts,
         |    MIN(CASE WHEN p.tu >= s0.sts THEN p.tu END) AS pts
         |  FROM s0 LEFT JOIN (SELECT user_id, tu FROM e
         |                     WHERE event_type = 'purchase') p
         |    ON p.user_id = s0.user_id
         |  GROUP BY 1),
         |dur AS (
         |  SELECT CASE WHEN pts IS NOT NULL
         |        AND pts - sts <= 604800000000
         |      THEN (pts - sts) // 86400000000 ELSE 7 END AS day,
         |    CASE WHEN pts IS NOT NULL AND pts - sts <= 604800000000
         |      THEN 1 ELSE 0 END AS ev
         |  FROM j),
         |hist AS (
         |  SELECT day, CAST(SUM(ev) AS BIGINT) AS d,
         |    CAST(COUNT(*) - SUM(ev) AS BIGINT) AS c
         |  FROM dur GROUP BY 1),
         |h2 AS (
         |  SELECT day, d, c,
         |    CAST(SUM(d + c) OVER ()
         |      - COALESCE(SUM(d + c) OVER (ORDER BY day
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |        0) AS BIGINT) AS n_risk
         |  FROM hist),
         |args AS (
         |  SELECT day, 'a' AS which, GREATEST(n_risk - d, 1) AS v
         |  FROM h2 WHERE d > 0
         |  UNION ALL SELECT day, 'b', n_risk FROM h2 WHERE d > 0),
         |${DuckLog2Q20.ctes("day", "which")},
         |lg AS (SELECT day, which, p * 1048576 + acc AS l FROM l20),
         |piv AS (
         |  SELECT day,
         |    MAX(CASE WHEN which = 'a' THEN l END)
         |      - MAX(CASE WHEN which = 'b' THEN l END) AS dl
         |  FROM lg GROUP BY 1),
         |fin AS (
         |  SELECT h2.day, h2.n_risk, h2.d, h2.c,
         |    SUM(COALESCE(piv.dl, 0)) OVER (ORDER BY h2.day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS logs_raw,
         |    MIN(CASE WHEN h2.d > 0 THEN h2.n_risk - h2.d ELSE 1 END)
         |      OVER (ORDER BY h2.day
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS ok
         |  FROM h2 LEFT JOIN piv USING (day))
         |SELECT CAST(day AS BIGINT) AS day, n_risk, d, c,
         |  CASE WHEN ok >= 1 THEN CAST(logs_raw AS BIGINT) END
         |    AS logs_q20
         |FROM fin ORDER BY day""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val lg = graft.functions.GraftColumns.binLog2Q20 _
      val horizonUs = 7L * 86400000000L
      val e = Tables.load(s, dir, "events")
        .select($"user_id", $"event_type", unix_micros($"ts").as("tu"))
      val signups = e.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"tu").as("sts"))
      val joined = signups
        .join(e.filter($"event_type" === "purchase")
          .select($"user_id", $"tu"), Seq("user_id"), "left")
        .groupBy($"user_id")
        .agg(min($"sts").as("sts"),
          min(when($"tu" >= $"sts", $"tu")).as("pts"))
      val isEvent = $"pts".isNotNull && $"pts" - $"sts" <= horizonUs
      val hist = joined
        .select(
          when(isEvent, div($"pts" - $"sts", lit(86400000000L)))
            .otherwise(7L).as("day"),
          when(isEvent, 1L).otherwise(0L).as("ev"))
        .groupBy($"day")
        .agg(sum($"ev").as("d"), sum(lit(1L) - $"ev").as("c"))
      // bounded-domain contract: the global windows walk the DAY spine
      // (8 rows: days 0-7 + censored bucket), never the corpus
      val wOrd = Window.orderBy($"day")
      val wPrior = wOrd.rowsBetween(Window.unboundedPreceding, -1)
      val wCum = wOrd.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val wAll = Window.partitionBy()
      hist
        .withColumn("n_risk",
          sum($"d" + $"c").over(wAll) -
            coalesce(sum($"d" + $"c").over(wPrior), lit(0L)))
        .withColumn("ok",
          min(when($"d" > 0L, $"n_risk" - $"d").otherwise(1L))
            .over(wCum))
        .withColumn("logs_q20",
          when($"ok" >= 1L,
            sum(when($"d" > 0L,
              lg(greatest($"n_risk" - $"d", lit(1L))) - lg($"n_risk"))
              .otherwise(0L)).over(wCum)))
        .select($"day", $"n_risk", $"d", $"c", $"logs_q20")
        .orderBy($"day")
    },

    // Rolling 7-day distinct actives via MERGEABLE KMV sketches — the
    // bounded-state companion to q184's exact explode: each day keeps
    // a bottom-64 user-hash sketch; a report day's 7-day estimate
    // merges the 7 daily sketches (explode the K-ROW sketches, not the
    // (user, day) pairs — state per day is 64 rows whatever the
    // traffic) and re-takes the bottom 64. Exact below k, ~1/√k
    // relative error above, deterministic integers throughout.
    GraftQuery(
      "q216_rolling_kmv",
      """WITH d AS (
        |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
        |    (ph * ph) % 1000000007 AS h
        |  FROM (
        |    SELECT ts,
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(
        |          string_split(CAST(user_id AS VARCHAR) || ':rk1', ''),
        |          c -> ascii(c))),
        |        (a, x) -> (a*31 + x) % 1000000007) AS ph
        |    FROM events)),
        |rk AS (
        |  SELECT day, h,
        |    row_number() OVER (PARTITION BY day ORDER BY h) AS rk
        |  FROM d),
        |sk AS (SELECT day, h FROM rk WHERE rk <= 64),
        |spine AS (SELECT DISTINCT day FROM sk),
        |ex AS (
        |  SELECT DISTINCT day + u.j AS day, h
        |  FROM sk, UNNEST(generate_series(0, 6)) AS u(j)),
        |vote AS (SELECT ex.day, ex.h FROM ex SEMI JOIN spine USING (day)),
        |mrk AS (
        |  SELECT day, h,
        |    row_number() OVER (PARTITION BY day ORDER BY h) AS rk
        |  FROM vote),
        |m AS (SELECT day, h FROM mrk WHERE rk <= 64)
        |SELECT CAST(day AS BIGINT) AS day, COUNT(*) AS n_kept,
        |  CASE WHEN COUNT(*) < 64 THEN COUNT(*)
        |       ELSE (CAST(63 AS BIGINT) * 1000000007)
        |         // GREATEST(MAX(h), 1) END AS est_active_7d
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ops.SketchOps
      val div = graft.functions.GraftColumns.longDiv _
      val daily = SketchOps.kmvSketch(
        Tables.load(s, dir, "events")
          .select(div(unix_micros($"ts"), lit(86400000000L)).as("day"),
            $"user_id"),
        Seq("day"), "user_id", k = 64, salt = "rk1")
      val spine = daily.select($"day").distinct()
      val voted = daily
        .select($"day", $"__h",
          explode(sequence(lit(0L), lit(6L))).as("j"))
        .select(($"day" + $"j").as("day"), $"__h")
        .distinct()
        .join(spine, Seq("day"), "left_semi")
      val w = Window.partitionBy($"day").orderBy($"__h")
      val merged = voted
        .withColumn("__rk", row_number().over(w))
        .filter($"__rk" <= 64).drop("__rk")
      SketchOps.kmvEstimate(merged, Seq("day"), k = 64)
        .withColumnRenamed("est_distinct", "est_active_7d")
        .orderBy($"day")
    },

    // Rolling 7-day regression slope (trend monitoring) WITHOUT an
    // ordered window: each observed day votes its (x, y) point into
    // the ≤7 report windows it belongs to (the q184/q195 bounded
    // explode), x RE-CENTERED to the window offset 6−j so the
    // sufficient sums stay tiny (slope is shift-invariant); per
    // (type, report day) one map-side-combined q187 reduction. A
    // window-function rolling regression would serialize each series —
    // this shape is embarrassingly parallel at any scale.
    GraftQuery(
      "q227_rolling_ols",
      """WITH r AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    COUNT(*) AS y
        |  FROM events GROUP BY 1, 2),
        |v AS (
        |  SELECT r.event_type, r.day + u.j AS rday, 6 - u.j AS x, r.y
        |  FROM r, UNNEST(generate_series(0, 6)) AS u(j)),
        |s AS (
        |  SELECT v.event_type, v.rday AS day, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
        |    SUM(x*x) AS sxx
        |  FROM v SEMI JOIN r ON r.event_type = v.event_type
        |    AND r.day = v.rday
        |  GROUP BY 1, 2)
        |SELECT event_type, CAST(day AS BIGINT) AS day,
        |  CAST(n AS BIGINT) AS n,
        |  CASE WHEN n*sxx - sx*sx > 0 THEN
        |    CAST((n*sxy - sx*sy)*1000000 // (n*sxx - sx*sx) AS BIGINT)
        |  END AS slope_micro
        |FROM s ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val r = Tables.load(s, dir, "events")
        .select($"event_type",
          div(unix_micros($"ts"), lit(86400000000L)).as("day"))
        .groupBy($"event_type", $"day").agg(count(lit(1)).as("y"))
        .graftCheckpoint() // votes + spine
      val votes = r
        .select($"event_type", $"day", $"y",
          explode(sequence(lit(0L), lit(6L))).as("j"))
        .select($"event_type", ($"day" + $"j").as("day"),
          (lit(6L) - $"j").as("x"), $"y")
        .join(r.select($"event_type", $"day"), Seq("event_type", "day"),
          "left_semi")
      val st = votes.groupBy($"event_type", $"day")
        .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
          sum($"y").as("sy"), sum($"x" * $"y").as("sxy"),
          sum($"x" * $"x").as("sxx"))
      st.select($"event_type", $"day", $"n",
          when($"n" * $"sxx" - $"sx" * $"sx" > 0L,
            div(($"n" * $"sxy" - $"sx" * $"sy") * 1000000L,
              $"n" * $"sxx" - $"sx" * $"sx")).as("slope_micro"))
        .orderBy($"event_type", $"day")
    },

    // Mann-Kendall trend test (the nonparametric significance
    // companion to q188's Theil-Sen slope — the pair ship together in
    // every monitoring stack): S = Σ_{i<j} sign(y_j − y_i) over the
    // period-DOMAIN pair join, plus the tie-corrected variance times
    // 18 (n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) — an exact integer, no /18
    // rounding). |S| large vs √var ⇒ monotone trend.
    GraftQuery(
      "q231_mann_kendall",
      """WITH r AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    COUNT(*) AS y
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT a.event_type,
        |    CAST(SUM(CASE WHEN b.y > a.y THEN 1
        |                  WHEN b.y < a.y THEN -1 ELSE 0 END)
        |      AS BIGINT) AS s
        |  FROM r a JOIN r b ON a.event_type = b.event_type
        |    AND a.day < b.day
        |  GROUP BY 1),
        |ties AS (
        |  SELECT event_type,
        |    CAST(COALESCE(SUM(t*(t-1)*(2*t+5)), 0) AS BIGINT) AS tt
        |  FROM (SELECT event_type, y, COUNT(*) AS t FROM r
        |        GROUP BY 1, 2)
        |  WHERE t > 1 GROUP BY 1),
        |nn AS (SELECT event_type, COUNT(*) AS n FROM r GROUP BY 1)
        |SELECT nn.event_type, CAST(nn.n AS BIGINT) AS n, s.s,
        |  CAST(nn.n*(nn.n-1)*(2*nn.n+5) - COALESCE(ties.tt, 0)
        |    AS BIGINT) AS var18,
        |  CAST(CASE WHEN s.s > 0 THEN 1 WHEN s.s < 0 THEN -1 ELSE 0
        |    END AS BIGINT) AS direction
        |FROM nn JOIN s USING (event_type)
        |LEFT JOIN ties USING (event_type)
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val r = Tables.load(s, dir, "events")
        .select($"event_type",
          div(unix_micros($"ts"), lit(86400000000L)).as("day"))
        .groupBy($"event_type", $"day").agg(count(lit(1)).as("y"))
        .graftCheckpoint() // pair join + tie histogram + n
      val a = r.select($"event_type", $"day".as("da"), $"y".as("ya"))
      val b = r.select($"event_type", $"day".as("db"), $"y".as("yb"))
      val sTab = a.join(b, Seq("event_type"))
        .where($"da" < $"db")
        .groupBy($"event_type")
        .agg(sum(when($"yb" > $"ya", 1L).when($"yb" < $"ya", -1L)
          .otherwise(0L)).as("s"))
      val ties = r.groupBy($"event_type", $"y")
        .agg(count(lit(1)).as("t"))
        .where($"t" > 1L)
        .groupBy($"event_type")
        .agg(sum($"t" * ($"t" - 1L) * ($"t" * 2L + 5L)).as("tt"))
      val nn = r.groupBy($"event_type").agg(count(lit(1)).as("n"))
      nn.join(sTab, Seq("event_type"))
        .join(ties, Seq("event_type"), "left")
        .select($"event_type", $"n", $"s",
          ($"n" * ($"n" - 1L) * ($"n" * 2L + 5L) -
            coalesce($"tt", lit(0L))).as("var18"),
          when($"s" > 0L, 1L).when($"s" < 0L, -1L).otherwise(0L)
            .as("direction"))
        .orderBy($"event_type")
    },

    // Cohort LTV accumulation curve (revenue companion to q160's
    // retention COUNTS): per signup-week cohort, cumulative purchase
    // revenue by week offset and revenue-per-cohort-user — one
    // (user → cohort) reduction, one purchase equi-join, then windows
    // over the cohorts × offsets DOMAIN table.
    GraftQuery(
      "q234_ltv_curve",
      """WITH s AS (
        |  SELECT user_id,
        |    MIN(epoch_us(ts) // 604800000000) AS ws
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |coh AS (SELECT ws, COUNT(*) AS n_users FROM s GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, epoch_us(e.ts) // 604800000000 AS wk,
        |    CAST(round(e.value*100) AS BIGINT) AS vc
        |  FROM events e WHERE e.event_type = 'purchase'),
        |r AS (
        |  SELECT s.ws, p.wk - s.ws AS off, SUM(p.vc) AS rev
        |  FROM p JOIN s ON s.user_id = p.user_id
        |  WHERE p.wk >= s.ws GROUP BY 1, 2),
        |c AS (
        |  SELECT ws, off, rev,
        |    SUM(rev) OVER (PARTITION BY ws ORDER BY off) AS cum_rev
        |  FROM r)
        |SELECT CAST(c.ws AS BIGINT) AS cohort_week,
        |  CAST(c.off AS BIGINT) AS week_offset,
        |  CAST(coh.n_users AS BIGINT) AS n_users,
        |  CAST(c.rev AS BIGINT) AS rev_c,
        |  CAST(c.cum_rev AS BIGINT) AS cum_rev_c,
        |  CAST(c.cum_rev * 1000 // coh.n_users AS BIGINT)
        |    AS ltv_per_user_milli
        |FROM c JOIN coh ON coh.ws = c.ws
        |ORDER BY cohort_week, week_offset""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val e = Tables.load(s, dir, "events")
        .select($"user_id", $"event_type",
          div(unix_micros($"ts"), lit(604800000000L)).as("wk"),
          round($"value" * 100, 0).cast("long").as("vc"))
        .graftCheckpoint() // signup + purchase branches
      val su = e.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"wk").as("ws"))
      val coh = su.groupBy($"ws").agg(count(lit(1)).as("n_users"))
      val r = e.filter($"event_type" === "purchase")
        .select($"user_id", $"wk", $"vc")
        .join(su, Seq("user_id"))
        .where($"wk" >= $"ws")
        .groupBy($"ws", ($"wk" - $"ws").as("off"))
        .agg(sum($"vc").as("rev"))
      val wCum = Window.partitionBy($"ws").orderBy($"off")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      r.withColumn("cum_rev", sum($"rev").over(wCum))
        .join(coh, Seq("ws"))
        .select($"ws".as("cohort_week"), $"off".as("week_offset"),
          $"n_users", $"rev".as("rev_c"), $"cum_rev".as("cum_rev_c"),
          div($"cum_rev" * 1000L, $"n_users").as("ltv_per_user_milli"))
        .orderBy($"cohort_week", $"week_offset")
    },

    // Positional event-pattern matching (MATCH_RECOGNIZE-lite): "a
    // view followed by a purchase within the next 3 EVENTS" per user —
    // by position, not time (the q159 funnel is the time-window form).
    // Positions from one per-user rank window; the pattern is an
    // EQUI-join on (user, pos + offset) with offsets 1..3 exploded
    // (the q170/q174 position-join shape — never an inequality join).
    GraftQuery(
      "q236_event_pattern",
      """WITH p AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS pos
        |  FROM events),
        |m AS (
        |  SELECT a.user_id, a.pos AS view_pos,
        |    b.pos - a.pos AS gap
        |  FROM p a, UNNEST(generate_series(1, 3)) AS u(j)
        |  JOIN p b ON b.user_id = a.user_id AND b.pos = a.pos + u.j
        |  WHERE a.event_type = 'view' AND b.event_type = 'purchase')
        |SELECT user_id, COUNT(*) AS n_patterns,
        |  CAST(MIN(view_pos) AS BIGINT) AS first_view_pos,
        |  CAST(SUM(gap) AS BIGINT) AS gap_sum
        |FROM m GROUP BY 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val wp = Window.partitionBy($"user_id")
        .orderBy($"ts_us", $"event_id")
      val p = Tables.load(s, dir, "events")
        .select($"user_id", $"event_type",
          unix_micros($"ts").as("ts_us"), $"event_id")
        .withColumn("pos", row_number().over(wp).cast("long"))
        .graftCheckpoint() // both pattern sides
      val a = p.where($"event_type" === "view")
        .select($"user_id", $"pos".as("view_pos"),
          explode(sequence(lit(1L), lit(3L))).as("j"))
        .withColumn("bpos", $"view_pos" + $"j")
      val b = p.where($"event_type" === "purchase")
        .select($"user_id", $"pos".as("bpos"))
      a.join(b, Seq("user_id", "bpos"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_patterns"),
          min($"view_pos").as("first_view_pos"),
          sum($"j").as("gap_sum"))
        .orderBy($"user_id")
    },

    // Weekday activity profile (the seasonality fingerprint q208's MI
    // and q196's dow-residuals consume): per (type, day-of-week) the
    // ppm share of that type's weekly activity — one groupBy to the
    // |types|×7 domain plus a per-type window over it.
    GraftQuery(
      "q247_weekday_profile",
      """WITH c AS (
        |  SELECT event_type,
        |    (epoch_us(ts) // 86400000000) % 7 AS dow,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(dow AS BIGINT) AS dow,
        |  CAST(n AS BIGINT) AS n,
        |  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY event_type)
        |    AS BIGINT) AS share_ppm
        |FROM c ORDER BY event_type, dow""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val w = Window.partitionBy($"event_type")
      Tables.load(s, dir, "events")
        .select($"event_type",
          pmod(div(unix_micros($"ts"), lit(86400000000L)), lit(7L))
            .as("dow"))
        .groupBy($"event_type", $"dow").agg(count(lit(1)).as("n"))
        .withColumn("share_ppm",
          div($"n" * 1000000L, sum($"n").over(w)))
        .orderBy($"event_type", $"dow")
    })
}
