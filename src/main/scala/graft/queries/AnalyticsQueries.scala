package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{LayoutOps, SessionOps}

/** Analytics-extension conformance suite: batch sessionization,
  * per-group top-k, CUBE grouping analytics, Z-order clustering keys.
  * Determinism contract per NOTES: total ORDER BY, integer micros /
  * cents, no raw timestamps or doubles in output.
  */
object AnalyticsQueries {

  // Identical SQL text runs on both engines (the q52 pattern): Spark
  // plans GROUPING SETS as one expand+aggregate pass, DuckDB is the
  // oracle. gid disambiguates which set each output row belongs to.
  private val GroupingSetsSql =
    """SELECT lang, source,
      |  CAST(2*GROUPING(lang) + GROUPING(source) AS BIGINT) AS gid,
      |  COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents
      |GROUP BY GROUPING SETS ((lang), (source), ())
      |ORDER BY gid, lang NULLS FIRST, source NULLS FIRST""".stripMargin

  val all: Seq[GraftQuery] = Seq(

    // Explicit GROUPING SETS (the third grouping-analytics face next to
    // ROLLUP q46 and CUBE q57): per-lang totals + per-source totals +
    // grand total in ONE aggregation pass, via the SQL face.
    GraftQuery("q73_grouping_sets", GroupingSetsSql) { (s, dir) =>
      graft.Tables.load(s, dir, "documents")
        .createOrReplaceTempView("documents")
      s.sql(GroupingSetsSql)
    },

    // Batch sessionization (gaps-and-islands; the batch face of the
    // streaming flatMapGroupsWithState sessionizer — equivalence
    // cross-checked in SessionOpsSpec). 4-hour inactivity gap.
    GraftQuery(
      "q55_sessionize",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(round(value*100) AS BIGINT) AS value_c
        |  FROM events),
        |x AS (
        |  SELECT *, lag(ts_us) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id) AS prev_ts
        |  FROM e),
        |y AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |      OR ts_us - prev_ts > 14400000000 THEN 1 ELSE 0 END AS brk
        |  FROM x),
        |z AS (
        |  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id) AS BIGINT) AS session_idx
        |  FROM y)
        |SELECT user_id, session_idx,
        |  MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
        |  COUNT(*) AS n_events, CAST(SUM(value_c) AS BIGINT) AS value_c
        |FROM z GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
          $"value")
      SessionOps.sessionize(
          e, "user_id", "ts_us", gapUs = 4L * 3600 * 1000000,
          tieCol = "event_id", valueCol = "value")
        .orderBy($"user_id", $"session_idx")
    },

    // Exact per-group top-k (top 3 users per event type by activity):
    // two-level aggregate first (map-side combine collapses the event
    // stream to |type × user| rows), THEN a window rank over the small
    // aggregated stream — never a global sort of raw events.
    GraftQuery(
      "q56_topk_per_group",
      """WITH c AS (
        |  SELECT event_type, user_id, COUNT(*) AS n,
        |    CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY n DESC, user_id) AS rk
        |  FROM c)
        |SELECT event_type, user_id, n, value_c, rk
        |FROM r WHERE rk <= 3
        |ORDER BY event_type, rk""".stripMargin) { (s, dir) =>
      import s.implicits._
      val counts = Tables.load(s, dir, "events")
        .groupBy($"event_type", $"user_id")
        .agg(count(lit(1)).as("n"),
          sum(round($"value" * 100, 0).cast("long")).as("value_c"))
      val w = Window.partitionBy($"event_type")
        .orderBy($"n".desc, $"user_id".asc)
      counts
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= 3)
        .orderBy($"event_type", $"rk")
    },

    // CUBE over (event_type, hour-of-day): all four grouping layers in
    // one pass (Catalyst expands to a single shuffle with a grouping-id
    // column — not four scans). grouping_id() disambiguates real NULLs
    // from subtotal rows; hour derives from integer micros so both
    // engines bucket identically.
    GraftQuery(
      "q57_cube",
      """WITH e AS (
        |  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hr,
        |    CAST(round(value*100) AS BIGINT) AS value_c
        |  FROM events)
        |SELECT event_type, hr,
        |  CAST(GROUPING(event_type, hr) AS BIGINT) AS gid,
        |  COUNT(*) AS n, CAST(SUM(value_c) AS BIGINT) AS value_c
        |FROM e GROUP BY CUBE (event_type, hr)
        |ORDER BY gid, event_type NULLS FIRST, hr NULLS FIRST""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .select($"event_type",
          // `div` = integer division (Spark's `/` on longs is double)
          expr("(unix_micros(ts) div 3600000000) % 24").as("hr"),
          round($"value" * 100, 0).cast("long").as("value_c"))
        .cube($"event_type", $"hr")
        .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n"),
          sum($"value_c").as("value_c"))
        .orderBy($"gid", $"event_type".asc_nulls_first,
          $"hr".asc_nulls_first)
    },

    // Z-order (Morton) clustering key over (part, supplier): the
    // multi-dim layout primitive, oracle-checked bit-for-bit. The
    // rollup groups by z-prefix (top-level quadrants of the curve) to
    // keep output bounded at any SF while hashing every row's key.
    GraftQuery(
      "q58_zorder",
      """WITH z AS (
        |  SELECT CAST(list_sum(list_transform(generate_series(0, 20), i ->
        |      (((l_partkey >> i) & 1) << (2*i)) +
        |      (((l_suppkey >> i) & 1) << (2*i + 1)))) AS BIGINT) AS zval
        |  FROM lineitem)
        |SELECT zval >> 18 AS z_quadrant,
        |  COUNT(*) AS n,
        |  CAST(SUM(zval % 1000003) AS BIGINT) AS z_check,
        |  MIN(zval) AS z_min, MAX(zval) AS z_max
        |FROM z GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .select(LayoutOps.zValue($"l_partkey", $"l_suppkey", 21).as("zval"))
        .groupBy(shiftright($"zval", 18).as("z_quadrant"))
        .agg(count(lit(1)).as("n"),
          sum($"zval" % 1000003L).as("z_check"),
          min($"zval").as("z_min"), max($"zval").as("z_max"))
        .orderBy($"z_quadrant")
    },

    // Time-series gap filling with forward fill (the imputation
    // classic): per-user daily rollup, a dense user × day spine from
    // the data's global day range, then last-non-null carried forward.
    // Spine generation is a broadcast of ONE bounds row; the fill is a
    // running window per user — no self-joins, no per-day scans.
    GraftQuery(
      "q74_forward_fill",
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(round(value*100) AS BIGINT) AS value_c
        |  FROM events),
        |daily AS (
        |  SELECT user_id, day, CAST(SUM(value_c) AS BIGINT) AS value_c
        |  FROM e GROUP BY 1, 2),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |spine AS (
        |  SELECT u.user_id, d.day
        |  FROM (SELECT DISTINCT user_id FROM e) u
        |  CROSS JOIN (SELECT unnest(generate_series(d0, d1)) AS day
        |              FROM b) d),
        |j AS (
        |  SELECT s.user_id, s.day, daily.value_c
        |  FROM spine s LEFT JOIN daily
        |    ON s.user_id = daily.user_id AND s.day = daily.day)
        |SELECT user_id, day,
        |  COALESCE(last_value(value_c IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
        |    AS filled
        |FROM j ORDER BY user_id, day""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .select($"user_id",
          expr("unix_micros(ts) div 86400000000").as("day"),
          round($"value" * 100, 0).cast("long").as("value_c"))
      val daily = e.groupBy($"user_id", $"day")
        .agg(sum($"value_c").as("value_c"))
      val bounds = e.agg(min($"day").as("d0"), max($"day").as("d1"))
      val spine = e.select($"user_id").distinct()
        .crossJoin(broadcast(bounds))
        .select($"user_id", explode(sequence($"d0", $"d1")).as("day"))
      val w = Window.partitionBy($"user_id").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left_outer")
        .select($"user_id", $"day",
          coalesce(last($"value_c", ignoreNulls = true).over(w), lit(0L))
            .as("filled"))
        .orderBy($"user_id", $"day")
    },

    // FULL OUTER join (reconciliation shape): per-nation high-balance
    // customer counts vs high-balance supplier counts — thresholds
    // chosen so BOTH sides have exclusive keys, exercising both
    // null-extension branches.
    GraftQuery(
      "q75_full_outer",
      """WITH c AS (
        |  SELECT c_nationkey AS k, COUNT(*) AS n_cust
        |  FROM customer WHERE c_acctbal > 9950 GROUP BY 1),
        |s AS (
        |  SELECT s_nationkey AS k, COUNT(*) AS n_supp
        |  FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
        |SELECT COALESCE(c.k, s.k) AS nationkey,
        |  CAST(COALESCE(c.n_cust, 0) AS BIGINT) AS n_cust,
        |  CAST(COALESCE(s.n_supp, 0) AS BIGINT) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.k = s.k
        |ORDER BY nationkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val c = Tables.load(s, dir, "customer")
        .filter($"c_acctbal" > 9950)
        .groupBy($"c_nationkey".as("ck"))
        .agg(count(lit(1)).as("n_cust"))
      val su = Tables.load(s, dir, "supplier")
        .filter($"s_acctbal" > 9000)
        .groupBy($"s_nationkey".as("sk"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(su, $"ck" === $"sk", "full_outer")
        .select(coalesce($"ck", $"sk").as("nationkey"),
          coalesce($"n_cust", lit(0L)).as("n_cust"),
          coalesce($"n_supp", lit(0L)).as("n_supp"))
        .orderBy($"nationkey")
    },

    // Skew-salted two-phase collect_list (SkewOps.saltedCollectList):
    // `lang` has ~5 values over the whole corpus — the canonical hot
    // aggregation key where partial-agg can't shrink a non-algebraic
    // aggregate's shuffle. The salted plan must equal the plain
    // groupBy row-for-row; the oracle IS the plain groupBy.
    GraftQuery(
      "q66_salted_agg",
      """SELECT lang,
        |  array_to_string(list_sort(list(doc_id)), ',') AS doc_ids,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      graft.ops.SkewOps.saltedCollectList(
          Tables.load(s, dir, "documents").select($"lang", $"doc_id"),
          "lang", "doc_id", nSalts = 8)
        .select($"lang",
          array_join(transform($"doc_ids", _.cast("string")), ",")
            .as("doc_ids"),
          size($"doc_ids").cast("long").as("n"))
        .orderBy($"lang")
    },

    // Skew-salted equi-join (SkewOps.saltedEquiJoin): l_returnflag has
    // 3 values, so a plain shuffle join puts ~1/3 of the fact table on
    // one task; the salted plan spreads each hot key over 16 partitions
    // deterministically and must reproduce the plain join exactly.
    GraftQuery(
      "q67_salted_join",
      """WITH d AS (
        |  SELECT l_returnflag, COUNT(*) AS flag_rows
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag,
        |  CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(MAX(d.flag_rows) AS BIGINT) AS flag_rows
        |FROM lineitem l JOIN d USING (l_returnflag)
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
        .select($"l_returnflag", $"l_quantity".cast("long").as("l_quantity"))
      val dim = li.groupBy($"l_returnflag")
        .agg(count(lit(1)).as("flag_rows"))
      graft.ops.SkewOps.saltedEquiJoin(li, dim, Seq("l_returnflag"), 16)
        .groupBy($"l_returnflag")
        .agg(sum($"l_quantity").as("sum_qty"),
          max($"flag_rows").as("flag_rows"))
        .orderBy($"l_returnflag")
    })
}
