package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Checkpointer._
import graft.ops.{IdOps, LayoutOps, SessionOps}

/** Analytics-extension conformance suite: batch sessionization,
  * per-group top-k, CUBE grouping analytics, Z-order clustering keys.
  * Determinism contract per NOTES: total ORDER BY, integer micros /
  * cents, no raw timestamps or doubles in output.
  */
object AnalyticsQueries {

  // polyHash of an ASCII string — DuckDB replica of the native fold
  // (kept in lockstep with TextOps.polyHash; same helper as
  // CurationQueries').
  private[queries] def duckPolyHash(expr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split($expr, ''), c -> ascii(c))),
       |   (a,x) -> (a*31+x)%1000000007)""".stripMargin

  /** Benford first-digit probabilities, floored ppm:
    * ⌊log10(1 + 1/d)·1e6⌋ for d = 1..9 — fixed public constants,
    * consumed as identical literals by both engines (q185 pattern).
    */
  val BenfordPpm: Array[Long] = Array(
    301029L, 176091L, 124938L, 96910L, 79181L,
    66946L, 57991L, 51152L, 45757L)

  /** RBO@50 per-member suffix weights, p = 0.9 (Webber et al. 2010):
    * w_d = (1−p)·p^(d−1) in ppm via the integer recurrence
    * w₁ = 100000, w_{d+1} = w_d·9 div 10; c_d = w_d·1000 div d; and
    * S_m = Σ_{d=m..50} c_d. A doc ranked a in list A and b in list B
    * is inside both depth-d prefixes iff max(a,b) ≤ d, so its total
    * contribution to Σ_d w_d·|A_d∩B_d|/d is exactly S_max(a,b) —
    * turning truncated RBO into ONE table lookup per joint doc.
    */
  val RboSuffixMilli: Array[Long] = {
    val w = Iterator.iterate(100000L)(x => x * 9 / 10).take(50).toArray
    val c = Array.tabulate(50)(i => w(i) * 1000 / (i + 1))
    val s = new Array[Long](50)
    var acc = 0L
    for (i <- 49 to 0 by -1) { acc += c(i); s(i) = acc }
    s
  }

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

  /** Per-run scratch dir for sink round-trip queries, deleted on JVM
    * exit: a fixed path raced concurrent Verify/Bench runs
    * mid-overwrite, but bare createTempDirectory leaked a full table
    * copy into /tmp per run — the shutdown hook walks and removes it.
    */
  private def scratchDir(prefix: String): String =
    GraftQuery.scratchDir(prefix)

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
    },

    // Unpivot / melt (wide → long): the inverse of q49's pivot. Spark
    // plans `unpivot` as a single Expand (one pass over the fact table,
    // no union of N scans) — the oracle spells the same relation as the
    // portable UNION ALL form. Money stays integer cents per the
    // determinism contract.
    GraftQuery(
      "q79_unpivot",
      """WITH m AS (
        |  SELECT l_returnflag, 'quantity' AS metric,
        |    CAST(round(l_quantity*100) AS BIGINT) AS cents FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'extendedprice',
        |    CAST(round(l_extendedprice*100) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'discount',
        |    CAST(round(l_discount*100) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'tax',
        |    CAST(round(l_tax*100) AS BIGINT) FROM lineitem)
        |SELECT l_returnflag, metric, CAST(SUM(cents) AS BIGINT) AS total_c,
        |  COUNT(*) AS n
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .select($"l_returnflag",
          round($"l_quantity" * 100, 0).cast("long").as("quantity"),
          round($"l_extendedprice" * 100, 0).cast("long")
            .as("extendedprice"),
          round($"l_discount" * 100, 0).cast("long").as("discount"),
          round($"l_tax" * 100, 0).cast("long").as("tax"))
        .unpivot(
          Array($"l_returnflag"),
          Array($"quantity", $"extendedprice", $"discount", $"tax"),
          "metric", "cents")
        .groupBy($"l_returnflag", $"metric")
        .agg(sum($"cents").as("total_c"), count(lit(1)).as("n"))
        .orderBy($"l_returnflag", $"metric")
    },

    // Window-function conformance sweep: ntile / percent_rank /
    // cume_dist / lead / frame-bounded first+last over each customer's
    // order history. One window partitioning serves every function (a
    // single sort+shuffle in the plan). Rank fractions travel as
    // round(1e6×) BIGINT — partition sizes here (~10 orders/customer)
    // can't land a ×1e6 fraction on an exact .5, so both engines round
    // identically.
    GraftQuery(
      "q80_window_suite",
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS price_c,
        |    epoch_us(o_orderdate) AS od_us
        |  FROM orders),
        |w AS (
        |  SELECT o_custkey, o_orderkey, price_c,
        |    row_number()   OVER win AS rn,
        |    ntile(4)       OVER win AS quartile,
        |    CAST(round(percent_rank() OVER win * 1000000) AS BIGINT)
        |      AS pct_rank_ppm,
        |    CAST(round(cume_dist()    OVER win * 1000000) AS BIGINT)
        |      AS cume_ppm,
        |    lead(price_c)  OVER win AS next_price_c,
        |    first_value(price_c) OVER (win ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND UNBOUNDED FOLLOWING) AS first_c,
        |    last_value(price_c)  OVER (win ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND UNBOUNDED FOLLOWING) AS last_c
        |  FROM o
        |  WINDOW win AS (PARTITION BY o_custkey ORDER BY od_us, o_orderkey))
        |SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, price_c,
        |  CAST(quartile AS BIGINT) AS quartile, pct_rank_ppm, cume_ppm,
        |  next_price_c, first_c, last_c
        |FROM w WHERE o_custkey % 50 = 0
        |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      import s.implicits._
      val win = Window.partitionBy($"o_custkey")
        .orderBy($"od_us".asc, $"o_orderkey".asc)
      val full = win.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          round($"o_totalprice" * 100, 0).cast("long").as("price_c"),
          // o_orderdate is TIMESTAMP_NTZ in parquet; the UTC session tz
          // makes the cast to TIMESTAMP a no-op shift, matching epoch_us.
          unix_micros($"o_orderdate".cast("timestamp")).as("od_us"))
        .select($"o_custkey",
          row_number().over(win).cast("long").as("rn"),
          $"o_orderkey", $"price_c",
          ntile(4).over(win).cast("long").as("quartile"),
          round(percent_rank().over(win) * 1000000, 0).cast("long")
            .as("pct_rank_ppm"),
          round(cume_dist().over(win) * 1000000, 0).cast("long")
            .as("cume_ppm"),
          lead($"price_c", 1).over(win).as("next_price_c"),
          first_value($"price_c").over(full).as("first_c"),
          last_value($"price_c").over(full).as("last_c"))
        .filter($"o_custkey" % 50 === 0)
        .orderBy($"o_custkey", $"rn")
    },

    // Deterministic bottom-k quantile SKETCH (SketchOps.quantileSketch):
    // a 256-row uniform sample by mixed portable key hash — the q111
    // count-min trick applied to quantiles: unlike percentile_approx's
    // engine-specific KLL, the sample (and hence every estimate, down
    // to the integer rank policy) is bit-replayable in DuckDB, while
    // keeping the sketch property that matters at 100 TB: fixed k-row
    // size, TakeOrderedAndProject build, algebraic shard merge
    // (spec-checked in SketchOpsSpec).
    GraftQuery(
      "q140_quantile_sketch",
      """WITH pri AS (
        |  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
        |    (h * h) % 1000000007 AS pri
        |  FROM (
        |    SELECT o_totalprice,
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(
        |          string_split(CAST(o_orderkey AS VARCHAR) || ':qs1', ''),
        |          c -> ascii(c))),
        |        (a, x) -> (a*31 + x) % 1000000007) AS h
        |    FROM orders)),
        |samp AS (SELECT cents FROM pri ORDER BY pri, cents LIMIT 256),
        |sorted AS (
        |  SELECT cents, row_number() OVER (ORDER BY cents) - 1 AS rk
        |  FROM samp),
        |nn AS (SELECT COUNT(*) AS n FROM samp),
        |qs AS (SELECT CAST(unnest([10000, 250000, 500000, 750000,
        |  990000]) AS BIGINT) AS q_ppm)
        |SELECT qs.q_ppm, s.cents AS est
        |FROM qs CROSS JOIN nn
        |JOIN sorted s ON s.rk = ((nn.n - 1) * qs.q_ppm) // 1000000
        |ORDER BY q_ppm""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ops.SketchOps
      val vals = Tables.load(s, dir, "orders")
        .select($"o_orderkey", floor($"o_totalprice" * 100).as("cents"))
      val sk = SketchOps.quantileSketch(
        vals, "o_orderkey", "cents", k = 256, salt = "qs1")
      SketchOps.quantileEstimates(sk, "cents",
          Seq(10000L, 250000L, 500000L, 750000L, 990000L))
        .orderBy($"q_ppm")
    },

    // Equi-depth range-partition planning (the q140 sketch put to its
    // production use): split points from the deterministic quantile
    // sketch, then every row assigned bucket = #boundaries strictly
    // below its value — the exact computation that plans range
    // partitions / sort-merge split points at 100 TB without a global
    // sort. The per-bucket rollup proves near-equal depth; boundaries
    // enter the plan as ONE broadcast 1-row sorted array.
    GraftQuery(
      "q171_equidepth_buckets",
      """WITH pri AS (
        |  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
        |    (h * h) % 1000000007 AS pri
        |  FROM (
        |    SELECT o_totalprice,
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(
        |          string_split(CAST(o_orderkey AS VARCHAR) || ':qs1', ''),
        |          c -> ascii(c))),
        |        (a, x) -> (a*31 + x) % 1000000007) AS h
        |    FROM orders)),
        |samp AS (SELECT cents FROM pri ORDER BY pri, cents LIMIT 256),
        |sorted AS (
        |  SELECT cents, row_number() OVER (ORDER BY cents) - 1 AS rk
        |  FROM samp),
        |nn AS (SELECT COUNT(*) AS n FROM samp),
        |qs AS (SELECT CAST(unnest([250000, 500000, 750000]) AS BIGINT)
        |  AS q_ppm),
        |bs AS (
        |  SELECT list(est ORDER BY est) AS bs FROM (
        |    SELECT s.cents AS est
        |    FROM qs CROSS JOIN nn
        |    JOIN sorted s ON s.rk = ((nn.n - 1) * qs.q_ppm) // 1000000)),
        |vals AS (
        |  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT CAST(len(list_filter(bs.bs, b -> b < cents)) AS BIGINT)
        |    AS bucket,
        |  COUNT(*) AS n, MIN(cents) AS min_c, MAX(cents) AS max_c
        |FROM vals CROSS JOIN bs
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ops.SketchOps
      val vals = Tables.load(s, dir, "orders")
        .select($"o_orderkey", floor($"o_totalprice" * 100).as("cents"))
      val sk = SketchOps.quantileSketch(
        vals, "o_orderkey", "cents", k = 256, salt = "qs1")
      val bounds = SketchOps.quantileEstimates(sk, "cents",
          Seq(250000L, 500000L, 750000L))
        .agg(sort_array(collect_list($"est")).as("__bs"))
      vals.crossJoin(broadcast(bounds))
        .select($"cents",
          size(filter($"__bs", b => b < $"cents")).cast("long")
            .as("bucket"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"), min($"cents").as("min_c"),
          max($"cents").as("max_c"))
        .orderBy($"bucket")
    },

    // Join-cardinality estimation (SketchOps.kmvJoinCardinality): the
    // optimizer statistic — estimate |views ⋈ purchases on user| from
    // a merged bottom-64 KMV key sample with per-key multiplicity
    // products, NEVER running the join; gate carries the estimate AND
    // the exact size so the error itself is hash-checked.
    GraftQuery(
      "q172_join_cardinality",
      """WITH va AS (SELECT user_id FROM events WHERE event_type='view'),
        |pb AS (SELECT user_id FROM events WHERE event_type='purchase'),
        |ha AS (
        |  SELECT DISTINCT (h*h) % 1000000007 AS h FROM (
        |    SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(
        |        string_split(CAST(user_id AS VARCHAR) || ':jc1', ''),
        |        c -> ascii(c))),
        |      (a, x) -> (a*31 + x) % 1000000007) AS h
        |    FROM va)),
        |hb AS (
        |  SELECT DISTINCT (h*h) % 1000000007 AS h FROM (
        |    SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(
        |        string_split(CAST(user_id AS VARCHAR) || ':jc1', ''),
        |        c -> ascii(c))),
        |      (a, x) -> (a*31 + x) % 1000000007) AS h
        |    FROM pb)),
        |u AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
        |      ORDER BY h LIMIT 64),
        |ca AS (
        |  SELECT (h*h) % 1000000007 AS h, COUNT(*) AS c FROM (
        |    SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(
        |        string_split(CAST(user_id AS VARCHAR) || ':jc1', ''),
        |        c -> ascii(c))),
        |      (a, x) -> (a*31 + x) % 1000000007) AS h
        |    FROM va) GROUP BY 1),
        |cb AS (
        |  SELECT (h*h) % 1000000007 AS h, COUNT(*) AS c FROM (
        |    SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(
        |        string_split(CAST(user_id AS VARCHAR) || ':jc1', ''),
        |        c -> ascii(c))),
        |      (a, x) -> (a*31 + x) % 1000000007) AS h
        |    FROM pb) GROUP BY 1),
        |est AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
        |    MAX(u.h) AS kth,
        |    CAST(COALESCE(SUM(COALESCE(ca.c, 0) * COALESCE(cb.c, 0)), 0)
        |      AS BIGINT) AS sum_prod_sampled
        |  FROM u LEFT JOIN ca ON ca.h = u.h LEFT JOIN cb ON cb.h = u.h),
        |scaled AS (
        |  SELECT n_kept,
        |    CASE WHEN n_kept < 64 THEN n_kept
        |      ELSE (CAST(63 AS BIGINT) * 1000000007) // GREATEST(kth, 1) END
        |      AS est_union,
        |    sum_prod_sampled
        |  FROM est),
        |exact AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS exact_join
        |  FROM va JOIN pb ON va.user_id = pb.user_id)
        |SELECT n_kept, est_union, sum_prod_sampled,
        |  (sum_prod_sampled * est_union) // GREATEST(n_kept, 1)
        |    AS est_join,
        |  exact_join
        |FROM scaled CROSS JOIN exact""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ops.SketchOps
      val e = Tables.load(s, dir, "events")
      val views = e.filter($"event_type" === "view")
      val purchases = e.filter($"event_type" === "purchase")
      val est = SketchOps.kmvJoinCardinality(
        views, "user_id", purchases, "user_id", k = 64, salt = "jc1")
      val exact = views.select($"user_id")
        .join(purchases.select($"user_id"), Seq("user_id"))
        .agg(count(lit(1)).as("exact_join"))
      est.crossJoin(broadcast(exact))
    },

    // Per-group quantile sketch (SketchOps.quantileSketchGrouped):
    // q140's deterministic bottom-k hash sample WITHIN each group —
    // doc-length p25/p50/p75/p95 per language at a fixed 128-row cost
    // per group. The build is the two-level window shape (no task
    // sorts a hot group's full row set), the merge is exact per group,
    // and the nearest-rank-lower estimates are integer arithmetic on
    // portable hashes → bit-replayable in DuckDB. Spec-checked in
    // SketchOpsSpec (merge ≡ whole, invariance, rank accuracy,
    // exact-below-k).
    GraftQuery(
      "q146_grouped_quantiles",
      """WITH pri AS (
        |  SELECT lang, n_chars, (h * h) % 1000000007 AS pri
        |  FROM (
        |    SELECT lang, n_chars,
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(
        |          string_split(CAST(doc_id AS VARCHAR) || ':qg1', ''),
        |          c -> ascii(c))),
        |        (a, x) -> (a*31 + x) % 1000000007) AS h
        |    FROM documents)),
        |samp AS (
        |  SELECT lang, n_chars FROM (
        |    SELECT lang, n_chars,
        |      row_number() OVER (PARTITION BY lang ORDER BY pri, n_chars)
        |        AS rk
        |    FROM pri) WHERE rk <= 128),
        |sorted AS (
        |  SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) - 1
        |      AS rk
        |  FROM samp),
        |nn AS (SELECT lang, COUNT(*) AS n FROM samp GROUP BY 1),
        |qs AS (SELECT CAST(unnest([250000, 500000, 750000, 950000])
        |  AS BIGINT) AS q_ppm)
        |SELECT s.lang, qs.q_ppm, s.n_chars AS est
        |FROM nn CROSS JOIN qs
        |JOIN sorted s ON s.lang = nn.lang
        |  AND s.rk = ((nn.n - 1) * qs.q_ppm) // 1000000
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ops.SketchOps
      val docs = Tables.load(s, dir, "documents")
        .select($"lang", $"doc_id", $"n_chars")
      val sk = SketchOps.quantileSketchGrouped(
        docs, Seq("lang"), "doc_id", "n_chars", k = 128, salt = "qg1")
      SketchOps.quantileEstimatesGrouped(sk, Seq("lang"), "n_chars",
          Seq(250000L, 500000L, 750000L, 950000L))
        .orderBy($"lang", $"q_ppm")
    },

    // KMV (k-minimum-values) distinct-count sketch per group
    // (SketchOps.kmvSketch): the k smallest distinct key hashes per
    // group — the cardinality member of the deterministic-sketch family
    // (q111 frequencies, q140 ranks). Unlike approx_count_distinct's
    // HLL++ registers (engine-specific, spec-only) the kept hashes are
    // pure arithmetic on the keys, so the (k−1)·M div h_k estimate is
    // bit-replayable in DuckDB. Fixed ≤k rows per group, exact
    // algebraic shard merge, two-level bottom-k build (no task ever
    // sorts a hot group's full distinct set) — spec-checked in
    // SketchOpsSpec.
    GraftQuery(
      "q143_kmv_distinct",
      """WITH h AS (
        |  SELECT DISTINCT o_orderpriority, (ph * ph) % 1000000007 AS h
        |  FROM (
        |    SELECT o_orderpriority,
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(
        |          string_split(CAST(o_custkey AS VARCHAR) || ':kmv1', ''),
        |          c -> ascii(c))),
        |        (a, x) -> (a*31 + x) % 1000000007) AS ph
        |    FROM orders)),
        |rk AS (
        |  SELECT o_orderpriority, h,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY h)
        |      AS rk
        |  FROM h),
        |sk AS (SELECT o_orderpriority, h FROM rk WHERE rk <= 128)
        |SELECT o_orderpriority, COUNT(*) AS n_kept,
        |  CASE WHEN COUNT(*) < 128 THEN COUNT(*)
        |       ELSE (CAST(127 AS BIGINT) * 1000000007)
        |         // GREATEST(MAX(h), 1) END
        |    AS est_distinct
        |FROM sk GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ops.SketchOps
      val orders = Tables.load(s, dir, "orders")
        .select($"o_orderpriority", $"o_custkey")
      val sk = SketchOps.kmvSketch(
        orders, Seq("o_orderpriority"), "o_custkey", k = 128,
        salt = "kmv1")
      SketchOps.kmvEstimate(sk, Seq("o_orderpriority"), k = 128)
        .orderBy($"o_orderpriority")
    },

    // KMV set operations (SketchOps.kmvSetEstimate): union /
    // intersection / Jaccard estimates between two corpora from their
    // bottom-k sketches alone — the theta-sketch read path. Here: how
    // much do the urgent and high-priority customer SETS overlap, per
    // order status? At 100 TB this prices corpus overlap
    // (contamination, coverage) at a fixed k-row cost per group with no
    // key-level join of the corpora (doc-level removal stays q62's
    // semi-join). The merged bottom-k is a uniform distinct-key sample
    // of the union whose members are checkable against each side's
    // sketch, so the shared fraction estimates Jaccard; everything is
    // integer arithmetic on portable hashes → bit-replayable in DuckDB
    // (exact below k; the small P status exercises that path).
    GraftQuery(
      "q144_kmv_set_ops",
      """WITH src AS (
        |  SELECT o_orderstatus, o_orderpriority,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(
        |        string_split(CAST(o_custkey AS VARCHAR) || ':kmv2', ''),
        |        c -> ascii(c))),
        |      (a, x) -> (a*31 + x) % 1000000007) AS ph
        |  FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
        |ha AS (
        |  SELECT DISTINCT o_orderstatus, (ph * ph) % 1000000007 AS h
        |  FROM src WHERE o_orderpriority = '1-URGENT'),
        |hb AS (
        |  SELECT DISTINCT o_orderstatus, (ph * ph) % 1000000007 AS h
        |  FROM src WHERE o_orderpriority = '2-HIGH'),
        |ska AS (SELECT o_orderstatus, h FROM (
        |  SELECT o_orderstatus, h,
        |    row_number() OVER (PARTITION BY o_orderstatus ORDER BY h) rk
        |  FROM ha) WHERE rk <= 128),
        |skb AS (SELECT o_orderstatus, h FROM (
        |  SELECT o_orderstatus, h,
        |    row_number() OVER (PARTITION BY o_orderstatus ORDER BY h) rk
        |  FROM hb) WHERE rk <= 128),
        |u AS (SELECT o_orderstatus, h FROM (
        |  SELECT o_orderstatus, h,
        |    row_number() OVER (PARTITION BY o_orderstatus ORDER BY h) rk
        |  FROM (SELECT o_orderstatus, h FROM ska
        |        UNION SELECT o_orderstatus, h FROM skb))
        |  WHERE rk <= 128),
        |agg AS (
        |  SELECT u.o_orderstatus, COUNT(*) AS n_kept,
        |    CAST(SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |    CAST(SUM(CASE WHEN a.h IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b,
        |    MAX(u.h) AS kth
        |  FROM u
        |  LEFT JOIN ska a
        |    ON a.o_orderstatus = u.o_orderstatus AND a.h = u.h
        |  LEFT JOIN skb b
        |    ON b.o_orderstatus = u.o_orderstatus AND b.h = u.h
        |  GROUP BY 1),
        |est AS (
        |  SELECT o_orderstatus, n_kept, n_shared, n_a, n_b,
        |    CASE WHEN n_kept < 128 THEN n_kept
        |         ELSE (CAST(127 AS BIGINT) * 1000000007)
        |           // GREATEST(kth, 1) END AS est_union
        |  FROM agg)
        |SELECT o_orderstatus, n_kept, n_shared, est_union,
        |  (n_shared * est_union) // n_kept AS est_intersection,
        |  (n_shared * 1000000) // n_kept AS jaccard_ppm,
        |  CASE WHEN n_a > 0 THEN (n_shared * 1000000) // n_a
        |       ELSE 0 END AS containment_a_ppm,
        |  CASE WHEN n_b > 0 THEN (n_shared * 1000000) // n_b
        |       ELSE 0 END AS containment_b_ppm
        |FROM est ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ops.SketchOps
      val orders = Tables.load(s, dir, "orders")
        .select($"o_orderstatus", $"o_orderpriority", $"o_custkey")
      def sketch(prio: String) = SketchOps.kmvSketch(
        orders.filter($"o_orderpriority" === prio),
        Seq("o_orderstatus"), "o_custkey", k = 128, salt = "kmv2")
      SketchOps.kmvSetEstimate(
          sketch("1-URGENT"), sketch("2-HIGH"),
          Seq("o_orderstatus"), k = 128)
        .orderBy($"o_orderstatus")
    },

    // Misra–Gries heavy hitters (SketchOps.mgSketch): top-k tokens per
    // language with counts reduced by the (k+1)-th largest count — the
    // offline canonical MG summary. Unlike q76's exact global top-k,
    // this is the bounded-memory MERGEABLE form (Agarwal et al. 2012):
    // shards/days summarize to ≤ k rows per group and fold by
    // counter-sum + re-threshold with the n/(k+1) error bound intact —
    // the per-group vocabulary readout that stays fixed-size at 100 TB.
    // No hashing anywhere: the summary is a pure function of exact
    // counts under (count desc, token asc), so DuckDB replays it
    // bit-for-bit with plain window SQL. Two-level ranking build (no
    // task sorts a group's full vocabulary) — spec-checked in
    // SketchOpsSpec.
    GraftQuery(
      "q145_heavy_hitters",
      """WITH tok AS (
        |  SELECT lang, unnest(string_split_regex(text, '\s+')) AS token
        |  FROM documents),
        |cnt AS (
        |  SELECT lang, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
        |rk AS (
        |  SELECT lang, token, c,
        |    row_number() OVER (PARTITION BY lang ORDER BY c DESC, token)
        |      AS rk
        |  FROM cnt),
        |t AS (
        |  SELECT lang,
        |    COALESCE(MAX(CASE WHEN rk = 33 THEN c END),
        |             CAST(0 AS BIGINT)) AS t
        |  FROM rk WHERE rk <= 33 GROUP BY 1)
        |SELECT rk.lang, token, c - t AS cnt_lb
        |FROM rk JOIN t ON rk.lang = t.lang
        |WHERE rk <= 32 AND c - t > 0
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ops.{SketchOps, TextOps}
      val toks = Tables.load(s, dir, "documents")
        .select($"lang", explode(TextOps.tokenize($"text")).as("token"))
      SketchOps.mgSketch(toks, Seq("lang"), "token", k = 32)
        .orderBy($"lang", $"token")
    },

    // Exact interpolated quantiles (percentile_cont): quartiles of the
    // price distribution per return flag. Both engines use the same
    // a + (b−a)·frac linear interpolation; over integer cents at
    // quarter fractions the result ×4 is an exact integer in IEEE
    // double, so it travels as BIGINT with no rounding at all.
    GraftQuery(
      "q81_quantiles",
      """WITH c AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS cents
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  CAST(percentile_cont(0.25) WITHIN GROUP (ORDER BY cents) * 4
        |    AS BIGINT) AS p25_qc,
        |  CAST(percentile_cont(0.5)  WITHIN GROUP (ORDER BY cents) * 4
        |    AS BIGINT) AS p50_qc,
        |  CAST(percentile_cont(0.75) WITHIN GROUP (ORDER BY cents) * 4
        |    AS BIGINT) AS p75_qc,
        |  COUNT(*) AS n
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .select($"l_returnflag",
          round($"l_extendedprice" * 100, 0).cast("long").as("cents"))
        .groupBy($"l_returnflag")
        .agg(
          (percentile($"cents", lit(0.25)) * 4).cast("long").as("p25_qc"),
          (percentile($"cents", lit(0.5)) * 4).cast("long").as("p50_qc"),
          (percentile($"cents", lit(0.75)) * 4).cast("long").as("p75_qc"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    },

    // Schemaless JSON via the VARIANT type (Spark 4): parse_json once,
    // typed variant_get extraction — no up-front schema, unlike q11's
    // from_json(schema). The binary variant encoding never leaves the
    // plan; only the extracted BIGINT travels. Oracle is DuckDB's
    // json_extract over the same strings.
    GraftQuery(
      "q82_variant_json",
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, k // 10 AS k_decade,
        |  COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
        |  MIN(k) AS min_k, MAX(k) AS max_k
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .select($"event_type",
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
        .groupBy($"event_type", expr("k div 10").as("k_decade"))
        .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
          min($"k").as("min_k"), max($"k").as("max_k"))
        .orderBy($"event_type", $"k_decade")
    },

    // Conditional-aggregate sweep: count_if / bool_or / bool_and /
    // max_by in one partial-aggregable pass. max_by's ordering key is
    // cents×1e9 + orderkey — injective while orderkey < 1e9 (true up
    // to TPC-H sf~600; cents ≤ ~1.1e7 keeps the product < 2^63), so
    // ties require cents AND the payload to coincide and can't produce
    // divergent answers between engines.
    GraftQuery(
      "q83_conditional_agg",
      """WITH l AS (
        |  SELECT l_linestatus, l_orderkey, l_returnflag, l_quantity,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS cents,
        |    CAST(round(l_discount*10000) AS BIGINT) AS disc_bp
        |  FROM lineitem)
        |SELECT l_linestatus, COUNT(*) AS n,
        |  CAST(count_if(disc_bp > 500) AS BIGINT) AS n_deep_disc,
        |  bool_or(l_returnflag = 'R') AS has_return,
        |  bool_and(l_quantity > 0) AS all_positive,
        |  max_by(l_orderkey, cents * 1000000000 + l_orderkey)
        |    AS priciest_order
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .select($"l_linestatus", $"l_orderkey", $"l_returnflag",
          $"l_quantity",
          round($"l_extendedprice" * 100, 0).cast("long").as("cents"),
          round($"l_discount" * 10000, 0).cast("long").as("disc_bp"))
        .groupBy($"l_linestatus")
        .agg(count(lit(1)).as("n"),
          count_if($"disc_bp" > 500).as("n_deep_disc"),
          bool_or($"l_returnflag" === "R").as("has_return"),
          bool_and($"l_quantity" > 0).as("all_positive"),
          max_by($"l_orderkey", $"cents" * 1000000000L + $"l_orderkey")
            .as("priciest_order"))
        .orderBy($"l_linestatus")
    },

    // Correlated scalar subqueries (the SQL face Catalyst de-correlates
    // into aggregate joins): orders at more than 2× their customer's
    // average price. The comparison is cross-multiplied into exact
    // integer arithmetic (price_c × n > 2 × sum_c) so no engine's AVG
    // fold order can flip a boundary row. Identical SQL text runs on
    // both engines (q73 pattern).
    GraftQuery("q84_correlated_subquery", AnalyticsSql.CorrelatedSubquery) {
      (s, dir) =>
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(AnalyticsSql.CorrelatedSubquery)
    },

    // Exact integer moments: the engine-portable way to ship variance /
    // covariance / correlation. Floating stddev/corr aggregates are
    // fold-order-dependent and can't hash-match across engines; the
    // raw power sums over integer cents/basis-points are exact and
    // algebraic (one map-side-combined pass), and n·Σx²−(Σx)² etc.
    // derive the statistics losslessly downstream.
    GraftQuery(
      "q85_moment_sums",
      """WITH l AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_quantity*100) AS BIGINT) AS x,
        |    CAST(round(l_discount*10000) AS BIGINT) AS y
        |  FROM lineitem)
        |SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(x) AS BIGINT) AS sum_x, CAST(SUM(y) AS BIGINT) AS sum_y,
        |  CAST(SUM(x*x) AS BIGINT) AS sum_x2,
        |  CAST(SUM(y*y) AS BIGINT) AS sum_y2,
        |  CAST(SUM(x*y) AS BIGINT) AS sum_xy,
        |  CAST(COUNT(*)*SUM(x*x) - SUM(x)*SUM(x) AS BIGINT) AS var_num_x
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .select($"l_returnflag",
          round($"l_quantity" * 100, 0).cast("long").as("x"),
          round($"l_discount" * 10000, 0).cast("long").as("y"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum($"x").as("sum_x"), sum($"y").as("sum_y"),
          sum($"x" * $"x").as("sum_x2"), sum($"y" * $"y").as("sum_y2"),
          sum($"x" * $"y").as("sum_xy"))
        .select($"l_returnflag", $"n", $"sum_x", $"sum_y", $"sum_x2",
          $"sum_y2", $"sum_xy",
          ($"n" * $"sum_x2" - $"sum_x" * $"sum_x").as("var_num_x"))
        .orderBy($"l_returnflag")
    },

    // Recursive CTE (Spark 4's WITH RECURSIVE / UnionLoop): a dense
    // 24-hour spine generated by recursion, LEFT JOINed to the event
    // stream so silent hours surface as zero rows — the recursive
    // sibling of q74's sequence() spine. Identical SQL text on both
    // engines, ANSI EXTRACT for the hour bucket.
    GraftQuery("q86_recursive_cte", AnalyticsSql.RecursiveHours) {
      (s, dir) =>
      Tables.load(s, dir, "events").createOrReplaceTempView("events")
      s.sql(AnalyticsSql.RecursiveHours)
    },

    // RANGE-frame window (value-based, not row-based): 7-day trailing
    // spend per customer. RANGE includes ALL peer rows at equal order
    // keys, so the trailing sum is deterministic even when two orders
    // share a timestamp — the property ROWS frames lack. Still one
    // sort+shuffle.
    GraftQuery(
      "q87_range_frame",
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS price_c,
        |    epoch_us(o_orderdate) AS od_us
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, od_us, price_c,
        |  CAST(SUM(price_c) OVER (PARTITION BY o_custkey ORDER BY od_us
        |    RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS trail7d_c
        |FROM o WHERE o_custkey % 50 = 0
        |ORDER BY o_custkey, od_us, o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val win = Window.partitionBy($"o_custkey").orderBy($"od_us".asc)
        .rangeBetween(-604800000000L, Window.currentRow)
      Tables.load(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          round($"o_totalprice" * 100, 0).cast("long").as("price_c"),
          unix_micros($"o_orderdate".cast("timestamp")).as("od_us"))
        .filter($"o_custkey" % 50 === 0)
        .select($"o_custkey", $"o_orderkey", $"od_us", $"price_c",
          sum($"price_c").over(win).as("trail7d_c"))
        .orderBy($"o_custkey", $"od_us", $"o_orderkey")
    },

    // Fuzzy key matching (edit distance): the scale-correct shape is
    // aggregate-to-dictionary FIRST — the distinct name dictionary is
    // vocabulary-sized regardless of corpus size — then self-pair the
    // tiny dictionary under levenshtein ≤ 3. Only the dictionary ever
    // crosses itself; the fact table never does.
    GraftQuery(
      "q88_fuzzy_match",
      """WITH names AS (SELECT DISTINCT p_name FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM names a JOIN names b ON a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY name_a, name_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val names = Tables.load(s, dir, "part").select($"p_name").distinct()
      val a = names.select($"p_name".as("name_a"))
      val b = names.select($"p_name".as("name_b"))
      a.join(b, $"name_a" < $"name_b")
        .filter(levenshtein($"name_a", $"name_b") <= 3)
        .select($"name_a", $"name_b",
          levenshtein($"name_a", $"name_b").cast("long").as("dist"))
        .orderBy($"name_a", $"name_b")
    },

    // Sorted-neighborhood blocking (BlockingOps.sortedNeighborhoodPairs;
    // Hernández & Stolfo 1998): entity-resolution candidates from
    // PROXIMITY IN SORT ORDER — O(n·w) pairs instead of q88's O(n²)
    // all-pairs conformance shape. The ranking is the q64 contiguous-id
    // op (range-partitioned, multi-reducer) and the window condition is
    // an adjacent-block EQUI-join (block = rank div w), never an
    // inequality join over the corpus. Same match predicate as q88
    // (levenshtein ≤ 3) so the two gates contrast the blocking recall
    // against the exhaustive baseline on identical data.
    GraftQuery(
      "q147_sorted_blocking",
      """WITH names AS (SELECT DISTINCT p_name FROM part),
        |rk AS (
        |  SELECT p_name, row_number() OVER (ORDER BY p_name) - 1 AS idx
        |  FROM names),
        |pairs AS (
        |  SELECT a.p_name AS name_a, b.p_name AS name_b
        |  FROM rk a JOIN rk b
        |    ON b.idx > a.idx AND b.idx - a.idx <= 5)
        |SELECT name_a, name_b,
        |  CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
        |FROM pairs WHERE levenshtein(name_a, name_b) <= 3
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ops.BlockingOps
      val names = Tables.load(s, dir, "part").select($"p_name").distinct()
      BlockingOps.sortedNeighborhoodPairs(names, 5, "p_name")
        .filter(levenshtein($"p_name_a", $"p_name_b") <= 3)
        .select($"p_name_a".as("name_a"), $"p_name_b".as("name_b"),
          levenshtein($"p_name_a", $"p_name_b").cast("long").as("dist"))
        .orderBy($"name_a", $"name_b")
    },

    // Fellegi–Sunter record-pair scoring (LinkageOps) — the decision
    // stage after q147's blocking: per-field agreement (levenshtein ≤
    // d, nulls never agree) × literal integer-milli log-odds weights →
    // match / possible / nonmatch. Candidates here are each customer
    // paired with a deterministically dirtied copy (name typo by key
    // mod 3, truncated address by mod 2, wrong phone by mod 5), so all
    // three decisions appear and the oracle replays the same
    // perturbation, comparators, and sums.
    GraftQuery(
      "q152_linkage_score",
      """WITH b AS (
        |  SELECT c_custkey,
        |    c_name AS name_a, c_mktsegment AS seg_a,
        |    CAST(CAST(round(c_acctbal*100) AS BIGINT) AS VARCHAR) AS acct_a,
        |    CASE c_custkey % 3 WHEN 0 THEN c_name
        |      WHEN 1 THEN c_name || 'x' ELSE c_name || 'zzzz' END AS name_b,
        |    CASE c_custkey % 2 WHEN 0 THEN c_mktsegment
        |      ELSE 'UNKNOWN' END AS seg_b,
        |    CASE c_custkey % 5 WHEN 0
        |      THEN CAST(CAST(round(c_acctbal*100) AS BIGINT) AS VARCHAR)
        |      ELSE CAST(CAST(round(c_acctbal*100) AS BIGINT) + 1 AS VARCHAR)
        |      END AS acct_b
        |  FROM customer),
        |sc AS (
        |  SELECT c_custkey,
        |    levenshtein(name_a, name_b) <= 1 AS agree_name,
        |    levenshtein(seg_a, seg_b) <= 0 AS agree_seg,
        |    levenshtein(acct_a, acct_b) <= 0 AS agree_acct
        |  FROM b),
        |t AS (
        |  SELECT *,
        |    (CASE WHEN agree_name THEN 4000 ELSE -2000 END +
        |     CASE WHEN agree_seg THEN 3000 ELSE -1500 END +
        |     CASE WHEN agree_acct THEN 2500 ELSE -500 END) AS score_milli
        |  FROM sc)
        |SELECT c_custkey, agree_name, agree_seg, agree_acct,
        |  CAST(score_milli AS BIGINT) AS score_milli,
        |  CASE WHEN score_milli >= 6000 THEN 'match'
        |       WHEN score_milli <= 0 THEN 'nonmatch'
        |       ELSE 'possible' END AS decision
        |FROM t ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ops.LinkageOps
      import graft.ops.LinkageOps.FieldRule
      val m3 = $"c_custkey" % 3
      val cents = round($"c_acctbal" * 100, 0).cast("long")
      val pairs = Tables.load(s, dir, "customer").select($"c_custkey",
        $"c_name".as("name_a"), $"c_mktsegment".as("seg_a"),
        cents.cast("string").as("acct_a"),
        when(m3 === 0, $"c_name")
          .when(m3 === 1, concat($"c_name", lit("x")))
          .otherwise(concat($"c_name", lit("zzzz"))).as("name_b"),
        when($"c_custkey" % 2 === 0, $"c_mktsegment")
          .otherwise(lit("UNKNOWN")).as("seg_b"),
        when($"c_custkey" % 5 === 0, cents.cast("string"))
          .otherwise((cents + 1L).cast("string")).as("acct_b"))
      LinkageOps.fellegiSunterScore(pairs, Seq(
          FieldRule("name", "name_a", "name_b", 1, 4000L, -2000L),
          FieldRule("seg", "seg_a", "seg_b", 0, 3000L, -1500L),
          FieldRule("acct", "acct_a", "acct_b", 0, 2500L, -500L)),
        upperMilli = 6000L, lowerMilli = 0L)
        .select($"c_custkey", $"agree_name", $"agree_seg",
          $"agree_acct", $"score_milli", $"decision")
        .orderBy($"c_custkey")
    },

    // MULTI-PASS sorted-neighborhood blocking (the full
    // Hernández–Stolfo method): q147's single name-sorted pass plus a
    // reversed-name pass — a typo early in the key scatters a true
    // pair in one sort order but not the other; the union/distinct of
    // both passes is the recall fix. Pairs canonicalized on the name
    // so cross-pass orientations collapse.
    GraftQuery(
      "q154_multipass_blocking",
      """WITH names AS (SELECT DISTINCT p_name FROM part),
        |r1 AS (
        |  SELECT p_name, row_number() OVER (ORDER BY p_name) - 1 AS idx
        |  FROM names),
        |r2 AS (
        |  SELECT p_name,
        |    row_number() OVER (ORDER BY reverse(p_name)) - 1 AS idx
        |  FROM names),
        |p1 AS (
        |  SELECT a.p_name AS x, b.p_name AS y
        |  FROM r1 a JOIN r1 b ON b.idx > a.idx AND b.idx - a.idx <= 5),
        |p2 AS (
        |  SELECT a.p_name AS x, b.p_name AS y
        |  FROM r2 a JOIN r2 b ON b.idx > a.idx AND b.idx - a.idx <= 5),
        |u AS (
        |  SELECT DISTINCT least(x, y) AS name_a, greatest(x, y) AS name_b
        |  FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2))
        |SELECT name_a, name_b,
        |  CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
        |FROM u WHERE levenshtein(name_a, name_b) <= 3
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ops.BlockingOps
      val names = Tables.load(s, dir, "part").select($"p_name").distinct()
        .withColumn("rev", reverse($"p_name"))
      BlockingOps.sortedNeighborhoodPairsMultiPass(
          names, 5, "p_name", Seq(Seq("p_name"), Seq("rev")))
        .filter(levenshtein($"p_name_a", $"p_name_b") <= 3)
        .select($"p_name_a".as("name_a"), $"p_name_b".as("name_b"),
          levenshtein($"p_name_a", $"p_name_b").cast("long").as("dist"))
        .orderBy($"name_a", $"name_b")
    },

    // ENTITY RESOLUTION END-TO-END: block → score → cluster in one
    // gate (the ER composition finisher, like q149 for CDC). A dirty
    // customer set (every third customer duplicated with a name typo
    // and offset id) goes through sorted-neighborhood blocking (q147),
    // Fellegi–Sunter match scoring (q152), and connected components
    // over the accepted match pairs (q60's CC) → entity ids. The
    // oracle replays blocking rank-windows, scoring sums, and the
    // transitive closure as a recursive CTE.
    GraftQuery(
      "q155_er_pipeline",
      """WITH RECURSIVE base AS (
        |  SELECT c_custkey AS id, c_name AS name, c_mktsegment AS seg,
        |    CAST(CAST(round(c_acctbal*100) AS BIGINT) AS VARCHAR) AS acct
        |  FROM customer WHERE c_custkey < 300),
        |dirty AS (
        |  SELECT id, name, seg, acct FROM base
        |  UNION ALL
        |  SELECT id + 1000000, name || 'x', seg, acct FROM base
        |  WHERE id % 3 = 0),
        |rk AS (
        |  SELECT *, row_number() OVER (ORDER BY name, id) - 1 AS idx
        |  FROM dirty),
        |cand AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    a.name AS name_a, b.name AS name_b, a.seg AS seg_a,
        |    b.seg AS seg_b, a.acct AS acct_a, b.acct AS acct_b
        |  FROM rk a JOIN rk b ON b.idx > a.idx AND b.idx - a.idx <= 10),
        |m AS (
        |  SELECT id_a, id_b FROM cand
        |  WHERE (CASE WHEN levenshtein(name_a, name_b) <= 1
        |           THEN 4000 ELSE -2000 END +
        |         CASE WHEN levenshtein(seg_a, seg_b) <= 0
        |           THEN 3000 ELSE -1500 END +
        |         CASE WHEN levenshtein(acct_a, acct_b) <= 0
        |           THEN 2500 ELSE -500 END) >= 6000),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM m
        |  UNION SELECT id_b, id_a FROM m),
        |reach(src, node) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node),
        |comp AS (SELECT src AS id, MIN(node) AS entity
        |  FROM reach GROUP BY src)
        |SELECT entity, COUNT(*) AS n_members, MAX(id) AS max_member
        |FROM comp GROUP BY entity ORDER BY entity""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      import graft.ops.{BlockingOps, GraphOps, LinkageOps}
      import graft.ops.LinkageOps.FieldRule
      val base = Tables.load(s, dir, "customer")
        .filter($"c_custkey" < 300)
        .select($"c_custkey".as("id"), $"c_name".as("name"),
          $"c_mktsegment".as("seg"),
          round($"c_acctbal" * 100, 0).cast("long").cast("string")
            .as("acct"))
      val dirty = base.unionByName(base.filter($"id" % 3 === 0)
        .select(($"id" + 1000000L).as("id"),
          concat($"name", lit("x")).as("name"), $"seg", $"acct"))
      val cand = BlockingOps.sortedNeighborhoodPairs(
        dirty, 10, "name", "id")
      val matches = LinkageOps.fellegiSunterScore(cand, Seq(
          FieldRule("name", "name_a", "name_b", 1, 4000L, -2000L),
          FieldRule("seg", "seg_a", "seg_b", 0, 3000L, -1500L),
          FieldRule("acct", "acct_a", "acct_b", 0, 2500L, -500L)),
        upperMilli = 6000L, lowerMilli = 0L)
        .filter($"decision" === "match")
        .select($"id_a", $"id_b")
      GraphOps.connectedComponents(matches, "id_a", "id_b")
        .groupBy($"component")
        .agg(count(lit(1)).as("n_members"), max($"id").as("max_member"))
        .select($"component".as("entity"), $"n_members", $"max_member")
        .orderBy($"entity")
    },

    // Incremental rollup maintenance (TemporalOps.mergeRollup): the
    // trailing week's events are aggregated as a delta and merged into
    // the pre-aggregated history by re-summing partials — no history
    // rescan at refresh time. The oracle is the full one-pass
    // recompute, which the algebraic merge must equal bit-for-bit.
    // The week boundary comes from a 1-row max-day aggregate broadcast
    // (q74's bounds pattern — sanctioned BNLJ, constant-size build).
    GraftQuery(
      "q89_incremental_rollup",
      """WITH e AS (
        |  SELECT user_id, CAST(round(value*100) AS BIGINT) AS value_c
        |  FROM events)
        |SELECT user_id, CAST(SUM(value_c) AS BIGINT) AS value_c,
        |  COUNT(*) AS n
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .select($"user_id",
          expr("unix_micros(ts) div 86400000000").as("day"),
          round($"value" * 100, 0).cast("long").as("value_c"))
      val bounds = e.agg(max($"day").as("max_day"))
      val tagged = e.crossJoin(broadcast(bounds))
      def rollup(df: org.apache.spark.sql.DataFrame) =
        df.groupBy($"user_id")
          .agg(sum($"value_c").as("value_c"), count(lit(1)).as("n"))
      val prevAgg = rollup(tagged.filter($"day" <= $"max_day" - 7))
      val deltaAgg = rollup(tagged.filter($"day" > $"max_day" - 7))
      graft.ops.TemporalOps
        .mergeRollup(prevAgg, deltaAgg, Seq("user_id"),
          Seq("value_c", "n"))
        .orderBy($"user_id")
    },

    // Hive-style partitioned layout round trip: write documents
    // partitioned by lang (LayoutOps.writePartitioned), read back with
    // a lang filter — the scan prunes whole directories at planning
    // time (PartitionFilters; asserted in PlansSpec) — and aggregate.
    // The oracle is the same aggregate over the ORIGINAL table, so the
    // gate checks full write→read fidelity, not just the plan shape.
    GraftQuery(
      "q90_partition_pruning",
      """SELECT source, COUNT(*) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE lang IN ('en', 'ru')
        |GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      import s.implicits._
      val path = scratchDir("graft_q90")
      graft.ops.LayoutOps.writePartitioned(
        Tables.load(s, dir, "documents"), path, "lang")
      s.read.parquet(path)
        .filter($"lang".isin("en", "ru"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n"), sum($"n_chars").as("total_chars"))
        .orderBy($"source")
    },

    // Fixed-iteration integer PageRank over the order→part reference
    // graph (importance scoring — the graph-analytics companion to
    // q60's connected components). Every arithmetic step is BIGINT
    // `div`, so the DuckDB oracle replays 3 unrolled iterations to the
    // exact same values — floats would fold-order-drift. Top-100 ranks
    // (value + id tiebreak) travel in the hash.
    GraftQuery("q106_pagerank", AnalyticsSql.PageRank3) { (s, dir) =>
      import s.implicits._
      // Narrow join keys (guide §2.3): the loop shuffles every edge and
      // rank row 3 times, so node ids ride as 8-byte longs (2k / 2k+1
      // parity-codes the o/p side) and decode to the contract's string
      // ids only at the output — rank arithmetic never reads the id, so
      // the values are bit-identical (oracle-checked).
      val edges = Tables.load(s, dir, "lineitem")
        .select(($"l_orderkey" * 2).cast("long").as("src"),
          ($"l_partkey" * 2 + 1).cast("long").as("dst"))
        .distinct()
      graft.ops.GraphOps.pageRank(edges, "src", "dst", iters = 3)
        .select(when($"id" % 2 === 0,
            concat(lit("o"), expr("id div 2").cast("string")))
          .otherwise(concat(lit("p"), expr("(id - 1) div 2").cast("string")))
          .as("id"), $"r")
        .orderBy($"r".desc, $"id")
        .limit(100)
    },

    // PERSONALIZED PageRank (topic-sensitive restart): teleport AND
    // dangling mass return to a trusted seed set (orders with key
    // % 97 = 0) instead of uniformly — rank becomes flow-weighted
    // proximity to the seeds (the quality-propagation companion to
    // q138's seed distances). Same integer loop as q106 — BIGINT `div`
    // everywhere — so the oracle unrolls the same 3 rounds with the
    // seed-conditional restart terms and replays bit-for-bit.
    GraftQuery("q141_personalized_pagerank", AnalyticsSql.PprSeeded3) {
      (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      // long parity-coded node ids inside the loop, string ids at the
      // output only — see q106 (guide §2.3 narrower shuffle keys)
      val edges = li.select(($"l_orderkey" * 2).cast("long").as("src"),
          ($"l_partkey" * 2 + 1).cast("long").as("dst"))
        .distinct()
      val seeds = li.filter($"l_orderkey" % 97 === 0)
        .select(($"l_orderkey" * 2).cast("long").as("seed"))
        .distinct()
      graft.ops.GraphOps.personalizedPageRank(
          edges, "src", "dst", seeds, "seed", iters = 3)
        .select(when($"id" % 2 === 0,
            concat(lit("o"), expr("id div 2").cast("string")))
          .otherwise(concat(lit("p"), expr("(id - 1) div 2").cast("string")))
          .as("id"), $"r")
        .orderBy($"r".desc, $"id")
        .limit(100)
    },

    // JSONL sink+source round trip (the interchange format of every
    // data-pipeline handoff): write documents as JSON lines, read back
    // with an explicit schema (schema-on-read — no inference pass at
    // scale), aggregate. Oracle runs the same aggregate on the ORIGINAL
    // table, so the gate checks write→read fidelity of values, not
    // plan shape (q90's pattern for the partitioned-parquet layout).
    GraftQuery(
      "q108_jsonl_roundtrip",
      """SELECT source, lang, COUNT(*) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(length(text)) AS BIGINT) AS total_len
        |FROM documents
        |GROUP BY source, lang ORDER BY source, lang""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.types._
      val path = scratchDir("graft_q108")
      Tables.load(s, dir, "documents")
        .write.mode("overwrite").json(path)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      s.read.schema(schema).json(path)
        .groupBy($"source", $"lang")
        .agg(count(lit(1)).as("n"), sum($"n_chars").as("total_chars"),
          sum(length($"text")).as("total_len"))
        .orderBy($"source", $"lang")
    },

    // CSV sink+source round trip with explicit schema + ISO timestamp
    // format: numeric, string, and timestamp fidelity all checked via
    // the original-table oracle (timestamps compare as integer micros).
    GraftQuery(
      "q109_csv_roundtrip",
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS total_c,
        |  CAST(SUM(epoch_us(o_orderdate)) AS BIGINT) AS sum_ts_us
        |FROM orders
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.types._
      val path = scratchDir("graft_q109")
      val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      // Pin BOTH timestamp formats on the write: o_orderdate reads as
      // session-TZ TimestampType since Tables.load disabled NTZ
      // inference (UTC session ⇒ identical wall-time strings either
      // way), and the NTZ option alone would leave the LTZ default
      // format in play.
      Tables.load(s, dir, "orders")
        .write.mode("overwrite")
        .option("header", "true").option("timestampNTZFormat", fmt)
        .option("timestampFormat", fmt)
        .csv(path)
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType),
        StructField("o_orderdate", TimestampNTZType),
        StructField("o_orderpriority", StringType)))
      s.read.schema(schema)
        .option("header", "true").option("timestampNTZFormat", fmt)
        .csv(path)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(round($"o_totalprice" * 100, 0).cast("long")).as("total_c"),
          sum(unix_micros($"o_orderdate".cast("timestamp"))).as("sum_ts_us"))
        .orderBy($"o_orderstatus")
    },

    // ORC sink+source round trip (the third interchange format next to
    // q108 JSONL and q109 CSV): columnar, self-describing schema, so
    // the read-back needs no schema-on-read declaration. Oracle runs
    // the same aggregate over the ORIGINAL table — write→read value
    // fidelity is what's gated.
    GraftQuery(
      "q117_orc_roundtrip",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
        |    AS sum_qty_c,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_c
        |FROM lineitem
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      val path = scratchDir("graft_q117")
      Tables.load(s, dir, "lineitem")
        .select($"l_returnflag", $"l_linestatus", $"l_quantity",
          $"l_extendedprice")
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(round($"l_quantity" * 100, 0).cast("long")).as("sum_qty_c"),
          sum(round($"l_extendedprice" * 100, 0).cast("long"))
            .as("sum_price_c"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // Schema evolution on read (the lakehouse append reality: an early
    // batch lacks columns a later batch has): two parquet batches with
    // different column sets land in one directory; mergeSchema=true
    // reads the union schema, null-extending the old batch. The oracle
    // replays the same union with explicit NULLs from the original
    // table — write→read fidelity AND null-extension semantics gated.
    GraftQuery(
      "q122_schema_evolution",
      """WITH old_batch AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(NULL AS BIGINT) AS price_c
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |new_batch AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS price_c
        |  FROM orders WHERE o_orderkey % 2 = 1),
        |unioned AS (
        |  SELECT * FROM old_batch UNION ALL SELECT * FROM new_batch)
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  COUNT(price_c) AS n_priced,
        |  CAST(COALESCE(SUM(price_c), 0) AS BIGINT) AS total_c
        |FROM unioned GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      import s.implicits._
      val path = scratchDir("graft_q122")
      val orders = Tables.load(s, dir, "orders")
      orders.filter($"o_orderkey" % 2 === 0)
        .select($"o_orderkey", $"o_orderstatus")
        .write.mode("overwrite").parquet(path)
      orders.filter($"o_orderkey" % 2 === 1)
        .select($"o_orderkey", $"o_orderstatus",
          round($"o_totalprice" * 100, 0).cast("long").as("price_c"))
        .write.mode("append").parquet(path)
      s.read.option("mergeSchema", "true").parquet(path)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          count($"price_c").as("n_priced"),
          coalesce(sum($"price_c"), lit(0L)).as("total_c"))
        .orderBy($"o_orderstatus")
    },

    // Item-item association lift (AssocOps.itemLift): market-basket
    // pairs from a self-equi-join on the ORDER key (stream bounded by
    // basket size, never corpus n²), supports via item equi-joins, N
    // as an in-plan 1-row scalar. lift > 1e6 ⇔ co-occurrence beats
    // independence.
    GraftQuery(
      "q164_item_lift",
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |co AS (
        |  SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS co
        |  FROM op a JOIN op b ON a.b = b.b AND a.i < b.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        |c AS (SELECT i, COUNT(*) AS c FROM op GROUP BY 1),
        |n AS (SELECT COUNT(DISTINCT b) AS n FROM op)
        |SELECT item_a, item_b, co, ca.c AS c_a, cb.c AS c_b,
        |  (co*n.n*1000000)//(ca.c*cb.c) AS lift_ppm
        |FROM co
        |JOIN c ca ON ca.i = item_a
        |JOIN c cb ON cb.i = item_b
        |CROSS JOIN n
        |ORDER BY item_a, item_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      graft.ops.AssocOps.itemLift(
          Tables.load(s, dir, "lineitem"), "l_orderkey", "l_partkey",
          minCo = 3L)
        .orderBy($"item_a", $"item_b")
    },

    // Synchronous label propagation (GraphOps.labelPropagation) over
    // the part co-occurrence graph: 2 rounds, smallest-label
    // tie-break. Labels COMPETE by neighbor frequency — from round 2
    // this genuinely diverges from connected components (q60/q116).
    // The per-node argmax is the algebraic min(struct(−cnt, label)),
    // map-side combinable — no per-node window, hub-safe.
    GraftQuery("q165_label_propagation", AnalyticsSql.Lpa2) { (s, dir) =>
      import s.implicits._
      val op = Tables.load(s, dir, "lineitem")
        .select($"l_orderkey".as("b"), $"l_partkey".as("i")).distinct()
      // no .distinct() on the pair stream (guide §2.4): the operator's
      // own canonical dedup absorbs duplicate wedges, so the
      // query-side distinct was a second full |pairs| exchange
      // producing the identical undirected edge set (q275 keeps its
      // distinct — modularity consumes the pair MULTISET directly)
      val pairs = op.select($"b", $"i".as("pa"))
        .join(op.select($"b", $"i".as("pb")), Seq("b"))
        .filter($"pa" < $"pb")
        .select($"pa", $"pb")
      graft.ops.GraphOps.labelPropagation(pairs, "pa", "pb", rounds = 2)
        .orderBy($"id")
    },

    // Newman modularity (GraphOps.modularity) of the q165 LPA
    // communities over the same part co-occurrence graph — the "did
    // the clustering find real structure?" readout. Exact
    // single-fraction integer Q (per-community floors would drift);
    // the oracle reuses q165's own CTE body so both engines score the
    // IDENTICAL assignment.
    GraftQuery("q275_modularity", AnalyticsSql.Modularity) { (s, dir) =>
      import s.implicits._
      val op = Tables.load(s, dir, "lineitem")
        .select($"l_orderkey".as("b"), $"l_partkey".as("i")).distinct()
      val pairs = op.select($"b", $"i".as("pa"))
        .join(op.select($"b", $"i".as("pb")), Seq("b"))
        .filter($"pa" < $"pb")
        .select($"pa", $"pb").distinct()
        .graftCheckpoint() // consumed by the LPA rounds AND modularity
      val labels = graft.ops.GraphOps.labelPropagation(
        pairs, "pa", "pb", rounds = 2)
      graft.ops.GraphOps.modularity(
          pairs, "pa", "pb", labels, "id", "label")
        .orderBy($"community")
    },

    // HITS hubs & authorities (GraphOps.hits) over the buyer→supplier
    // bipartite graph: authorities rank suppliers by endorsement from
    // strong buyers, hubs rank buyers by breadth of strong suppliers —
    // the mutually-recursive companion to q106's PageRank. Exact
    // integer loop (L∞ ppm normalization per half-round — a positive
    // scalar divide, so rankings match Kleinberg's L2 form) lets the
    // oracle unroll 2 rounds bit-for-bit. Top-10 per side; ids are
    // 'c'/'s'-prefixed (the key spaces collide numerically).
    GraftQuery("q162_hits", AnalyticsSql.Hits2) { (s, dir) =>
      import s.implicits._
      val edges = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem"),
          $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).cast("long").as("src"),
          ($"l_suppkey" * 2 + 1).cast("long").as("dst"))
      // long parity-coded ids inside the two HITS rounds, decoded to
      // the contract's c/s string ids at the output (guide §2.3); the
      // score arithmetic never reads the id, so values are unchanged
      val sc = graft.ops.GraphOps.hits(edges, "src", "dst", rounds = 2)
        .select(when($"id" % 2 === 0,
            concat(lit("c"), expr("id div 2").cast("string")))
          .otherwise(concat(lit("s"), expr("(id - 1) div 2").cast("string")))
          .as("id"), $"hub_ppm", $"auth_ppm")
      def side(tpe: String, scoreCol: String, prefix: String) = {
        val top = sc.filter($"id".startsWith(prefix))
          .select($"id".as("node_id"), col(scoreCol).as("score_ppm"))
          .orderBy($"score_ppm".desc, $"node_id").limit(10)
        // rank window runs over the 10 TakeOrdered survivors only —
        // bounded by construction (the q121 pattern), never all nodes
        top.select(lit(tpe).as("node_type"), $"node_id", $"score_ppm",
          row_number().over(Window
            .orderBy($"score_ppm".desc, $"node_id")).cast("long")
            .as("rank"))
      }
      side("supplier", "auth_ppm", "s")
        .union(side("customer", "hub_ppm", "c"))
        .orderBy($"node_type", $"rank")
    },

    // Robust per-group winsorization (CurationOps.robustClip): clip
    // event values into median ± 3·MAD of their event type — the
    // outlier fence that doesn't move with the outliers (mean ± kσ
    // does). Both medians are exact yet computed over the per-group
    // VALUE HISTOGRAM (distinct cents values), so no task ever sorts a
    // group's raw rows. Gate reads the per-group clip summary.
    GraftQuery(
      "q163_robust_clip",
      """WITH v AS (
        |  SELECT event_type,
        |    CAST(round(value*100) AS BIGINT) AS value_c FROM events),
        |hist AS (
        |  SELECT event_type, value_c, COUNT(*) AS c FROM v GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, value_c,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY value_c) AS cum,
        |    SUM(c) OVER (PARTITION BY event_type) AS n
        |  FROM hist),
        |med AS (
        |  SELECT event_type, MIN(value_c) AS med FROM cum
        |  WHERE cum >= (n+1)//2 GROUP BY 1),
        |d AS (
        |  SELECT v.event_type, value_c, ABS(value_c - med) AS dev, med
        |  FROM v JOIN med USING (event_type)),
        |dh AS (
        |  SELECT event_type, dev, COUNT(*) AS c FROM d GROUP BY 1, 2),
        |dcum AS (
        |  SELECT event_type, dev,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY dev) AS cum,
        |    SUM(c) OVER (PARTITION BY event_type) AS n
        |  FROM dh),
        |mad AS (
        |  SELECT event_type, MIN(dev) AS mad FROM dcum
        |  WHERE cum >= (n+1)//2 GROUP BY 1)
        |SELECT d.event_type, COUNT(*) AS n,
        |  MIN(d.med) AS med_c, MIN(mad.mad) AS mad_c,
        |  COUNT(*) FILTER (value_c < med - 3*mad) AS n_lo,
        |  COUNT(*) FILTER (value_c > med + 3*mad) AS n_hi,
        |  CAST(SUM(LEAST(GREATEST(value_c, med - 3*mad),
        |    med + 3*mad)) AS BIGINT) AS sum_clipped_c
        |FROM d JOIN mad USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .select($"event_type",
          round($"value" * 100, 0).cast("long").as("value_c"))
      graft.ops.CurationOps.robustClip(e, "event_type", "value_c", k = 3)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          min($"med").as("med_c"), min($"mad").as("mad_c"),
          count(when($"value_c" < $"med" - $"mad" * 3, 1)).as("n_lo"),
          count(when($"value_c" > $"med" + $"mad" * 3, 1)).as("n_hi"),
          sum($"clipped").as("sum_clipped_c"))
        .orderBy($"event_type")
    },

    // Exact ROC curve + Mann-Whitney AUC (EvalOps.rocAnalysis) for a
    // "is this document English?" scorer using n_chars as the score —
    // the threshold-selection readout for every curation classifier
    // (q125/q124). Runs over the score VALUE HISTOGRAM (the q163
    // pattern: the ordered walk covers distinct scores, never raw
    // rows); AUC has exact midrank tie handling via the ×2-scaled
    // integer form, attached to every row as an in-plan 1-row scalar.
    GraftQuery(
      "q179_roc_auc",
      """WITH h AS (
        |  SELECT n_chars AS score,
        |    COUNT(*) FILTER (lang = 'en') AS pos,
        |    COUNT(*) FILTER (lang <> 'en') AS neg
        |  FROM documents GROUP BY 1),
        |pts AS (
        |  SELECT score, pos, neg,
        |    SUM(pos) OVER (ORDER BY score DESC) AS tp,
        |    SUM(neg) OVER (ORDER BY score DESC) AS fp
        |  FROM h),
        |tot AS (
        |  SELECT CAST(SUM(pos) AS BIGINT) AS p,
        |    CAST(SUM(neg) AS BIGINT) AS n FROM h),
        |auc AS (
        |  SELECT CAST(SUM(pos * (2*(tot.n - fp) + neg)) * 1000000
        |      // (2 * MIN(tot.p) * MIN(tot.n)) AS BIGINT) AS auc_ppm
        |  FROM pts CROSS JOIN tot)
        |SELECT CAST(score AS BIGINT) AS score,
        |  CAST(pos AS BIGINT) AS pos, CAST(neg AS BIGINT) AS neg,
        |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
        |  CAST(tp * 1000000 // tot.p AS BIGINT) AS tpr_ppm,
        |  CAST(fp * 1000000 // tot.n AS BIGINT) AS fpr_ppm,
        |  auc.auc_ppm
        |FROM pts CROSS JOIN tot CROSS JOIN auc
        |ORDER BY score""".stripMargin) { (s, dir) =>
      import s.implicits._
      graft.ops.EvalOps.rocAnalysis(
          Tables.load(s, dir, "documents")
            .select($"n_chars", ($"lang" === "en").as("is_en")),
          "n_chars", "is_en")
        .orderBy($"score")
    },

    // Calibration audit (EvalOps.calibrationBins) for the same
    // "is-English" scorer squashed to a pseudo-probability
    // p_ppm = n·1e6/(n+300): equal-width reliability bins + Brier +
    // ECE — rank quality (q179 AUC) says nothing about whether the
    // score IS a probability (Guo et al. 2017). Corpus reduces to
    // ≤10 bin rows in one map-side-combined pass; Brier/ECE attach as
    // in-plan 1-row scalars; ECE uses the ROUNDED bin stats so every
    // number replays exactly.
    GraftQuery(
      "q273_calibration",
      """WITH s AS (
        |  SELECT n_chars * 1000000 // (n_chars + 300) AS p,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |b AS (SELECT LEAST(p * 10 // 1000000, 9) AS bin, p, y FROM s),
        |bins AS (
        |  SELECT bin, COUNT(*) AS n,
        |    CAST(SUM(p) // COUNT(*) AS BIGINT) AS mean_p_ppm,
        |    CAST(SUM(y) * 1000000 // COUNT(*) AS BIGINT)
        |      AS pos_rate_ppm
        |  FROM b GROUP BY 1),
        |br AS (
        |  SELECT CAST(SUM((p - y*1000000) * (p - y*1000000))
        |      // COUNT(*) AS BIGINT) AS brier_ppm2,
        |    COUNT(*) AS nt
        |  FROM b),
        |ec AS (
        |  SELECT CAST(SUM(n * abs(mean_p_ppm - pos_rate_ppm))
        |      // MIN(br.nt) AS BIGINT) AS ece_ppm
        |  FROM bins CROSS JOIN br)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
        |  mean_p_ppm, pos_rate_ppm, br.brier_ppm2, ec.ece_ppm
        |FROM bins CROSS JOIN br CROSS JOIN ec
        |ORDER BY bin""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      graft.ops.EvalOps.calibrationBins(
          Tables.load(s, dir, "documents")
            .select(
              div($"n_chars" * 1000000L, $"n_chars" + 300L).as("p_ppm"),
              ($"lang" === "en").as("is_en")),
          "p_ppm", "is_en", nBins = 10)
        .orderBy($"bin")
    },

    // Per-group AUC (EvalOps.rocAucGrouped): q179's Mann-Whitney
    // statistic PARTITIONED by source — per-slice model monitoring with
    // no global ordered window at any scale (the histogram walk runs
    // per group key). Single-class groups yield NULL, in the hash.
    GraftQuery(
      "q182_grouped_auc",
      """WITH h AS (
        |  SELECT source, n_chars AS score,
        |    COUNT(*) FILTER (lang = 'en') AS pos,
        |    COUNT(*) FILTER (lang <> 'en') AS neg
        |  FROM documents GROUP BY 1, 2),
        |pts AS (
        |  SELECT source, pos, neg,
        |    SUM(neg) OVER (PARTITION BY source ORDER BY score DESC)
        |      AS fp,
        |    SUM(neg) OVER (PARTITION BY source) AS n
        |  FROM h)
        |SELECT source, CAST(SUM(pos) AS BIGINT) AS pos,
        |  CAST(MIN(n) AS BIGINT) AS neg,
        |  CASE WHEN SUM(pos) > 0 AND MIN(n) > 0 THEN
        |    CAST(SUM(pos * (2*(n - fp) + neg)) * 1000000
        |      // (2 * SUM(pos) * MIN(n)) AS BIGINT) END AS auc_ppm
        |FROM pts GROUP BY source ORDER BY source""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      graft.ops.EvalOps.rocAucGrouped(
          Tables.load(s, dir, "documents")
            .select($"source", $"n_chars", ($"lang" === "en").as("is_en")),
          "source", "n_chars", "is_en")
        .orderBy($"source")
    },

    // XML sink+source round trip (Spark 4's built-in XML data source):
    // write documents as <doc> rows, read back with an explicit schema
    // (schema-on-read — no inference pass), aggregate; the oracle runs
    // the same aggregate on the ORIGINAL table (q108's pattern), so the
    // gate checks write→read value fidelity through XML escaping.
    GraftQuery(
      "q186_xml_roundtrip",
      """SELECT lang, COUNT(*) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(length(text)) AS BIGINT) AS total_len,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM documents
        |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.types._
      val path = scratchDir("graft_q186")
      Tables.load(s, dir, "documents")
        .write.mode("overwrite").option("rootTag", "docs")
        .option("rowTag", "doc").format("xml").save(path)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      s.read.schema(schema).option("rowTag", "doc").format("xml").load(path)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n"), sum($"n_chars").as("total_chars"),
          sum(length($"text")).as("total_len"),
          sum($"doc_id").as("id_sum"))
        .orderBy($"lang")
    },

    // NDCG@10 ranking quality per source (EvalOps.ndcgAtK) — the
    // ranking complement to the q179/q182 classification metrics:
    // system ranking by n_chars, graded relevance from lang
    // (en=2, de=1, else 0), discounts from the SHARED Q20-log literal
    // table (EvalOps.ndcgWeights — both engines consume the identical
    // precomputed integers, the q185 Poisson-table pattern; w(1) is
    // exactly 1e6). Two per-group row_number windows over the
    // candidate-set-sized groups; ties pinned by doc_id on both sides.
    GraftQuery(
      "q191_ndcg",
      s"""WITH d AS (
        |  SELECT source, doc_id, n_chars,
        |    CASE lang WHEN 'en' THEN 2 WHEN 'de' THEN 1 ELSE 0 END
        |      AS rel,
        |    ${graft.ops.EvalOps.ndcgWeights(10)
                 .mkString("[", ", ", "]")} AS w
        |  FROM documents),
        |r AS (
        |  SELECT source, rel, w,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rs,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY rel DESC, doc_id) AS ri
        |  FROM d)
        |SELECT source, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN rs <= 10 THEN rel * w[rs] ELSE 0 END)
        |    AS BIGINT) AS dcg_micro,
        |  CAST(SUM(CASE WHEN ri <= 10 THEN rel * w[ri] ELSE 0 END)
        |    AS BIGINT) AS idcg_micro,
        |  CASE WHEN SUM(CASE WHEN ri <= 10 THEN rel * w[ri] ELSE 0 END)
        |      > 0 THEN
        |    CAST(SUM(CASE WHEN rs <= 10 THEN rel * w[rs] ELSE 0 END)
        |        * 1000000
        |      // SUM(CASE WHEN ri <= 10 THEN rel * w[ri] ELSE 0 END)
        |      AS BIGINT)
        |  END AS ndcg_ppm
        |FROM r GROUP BY source ORDER BY source""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      graft.ops.EvalOps.ndcgAtK(
          Tables.load(s, dir, "documents")
            .select($"source", $"doc_id", $"n_chars",
              when($"lang" === "en", 2L).when($"lang" === "de", 1L)
                .otherwise(0L).as("rel")),
          "source", "n_chars", "rel", "doc_id", k = 10)
        .orderBy($"source")
    },

    // Precision/recall/F1 sweep (EvalOps.prCurve) — q179's histogram
    // walk with the retrieval-facing metrics; F1 via its pair-count
    // identity 2tp/(2tp+fp+fn) as ONE exact integral division, never
    // a rounded-P/rounded-R recombination.
    GraftQuery(
      "q192_pr_curve",
      """WITH h AS (
        |  SELECT n_chars AS score,
        |    COUNT(*) FILTER (lang = 'en') AS pos,
        |    COUNT(*) FILTER (lang <> 'en') AS neg
        |  FROM documents GROUP BY 1),
        |pts AS (
        |  SELECT score,
        |    SUM(pos) OVER (ORDER BY score DESC) AS tp,
        |    SUM(neg) OVER (ORDER BY score DESC) AS fp
        |  FROM h),
        |tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS p FROM h)
        |SELECT CAST(score AS BIGINT) AS score, CAST(tp AS BIGINT) AS tp,
        |  CAST(fp AS BIGINT) AS fp,
        |  CAST(tot.p - tp AS BIGINT) AS fn,
        |  CASE WHEN tp + fp > 0 THEN
        |    CAST(tp*1000000 // (tp + fp) AS BIGINT) END AS precision_ppm,
        |  CASE WHEN tot.p > 0 THEN
        |    CAST(tp*1000000 // tot.p AS BIGINT) END AS recall_ppm,
        |  CASE WHEN 2*tp + fp + (tot.p - tp) > 0 THEN
        |    CAST(2*tp*1000000 // (2*tp + fp + (tot.p - tp)) AS BIGINT)
        |  END AS f1_ppm
        |FROM pts CROSS JOIN tot ORDER BY score""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      graft.ops.EvalOps.prCurve(
          Tables.load(s, dir, "documents")
            .select($"n_chars", ($"lang" === "en").as("is_en")),
          "n_chars", "is_en")
        .orderBy($"score")
    },

    // Pearson chi-square independence of lang × source
    // (EvalOps.chiSquareIndependence) — the categorical drift/
    // association screen: one map-side-combined groupBy reduces the
    // corpus to the |A|×|B| contingency table, margins ride as window
    // aggregates over that domain-sized table, per-cell χ²·1000 in
    // pure integer milli arithmetic; total + dof + Cramér's V² attach
    // as an in-plan 1-row scalar (q179 pattern).
    GraftQuery(
      "q193_chi_square",
      """WITH cells AS (
        |  SELECT lang AS a, source AS b, COUNT(*) AS o
        |  FROM documents GROUP BY 1, 2),
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
      graft.ops.EvalOps.chiSquareIndependence(
          Tables.load(s, dir, "documents"), "lang", "source")
        .orderBy($"a", $"b")
    },

    // Benford first-digit screen (fraud/synthetic-data quality check):
    // leading digit of the order price in cents vs the Benford ppm
    // literals, χ²-style deviation per digit in pure integer
    // arithmetic, total attached as an in-plan 1-row scalar. One
    // groupBy to a ≤9-row table; everything after is domain-sized.
    GraftQuery(
      "q198_benford",
      s"""WITH c AS (
        |  SELECT CAST(round(o_totalprice*100) AS BIGINT) AS c
        |  FROM orders),
        |d AS (
        |  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT)
        |      AS digit,
        |    COUNT(*) AS n
        |  FROM c WHERE c >= 1 GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM d),
        |s AS (
        |  SELECT digit, n, n*1000000 // t.t AS obs_ppm,
        |    ${AnalyticsQueries.BenfordPpm.mkString("[", ", ", "]")}
        |      [digit] AS exp_ppm
        |  FROM d CROSS JOIN t),
        |dev AS (
        |  SELECT digit, CAST(n AS BIGINT) AS n,
        |    CAST(obs_ppm AS BIGINT) AS obs_ppm,
        |    CAST(exp_ppm AS BIGINT) AS exp_ppm,
        |    CAST((obs_ppm - exp_ppm)*(obs_ppm - exp_ppm) // exp_ppm
        |      AS BIGINT) AS dev
        |  FROM s),
        |tot AS (
        |  SELECT CAST(SUM(dev) AS BIGINT) AS benford_stat FROM dev)
        |SELECT digit, n, obs_ppm, exp_ppm, dev, tot.benford_stat
        |FROM dev CROSS JOIN tot ORDER BY digit""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val exp = typedLit(AnalyticsQueries.BenfordPpm)
      val digits = Tables.load(s, dir, "orders")
        .select(round($"o_totalprice" * 100, 0).cast("long").as("c"))
        .where($"c" >= 1L)
        .select(substring($"c".cast("string"), 1, 1).cast("long")
          .as("digit"))
        .groupBy($"digit").agg(count(lit(1)).as("n"))
      val tot = digits.agg(sum($"n").as("__t"))
      val dev = digits.crossJoin(broadcast(tot))
        .select($"digit", $"n",
          div($"n" * 1000000L, $"__t").as("obs_ppm"),
          element_at(exp, $"digit".cast("int")).as("exp_ppm"))
        .withColumn("dev",
          div(($"obs_ppm" - $"exp_ppm") * ($"obs_ppm" - $"exp_ppm"),
            $"exp_ppm"))
      val stat = dev.agg(sum($"dev").as("benford_stat"))
      dev.crossJoin(broadcast(stat)).orderBy($"digit")
    },

    // Rank-biased overlap (Webber 2010) between two corpus rankings —
    // "how much do two ranking functions agree, top-weighted": by
    // n_chars vs by token count, truncated at depth 50, p = 0.9. Each
    // side is a TakeOrdered top-50 (never a global row_number at
    // scale); the joint doc's contribution is ONE literal-table lookup
    // (RboSuffixMilli) — the Σ_d w_d·|A_d∩B_d|/d double sum folded
    // per-doc at plan-build time.
    GraftQuery(
      "q199_rbo",
      s"""WITH base AS (
        |  SELECT doc_id, n_chars,
        |    len(string_split_regex(text, '\\s+')) AS n_tok
        |  FROM documents),
        |ta AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS ra
        |  FROM base ORDER BY n_chars DESC, doc_id LIMIT 50),
        |tb AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY n_tok DESC, doc_id) AS rb
        |  FROM base ORDER BY n_tok DESC, doc_id LIMIT 50),
        |j AS (
        |  SELECT GREATEST(ra, rb) AS m,
        |    ${AnalyticsQueries.RboSuffixMilli.mkString("[", ", ", "]")}
        |      AS s
        |  FROM ta JOIN tb USING (doc_id))
        |SELECT COUNT(*) AS n_joint,
        |  CAST(COALESCE(SUM(s[m]), 0) // 1000 AS BIGINT) AS rbo_ppm
        |FROM j""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val suffix = typedLit(AnalyticsQueries.RboSuffixMilli)
      val base = Tables.load(s, dir, "documents")
        .select($"doc_id", $"n_chars",
          size(graft.ops.TextOps.tokenize($"text")).cast("long")
            .as("n_tok"))
      // bounded-domain contract: the rank windows run AFTER limit(50)
      // (TakeOrdered cuts in parallel; the window sees ≤50 rows)
      val wa = Window.orderBy($"n_chars".desc, $"doc_id")
      val ta = base.orderBy($"n_chars".desc, $"doc_id").limit(50)
        .withColumn("ra", row_number().over(wa))
        .select($"doc_id", $"ra")
      val wb = Window.orderBy($"n_tok".desc, $"doc_id")
      val tb = base.orderBy($"n_tok".desc, $"doc_id").limit(50)
        .withColumn("rb", row_number().over(wb))
        .select($"doc_id", $"rb")
      ta.join(tb, Seq("doc_id"))
        .select(greatest($"ra", $"rb").as("m"))
        .agg(count(lit(1)).as("n_joint"),
          div(coalesce(sum(element_at(suffix, $"m".cast("int"))),
            lit(0L)), lit(1000L)).as("rbo_ppm"))
    },

    // Gains/lift table (score-decile model readout): fixed-width score
    // buckets, per-bucket empirical positive rate and lift vs the base
    // rate, cumulative capture walking from the top bucket down — the
    // campaign-targeting chart. One corpus pass to the ≤10-row bucket
    // table; rates/lift/capture are windows over that domain, no
    // corpus-sized window anywhere.
    GraftQuery(
      "q207_gains_lift",
      """WITH b AS (
        |  SELECT LEAST(n_chars // 100, 9) AS bin,
        |    COUNT(*) AS n,
        |    COUNT(*) FILTER (lang = 'en') AS pos
        |  FROM documents GROUP BY 1),
        |w AS (
        |  SELECT bin, n, pos,
        |    SUM(n) OVER (ORDER BY bin DESC) AS cum_n,
        |    SUM(pos) OVER (ORDER BY bin DESC) AS cum_pos,
        |    SUM(n) OVER () AS tn, SUM(pos) OVER () AS tp
        |  FROM b)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
        |  CAST(pos AS BIGINT) AS pos,
        |  CAST(pos * 1000000 // n AS BIGINT) AS rate_ppm,
        |  CASE WHEN tp > 0 THEN
        |    CAST(pos * tn * 1000 // (n * tp) AS BIGINT) END AS lift_milli,
        |  CASE WHEN tp > 0 THEN
        |    CAST(cum_pos * 1000000 // tp AS BIGINT) END AS capture_ppm,
        |  CAST(cum_n * 1000000 // tn AS BIGINT) AS depth_ppm
        |FROM w ORDER BY bin""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val b = Tables.load(s, dir, "documents")
        .select(least(div($"n_chars", lit(100L)), lit(9L)).as("bin"),
          ($"lang" === "en").as("is_en"))
        .groupBy($"bin")
        .agg(count(lit(1)).as("n"),
          sum(when($"is_en", 1L).otherwise(0L)).as("pos"))
      // bounded-domain contract: the global windows walk the 10 fixed
      // decile BINS (least(… div 100, 9)), never the corpus
      val wCum = Window.orderBy($"bin".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      b.withColumn("cum_n", sum($"n").over(wCum))
        .withColumn("cum_pos", sum($"pos").over(wCum))
        .withColumn("tn", sum($"n").over(wAll))
        .withColumn("tp", sum($"pos").over(wAll))
        .select($"bin", $"n", $"pos",
          div($"pos" * 1000000L, $"n").as("rate_ppm"),
          when($"tp" > 0L, div($"pos" * $"tn" * 1000L, $"n" * $"tp"))
            .as("lift_milli"),
          when($"tp" > 0L, div($"cum_pos" * 1000000L, $"tp"))
            .as("capture_ppm"),
          div($"cum_n" * 1000000L, $"tn").as("depth_ppm"))
        .orderBy($"bin")
    },

    // Per-(type, day) SLA bands: exact nearest-rank p50/p95 of the
    // event value over the per-group VALUE HISTOGRAM (the q163/q168
    // contract: the cumulative walk covers each group's distinct cents
    // values, never its raw rows) — the latency-dashboard readout.
    GraftQuery(
      "q218_sla_bands",
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(round(value*100) AS BIGINT) AS v
        |  FROM events),
        |h AS (
        |  SELECT event_type, day, v, COUNT(*) AS c
        |  FROM e GROUP BY 1, 2, 3),
        |w AS (
        |  SELECT event_type, day, v, c,
        |    SUM(c) OVER (PARTITION BY event_type, day ORDER BY v)
        |      AS cum,
        |    SUM(c) OVER (PARTITION BY event_type, day) AS n
        |  FROM h)
        |SELECT event_type, CAST(day AS BIGINT) AS day,
        |  CAST(MIN(n) AS BIGINT) AS n,
        |  CAST(MIN(CASE WHEN cum * 100 >= n * 50 THEN v END) AS BIGINT)
        |    AS p50_c,
        |  CAST(MIN(CASE WHEN cum * 100 >= n * 95 THEN v END) AS BIGINT)
        |    AS p95_c
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val h = Tables.load(s, dir, "events")
        .select($"event_type",
          div(unix_micros($"ts"), lit(86400000000L)).as("day"),
          round($"value" * 100, 0).cast("long").as("v"))
        .groupBy($"event_type", $"day", $"v")
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy($"event_type", $"day").orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy($"event_type", $"day")
      h.withColumn("cum", sum($"c").over(wCum))
        .withColumn("n", sum($"c").over(wAll))
        .groupBy($"event_type", $"day")
        .agg(min($"n").as("n"),
          min(when($"cum" * 100L >= $"n" * 50L, $"v")).as("p50_c"),
          min(when($"cum" * 100L >= $"n" * 95L, $"v")).as("p95_c"))
        .orderBy($"event_type", $"day")
    },

    // Trimmed mean (drop the bottom/top 5% of ROWS per group) — the
    // robust location estimate that, unlike q163's winsorize, discards
    // the tails entirely. Rank-trimming over the VALUE HISTOGRAM: per
    // distinct value, the kept multiplicity is the overlap of its rank
    // interval (cum−c, cum] with (lo, hi] — pure integer interval
    // arithmetic over the per-group walk, never a corpus row_number.
    GraftQuery(
      "q220_trimmed_mean",
      """WITH c AS (
        |  SELECT l_returnflag AS f,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS v
        |  FROM lineitem),
        |h AS (SELECT f, v, COUNT(*) AS c FROM c GROUP BY 1, 2),
        |w AS (
        |  SELECT f, v, c,
        |    SUM(c) OVER (PARTITION BY f ORDER BY v) AS cum,
        |    SUM(c) OVER (PARTITION BY f) AS n
        |  FROM h),
        |k AS (
        |  SELECT f, v, c, cum, n,
        |    n * 5 // 100 AS lo, n * 95 // 100 AS hi
        |  FROM w)
        |SELECT f AS l_returnflag, CAST(MIN(n) AS BIGINT) AS n,
        |  CAST(MIN(hi) - MIN(lo) AS BIGINT) AS kept,
        |  CAST(SUM(v * GREATEST(0, LEAST(cum, hi)
        |      - GREATEST(cum - c, lo)))
        |    // (MIN(hi) - MIN(lo)) AS BIGINT) AS trimmed_mean_c,
        |  CAST(SUM(v * c) // MIN(n) AS BIGINT) AS mean_c
        |FROM k GROUP BY f ORDER BY f""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val h = Tables.load(s, dir, "lineitem")
        .select($"l_returnflag".as("f"),
          round($"l_extendedprice" * 100, 0).cast("long").as("v"))
        .groupBy($"f", $"v").agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy($"f").orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy($"f")
      h.withColumn("cum", sum($"c").over(wCum))
        .withColumn("n", sum($"c").over(wAll))
        .withColumn("lo", div($"n" * 5L, lit(100L)))
        .withColumn("hi", div($"n" * 95L, lit(100L)))
        .groupBy($"f")
        .agg(min($"n").as("n"),
          (min($"hi") - min($"lo")).as("kept"),
          div(sum($"v" * greatest(lit(0L),
            least($"cum", $"hi") - greatest($"cum" - $"c", $"lo"))),
            min($"hi") - min($"lo")).as("trimmed_mean_c"),
          div(sum($"v" * $"c"), min($"n")).as("mean_c"))
        .select($"f".as("l_returnflag"), $"n", $"kept",
          $"trimmed_mean_c", $"mean_c")
        .orderBy($"l_returnflag")
    },

    // Two-sample Kolmogorov-Smirnov statistic (distribution-shift
    // test, the nonparametric complement to q193's categorical χ²):
    // D = max |F1(x) − F2(x)| over the MERGED VALUE HISTOGRAM,
    // computed exactly as max |cum1·n2 − cum2·n1| in cross-multiplied
    // integers (no fraction ever rounded before the max); one ordered
    // walk over distinct values, never raw rows. Reports D in ppm and
    // the value attaining it.
    GraftQuery(
      "q224_ks_test",
      """WITH h AS (
        |  SELECT n_chars AS v,
        |    COUNT(*) FILTER (lang = 'en') AS c1,
        |    COUNT(*) FILTER (lang <> 'en') AS c2
        |  FROM documents GROUP BY 1),
        |w AS (
        |  SELECT v,
        |    SUM(c1) OVER (ORDER BY v) AS cum1,
        |    SUM(c2) OVER (ORDER BY v) AS cum2,
        |    SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
        |  FROM h),
        |d AS (
        |  SELECT v, n1, n2,
        |    abs(cum1 * n2 - cum2 * n1) AS ds
        |  FROM w),
        |mx AS (SELECT MAX(ds) AS mds FROM d)
        |SELECT CAST(MIN(n1) AS BIGINT) AS n1,
        |  CAST(MIN(n2) AS BIGINT) AS n2,
        |  CAST(MIN(mx.mds) * 1000000 // (MIN(n1) * MIN(n2)) AS BIGINT)
        |    AS ks_ppm,
        |  CAST(MIN(CASE WHEN ds = mx.mds THEN v END) AS BIGINT)
        |    AS v_at_max
        |FROM d CROSS JOIN mx""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      // The merged value domain grows with the corpus — global ordered
      // windows would serialize the histogram through one reducer at
      // scale. Range-partitioned prefix sums (both CDFs in ONE pass) +
      // broadcast 1-row totals compute identical exact values with
      // parallel reducers (VERDICT r7 #2; oracle keeps the windows).
      val h = Tables.load(s, dir, "documents")
        .groupBy($"n_chars".as("v"))
        .agg(sum(when($"lang" === "en", 1L).otherwise(0L)).as("c1"),
          sum(when($"lang" =!= "en", 1L).otherwise(0L)).as("c2"))
      val tot = h.agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
      val d = graft.ops.IdOps
        .prefixSums(h, Seq("c1", "c2"), Seq("cum1", "cum2"),
          inclusive = true, "v")
        .crossJoin(broadcast(tot))
        .withColumn("ds", abs($"cum1" * $"n2" - $"cum2" * $"n1"))
      val mx = d.agg(max($"ds").as("mds"))
      d.crossJoin(broadcast(mx))
        .agg(min($"n1").as("n1"), min($"n2").as("n2"),
          div(min($"mds") * 1000000L, min($"n1") * min($"n2"))
            .as("ks_ppm"),
          min(when($"ds" === $"mds", $"v")).as("v_at_max"))
    },

    // Cross-group quantile matching (batch-effect / shard-calibration
    // correction): map every group value to the POOLED value at the
    // same quantile — per (group, value): strictly-below group rank →
    // pooled rank r = below·N div n_g + 1 → the pooled value whose
    // cumulative rank interval [cum−c+1, cum] contains r. The rank
    // lookup is RangeJoinOps.intervalJoin's bin-bucketed EQUI-join
    // over the rank space (never a per-row inequality join); both
    // histograms are domain-sized.
    GraftQuery(
      "q228_quantile_matching",
      """WITH g AS (
        |  SELECT lang, n_chars AS v, COUNT(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |gw AS (
        |  SELECT lang, v, c,
        |    SUM(c) OVER (PARTITION BY lang ORDER BY v) - c AS below,
        |    SUM(c) OVER (PARTITION BY lang) AS ng
        |  FROM g),
        |p AS (SELECT n_chars AS v, COUNT(*) AS c FROM documents
        |      GROUP BY 1),
        |pw AS (
        |  SELECT v AS mv, c,
        |    SUM(c) OVER (ORDER BY v) - c + 1 AS lo,
        |    SUM(c) OVER (ORDER BY v) AS hi,
        |    SUM(c) OVER () AS n
        |  FROM p),
        |pts AS (
        |  SELECT lang, v, below * (SELECT MIN(n) FROM pw) // ng + 1
        |    AS r
        |  FROM gw)
        |SELECT pts.lang, CAST(pts.v AS BIGINT) AS v,
        |  CAST(pts.r AS BIGINT) AS r, CAST(pw.mv AS BIGINT) AS mapped_v
        |FROM pts JOIN pw ON pts.r >= pw.lo AND pts.r <= pw.hi
        |ORDER BY lang, v""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val docs = Tables.load(s, dir, "documents")
        .select($"lang", $"n_chars".as("v"))
        .graftCheckpoint() // both histograms in one pass each
      val wCumG = Window.partitionBy($"lang").orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAllG = Window.partitionBy($"lang")
      val gw = docs.groupBy($"lang", $"v").agg(count(lit(1)).as("c"))
        .withColumn("below", sum($"c").over(wCumG) - $"c")
        .withColumn("ng", sum($"c").over(wAllG))
      // pooled CDF over the unbounded value domain: range-partitioned
      // prefix sum + broadcast 1-row total, not a global ordered window
      // (VERDICT r7 #2 class)
      val pw0 = docs.groupBy($"v").agg(count(lit(1)).as("c"))
      val totP = pw0.agg(sum($"c").as("n"))
      val pw = graft.ops.IdOps
        .prefixSums(pw0, Seq("c"), Seq("hi"), inclusive = true, "v")
        .withColumn("lo", $"hi" - $"c" + 1L)
        .crossJoin(broadcast(totP))
        .select($"v".as("mv"), $"lo", $"hi", $"n")
      val nScalar = pw.agg(min($"n").as("__n"))
      val pts = gw.crossJoin(broadcast(nScalar))
        .select($"lang", $"v",
          (div($"below" * $"__n", $"ng") + 1L).as("r"))
      graft.ops.RangeJoinOps.intervalJoin(
          pts, pw.select($"mv", $"lo", $"hi"), Seq.empty,
          "r", "lo", "hi", binWidth = 64L)
        .select($"lang", $"v", $"r", $"mv".as("mapped_v"))
        .orderBy($"lang", $"v")
    },

    // Per-group KS drift (each slice vs the REST of the corpus — the
    // q182 per-slice move applied to q224): the exact D needs every
    // group's CDF evaluated at EVERY merged value, so the walk runs
    // over the groups × distinct-values DOMAIN SPINE (a broadcast
    // cross of two bounded dims, q203's shape), with the group CDF
    // carried by a per-group cumulative over the zero-filled spine.
    // Cross-multiplied integers as in q224; one row per group.
    GraftQuery(
      "q233_grouped_ks",
      """WITH h AS (
        |  SELECT lang, n_chars AS v, COUNT(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |vs AS (SELECT DISTINCT n_chars AS v FROM documents),
        |langs AS (SELECT DISTINCT lang FROM documents),
        |ga AS (
        |  SELECT v, SUM(c) AS ca FROM h GROUP BY 1),
        |gaw AS (
        |  SELECT v, SUM(ca) OVER (ORDER BY v) AS cum_all,
        |    SUM(ca) OVER () AS n
        |  FROM ga),
        |sp AS (
        |  SELECT l.lang, s.v, COALESCE(h.c, 0) AS c0
        |  FROM langs l CROSS JOIN vs s
        |  LEFT JOIN h ON h.lang = l.lang AND h.v = s.v),
        |w AS (
        |  SELECT sp.lang, sp.v,
        |    SUM(sp.c0) OVER (PARTITION BY sp.lang ORDER BY sp.v)
        |      AS cumg,
        |    SUM(sp.c0) OVER (PARTITION BY sp.lang) AS ng,
        |    gaw.cum_all, gaw.n
        |  FROM sp JOIN gaw ON gaw.v = sp.v),
        |d AS (
        |  SELECT lang, v, ng, n,
        |    abs(cumg * (n - ng) - (cum_all - cumg) * ng) AS ds
        |  FROM w),
        |mx AS (SELECT lang, MAX(ds) AS mds FROM d GROUP BY 1)
        |SELECT d.lang, CAST(MIN(d.ng) AS BIGINT) AS ng,
        |  CAST(MIN(d.n) - MIN(d.ng) AS BIGINT) AS n_rest,
        |  CASE WHEN MIN(d.ng) > 0 AND MIN(d.ng) < MIN(d.n) THEN
        |    CAST(MIN(mx.mds) * 1000000
        |      // (MIN(d.ng) * (MIN(d.n) - MIN(d.ng))) AS BIGINT)
        |  END AS ks_ppm,
        |  CAST(MIN(CASE WHEN d.ds = mx.mds THEN d.v END) AS BIGINT)
        |    AS v_at_max
        |FROM d JOIN mx ON mx.lang = d.lang
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val docs = Tables.load(s, dir, "documents")
        .select($"lang", $"n_chars".as("v"))
        .graftCheckpoint() // three histogram consumers
      val h = docs.groupBy($"lang", $"v").agg(count(lit(1)).as("c"))
      val vs = docs.select($"v").distinct()
      val langs = docs.select($"lang").distinct()
      // pooled CDF: range-partitioned prefix sum + broadcast total, not
      // a global ordered window over the unbounded value domain
      // (VERDICT r7 #2 class); the per-lang walks below stay windows —
      // they are PARTITIONED by lang
      val gaw0 = docs.groupBy($"v").agg(count(lit(1)).as("ca"))
      val totA = gaw0.agg(sum($"ca").as("n"))
      val gaw = graft.ops.IdOps
        .prefixSums(gaw0, Seq("ca"), Seq("cum_all"), inclusive = true, "v")
        .crossJoin(broadcast(totA))
        .select($"v", $"cum_all", $"n")
      val sp = langs.crossJoin(broadcast(vs))
        .join(h, Seq("lang", "v"), "left")
        .select($"lang", $"v", coalesce($"c", lit(0L)).as("c0"))
      val wCumG = Window.partitionBy($"lang").orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAllG = Window.partitionBy($"lang")
      val d = sp
        .withColumn("cumg", sum($"c0").over(wCumG))
        .withColumn("ng", sum($"c0").over(wAllG))
        .join(gaw, Seq("v"))
        .withColumn("ds",
          abs($"cumg" * ($"n" - $"ng") -
            ($"cum_all" - $"cumg") * $"ng"))
      val mx = d.groupBy($"lang").agg(max($"ds").as("mds"))
      d.join(mx, Seq("lang"))
        .groupBy($"lang")
        .agg(min($"ng").as("ng"),
          (min($"n") - min($"ng")).as("n_rest"),
          when(min($"ng") > 0L && min($"ng") < min($"n"),
            div(min($"mds") * 1000000L,
              min($"ng") * (min($"n") - min($"ng")))).as("ks_ppm"),
          min(when($"ds" === $"mds", $"v")).as("v_at_max"))
        .orderBy($"lang")
    },

    // Decision-theoretic threshold selection: the score threshold
    // maximizing expected profit 5·tp − 1·fp (value-weighted confusion
    // costs) over the q179/q192 cumulative histogram walk — the step
    // AFTER the curves: curves describe, this DECIDES. argmax with a
    // deterministic tiebreak (highest threshold attaining the max);
    // everything over the distinct-score domain.
    GraftQuery(
      "q235_threshold_opt",
      """WITH h AS (
        |  SELECT n_chars AS score,
        |    COUNT(*) FILTER (lang = 'en') AS pos,
        |    COUNT(*) FILTER (lang <> 'en') AS neg
        |  FROM documents GROUP BY 1),
        |pts AS (
        |  SELECT score,
        |    SUM(pos) OVER (ORDER BY score DESC) AS tp,
        |    SUM(neg) OVER (ORDER BY score DESC) AS fp
        |  FROM h),
        |scored AS (
        |  SELECT score, tp, fp, 5*tp - fp AS profit FROM pts),
        |mx AS (SELECT MAX(profit) AS mp FROM scored)
        |SELECT CAST(MAX(CASE WHEN profit = mx.mp THEN score END)
        |    AS BIGINT) AS best_threshold,
        |  CAST(MIN(mx.mp) AS BIGINT) AS best_profit,
        |  CAST(MAX(CASE WHEN profit = mx.mp THEN tp END) AS BIGINT)
        |    AS tp_at_best,
        |  CAST(MAX(CASE WHEN profit = mx.mp THEN fp END) AS BIGINT)
        |    AS fp_at_best
        |FROM scored CROSS JOIN mx""".stripMargin) { (s, dir) =>
      import s.implicits._
      val h = Tables.load(s, dir, "documents")
        .groupBy($"n_chars".as("score"))
        .agg(sum(when($"lang" === "en", 1L).otherwise(0L)).as("pos"),
          sum(when($"lang" =!= "en", 1L).otherwise(0L)).as("neg"))
      // descending cumulative counts via range-partitioned prefix sums
      // (negated key) — the score domain grows with the corpus, so no
      // global ordered window (VERDICT r7 #2 class; oracle keeps the
      // window formulation)
      val scored = graft.ops.IdOps.prefixSums(
          h.withColumn("__ns", -$"score"),
          Seq("pos", "neg"), Seq("tp", "fp"), inclusive = true, "__ns")
        .drop("__ns")
        .withColumn("profit", lit(5L) * $"tp" - $"fp")
      val mx = scored.agg(max($"profit").as("mp"))
      scored.crossJoin(broadcast(mx))
        .agg(max(when($"profit" === $"mp", $"score"))
            .as("best_threshold"),
          min($"mp").as("best_profit"),
          max(when($"profit" === $"mp", $"tp")).as("tp_at_best"),
          max(when($"profit" === $"mp", $"fp")).as("fp_at_best"))
    },

    // Mean reciprocal rank (search-eval companion to q191's NDCG):
    // per source, the first relevant doc's rank in the n_chars-desc
    // ordering → rr_ppm = 1e6 div rank; plus the corpus MRR as an
    // in-plan 1-row scalar. Rank windows per group, ties pinned.
    GraftQuery(
      "q238_mrr",
      """WITH r AS (
        |  SELECT source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rk,
        |    lang = 'en' AS rel
        |  FROM documents),
        |fr AS (
        |  SELECT source, MIN(CASE WHEN rel THEN rk END) AS first_rel
        |  FROM r GROUP BY 1),
        |rr AS (
        |  SELECT source, first_rel,
        |    CASE WHEN first_rel IS NOT NULL
        |      THEN 1000000 // first_rel END AS rr_ppm
        |  FROM fr),
        |m AS (
        |  SELECT CAST(SUM(COALESCE(rr_ppm, 0)) // COUNT(*) AS BIGINT)
        |    AS mrr_ppm
        |  FROM rr)
        |SELECT rr.source, CAST(rr.first_rel AS BIGINT) AS first_rel,
        |  CAST(rr.rr_ppm AS BIGINT) AS rr_ppm, m.mrr_ppm
        |FROM rr CROSS JOIN m ORDER BY rr.source""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val w = Window.partitionBy($"source")
        .orderBy($"n_chars".desc, $"doc_id")
      val fr = Tables.load(s, dir, "documents")
        .withColumn("rk", row_number().over(w).cast("long"))
        .groupBy($"source")
        .agg(min(when($"lang" === "en", $"rk")).as("first_rel"))
        .withColumn("rr_ppm",
          when($"first_rel".isNotNull, div(lit(1000000L), $"first_rel")))
      val m = fr.agg(
        div(sum(coalesce($"rr_ppm", lit(0L))), count(lit(1)))
          .as("mrr_ppm"))
      fr.crossJoin(broadcast(m))
        .select($"source", $"first_rel", $"rr_ppm", $"mrr_ppm")
        .orderBy($"source")
    },

    // Cohen's kappa inter-rater agreement (label-quality eval for
    // annotation pipelines): two deterministic raters over documents
    // (lang = en vs n_chars ≥ 300), exact integer ppm — po, pe from
    // the 2×2 confusion counts, κ = (po − pe)·1e6 div (1e6 − pe). One
    // row; one map-side-combined aggregate.
    GraftQuery(
      "q253_cohens_kappa",
      """WITH c AS (
        |  SELECT
        |    COUNT(*) FILTER (lang = 'en' AND n_chars >= 300) AS n11,
        |    COUNT(*) FILTER (lang = 'en' AND n_chars < 300) AS n10,
        |    COUNT(*) FILTER (lang <> 'en' AND n_chars >= 300) AS n01,
        |    COUNT(*) FILTER (lang <> 'en' AND n_chars < 300) AS n00,
        |    COUNT(*) AS n
        |  FROM documents),
        |p AS (
        |  SELECT n11, n10, n01, n00, n,
        |    (n11 + n00) * 1000000 // n AS po_ppm,
        |    ((n11 + n10) * (n11 + n01)
        |      + (n01 + n00) * (n10 + n00)) * 1000000 // (n * n) AS pe_ppm
        |  FROM c)
        |SELECT CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
        |  CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
        |  CAST(po_ppm AS BIGINT) AS po_ppm, CAST(pe_ppm AS BIGINT) AS pe_ppm,
        |  CASE WHEN pe_ppm < 1000000 THEN
        |    CAST((po_ppm - pe_ppm) * 1000000 // (1000000 - pe_ppm)
        |      AS BIGINT) END AS kappa_ppm
        |FROM p""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val a = $"lang" === "en"
      val b = $"n_chars" >= 300L
      val c = Tables.load(s, dir, "documents").agg(
        sum(when(a && b, 1L).otherwise(0L)).as("n11"),
        sum(when(a && !b, 1L).otherwise(0L)).as("n10"),
        sum(when(!a && b, 1L).otherwise(0L)).as("n01"),
        sum(when(!a && !b, 1L).otherwise(0L)).as("n00"),
        count(lit(1)).as("n"))
      c.select($"n11", $"n10", $"n01", $"n00",
          div(($"n11" + $"n00") * 1000000L, $"n").as("po_ppm"),
          div((($"n11" + $"n10") * ($"n11" + $"n01") +
            ($"n01" + $"n00") * ($"n10" + $"n00")) * 1000000L,
            $"n" * $"n").as("pe_ppm"))
        .withColumn("kappa_ppm",
          when($"pe_ppm" < 1000000L,
            div(($"po_ppm" - $"pe_ppm") * 1000000L,
              lit(1000000L) - $"pe_ppm")))
    },

    // Group-aware train/val/test split (leakage-safe data prep: all of
    // a user's events land in ONE split — the group key is hashed, not
    // the row): 80/10/10 by pure hash, with the no-leakage property
    // itself in the gate (n_users summed across splits must equal the
    // distinct-user count, which the oracle computes independently).
    GraftQuery(
      "q254_group_split",
      s"""WITH tagged AS (
         |  SELECT user_id, event_id,
         |    CASE WHEN h < 8 THEN 'train' WHEN h = 8 THEN 'val'
         |      ELSE 'test' END AS split
         |  FROM (
         |    SELECT user_id, event_id,
         |      ${AnalyticsQueries.duckPolyHash(
               "CAST(user_id AS VARCHAR) || ':split1'")} % 10 AS h
         |    FROM events))
         |SELECT split, COUNT(DISTINCT user_id) AS n_users,
         |  COUNT(*) AS n_events,
         |  CAST(SUM(event_id) AS BIGINT) AS sum_event_ids
         |FROM tagged GROUP BY split ORDER BY split""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val h = pmod(graft.ops.TextOps.polyHash(
        concat($"user_id".cast("string"), lit(":split1"))), lit(10L))
      Tables.load(s, dir, "events")
        .withColumn("split",
          when(h < 8, "train").when(h === 8, "val").otherwise("test"))
        .groupBy($"split")
        .agg(countDistinct($"user_id").as("n_users"),
          count(lit(1)).as("n_events"),
          sum($"event_id").as("sum_event_ids"))
        .orderBy($"split")
    },

    // k-anonymity suppression (privacy-safe aggregate release: a cell
    // backed by fewer than k distinct users identifies them — suppress
    // it and account for the suppression): per (event_type, day) cell,
    // release count + distinct users only when users ≥ 5; suppressed
    // cells collapse into one audit row. Exact distinct counts —
    // map-side-combined two-level aggregate, no window.
    GraftQuery(
      "q264_k_anonymity",
      """WITH cells AS (
        |  SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day,
        |    COUNT(*) AS n_events,
        |    COUNT(DISTINCT user_id) AS n_users
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(day AS BIGINT) AS day,
        |  CAST(n_events AS BIGINT) AS n_events,
        |  CAST(n_users AS BIGINT) AS n_users
        |FROM cells WHERE n_users >= 5
        |UNION ALL
        |SELECT '__suppressed__', -1,
        |  CAST(COALESCE(SUM(n_events), 0) AS BIGINT),
        |  CAST(COUNT(*) AS BIGINT)
        |FROM cells WHERE n_users < 5
        |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val cells = Tables.load(s, dir, "events")
        .select($"event_type", $"user_id",
          div(unix_micros($"ts"), lit(86400000000L)).as("day"))
        .groupBy($"event_type", $"day")
        .agg(count(lit(1)).as("n_events"),
          countDistinct($"user_id").as("n_users"))
        .graftCheckpoint() // released + audit consumers
      val released = cells.filter($"n_users" >= 5)
      val audit = cells.filter($"n_users" < 5)
        .agg(coalesce(sum($"n_events"), lit(0L)).as("n_events"),
          count(lit(1)).as("n_users"))
        .select(lit("__suppressed__").as("event_type"),
          lit(-1L).as("day"), $"n_events", $"n_users")
      released.unionByName(audit).orderBy($"event_type", $"day")
    },

    // KV-cache prefix-sharing readout (serving-time batching prep:
    // sort prompts lexicographically and adjacent requests share
    // radix-tree cache prefixes — this measures the savings within the
    // first 64 chars, a cache-block-sized window that also bounds the
    // per-pair cost): docs in (text, id) order, per adjacent pair the
    // shared prefix length (downward-closed, so count-of-equal-prefixes
    // = LCP), histogrammed. Global order comes from
    // IdOps.contiguousIds (range-partitioned, multi-reducer); adjacency
    // is the rank self-EQUI-join (rank = rank + 1), never a global lag
    // window. The oracle replays with the one-reducer window rank.
    GraftQuery(
      "q265_prefix_sharing",
      """WITH o AS (
        |  SELECT text, row_number() OVER (ORDER BY text, doc_id) - 1
        |    AS rk
        |  FROM documents),
        |pairs AS (
        |  SELECT a.text AS ta, b.text AS tb
        |  FROM o a JOIN o b ON b.rk = a.rk + 1),
        |lcp AS (
        |  SELECT len(list_filter(
        |    generate_series(1, LEAST(64, len(ta), len(tb))),
        |    i -> ta[1:i] = tb[1:i])) AS l
        |  FROM pairs)
        |SELECT CAST(l AS BIGINT) AS lcp, COUNT(*) AS n_pairs
        |FROM lcp GROUP BY l ORDER BY lcp""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ranked = IdOps.contiguousIds(
        Tables.load(s, dir, "documents").select($"text", $"doc_id"),
        "rk", "text", "doc_id")
      val a = ranked.select($"rk", $"text".as("ta"))
      val b = ranked.select(($"rk" - 1L).as("rk"), $"text".as("tb"))
      // NB sequence(1, 0) in Spark yields [1, 0] (auto-negative step),
      // not empty — guard the empty-text bound explicitly
      val bound = least(lit(64), length($"ta"), length($"tb")).cast("int")
      a.join(b, Seq("rk"))
        .select(size(filter(
          when(bound > 0, sequence(lit(1), bound))
            .otherwise(array().cast("array<int>")),
          i => $"ta".substr(lit(1), i) === $"tb".substr(lit(1), i)))
          .cast("long").as("lcp"))
        .groupBy($"lcp").agg(count(lit(1)).as("n_pairs"))
        .orderBy($"lcp")
    })
}

/** SQL texts that run verbatim on BOTH engines (Spark executes them and
  * DuckDB oracles them) — keep to the common ANSI surface. */
private object AnalyticsSql {
  val CorrelatedSubquery: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(round(o_totalprice*100) AS BIGINT) AS price_c
      |FROM orders o
      |WHERE CAST(round(o_totalprice*100) AS BIGINT) *
      |    (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |  > 2 * (SELECT CAST(SUM(CAST(round(o2.o_totalprice*100) AS BIGINT))
      |           AS BIGINT)
      |         FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  val RecursiveHours: String =
    """WITH RECURSIVE hours(h) AS (
      |  SELECT CAST(0 AS BIGINT)
      |  UNION ALL
      |  SELECT h + 1 FROM hours WHERE h < 23)
      |SELECT h.h AS hr, COUNT(e.event_id) AS n_events
      |FROM hours h LEFT JOIN events e ON EXTRACT(HOUR FROM e.ts) = h.h
      |GROUP BY h.h ORDER BY h.h""".stripMargin

  /** DuckDB replay of GraphOps.pageRank at 3 iterations: same BIGINT
    * division order at every step (base uses mass//N FIRST, contrib is
    * r//deg then summed, dangling redistributes as dang//N).
    */
  /** 2 unrolled synchronous-LPA rounds over the part co-occurrence
    * graph — replays GraphOps.labelPropagation exactly (neighbor-label
    * frequency argmax, smallest-label tie-break; the oracle's
    * row_number pick ≡ the engine's algebraic min(struct(−cnt,label))).
    */
  /** Shared CTE body (op → pairs → e → 2 LPA rounds → l2) so q275's
    * modularity oracle reuses the IDENTICAL community assignment.
    */
  private val LpaCtes: String =
    """op AS (
      |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
      |pairs AS (
      |  SELECT a.i AS pa, b.i AS pb
      |  FROM op a JOIN op b ON a.b = b.b AND a.i < b.i GROUP BY 1, 2),
      |e AS (SELECT pa AS a, pb AS b FROM pairs
      |      UNION SELECT pb, pa FROM pairs),
      |v1 AS (SELECT a AS id, b AS label, COUNT(*) AS c FROM e GROUP BY 1, 2),
      |l1 AS (SELECT id, label FROM (
      |    SELECT id, label,
      |      row_number() OVER (PARTITION BY id ORDER BY c DESC, label) AS rk
      |    FROM v1) t WHERE rk = 1),
      |v2 AS (SELECT e.a AS id, l1.label, COUNT(*) AS c
      |       FROM e JOIN l1 ON l1.id = e.b GROUP BY 1, 2),
      |l2 AS (SELECT id, label FROM (
      |    SELECT id, label,
      |      row_number() OVER (PARTITION BY id ORDER BY c DESC, label) AS rk
      |    FROM v2) t WHERE rk = 1)""".stripMargin

  val Lpa2: String =
    s"WITH $LpaCtes\nSELECT id, label FROM l2 ORDER BY id"

  /** q275: Newman modularity of the l2 communities over the same
    * graph, exact single-fraction integer form
    * Q_ppm = (4m·Σe_c − Σd_c²)·1e6 // 4m².
    */
  val Modularity: String =
    s"""WITH $LpaCtes,
       |deg AS (SELECT a AS id, COUNT(*) AS d FROM e GROUP BY 1),
       |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pairs),
       |comm AS (
       |  SELECT l.label AS community, COUNT(*) AS n_nodes,
       |    CAST(SUM(COALESCE(deg.d, 0)) AS BIGINT) AS d_sum
       |  FROM l2 l LEFT JOIN deg ON deg.id = l.id GROUP BY 1),
       |intra AS (
       |  SELECT la.label AS community, CAST(COUNT(*) AS BIGINT)
       |    AS e_intra
       |  FROM pairs p JOIN l2 la ON la.id = p.pa
       |    JOIN l2 lb ON lb.id = p.pb
       |  WHERE la.label = lb.label GROUP BY 1),
       |prt AS (
       |  SELECT c.community, c.n_nodes,
       |    COALESCE(i.e_intra, 0) AS e_intra, c.d_sum
       |  FROM comm c LEFT JOIN intra i ON i.community = c.community),
       |qq AS (
       |  SELECT CAST((4 * mm.m * SUM(e_intra)
       |      - CAST(SUM(d_sum * d_sum) AS BIGINT)) * 1000000
       |    // (4 * mm.m * mm.m) AS BIGINT) AS q_ppm
       |  FROM prt CROSS JOIN mm GROUP BY mm.m)
       |SELECT community, CAST(n_nodes AS BIGINT) AS n_nodes,
       |  CAST(e_intra AS BIGINT) AS e_intra, d_sum, qq.q_ppm
       |FROM prt CROSS JOIN qq ORDER BY community""".stripMargin

  /** 2 unrolled HITS rounds over the buyer→supplier graph, integer
    * ppm with L∞ normalization — replays GraphOps.hits bit-for-bit.
    */
  val Hits2: String =
    """WITH e AS (
      |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
      |a1s AS (SELECT dst AS id, CAST(SUM(CAST(1000000 AS BIGINT)) AS BIGINT) AS s
      |        FROM e GROUP BY 1),
      |a1 AS (SELECT n.id, COALESCE(a1s.s, 0) AS s
      |       FROM nodes n LEFT JOIN a1s USING (id)),
      |a1n AS (SELECT id, s*1000000//(SELECT MAX(s) FROM a1) AS s FROM a1),
      |h1s AS (SELECT e.src AS id, CAST(SUM(a.s) AS BIGINT) AS s
      |        FROM e JOIN a1n a ON a.id = e.dst GROUP BY 1),
      |h1 AS (SELECT n.id, COALESCE(h1s.s, 0) AS s
      |       FROM nodes n LEFT JOIN h1s USING (id)),
      |h1n AS (SELECT id, s*1000000//(SELECT MAX(s) FROM h1) AS s FROM h1),
      |a2s AS (SELECT e.dst AS id, CAST(SUM(h.s) AS BIGINT) AS s
      |        FROM e JOIN h1n h ON h.id = e.src GROUP BY 1),
      |a2 AS (SELECT n.id, COALESCE(a2s.s, 0) AS s
      |       FROM nodes n LEFT JOIN a2s USING (id)),
      |a2n AS (SELECT id, s*1000000//(SELECT MAX(s) FROM a2) AS s FROM a2),
      |h2s AS (SELECT e.src AS id, CAST(SUM(a.s) AS BIGINT) AS s
      |        FROM e JOIN a2n a ON a.id = e.dst GROUP BY 1),
      |h2 AS (SELECT n.id, COALESCE(h2s.s, 0) AS s
      |       FROM nodes n LEFT JOIN h2s USING (id)),
      |h2n AS (SELECT id, s*1000000//(SELECT MAX(s) FROM h2) AS s FROM h2),
      |sc AS (SELECT n.id, h.s AS hub_ppm, a.s AS auth_ppm
      |       FROM nodes n JOIN h2n h USING (id) JOIN a2n a USING (id))
      |SELECT * FROM (
      |  SELECT 'supplier' AS node_type, id AS node_id,
      |    auth_ppm AS score_ppm,
      |    CAST(row_number() OVER (ORDER BY auth_ppm DESC, id) AS BIGINT)
      |      AS rank
      |  FROM sc WHERE id LIKE 's%'
      |  UNION ALL
      |  SELECT 'customer', id, hub_ppm,
      |    CAST(row_number() OVER (ORDER BY hub_ppm DESC, id) AS BIGINT)
      |  FROM sc WHERE id LIKE 'c%') t
      |WHERE rank <= 10 ORDER BY node_type, rank""".stripMargin

  val PageRank3: String = {
    val iterCtes = (1 to 3).map { k =>
      val prev = if (k == 1) "r0" else s"r${k - 1}"
      s"""dang$k AS (
         |  SELECT CAST(COALESCE(SUM(r), 0) AS BIGINT) AS dang FROM $prev
         |  WHERE id NOT IN (SELECT src FROM deg)),
         |in$k AS (
         |  SELECT e.dst AS id, CAST(SUM(p.r // d.deg) AS BIGINT) AS in_sum
         |  FROM e JOIN deg d ON e.src = d.src JOIN $prev p ON p.id = e.src
         |  GROUP BY e.dst),
         |r$k AS (
         |  SELECT n.id, CAST(
         |    (SELECT ((1000000 - 850000) * (1000000000000 // p.n)) // 1000000
         |     FROM params p)
         |    + (850000 * (COALESCE(i.in_sum, CAST(0 AS BIGINT))
         |       + (SELECT d.dang // p.n FROM dang$k d, params p)))
         |      // 1000000 AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN in$k i ON n.id = i.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT 'o' || CAST(l_orderkey AS STRING) AS src,
       |    'p' || CAST(l_partkey AS STRING) AS dst
       |  FROM lineitem),
       |nodes AS (
       |  SELECT DISTINCT id FROM (
       |    SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
       |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
       |params AS (SELECT COUNT(*) AS n FROM nodes),
       |r0 AS (
       |  SELECT id, (SELECT 1000000000000 // p.n FROM params p) AS r
       |  FROM nodes),
       |$iterCtes
       |SELECT id, r FROM r3
       |ORDER BY r DESC, id LIMIT 100""".stripMargin
  }

  /** DuckDB replay of GraphOps.personalizedPageRank at 3 iterations:
    * the PageRank3 loop with seed-conditional restart — base and
    * dangling shares go to the seed set (mass//S), non-seeds get 0,
    * ranks start at mass//S on seeds and 0 elsewhere.
    */
  val PprSeeded3: String = {
    val iterCtes = (1 to 3).map { k =>
      val prev = if (k == 1) "r0" else s"r${k - 1}"
      s"""dang$k AS (
         |  SELECT CAST(COALESCE(SUM(r), 0) AS BIGINT) AS dang FROM $prev
         |  WHERE id NOT IN (SELECT src FROM deg)),
         |in$k AS (
         |  SELECT e.dst AS id, CAST(SUM(p.r // d.deg) AS BIGINT) AS in_sum
         |  FROM e JOIN deg d ON e.src = d.src JOIN $prev p ON p.id = e.src
         |  GROUP BY e.dst),
         |r$k AS (
         |  SELECT n.id, CAST(
         |    (CASE WHEN n.id IN (SELECT id FROM seeds)
         |       THEN (SELECT ((1000000 - 850000) * (1000000000000 // p.s))
         |               // 1000000 FROM params p)
         |       ELSE 0 END)
         |    + (850000 * (COALESCE(i.in_sum, CAST(0 AS BIGINT))
         |       + (CASE WHEN n.id IN (SELECT id FROM seeds)
         |            THEN (SELECT d.dang // p.s FROM dang$k d, params p)
         |            ELSE 0 END)))
         |      // 1000000 AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN in$k i ON n.id = i.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT 'o' || CAST(l_orderkey AS STRING) AS src,
       |    'p' || CAST(l_partkey AS STRING) AS dst
       |  FROM lineitem),
       |nodes AS (
       |  SELECT DISTINCT id FROM (
       |    SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
       |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
       |seeds AS (
       |  SELECT DISTINCT 'o' || CAST(l_orderkey AS STRING) AS id
       |  FROM lineitem WHERE l_orderkey % 97 = 0),
       |params AS (SELECT COUNT(*) AS s FROM seeds),
       |r0 AS (
       |  SELECT id, CASE WHEN id IN (SELECT id FROM seeds)
       |    THEN (SELECT 1000000000000 // p.s FROM params p)
       |    ELSE CAST(0 AS BIGINT) END AS r
       |  FROM nodes),
       |$iterCtes
       |SELECT id, r FROM r3
       |ORDER BY r DESC, id LIMIT 100""".stripMargin
  }
}
