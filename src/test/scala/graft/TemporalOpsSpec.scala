package graft

import org.apache.spark.sql.Row
import graft.ops.TemporalOps

/** asofJoin edge semantics against hand-computed expectations, plus a
  * differential check vs a naive per-row scan on random data.
  */
class TemporalOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("backward as-of: equal ts matches, no-match keeps nulls, " +
       "latest-not-any right row wins") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "ts", "lv")
    val right = Seq((1L, 10L, 100L), (1L, 15L, 150L), (2L, 9L, 900L))
      .toDF("k", "ts", "rv")
    val got = TemporalOps.asofJoin(
        left, right, Seq("k"), "ts", "ts", matchedTsCol = Some("rts"))
      .orderBy($"k", $"ts")
      .as[(Long, Long, String, Option[Long], Option[Long])].collect().toSeq
    assert(got === Seq(
      (1L, 10L, "a", Some(100L), Some(10L)), // equal ts → matches
      (1L, 20L, "b", Some(150L), Some(15L)), // latest at-or-before, not first
      (2L, 5L, "c", None, None)))            // right is later → no match
  }

  test("forward as-of mirrors backward") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b")).toDF("k", "ts", "lv")
    val right = Seq((1L, 12L, 120L), (1L, 20L, 200L)).toDF("k", "ts", "rv")
    val got = TemporalOps.asofJoin(
        left, right, Seq("k"), "ts", "ts", direction = "forward")
      .orderBy($"ts")
      .as[(Long, Long, String, Option[Long])].collect().toSeq
    assert(got === Seq(
      (1L, 10L, "a", Some(120L)),  // earliest at-or-after
      (1L, 20L, "b", Some(200L)))) // equal ts → matches
  }

  test("null right-payload values don't stitch values across right rows") {
    val left = Seq((1L, 30L, "a")).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, 10L, Option(5L), Option("early")),
      (1L, 20L, Option.empty[Long], Option("late")))
      .toDF("k", "ts", "rv", "tag")
    val got = TemporalOps.asofJoin(left, right, Seq("k"), "ts", "ts")
      .select($"rv", $"tag").as[(Option[Long], String)].head()
    // the matched row is (20, null, "late") — rv must be null, NOT 5
    assert(got === ((None, "late")))
  }

  test("differential: asofJoin equals a naive nearest-scan on random " +
       "data, both directions, multiple seeds") {
    for (seed <- Seq(7, 13, 99); direction <- Seq("backward", "forward")) {
      val rnd = new scala.util.Random(seed)
      val left = (1 to 300).map(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      val right = (1 to 200).map(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong * 2 + 1, i * 10L))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (k,ts)
      val lDf = left.toDF("k", "ts", "lid")
      val rDf = right.toDF("k", "ts", "rid")
      val got = TemporalOps.asofJoin(
          lDf, rDf, Seq("k"), "ts", "ts", direction = direction,
          matchedTsCol = Some("rts"))
        .select($"k", $"ts", $"lid", $"rid", $"rts")
        .as[(Long, Long, Long, Option[Long], Option[Long])]
        .collect().toSet
      val expected = left.map { case (k, ts, lid) =>
        val cand = right.filter(r => r._1 == k)
        val best =
          if (direction == "backward") cand.filter(_._2 <= ts).sortBy(_._2).lastOption
          else cand.filter(_._2 >= ts).sortBy(_._2).headOption
        (k, ts, lid, best.map(_._3), best.map(_._2))
      }.toSet
      assert(got === expected, s"seed=$seed direction=$direction")
    }
  }

  test("asofJoin plan shuffles once on the key (no range-join explosion)") {
    val e = Tables.load(spark, sfDir, "events")
    val l = e.filter($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id")
    val r = e.filter($"event_type" === "click")
      .select($"user_id", unix_micros($"ts").as("cts_us"),
        $"event_id".as("click_id"))
    val p = TemporalOps.asofJoin(l, r, Seq("user_id"), "ts_us", "cts_us")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("Join"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("intervalJoin equals the naive inequality join, incl. boundary " +
       "points and bin-straddling intervals") {
    import graft.ops.RangeJoinOps
    val rnd = new scala.util.Random(11)
    val points = (1 to 400).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(500).toLong, i.toLong))
      .toDF("k", "t", "pid")
    val intervals = (1 to 120).map { i =>
      val s = rnd.nextInt(500).toLong
      (rnd.nextInt(4).toLong, s, s + rnd.nextInt(120).toLong, i.toLong)
    }.toDF("k", "s", "e", "iid")
    // binWidth 64 « max interval span 120 → every interval spans bins
    val got = RangeJoinOps.intervalJoin(
        points, intervals, Seq("k"), "t", "s", "e", binWidth = 64)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val naive = points.as("p")
      .join(intervals.as("i"),
        $"p.k" === $"i.k" && $"p.t" >= $"i.s" && $"p.t" <= $"i.e")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("intervalJoin plans as an equi-join on (key, bin), not a " +
       "nested-loop over all pairs") {
    import graft.ops.RangeJoinOps
    val points = Seq((1L, 5L)).toDF("k", "t")
    val intervals = Seq((1L, 0L, 10L)).toDF("k", "s", "e")
    val p = RangeJoinOps.intervalJoin(
        points, intervals, Seq("k"), "t", "s", "e", binWidth = 16)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
  }

  test("mergeRollup: empty delta is identity; empty prev equals delta; " +
       "disjoint keys union through") {
    val prev = Seq((1L, 10L, 2L), (2L, 5L, 1L)).toDF("k", "v", "n")
    val delta = Seq((2L, 3L, 1L), (3L, 7L, 4L)).toDF("k", "v", "n")
    val empty = prev.limit(0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k").as[(Long, Long, Long)].collect().toSeq
    assert(rows(TemporalOps.mergeRollup(prev, empty, Seq("k"), Seq("v", "n")))
      === Seq((1L, 10L, 2L), (2L, 5L, 1L)))
    assert(rows(TemporalOps.mergeRollup(empty, delta, Seq("k"), Seq("v", "n")))
      === Seq((2L, 3L, 1L), (3L, 7L, 4L)))
    assert(rows(TemporalOps.mergeRollup(prev, delta, Seq("k"), Seq("v", "n")))
      === Seq((1L, 10L, 2L), (2L, 8L, 2L), (3L, 7L, 4L)))
  }

  test("intervalUnion: overlapping intervals merge, touching intervals " +
       "merge ([start,end) semantics), disjoint stay islands, and " +
       "covered length never double-counts") {
    val iv = Seq(
      // key a: [0,10) ∪ [5,20) ∪ [20,25) -> one island [0,25);
      //        [40,50) disjoint -> second island
      ("a", 0L, 10L), ("a", 5L, 20L), ("a", 20L, 25L), ("a", 40L, 50L),
      // key b: nested [0,100) ⊃ [10,20) ⊃ [12,14) -> one island, 100
      ("b", 0L, 100L), ("b", 10L, 20L), ("b", 12L, 14L),
      // key c: exact duplicates collapse into one island
      ("c", 3L, 7L), ("c", 3L, 7L))
      .toDF("k", "s", "e")
    val got = TemporalOps.intervalUnion(iv, "k", "s", "e")
      .orderBy("k").as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("a", 4L, 2L, 35L), ("b", 3L, 1L, 100L), ("c", 2L, 1L, 4L)))
    // naive Σ(end-start) would say 40 for key a — the double count
    assert(got.head._4 < 40L)
  }

  test("intervalUnion: result is partitioning-invariant and ignores " +
       "input row order") {
    val rnd = new scala.util.Random(7)
    val rows = for (k <- Seq("x", "y"); _ <- 1 to 50) yield {
      val s = rnd.nextInt(1000).toLong
      (k, s, s + 1 + rnd.nextInt(60).toLong)
    }
    val base = TemporalOps.intervalUnion(
        rows.toDF("k", "s", "e"), "k", "s", "e")
      .as[(String, Long, Long, Long)].collect().toSet
    val shuffled = TemporalOps.intervalUnion(
        scala.util.Random.shuffle(rows).toDF("k", "s", "e")
          .repartition(7), "k", "s", "e")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(base === shuffled)
    // referee: driver-side sweep per key
    val expected = rows.groupBy(_._1).map { case (k, v) =>
      val sorted = v.map(t => (t._2, t._3)).sorted
      var islands = List.empty[(Long, Long)]
      for ((s, e) <- sorted) islands match {
        case (is, ie) :: rest if s <= ie =>
          islands = (is, math.max(ie, e)) :: rest
        case _ => islands = (s, e) :: islands
      }
      (k, v.size.toLong, islands.size.toLong,
        islands.map(i => i._2 - i._1).sum)
    }.toSet
    assert(base === expected)
  }

  private def unix_micros(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.unix_micros(c)
}
