package graft

import org.apache.spark.sql.functions._
import graft.ops.ProfileOps

class ProfileOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    (1L, Some("en"), "a"), (2L, Some("en"), "b"), (3L, Some("ru"), "a"),
    (4L, None, "a"), (5L, Some("en"), "c"), (6L, Some("de"), "a"),
    (7L, None, "b"), (8L, Some("en"), "a"))

  test("profile matches per-column brute force (nulls, distinct, " +
       "min/max, ordered top-3 with ties broken by value)") {
    val df = rows.toDF("id", "lang", "tag")
    val got = ProfileOps.profile(df, Seq("id", "lang", "tag"))
      .as[(String, Long, Long, Long, String, String, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keys.toSet === Set("id", "lang", "tag"))
    assert(got("id") === (("id", 8L, 0L, 8L, "1", "8", "1:1|2:1|3:1")))
    // lang: 2 nulls excluded from distinct/min/max/top; en=4 de=1 ru=1,
    // tie de/ru broken by value
    assert(got("lang") === (("lang", 8L, 2L, 3L, "de", "ru",
      "en:4|de:1|ru:1")))
    assert(got("tag") === (("tag", 8L, 0L, 3L, "a", "c", "a:5|b:2|c:1")))
  }

  test("profile is partitioning-invariant and two-level top-k agrees " +
       "with a single global ranking on a hot column") {
    val hot = (1 to 500).map(i => (i.toLong, s"v${i % 7}")).toDF("id", "v")
    val a = ProfileOps.profile(hot, Seq("v"), topK = 3, fanout = 8)
      .collect().toSeq
    val b = ProfileOps.profile(hot.repartition(13), Seq("v"),
      topK = 3, fanout = 1) // fanout 1 = single-level ranking
    assert(a === b.collect().toSeq)
  }
}
