package graft

import org.apache.spark.sql.functions._
import graft.ops.LinkageOps
import graft.ops.LinkageOps.FieldRule

class LinkageOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val rules = Seq(
    FieldRule("name", "name_a", "name_b", 1, 4000L, -2000L),
    FieldRule("city", "city_a", "city_b", 0, 3000L, -1500L))

  test("fellegi-sunter: agreement per rule, summed score, thresholded " +
       "decision; nulls never agree") {
    val pairs = Seq(
      (1L, "ann", "ann", "rome", "rome"),     // all agree: 7000 match
      (2L, "ann", "anx", "rome", "oslo"),     // lev 1 name only: 2500
      (3L, "ann", "zzz", "rome", "oslo"),     // none: -3500 nonmatch
      (4L, null.asInstanceOf[String], "ann", "rome", "rome") // null name
    ).toDF("id", "name_a", "name_b", "city_a", "city_b")
    val got = LinkageOps.fellegiSunterScore(pairs, rules, 5000L, 0L)
      .select($"id", $"agree_name", $"agree_city", $"score_milli",
        $"decision")
      .as[(Long, Boolean, Boolean, Long, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, true, true, 7000L, "match")))
    assert(got(2L) === ((2L, true, false, 2500L, "possible")))
    assert(got(3L) === ((3L, false, false, -3500L, "nonmatch")))
    assert(got(4L) === ((4L, false, true, 1000L, "possible")))
  }

  test("scoring is a pure per-row map: no exchange added over the input") {
    val pairs = Seq((1L, "a", "a", "b", "b"))
      .toDF("id", "name_a", "name_b", "city_a", "city_b")
    val plan = LinkageOps.fellegiSunterScore(pairs, rules, 5000L, 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
