package graft

import org.apache.spark.sql.functions._
import graft.ops.AssocOps

class AssocOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("itemLift: hand-computed lift, minCo pruning, duplicate " +
       "(basket,item) rows collapse") {
    // 4 baskets; {1,2} co-occur in 2 of them, c(1)=3, c(2)=2 →
    // lift = 2·4·1e6 / (3·2) = 1333333
    val rows = Seq(
      (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L), (13L, 3L), (13L, 4L),
      (10L, 1L)) // duplicate line item must not double-count
    val got = AssocOps.itemLift(rows.toDF("b", "i"), "b", "i", minCo = 2)
      .select($"item_a", $"item_b", $"co", $"c_a", $"c_b", $"lift_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 2L, 2L, 3L, 2L, 1333333L)))
    // minCo=1 admits the single-basket pairs too
    val all = AssocOps.itemLift(rows.toDF("b", "i"), "b", "i", minCo = 1)
      .select($"item_a", $"item_b").as[(Long, Long)].collect().toSet
    assert(all === Set((1L, 2L), (1L, 3L), (3L, 4L)))
  }

  test("itemLift: brute-force referee across partitionings; maxBasket " +
       "drops degenerate baskets entirely") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 300).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(12).toLong))
    val op = rows.distinct
    val baskets = op.groupBy(_._1).map { case (_, v) => v.map(_._2).toSet }
    val items = op.map(_._2).distinct
    val n = baskets.size.toLong
    val cnt = items.map(i => i -> baskets.count(_.contains(i)).toLong).toMap
    val expected = (for {
      a <- items; b <- items; if a < b
      co = baskets.count(s => s.contains(a) && s.contains(b)).toLong
      if co >= 2
    } yield (a, b) -> ((co, co * n * 1000000L / (cnt(a) * cnt(b))))).toMap
    Seq(1, 7).foreach { p =>
      val got = AssocOps.itemLift(
          rows.toDF("b", "i").repartition(p), "b", "i", minCo = 2)
        .select($"item_a", $"item_b", $"co", $"lift_ppm")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      assert(got === expected, s"partitions=$p")
    }
    // a basket over the cap contributes NO pairs, NO supports, and does
    // not count toward N (boilerplate mega-basket philosophy)
    val withMega = rows ++ (100L to 120L).map(i => (99L, i))
    val capped = AssocOps.itemLift(
      withMega.toDF("b", "i"), "b", "i", minCo = 2, maxBasket = 15)
      .select($"item_a", $"item_b", $"co", $"lift_ppm")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(capped === expected)
  }
}
