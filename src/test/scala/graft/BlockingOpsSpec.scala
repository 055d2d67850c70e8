package graft

import org.apache.spark.sql.functions._
import graft.ops.BlockingOps

/** Sorted-neighborhood blocking: the candidate set is exactly the
  * rank-window pairs, invariant in input partitioning, complete when
  * the window covers the whole input, and O(n·w)-bounded.
  */
class BlockingOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def names =
    Tables.load(spark, sfDir, "part").select($"p_name").distinct()

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.select($"p_name_a", $"p_name_b").as[(String, String)].collect().toSet

  test("sorted-neighborhood pairs equal the rank-window referee, " +
       "invariant under input partitioning") {
    val w = 5
    val sorted = names.as[String].collect().sorted
    val referee = (for {
      i <- sorted.indices
      j <- (i + 1) to math.min(i + w, sorted.length - 1)
    } yield (sorted(i), sorted(j))).toSet
    val got = pairsOf(BlockingOps.sortedNeighborhoodPairs(names, w, "p_name"))
    assert(got === referee)
    assert(got.size <= sorted.length.toLong * w)
    val repart = pairsOf(BlockingOps.sortedNeighborhoodPairs(
      names.repartition(13), w, "p_name"))
    assert(repart === referee)
  }

  test("window covering the whole input degenerates to the complete " +
       "all-pairs set (every match reachable at w = n)") {
    val small = names.orderBy($"p_name").limit(40)
    val vals = small.as[String].collect().sorted
    val all = (for {
      i <- vals.indices; j <- (i + 1) until vals.length
    } yield (vals(i), vals(j))).toSet
    assert(pairsOf(BlockingOps.sortedNeighborhoodPairs(
      small, vals.length, "p_name")) === all)
  }

  test("reserved-column and argument guards") {
    intercept[IllegalArgumentException] {
      BlockingOps.sortedNeighborhoodPairs(names, 0, "p_name")
    }
    intercept[IllegalArgumentException] {
      BlockingOps.sortedNeighborhoodPairs(
        names.withColumn("__idx", lit(1L)), 5, "p_name")
    }
  }

  test("multi-pass blocking: union of the per-pass pair sets with " +
       "canonical orientation, and the reversed-key pass recovers a " +
       "pair a leading typo scatters") {
    // 'aaaa9' vs 'zaaa9': a FIRST-character difference — far apart in
    // the forward sort, adjacent in the reversed sort
    val rows = Seq("aaaa9", "bcde1", "fghi2", "jklm3", "nopq4",
      "rstu5", "vwxy6", "zaaa9")
      .toDF("name").withColumn("rev", reverse($"name"))
    val fwd = BlockingOps.sortedNeighborhoodPairs(rows, 1, "name")
      .select($"name_a", $"name_b").as[(String, String)].collect().toSet
    assert(!fwd.contains(("aaaa9", "zaaa9")))
    val multi = BlockingOps.sortedNeighborhoodPairsMultiPass(
        rows, 1, "name", Seq(Seq("name"), Seq("rev")))
      .select($"name_a", $"name_b").as[(String, String)].collect().toSet
    assert(multi.contains(("aaaa9", "zaaa9")))
    // equivalence with the hand-built union (canonicalized on name)
    val rev = BlockingOps.sortedNeighborhoodPairs(rows, 1, "rev")
      .select(least($"name_a", $"name_b"), greatest($"name_a", $"name_b"))
      .as[(String, String)].collect().toSet
    assert(multi === (fwd ++ rev))
  }
}
