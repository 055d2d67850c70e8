package graft

import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/** Multi-index Hamming-ball pairs (DedupOps.hammingNeighborPairs):
  * brute-force referee equality on random signatures through both the
  * cold (bucket clique) and hot (second-level pigeonhole refinement)
  * paths, degenerate all-identical input, and partitioning invariance.
  */
class HammingPairsSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(
      sigs: Seq[(Long, Long)], maxDist: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, ba) <- sigs; (ib, bb) <- sigs if ia < ib
      d = java.lang.Long.bitCount(ba ^ bb) if d <= maxDist
    } yield (ia, ib, d.toLong)).toSet

  private def run(
      sigs: Seq[(Long, Long)], maxDist: Int, totalBits: Int,
      hotCap: Int, parts: Int = 4): Set[(Long, Long, Long)] =
    DedupOps.hammingNeighborPairs(
        sigs.toDF("id", "bits").repartition(parts),
        "id", "bits", maxDist, totalBits, hotCap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("referee equality across maxDist and both bucket paths") {
    val rnd = new scala.util.Random(3)
    // clustered signatures (few base patterns + small perturbations)
    // so band buckets genuinely exceed small hotCaps
    val bases = Seq.fill(4)(rnd.nextLong() & 0xFFFFFFFFL)
    val sigs = Seq.tabulate(200) { i =>
      val b = bases(i % bases.length)
      val flipped = (0 until rnd.nextInt(3)).foldLeft(b)((acc, _) =>
        acc ^ (1L << rnd.nextInt(32)))
      (i.toLong, flipped)
    }
    for (maxDist <- 1 to 4; hotCap <- Seq(4, 1000)) {
      val expected = brute(sigs, maxDist)
      val got = run(sigs, maxDist, 32, hotCap)
      assert(got == expected,
        s"maxDist=$maxDist hotCap=$hotCap: " +
          s"${(got -- expected).size} extra, ${(expected -- got).size} missing")
    }
  }

  test("all-identical signatures: complete clique at distance zero") {
    val sigs = Seq.tabulate(40)(i => (i.toLong, 0xABCDL))
    val got = run(sigs, maxDist = 2, totalBits = 32, hotCap = 8)
    assert(got.size == 40 * 39 / 2)
    assert(got.forall(_._3 == 0L))
  }

  test("wider signatures (48-bit) and uneven band splits") {
    val rnd = new scala.util.Random(9)
    val sigs = Seq.tabulate(120) { i =>
      (i.toLong, rnd.nextLong() & 0xFFFFFFFFFFFFL)
    }
    // 48 bits over maxDist=2 → 3 bands of 16; maxDist=4 → 5 uneven bands
    for (maxDist <- Seq(2, 4)) {
      assert(run(sigs, maxDist, 48, hotCap = 4) == brute(sigs, maxDist))
    }
  }

  test("each qualifying pair appears exactly once (no band duplicates)") {
    val sigs = Seq.tabulate(60)(i => (i.toLong, (i % 5).toLong))
    val rows = DedupOps.hammingNeighborPairs(
        sigs.toDF("id", "bits"), "id", "bits", maxDist = 3,
        totalBits = 32, hotCap = 4)
      .groupBy($"id_a", $"id_b").agg(count(lit(1)).as("n"))
      .filter($"n" > 1).count()
    assert(rows == 0L)
  }

  test("duplicate (id, bits) input rows do not duplicate output pairs " +
       "(ADVICE r7: the value-level rewrite dedups its membership table)") {
    val base = Seq.tabulate(20)(i => (i.toLong, (i % 4).toLong))
    val dup = base ++ base ++ base.take(7) // heavy row duplication
    val rows = DedupOps.hammingNeighborPairs(
        dup.toDF("id", "bits"), "id", "bits", maxDist = 3,
        totalBits = 32, hotCap = 4)
      .groupBy($"id_a", $"id_b").agg(count(lit(1)).as("n"))
      .filter($"n" > 1).count()
    assert(rows == 0L)
    assert(run(dup, 3, 32, 4) == brute(base, 3),
      "pair SET must equal the deduplicated input's pairs")
  }

  test("partitioning invariance") {
    val rnd = new scala.util.Random(1)
    val sigs = Seq.tabulate(150)(i => (i.toLong, rnd.nextLong() & 0xFFFFL))
    val a = run(sigs, 2, 32, 8, parts = 1)
    val b = run(sigs, 2, 32, 8, parts = 13)
    assert(a == b && a == brute(sigs, 2))
  }
}
