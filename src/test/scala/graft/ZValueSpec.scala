package graft

import org.apache.spark.sql.functions._
import graft.ops.LayoutOps

class ZValueSpec extends SparkTestBase {
  import spark.implicits._

  test("zInterleave: known Morton values and null propagation") {
    val df = Seq(
      (Some(0L), Some(0L)), (Some(1L), Some(0L)), (Some(0L), Some(1L)),
      (Some(5L), Some(3L)), (Some((1L << 21) - 1), Some((1L << 21) - 1)),
      (None: Option[Long], Some(1L))
    ).toDF("a", "b")
    val out = df.select(LayoutOps.zValue($"a", $"b", 21)).collect()
    assert(out(0).getLong(0) === 0L)
    assert(out(1).getLong(0) === 1L)   // a bit 0 -> position 0
    assert(out(2).getLong(0) === 2L)   // b bit 0 -> position 1
    assert(out(3).getLong(0) === 27L)  // 101 x 011 -> 011011
    assert(out(4).getLong(0) === (1L << 42) - 1) // all 42 bits set
    assert(out(5).isNullAt(0), "null input must propagate")
  }

  test("zInterleave roundtrip: de-interleaving the Morton key recovers " +
       "both inputs exactly (bijectivity over the bit budget)") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)(
      (rnd.nextLong().abs % (1L << 21), rnd.nextLong().abs % (1L << 21)))
    pairs.foreach { case (a, b) =>
      val z = graft.functions.ZInterleave.compute(a, b, 21)
      var (ra, rb) = (0L, 0L)
      (0 until 21).foreach { i =>
        ra |= ((z >> (2 * i)) & 1L) << i
        rb |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(ra === a && rb === b, s"roundtrip failed for ($a, $b)")
    }
  }

  test("native zInterleave matches the HOF fold on the real key space") {
    val mismatch = Tables.load(spark, sfDir, "lineitem")
      .select($"l_partkey".as("a"), $"l_suppkey".as("b"))
      .filter(
        LayoutOps.zValue($"a", $"b", 21) =!=
          LayoutOps.zValueHof($"a", $"b", 21))
      .count()
    assert(mismatch === 0L)
  }

  test("zorderBy clusters both dimensions: per-file bounding boxes are " +
       "far smaller than the global key range") {
    val df = Tables.load(spark, sfDir, "lineitem")
      .select($"l_partkey".as("a"), $"l_suppkey".as("b"))
    val parts = LayoutOps.zorderBy(df, "a", "b", 21, numFiles = 8)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max($"a") - min($"a")).as("da"), (max($"b") - min($"b")).as("db"))
      .collect()
    val Seq(ga, gb) = df.agg(
      max($"a") - min($"a"), max($"b") - min($"b"))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toSeq
    // 8 z-range files over 2 dims: the AREA of the average per-file
    // bounding box must be well under the global box (per-dimension
    // bounds are meaningless when one key range is tiny, as suppkey is
    // at small SF)
    val avgArea = parts.map(r =>
      (r.getAs[Long]("da").toDouble + 1) * (r.getAs[Long]("db") + 1))
      .sum / parts.length
    val globalArea = (ga.toDouble + 1) * (gb + 1)
    assert(avgArea < globalArea * 0.5,
      s"z-order gave no locality: avg box area $avgArea vs global $globalArea")
  }
}
