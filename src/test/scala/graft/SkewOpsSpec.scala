package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewOps

class SkewOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedEquiJoin equals the plain join on skewed data " +
       "(one key owns 90% of rows)") {
    val big = (1 to 2000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 7}" else "hot"
      (k, i.toLong)
    }.toDF("k", "v")
    val small = (Seq("hot") ++ (0 until 7).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim$i") }.toDF("k", "d")
    val plain = big.join(small, Seq("k"))
      .orderBy("k", "v").collect().toSeq
    val salted = SkewOps.saltedEquiJoin(big, small, Seq("k"), nSalts = 8)
      .select(big.columns.map(col) :+ col("d"): _*)
      .orderBy("k", "v").collect().toSeq
    assert(salted === plain)
    // the salted plan must actually spread the hot key across salts
    val spread = SkewOps.saltedEquiJoin(big, small, Seq("k"), 8)
      .groupBy().agg(countDistinct(xxhash64(col("v")) % 8)).head.getLong(0)
    assert(spread > 1)
  }

  test("saltedCollectList merges per-salt partials into the exact " +
       "sorted whole") {
    val df = (1 to 500).map(i => ("hot", i.toLong)).toDF("k", "v")
      .unionByName(Seq(("cold", 1L)).toDF("k", "v"))
    val out = SkewOps.saltedCollectList(df, "k", "v", nSalts = 4)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(out("hot") === (1L to 500L))
    assert(out("cold") === Seq(1L))
  }

  test("AQE skew join: the runtime re-planner splits a hot partition " +
       "without manual salting (the complement to saltedEquiJoin)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force a sort-merge join and make "skewed" reachable at test
      // scale: any partition over 32 KiB counts as skewed
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val hot = (1 to 60000).map(i =>
        (if (i % 100 == 0) i.toLong % 7 else 0L,
          "payload-%06d".format(i))).toDF("k", "pay")
      val dim = (0L to 6L).map(k => (k, s"dim$k")).toDF("k", "d")
      val joined = hot.join(dim, Seq("k"))
      joined.collect() // run so AQE finalizes the plan
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
