package graft

import org.apache.spark.sql.functions._
import graft.ops.BucketingOps

/** Bucketed-layout plan properties: once both sides are bucketed (and
  * sorted) on the join key, joins and aggregations on that key run with
  * no shuffle — the physical plans prove it.
  */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  private val nBuckets = 4

  /** Run `body` with broadcast joins off so the shuffle (or its absence)
    * is what the plan shows — at sf0.001 everything would broadcast —
    * and with bucketed-scan output ordering on (Spark ≥3.0 hides bucket
    * sort order behind this flag; our writer guarantees its one-file-
    * per-bucket sorted precondition).
    */
  private def withoutBroadcast[A](body: => A): A = {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach { case (k, p) =>
      p.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  private lazy val setup: Unit = {
    val orders = Tables.load(spark, sfDir, "orders")
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    BucketingOps.writeBucketed(
      orders.select($"o_orderkey", $"o_custkey", $"o_totalprice"),
      "orders_b", Seq("o_orderkey"), nBuckets)
    BucketingOps.writeBucketed(
      lineitem.select($"l_orderkey".as("o_orderkey"), $"l_extendedprice"),
      "lineitem_b", Seq("o_orderkey"), nBuckets)
  }

  test("bucketed fact-to-fact join has no Exchange and no Sort") {
    setup
    withoutBroadcast {
      val joined = BucketingOps.bucketedJoin(
        spark, "lineitem_b", "orders_b", Seq("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p)
      assert(!p.contains("Sort "), p) // write-time sortBy pre-sorts buckets
      // and it's the same rows as the plain join over raw parquet
      val raw = Tables.load(spark, sfDir, "lineitem")
        .select($"l_orderkey".as("o_orderkey"), $"l_extendedprice")
        .join(Tables.load(spark, sfDir, "orders")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice"),
          Seq("o_orderkey"))
      assert(joined.count() === raw.count())
      // decimal sum: order-independent, unlike IEEE double addition
      def centsSum(df: org.apache.spark.sql.DataFrame) =
        df.agg(sum($"l_extendedprice".cast("decimal(18,2)"))).head.getDecimal(0)
      assert(centsSum(joined) === centsSum(raw))
    }
  }

  test("aggregation on the bucket key skips its shuffle") {
    setup
    val agg = spark.table("lineitem_b")
      .groupBy($"o_orderkey")
      .agg(sum($"l_extendedprice").as("rev"))
    val p = agg.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    // same result as the shuffled aggregation over raw parquet
    val rawAgg = Tables.load(spark, sfDir, "lineitem")
      .groupBy($"l_orderkey".as("o_orderkey"))
      .agg(sum($"l_extendedprice").as("rev"))
    assert(agg.count() === rawAgg.count())
  }

  test("un-bucketed side still shuffles (the layout, not luck, removes it)") {
    setup
    withoutBroadcast {
      val raw = Tables.load(spark, sfDir, "orders")
        .select($"o_orderkey", $"o_totalprice")
      val p = spark.table("lineitem_b")
        .join(raw, Seq("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(p.contains("Exchange"), p)
    }
  }
}
