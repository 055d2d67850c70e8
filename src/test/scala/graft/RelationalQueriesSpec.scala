package graft

import graft.queries.RelationalQueries

/** Smoke + semantic checks for the relational conformance suite.
  * Value-level equivalence vs DuckDB is checked by tools/check_oracle.py
  * (and the driver's t2 gate); here we assert structure and invariants.
  */
class RelationalQueriesSpec extends SparkTestBase {

  test("every relational query runs and returns rows at sf0.001") {
    RelationalQueries.all.foreach { q =>
      val df = q.build(spark, sfDir)
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }

  test("q01 groups are the returnflag x linestatus combinations") {
    val df = RelationalQueries.all.find(_.name == "q01_pricing_summary").get
      .build(spark, sfDir)
    val flags = df.select("l_returnflag").collect().map(_.getString(0)).toSet
    assert(flags.subsetOf(Set("A", "N", "R")))
  }

  test("q05 top-k is sorted descending by total_c") {
    val rows = RelationalQueries.all.find(_.name == "q05_topk_orders").get
      .build(spark, sfDir).collect()
    val totals = rows.map(_.getAs[Long]("total_c")).toSeq
    assert(totals == totals.sorted.reverse)
    assert(rows.length == 10)
  }

  test("q06 emits exactly one row per customer with orders") {
    val df = RelationalQueries.all
      .find(_.name == "q06_latest_order_per_customer").get.build(spark, sfDir)
    import org.apache.spark.sql.functions._
    val dups = df.groupBy("o_custkey").count().filter(col("count") > 1).count()
    assert(dups == 0)
  }

  test("q15 upsert-latest yields one row per user") {
    val df = RelationalQueries.all
      .find(_.name == "q15_upsert_latest_per_key").get.build(spark, sfDir)
    assert(df.select("user_id").distinct().count() == df.count())
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys with matching names") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
  }
}
