package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * All engine operators are schema-parameterized (see `graft.ops`); these
  * helpers only bind them to the TPC-H-ish conformance tables.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark 4 only reads as
    // a nanos-since-epoch LongType behind this legacy flag. We convert to a
    // proper TimestampType (µs) right at the source; integer DIV avoids the
    // double-precision loss a plain `/ 1000` would introduce on 1.7e18 ns.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
    else df
  }
}
