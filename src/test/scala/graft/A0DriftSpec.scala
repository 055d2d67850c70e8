package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Always-first schema-drift tripwire (VERDICT r6 #3).
  *
  * The testdata under /root/testdata is driver-owned and was regenerated
  * once with a different physical schema (events.ts TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS)), which silently broke 19 oracle gates for a round.
  * This suite is cheap (<30 s), alphabetically first, and fails with the
  * offending table + dtype named, so the next drift costs one log line.
  */
class A0DriftSpec extends SparkTestBase {

  test("every conformance table loads with the expected dtypes") {
    Tables.validate(spark, sfDir)
  }

  test("normalizeTs maps all three historical ts encodings to one instant") {
    import spark.implicits._
    // 2023-11-14T22:13:20.123456Z as micros / nanos / NTZ wall-time (UTC
    // session, so the NTZ cast is instant-preserving).
    val us = 1700000000123456L
    val fromLongNs = Tables.normalizeTs(Seq(us * 1000).toDF("ts"))
    val fromNtz = Tables.normalizeTs(
      Seq(us).toDF("u").select(timestamp_micros(col("u"))
        .cast(TimestampNTZType).as("ts")))
    val fromTz = Tables.normalizeTs(
      Seq(us).toDF("u").select(timestamp_micros(col("u")).as("ts")))
    for (df <- Seq(fromLongNs, fromNtz, fromTz)) {
      assert(df.schema("ts").dataType == TimestampType)
      assert(df.select(unix_micros(col("ts"))).head.getLong(0) == us)
    }
  }

  test("a retyped ts fixture fails loudly, not silently") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("drift").toString
    // Simulate the next driver regeneration picking yet another encoding.
    Seq(1.5d).toDF("ts").write.parquet(s"$tmp/events.parquet")
    val e = intercept[IllegalStateException] {
      Tables.load(spark, tmp, "events")
    }
    assert(e.getMessage.contains("DoubleType"))
  }
}
