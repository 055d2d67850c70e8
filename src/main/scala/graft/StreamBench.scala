package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Sustained-rate readout for the CDC path (round-8 VERDICT task #6):
  * drain the whole sf events table through both CDC faces at the
  * reference daemon's own batch-size tunables (daemon.py:397-400,
  * `--pg-batch`/`--es-batch` default 1000) and report events/s —
  *
  *  - `batch_loop`: the q149 end-to-end shape — Keyset.nextBatch →
  *    latest-per-key reduce → UpsertSink bucket rewrite per tick
  *    (source + transform + sink, the full pipeline rate);
  *  - `dsv2_parquet`: the engine-trigger face — the DSv2 KeysetSource
  *    micro-batch stream appending to a parquet file sink under a real
  *    streaming checkpoint (source-side sustained rate).
  *
  * Prints one JSON line and writes `_streambench.json`; recorded in
  * BASELINE.md. Both paths assert they drained exactly the table's
  * row count — a silent under-delivery can't report a rate.
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-stream-bench")
    spark.sparkContext.setLogLevel("WARN")
    Tables.validate(spark, sfDir)

    val events = Tables.load(spark, sfDir, "events")
      .withColumn("did", lpad(col("event_id").cast("string"), 12, "0"))
    val total = events.count()

    // string-keyed physical copy for the DSv2 source (it watches a
    // parquet dir; the keyset tiebreaker must be a string column)
    val srcDir =
      Files.createTempDirectory("graft_sb_src").toString + "/events"
    events.write.parquet(srcDir)

    def batchLoop(batchSize: Int): Double = {
      import graft.cdc.{Keyset, UpsertSink}
      import org.apache.spark.sql.expressions.Window
      val tmp = Files.createTempDirectory("graft_sb_loop").toString
      val store =
        new UpsertSink(spark, s"$tmp/store", "user_id", nBuckets = 32)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")).desc, col("did").desc)
      var cur = Keyset.Cursor.Zero
      var n = 0L
      val t0 = System.nanoTime()
      var done = false
      while (!done) {
        val (batch, next) =
          Keyset.nextBatch(events, "ts", "did", cur, batchSize)
        if (next == cur) done = true
        else {
          val b = batch.localCheckpoint() // pin: the sink must not re-scan
          n += b.count()
          store.upsert(b.withColumn("rk", row_number().over(w))
            .filter(col("rk") === 1).drop("rk"))
          cur = next
        }
      }
      val sec = (System.nanoTime() - t0) / 1e9
      require(n == total, s"batch loop drained $n of $total rows")
      sec
    }

    def dsv2(batchSize: Int): Double = {
      val ckpt = Files.createTempDirectory("graft_sb_ckpt").toString
      val out = Files.createTempDirectory("graft_sb_out").toString + "/o"
      val t0 = System.nanoTime()
      val q = spark.readStream
        .format(classOf[graft.streaming.KeysetSourceProvider].getName)
        .option("path", srcDir)
        .option("tsCol", "ts")
        .option("idCol", "did")
        .option("batchSize", batchSize.toString)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      val n = spark.read.parquet(out).count()
      require(n == total, s"DSv2 stream drained $n of $total rows")
      sec
    }

    val batches = Seq(1000, 10000)
    val loops = batches.map(b => b -> batchLoop(b))
    val streams = batches.map(b => b -> dsv2(b))
    def fmt(r: (Int, Double)) =
      s""""${r._1}":{"sec":${r._2},""" +
        s""""events_per_sec":${(total / r._2).toLong}}"""
    val json =
      s"""{"metric":"cdc_throughput","rows":$total,""" +
        s""""batch_loop":{${loops.map(fmt).mkString(",")}},""" +
        s""""dsv2_parquet":{${streams.map(fmt).mkString(",")}},""" +
        s""""sf":"$sfDir"}"""
    println(json)
    Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_STREAMBENCH_OUT", "_streambench.json")),
      json + "\n")
    spark.stop()
  }
}
