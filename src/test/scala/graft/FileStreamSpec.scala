package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.EventStreamOps

/** readStream → transform → writeStream over the real events table:
  * the streaming answer must converge to the batch answer (S8/T1 in
  * Structured Streaming form, driven by Trigger.AvailableNow).
  */
class FileStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("file-source stream of events.parquet: windowed counts converge " +
       "to the batch result") {
    val batchEvents = Tables.load(spark, sfDir, "events")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema

    // the file stream source needs a directory (streams of arriving
    // files), not one file — stage the fixture into a temp dir
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("part-0.parquet"))

    val streamEvents = Tables.normalizeTs(spark.readStream
      .schema(schema)
      .parquet(streamDir.toString))

    val q = EventStreamOps.tumblingCounts(
        streamEvents, windowDur = "1 day", watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("filestream")
      .outputMode(OutputMode.Complete) // Complete: no watermark wait
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()

    val streamed = spark.table("filestream")
      .groupBy($"event_type").agg(sum($"n").as("n"))
      .as[(String, Long)].collect().toMap
    val batch = batchEvents.groupBy($"event_type")
      .agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(streamed === batch)
  }
}
