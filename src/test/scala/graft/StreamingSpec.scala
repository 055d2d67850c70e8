package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreamOps
import graft.streaming.EventStreamOps.Event

/** MemoryStream-driven checks of the streaming operators (SURVEY §5.5). */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("tumbling window counts with watermark: late row within delay " +
       "lands in its window; aggregates finalize on watermark advance") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreamOps.tumblingCounts(
        mem.toDF(), windowDur = "1 minute", watermarkDelay = "2 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, 10, "click", 1.0, ts(10)),
        Event(2, 10, "click", 2.0, ts(30)),
        Event(3, 11, "view", 1.0, ts(70)))
      q.processAllAvailable()
      // late-but-in-horizon event for the first window
      mem.addData(Event(4, 12, "click", 3.0, ts(50)))
      q.processAllAvailable()
      // push watermark far past both windows so they close
      mem.addData(Event(5, 13, "view", 1.0, ts(1000)))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .orderBy("window_start", "event_type")
        .select($"event_type", $"n", $"total_value")
        .as[(String, Long, Double)].collect()
      assert(rows.contains(("click", 3L, 6.0))) // late row counted
      assert(rows.contains(("view", 1L, 1.0)))
    } finally q.stop()
  }

  test("too-late rows beyond the watermark are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreamOps.tumblingCounts(
        mem.toDF(), windowDur = "1 minute", watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("latedrop")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Event(1, 1, "click", 1.0, ts(60)))
      q.processAllAvailable()
      mem.addData(Event(2, 1, "click", 1.0, ts(600))) // watermark → 540
      q.processAllAvailable()
      mem.addData(Event(3, 1, "click", 9.0, ts(30)))  // far below watermark
      q.processAllAvailable()
      mem.addData(Event(4, 1, "click", 1.0, ts(1200)))
      q.processAllAvailable()
      val total = spark.table("latedrop")
        .select($"total_value").as[Double].collect().sum
      assert(total === 2.0) // the 9.0 event never lands
    } finally q.stop()
  }

  test("sessionize: event-time inactivity gap emits one session per user " +
       "with accumulated counters once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreamOps.sessionize(mem.toDS(), gapMs = 5000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, 1, "click", 1.0, ts(10)),
        Event(2, 1, "click", 2.5, ts(11)),
        Event(3, 2, "view", 1.0, ts(12)))
      q.processAllAvailable()
      // advance the watermark far past lastTs+gap for users 1 and 2
      mem.addData(Event(4, 3, "click", 1.0, ts(100)))
      q.processAllAvailable()
      val sessions = spark.table("sessions")
        .as[EventStreamOps.SessionOut].collect()
        .map(s => s.user_id -> ((s.n_events, s.total_value))).toMap
      assert(sessions.get(1L).contains((2L, 3.5)))
      assert(sessions.get(2L).contains((1L, 1.0)))
      assert(!sessions.contains(3L)) // still open
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups replayed event ids") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreamOps.dedupInStream(mem.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Event(1, 1, "click", 1.0, ts(10)))
      q.processAllAvailable()
      mem.addData(Event(1, 1, "click", 1.0, ts(10))) // exact replay
      mem.addData(Event(2, 1, "view", 1.0, ts(11)))
      q.processAllAvailable()
      assert(spark.table("dedup").count() === 2)
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to in-window " +
       "clicks of the same user only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventStreamOps.clickAttribution(
        clicks.toDF(), purchases.toDF(),
        windowDur = "1 minute", watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(
        Event(10, 1, "click", 0.0, ts(100)),  // in window of purchase@130
        Event(11, 1, "click", 0.0, ts(20)),   // too old (>1 min before)
        Event(12, 2, "click", 0.0, ts(120)))  // other user
      purchases.addData(Event(50, 1, "purchase", 9.99, ts(130)))
      q.processAllAvailable()
      // advance both watermarks so the joined results finalize
      clicks.addData(Event(13, 9, "click", 0.0, ts(1000)))
      purchases.addData(Event(51, 9, "purchase", 1.0, ts(1000)))
      q.processAllAvailable()
      val rows = spark.table("attrib")
        .select($"user_id", $"purchase_id", $"click_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(rows.contains((1L, 50L, 10L)))
      assert(!rows.exists(_._3 == 11L), rows) // stale click not attributed
      assert(!rows.exists(r => r._1 == 2L), rows) // cross-user never joins
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER attribution: matched purchases join " +
       "their click; organic purchases emit NULL-extended only after " +
       "the click watermark passes their window") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventStreamOps.clickAttributionOuter(
        clicks.toDF(), purchases.toDF(),
        windowDur = "1 minute", watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(Event(10, 1, "click", 0.0, ts(100)))
      purchases.addData(
        Event(50, 1, "purchase", 9.99, ts(130)), // matches click 10
        Event(60, 2, "purchase", 5.00, ts(130))) // organic — no click
      q.processAllAvailable()
      val early = spark.table("attrib_outer")
        .select($"purchase_id").as[Long].collect().toSet
      assert(!early.contains(60L),
        "organic row must NOT emit before the watermark closes its window")
      // advance both watermarks far past purchase 60's window
      clicks.addData(Event(13, 9, "click", 0.0, ts(1000)))
      purchases.addData(Event(51, 9, "purchase", 1.0, ts(1000)))
      q.processAllAvailable()
      val rows = spark.table("attrib_outer")
        .select($"purchase_id", $"click_id")
        .as[(Long, Option[Long])].collect().toSet
      assert(rows.contains((50L, Some(10L))), rows)
      assert(rows.contains((60L, None)),
        s"organic purchase must surface null-extended: $rows")
    } finally q.stop()
  }

  test("stream-static enrichment: dim attributes attach per micro-batch; " +
       "unmatched streamed rows survive null-extended") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((10L, "gold"), (11L, "basic"))
      .toDF("user_id", "tier")
    val mem = MemoryStream[Event]
    val q = EventStreamOps.enrichWithDim(mem.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, 10, "click", 1.0, ts(10)),
        Event(2, 99, "click", 1.0, ts(20))) // no dim row
      q.processAllAvailable()
      mem.addData(Event(3, 11, "view", 1.0, ts(30))) // second batch joins too
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select($"event_id", $"tier").as[(Long, Option[String])]
        .collect().toMap
      assert(rows(1L) === Some("gold"))
      assert(rows(2L) === None)    // left-outer: kept, null-extended
      assert(rows(3L) === Some("basic"))
    } finally q.stop()
  }

  test("transformWithState dedup: first occurrence emitted, duplicates " +
       "suppressed within a batch AND across query RESTARTS (RocksDB " +
       "state restored from checkpoint; TimeMode.None harness mode)") {
    implicit val sqlCtx = spark.sqlContext
    val conf = spark.conf
    val savedProvider = conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_tws_ckpt").toString
    val mem = MemoryStream[Event]
    // ttlMs = 0 -> TimeMode.None: no timer micro-batches, so
    // AvailableNow drains pending offsets and terminates
    // deterministically (ProcessingTime mode schedules timer batches
    // forever -- see the op's scaladoc). The second run restores the
    // seen-set from the checkpoint -- cross-RESTART dedup, the
    // stronger durability property.
    // parquet sink, not memory: only fault-tolerant sinks support
    // restart-from-checkpoint, which is the property under test
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_tws_out").toString + "/data"
    def drain(): Seq[Long] = {
      val q = EventStreamOps.dedupWithTtlState(
          mem.toDS(), e => s"${e.user_id}|${e.event_type}",
          ttlMs = 0L)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(outDir).select($"event_id")
        .as[Long].collect().sorted.toSeq
    }
    try {
      mem.addData(
        Event(1, 10, "click", 1.0, ts(10)),
        Event(2, 10, "click", 2.0, ts(11)), // same-batch dup
        Event(3, 11, "view", 1.0, ts(12)))
      assert(drain() === Seq(1L, 3L))
      mem.addData(
        Event(4, 10, "click", 3.0, ts(500)), // dup vs RESTORED state
        Event(5, 10, "view", 1.0, ts(501)))  // new key
      // cumulative file-sink contents: 4 suppressed via restored state
      assert(drain() === Seq(1L, 3L, 5L))
    } finally {
      savedProvider match {
        case Some(v) => conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming incremental dedup: per-batch probe of the stored LSH " +
       "index then index REFRESH accumulates exactly the one-shot pair " +
       "set (the production daily-increment loop, as a real stream)") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    import graft.ops.{BucketingOps, DedupOps, TextOps}
    val big = 1 << 20 // bound off: exactness is the point of this test
    val sig = DedupOps.minhashSignatures(
        Tables.load(spark, sfDir, "documents")
          .select($"doc_id", TextOps.shingleHashes($"text", 3).as("hashes")),
        "doc_id", "hashes", 16)
      .localCheckpoint()
    val idx = "graft_streamdedup_lsh_idx"
    BucketingOps.writeBucketed(
      DedupOps.lshBandKeyTable(
        sig.filter($"doc_id" < 300), "doc_id", "sig", bands = 4, rows = 4),
      idx, Seq("band", "bh"), nBuckets = 4)
    val accepted = scala.collection.mutable.Set[(Long, Long)]()
    accepted ++= DedupOps.lshCandidatePairs(
        sig.filter($"doc_id" < 300), "doc_id", "sig", 4, 4, big)
      .as[(Long, Long)].collect()
    // the arriving-docs stream: one parquet file per accepted batch
    val dir = java.nio.file.Files
      .createTempDirectory("graft_streamdedup").toString
    val sigSchema = sig.schema
    def stage(lo: Long, hi: Long): Unit = sig
      .filter($"doc_id" >= lo && $"doc_id" < hi)
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    stage(300, 400)
    val q = spark.readStream.schema(sigSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val pinned = batch.localCheckpoint()
        // read the index through the BATCH's session: foreachBatch runs
        // in a session clone, and V1 table plans (file listings) are
        // cached per session — the outer session's cache would serve a
        // listing that predates the previous batch's refresh
        accepted ++= DedupOps.lshCandidatePairsIncrementalIndexed(
            batch.sparkSession.table(idx), pinned, "doc_id", "sig", 4, 4, big)
          .as[(Long, Long)].collect()
        DedupOps.refreshLshIndex(idx, pinned, "doc_id", "sig", 4, 4, 4)
      }
      .start()
    try {
      q.processAllAvailable()
      stage(400, 500)
      q.processAllAvailable()
    } finally q.stop()
    val oneShot = DedupOps.lshCandidatePairs(
        sig.filter($"doc_id" < 500), "doc_id", "sig", 4, 4, big)
      .as[(Long, Long)].collect().toSet
    assert(accepted.toSet === oneShot)
  }

  test("streaming classifier inference: the hashed linear classifier " +
       "scores a document stream per micro-batch, bit-identical to " +
       "batch (stateless scan-stage scoring is the streaming-safe " +
       "serving face; the NB apply with its per-doc aggregate is the " +
       "batch face)") {
    import graft.ops.ClassifierOps
    implicit val sqlCtx = spark.sqlContext
    val w = ClassifierOps.knuthWeights(64)
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "lazy dog"),
      (3L, "spark stream batch window"), (4L, ""))
    val mem = MemoryStream[(Long, String)]
    val q = ClassifierOps.classify(
        mem.toDF().toDF("doc_id", "text"),
        "doc_id", "text", w, 100L, "t1")
      .writeStream.format("memory").queryName("scored_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(docs.take(2): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("scored_stream")
        .select($"doc_id", $"n_feats", $"score_micro", $"label")
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = ClassifierOps.classify(
          docs.toDF("doc_id", "text"), "doc_id", "text", w, 100L, "t1")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed.size === 4)
    } finally q.stop()
  }
}
