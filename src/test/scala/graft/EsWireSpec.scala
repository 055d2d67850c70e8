package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import graft.cdc.{EsBulk, EsStub, EsWire}
import graft.sources.JdbcIO.RetryPolicy

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Live-wire drill for the ES `_bulk` connector (the round-8 VERDICT's
  * last "missing" item): real POSTs against [[EsStub]], asserting the
  * reference daemon's semantics — byte-exact request bodies (the
  * q267-checked rendering), idempotent replay, exponential-backoff
  * retry on 429/5xx/connection faults, whole-batch retry on transient
  * per-item failures, loud non-retryable errors naming ids, and
  * delete's absent-ids-are-ignored contract.
  */
class EsWireSpec extends SparkTestBase {
  import spark.implicits._

  private def causeChain(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")

  test("upsert POSTs byte-exact EsBulk bodies; replay is idempotent; " +
       "read() round-trips the store; missing index reads None") {
    val stub = new EsStub
    try {
      val docs = (1 to 25).map(i => (i.toLong, s"name_$i"))
        .toDF("id", "name")
      val sink = new EsWire.EsDocSink(spark, stub.host, "docs", "id",
        batchSize = 10)
      assert(sink.read() === None) // index not created yet → 404 → None
      sink.upsert(docs)
      // byte-exact: what arrived on the wire IS the q267-checked
      // rendering (same to_json(struct(sorted cols)) the sink uses)
      val expected = EsBulk.bulkBodyStrings(
          docs.select($"id",
            to_json(struct($"id", $"name")).as("__sj")),
          "docs", "id", "__sj", 10)
        .select($"body").as[String].collect().toSet
      assert(expected.size === 3) // 25 docs at batchSize 10
      assert(stub.bodies.asScala.toSet === expected)
      val got = sink.read().get
      assert(got.count() === 25)
      assert(got.select($"id").as[String].collect().toSet ===
        (1 to 25).map(_.toString).toSet)
      // replay the whole upsert: same ids re-index → same store
      val before = stub.store.snapshot()
      sink.upsert(docs)
      assert(stub.store.snapshot() === before, "replay must be a no-op")
    } finally stub.stop()
  }

  test("action lines JSON-escape hostile ids (quotes/backslashes/newlines), " +
       "stay byte-identical to the plain rendering for safe ids, and fail " +
       "fast on null ids or null sources") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    // safe id: bytes must equal the naive interpolation the oracle renders
    val safe = EsBulk.actionLines(
        Seq(("42", """{"v":1}""")).toDF("id", "sj"), "docs", "id", "sj")
      .select($"lines").as[String].head()
    assert(safe === "{\"index\":{\"_index\":\"docs\",\"_id\":\"42\"}}\n{\"v\":1}")
    // hostile id: action line must still be ONE line of valid JSON that
    // round-trips the id (naive interpolation would corrupt the frame)
    val hostile = "a\"b\\c\nd"
    val line = EsBulk.actionLines(
        Seq((hostile, """{"v":2}""")).toDF("id", "sj"), "docs", "id", "sj")
      .select($"lines").as[String].head()
    val action = line.substring(0, line.indexOf('\n'))
    assert(om.readTree(action).path("index").path("_id").asText() === hostile)
    val del = EsBulk.deleteActionLines(
        Seq(Tuple1(hostile)).toDF("id"), "docs", "id")
      .select($"lines").as[String].head()
    assert(om.readTree(del).path("delete").path("_id").asText() === hostile)
    // null id / null source: a silent drop would desynchronize the
    // action/source NDJSON pairing — must raise instead
    val nullId = intercept[Exception] {
      EsBulk.actionLines(
        Seq((null: String, "{}")).toDF("id", "sj"), "docs", "id", "sj")
        .select($"lines").as[String].head()
    }
    assert(causeChain(nullId).contains("EsBulk: null id"))
    val nullSrc = intercept[Exception] {
      EsBulk.actionLines(
        Seq(("7", null: String)).toDF("id", "sj"), "docs", "id", "sj")
        .select($"lines").as[String].head()
    }
    assert(causeChain(nullSrc).contains("EsBulk: null sj"))
  }

  test("HTTP-level 503/429 and a connection abort retry with backoff " +
       "and converge; retries exhausted surfaces the failure") {
    val stub = new EsStub
    try {
      val docs = (1 to 5).map(i => (i.toLong, s"d$i")).toDF("id", "v")
      val sink = new EsWire.EsDocSink(spark, stub.host, "idx", "id",
        batchSize = 100,
        retry = RetryPolicy(maxAttempts = 4, initialBackoffMs = 1L))
      stub.failHttpNext = List(503, 429)
      sink.upsert(docs) // attempts: 503, 429, 200
      assert(stub.bulkAttempts.get() === 3)
      assert(stub.store.size === 5)
      // connection-level fault (no HTTP response at all)
      stub.abortNext = 1
      stub.bulkAttempts.set(0)
      sink.upsert(docs)
      assert(stub.bulkAttempts.get() === 2)
      // exhaustion: more consecutive 503s than maxAttempts → loud fail
      stub.failHttpNext = List(503, 503, 503, 503)
      val e = intercept[Exception] { sink.upsert(docs) }
      assert(causeChain(e).contains("_bulk failed"), causeChain(e))
      stub.failHttpNext = Nil
    } finally stub.stop()
  }

  test("transient per-item 503 retries the WHOLE batch (idempotence " +
       "makes that safe) and converges; a permanent 400 item fails " +
       "loudly naming the id, never silently dropping docs") {
    val stub = new EsStub
    try {
      val docs = (1 to 5).map(i => (i.toLong, s"d$i")).toDF("id", "v")
      val sink = new EsWire.EsDocSink(spark, stub.host, "idx", "id",
        batchSize = 100,
        retry = RetryPolicy(maxAttempts = 4, initialBackoffMs = 1L))
      stub.failItemOnce.put("3", 503)
      sink.upsert(docs) // attempt 1: item 3 fails 503; attempt 2: all ok
      assert(stub.bulkAttempts.get() === 2)
      assert(stub.store.size === 5,
        "every doc indexed after the whole-batch retry")
      // permanent mapping reject: non-retryable, names the id
      stub.rejectItem = Map("4" -> 400)
      val e = intercept[Exception] { sink.upsert(docs) }
      val msg = causeChain(e)
      assert(msg.contains("_id=4") && msg.contains("status=400"), msg)
      stub.rejectItem = Map.empty
    } finally stub.stop()
  }

  test("CDC end-to-end over the WIRE (the reference daemon's full " +
       "shape): keyset ticks → latest-per-key → EsDocSink bulk POSTs, " +
       "with a replayed tick absorbed idempotently and a transient 503 " +
       "mid-run retried — final ES store ≡ latest-per-user over the " +
       "drained prefix") {
    import graft.cdc.Keyset
    import org.apache.spark.sql.expressions.Window
    val stub = new EsStub
    try {
      val events = Tables.load(spark, sfDir, "events")
        .withColumn("did", lpad($"event_id".cast("string"), 12, "0"))
      val sink = new EsWire.EsDocSink(spark, stub.host, "users",
        "user_id", batchSize = 50,
        retry = RetryPolicy(maxAttempts = 4, initialBackoffMs = 1L))
      val w = Window.partitionBy($"user_id")
        .orderBy(unix_micros($"ts").desc, $"did".desc)
      var cur = Keyset.Cursor.Zero
      def tick(c: Keyset.Cursor): Keyset.Cursor = {
        val (batch, next) = Keyset.nextBatch(events, "ts", "did", c, 120)
        sink.upsert(batch.withColumn("rk", row_number().over(w))
          .filter($"rk" === 1).drop("rk").localCheckpoint())
        next
      }
      cur = tick(cur)
      val afterT1 = cur
      stub.failHttpNext = List(503) // transient fault inside tick 2
      cur = tick(cur)
      tick(afterT1) // REPLAY tick 2 whole — idempotent upsert absorbs it
      cur = tick(cur)
      // oracle: latest value per user over the first 360 events in
      // (ts, did) order — the q149 expectation, computed independently
      val expect = events
        .withColumn("rn", row_number().over(
          Window.orderBy(unix_micros($"ts").asc, $"did".asc)))
        .filter($"rn" <= 360)
        .withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .select($"user_id".cast("string"), $"event_id")
        .as[(String, Long)].collect().toMap
      val got = stub.store.snapshot().collect {
        case ((idx, id), src) if idx == "users" =>
          id -> src
      }
      assert(got.keySet === expect.keySet)
      expect.foreach { case (uid, eid) =>
        assert(got(uid).contains(s"\"event_id\":$eid"),
          s"user $uid: ${got(uid)}")
      }
    } finally stub.stop()
  }

  test("delete removes present ids, IGNORES absent ids (item 404s — " +
       "the DocSink contract), and replays as a no-op") {
    val stub = new EsStub
    try {
      val docs = (1 to 6).map(i => (i.toLong, s"d$i")).toDF("id", "v")
      val sink = new EsWire.EsDocSink(spark, stub.host, "idx", "id",
        batchSize = 3,
        retry = RetryPolicy(maxAttempts = 3, initialBackoffMs = 1L))
      sink.upsert(docs)
      sink.delete(Seq(1L, 2L, 999L).toDF("id")) // 999 absent → 404 item
      assert(sink.read().get.select($"id").as[String].collect().toSet
        === (3 to 6).map(_.toString).toSet)
      sink.delete(Seq(1L, 2L, 999L).toDF("id")) // replay: all 404 now
      assert(sink.read().get.count() === 4)
    } finally stub.stop()
  }
}
