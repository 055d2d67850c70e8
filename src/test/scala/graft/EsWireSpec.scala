package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import graft.cdc.{EsBulk, EsWire}
import graft.sources.JdbcIO.RetryPolicy

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** In-process Elasticsearch stub: a REAL HTTP server honoring just
  * enough of the `_bulk` / `_search` wire API (daemon.py:358-381's
  * target surface) to drill [[graft.cdc.EsWire]] end to end with zero
  * external dependencies — plus fault-injection knobs: whole-request
  * HTTP 429/5xx, abrupt connection aborts, one-shot per-item 503s
  * (transient shard pressure), permanent per-item 400s (mapping
  * rejects).
  */
final class EsStub {
  /** (index, id) → source json. */
  val store: TrieMap[(String, String), String] = TrieMap.empty
  private val indices: TrieMap[String, Unit] = TrieMap.empty
  /** Every `_bulk` request body received, in arrival order. */
  val bodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val bulkAttempts = new AtomicInteger(0)
  /** HTTP statuses to answer the next `_bulk` calls with (then 200s). */
  @volatile var failHttpNext: List[Int] = Nil
  /** Abruptly close (no response) the next N `_bulk` calls. */
  @volatile var abortNext: Int = 0
  /** id → one-shot item status (consumed on first hit, then normal). */
  val failItemOnce: TrieMap[String, Int] = TrieMap.empty
  /** id → permanent item status (e.g. 400 mapping reject). */
  @volatile var rejectItem: Map[String, Int] = Map.empty

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()
  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", new HttpHandler {
    def handle(ex: HttpExchange): Unit =
      try route(ex)
      finally ex.close()
  })
  server.start()

  def host: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(status, b.length.toLong)
    ex.getResponseBody.write(b)
  }

  private def route(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val body =
      new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    if (path == "/_bulk") bulk(ex, body)
    else if (path.endsWith("/_search"))
      search(ex, path.stripPrefix("/").stripSuffix("/_search"))
    else respond(ex, 404, "{}")
  }

  private def item(
      op: String, idx: String, id: String, status: Int,
      error: Option[String]): String =
    s"""{"$op":{"_index":"$idx","_id":"$id","status":$status""" +
      error.fold("")(e => s""","error":{"reason":"$e"}""") + "}}"

  private def bulk(ex: HttpExchange, body: String): Unit = {
    bulkAttempts.incrementAndGet()
    bodies.add(body)
    if (abortNext > 0) { abortNext -= 1; return } // close w/o response
    failHttpNext match {
      case s :: rest =>
        failHttpNext = rest
        respond(ex, s, "{\"error\":\"injected\"}")
        return
      case Nil => ()
    }
    val lines = body.split("\n", -1).filter(_.nonEmpty)
    val items = scala.collection.mutable.ArrayBuffer.empty[String]
    var errors = false
    var i = 0
    while (i < lines.length) {
      val action = om.readTree(lines(i))
      val op = action.fieldNames().next()
      val idx = action.path(op).path("_index").asText()
      val id = action.path(op).path("_id").asText()
      op match {
        case "index" =>
          val src = lines(i + 1); i += 2
          indices.putIfAbsent(idx, ())
          (failItemOnce.remove(id), rejectItem.get(id)) match {
            case (Some(st), _) =>
              errors = true
              items += item(op, idx, id, st, Some("injected transient"))
            case (None, Some(st)) =>
              errors = true
              items += item(op, idx, id, st, Some("injected mapping reject"))
            case (None, None) =>
              store((idx, id)) = src
              items += item(op, idx, id, 200, None)
          }
        case "delete" =>
          i += 1
          if (store.remove((idx, id)).isDefined)
            items += item(op, idx, id, 200, None)
          else {
            errors = true // real ES marks delete-404 in the errors flag
            items += item(op, idx, id, 404, None)
          }
        case other =>
          i += 1
          errors = true
          items += item(other, idx, id, 400, Some("unsupported action"))
      }
    }
    respond(ex, 200,
      s"""{"took":1,"errors":$errors,"items":[${items.mkString(",")}]}""")
  }

  private def search(ex: HttpExchange, index: String): Unit =
    if (!indices.contains(index)) respond(ex, 404, "{}")
    else {
      val hits = store.toSeq.collect {
        case ((idx, id), src) if idx == index =>
          s"""{"_index":"$idx","_id":"$id","_source":$src}"""
      }.sorted
      respond(ex, 200,
        s"""{"hits":{"total":{"value":${hits.size}},""" +
          s""""hits":[${hits.mkString(",")}]}}""")
    }
}

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
