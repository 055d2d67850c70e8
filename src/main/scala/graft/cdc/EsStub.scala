package graft.cdc

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.concurrent.TrieMap

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
