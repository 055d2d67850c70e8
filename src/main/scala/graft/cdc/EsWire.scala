package graft.cdc

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Live Elasticsearch `_bulk` WIRE connector — the HTTP round trip the
  * reference performs via `helpers.bulk`
  * (postgres_to_es/daemon.py:358-381): POST the q267-checked
  * [[EsBulk]] NDJSON bodies to `<host>/_bulk`, parse the per-item
  * response, and retry retryable failures (connection faults, HTTP
  * 429/5xx, retryable item statuses) with the reference's
  * exponential-backoff formula (postgres_to_es/utils.py:19-53 —
  * `t = start·2ⁿ` capped at a border, here
  * [[graft.sources.JdbcIO.RetryPolicy]]). Whole-batch replay on
  * partial failure is safe for exactly the reference's reason: every
  * action is an idempotent upsert/delete by `_id`.
  *
  * Zero new dependencies: JDK `java.net.http` for the client and the
  * Jackson that ships with Spark for response parsing. Drilled
  * end-to-end in EsWireSpec against an in-process stub server with
  * injected 429/5xx/partial-item/connection faults — byte-exact
  * request bodies, idempotent replay, retry convergence, and loud
  * non-retryable errors are all spec-asserted.
  */
object EsWire {

  /** One action's outcome from a `_bulk` response `items` entry. */
  final case class ItemResult(
      op: String, id: String, status: Int, error: Option[String]) {
    def ok: Boolean = status >= 200 && status < 300
    def retryable: Boolean = status == 429 || status >= 500
  }

  /** Parsed `_bulk` response. For non-200 HTTP statuses `items` is
    * empty and `errors` is true (the whole request failed).
    */
  final case class BulkResult(
      httpStatus: Int, errors: Boolean, items: Seq[ItemResult])

  /** Without explicit timeouts a black-holed endpoint (firewall DROP,
    * half-open socket after ES dies) blocks `client.send` forever and
    * the retry/backoff machinery never engages — the executor task
    * wedges with no error. A timeout surfaces as an IOException, i.e.
    * the retryable connection-fault class [[postBulkChecked]] handles.
    */
  val ConnectTimeout: java.time.Duration = java.time.Duration.ofSeconds(10)
  val RequestTimeout: java.time.Duration = java.time.Duration.ofSeconds(60)

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(ConnectTimeout).build()

  // thread-safe for readTree; reused — construction is the expensive part
  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** One POST of an NDJSON body to a `_bulk` endpoint, response parsed
    * into per-item results. Throws on connection-level failures (the
    * retryable class [[postBulkChecked]] handles).
    */
  def postBulk(bulkUrl: String, body: String): BulkResult = {
    val req = HttpRequest.newBuilder(URI.create(bulkUrl))
      .header("Content-Type", "application/x-ndjson")
      .timeout(RequestTimeout)
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      BulkResult(resp.statusCode(), errors = true, Nil)
    else {
      val root = mapper.readTree(resp.body())
      val items = scala.collection.mutable.ArrayBuffer.empty[ItemResult]
      val it = root.path("items").elements()
      while (it.hasNext) {
        val entry = it.next()
        val op =
          if (entry.fieldNames().hasNext) entry.fieldNames().next()
          else "unknown"
        val n = entry.path(op)
        val err = n.path("error")
        items += ItemResult(op, n.path("_id").asText(),
          n.path("status").asInt(),
          if (err.isMissingNode || err.isNull) None
          else Some(err.toString))
      }
      BulkResult(200, root.path("errors").asBoolean(false),
        items.toSeq)
    }
  }

  /** POST with the reference's retry semantics. Succeeds when the HTTP
    * round trip is 200 and every item is 2xx (or a delete-404 when
    * `notFoundOk` — the DocSink "absent ids are ignored" contract).
    * Retries the WHOLE batch — idempotent actions make that safe — on
    * connection faults, HTTP 429/5xx, and responses whose only bad
    * items are 429/5xx. Any other item status (mapping errors, 400s)
    * is non-retryable: fail loudly naming the offending ids, never
    * silently drop documents (the reference's helpers.bulk raises
    * BulkIndexError the same way).
    */
  def postBulkChecked(
      bulkUrl: String, body: String,
      policy: graft.sources.JdbcIO.RetryPolicy,
      notFoundOk: Boolean): Unit = {
    var attempt = 1
    var backoff = policy.initialBackoffMs
    var done = false
    while (!done) {
      val outcome =
        try Right(postBulk(bulkUrl, body))
        catch { case scala.util.control.NonFatal(e) => Left(e) }
      outcome match {
        case Right(r) =>
          val bad = r.items.filterNot(i =>
            i.ok || (notFoundOk && i.op == "delete" && i.status == 404))
          if (r.httpStatus == 200 && bad.isEmpty) done = true
          else {
            val retryable = r.httpStatus == 429 || r.httpStatus >= 500 ||
              (r.httpStatus == 200 && bad.nonEmpty && bad.forall(_.retryable))
            if (!retryable || attempt >= policy.maxAttempts)
              throw new java.io.IOException(
                s"ES _bulk failed (http ${r.httpStatus}, " +
                  s"attempt $attempt/${policy.maxAttempts}): " +
                  bad.take(5).map(i =>
                    s"${i.op} _id=${i.id} status=${i.status}" +
                      i.error.fold("")(e => s" $e")).mkString("; "))
          }
        case Left(e) =>
          if (attempt >= policy.maxAttempts) throw e
      }
      if (!done) {
        Thread.sleep(backoff)
        backoff =
          math.min((backoff * policy.factor).toLong, policy.maxBackoffMs)
        attempt += 1
      }
    }
  }

  /** Live [[DocSink]] over the ES wire — the reference's daemon sink
    * with the engine's scale shape: bodies are assembled distributed
    * (the q267-checked [[EsBulk]] batching), then each PARTITION of
    * batch bodies POSTs from its executor — no driver fan-in of the
    * corpus, parallel ingestion across executors exactly like the
    * es-hadoop connector. `sourceJsonCol` supplies a pre-rendered
    * deterministic source document; absent, docs render as
    * `to_json(struct(columns sorted by name))`.
    *
    * `read()` is the drill/verification surface: one match_all search
    * capped at the ES 10k result window — production reads go through
    * scroll/search_after or the es-hadoop connector, never a driver
    * GET.
    */
  final class EsDocSink(
      spark: SparkSession, host: String, index: String,
      val idCol: String,
      sourceJsonCol: Option[String] = None,
      batchSize: Int = 1000,
      retry: graft.sources.JdbcIO.RetryPolicy =
        graft.sources.JdbcIO.RetryPolicy(initialBackoffMs = 10L))
      extends DocSink {

    private val bulkUrl = s"$host/_bulk"

    def upsert(docs: DataFrame): Unit = {
      val rendered = sourceJsonCol match {
        case Some(c) => docs.select(col(idCol), col(c).as("__sj"))
        case None => docs.select(col(idCol),
          to_json(struct(docs.columns.sorted.map(col): _*)).as("__sj"))
      }
      post(EsBulk.bulkBodyStrings(rendered, index, idCol, "__sj",
        batchSize), notFoundOk = false)
    }

    def delete(ids: DataFrame): Unit =
      post(EsBulk.deleteBodyStrings(ids.select(col(idCol)).distinct(),
        index, idCol, batchSize), notFoundOk = true)

    private def post(bodies: DataFrame, notFoundOk: Boolean): Unit = {
      val (url, pol, nfOk) = (bulkUrl, retry, notFoundOk)
      bodies.select(col("body")).foreachPartition {
        (it: Iterator[Row]) =>
          it.foreach(r =>
            EsWire.postBulkChecked(url, r.getString(0), pol, nfOk))
      }
    }

    def read(): Option[DataFrame] = {
      val req = HttpRequest.newBuilder(
          URI.create(s"$host/$index/_search"))
        .header("Content-Type", "application/json")
        .timeout(RequestTimeout)
        .POST(HttpRequest.BodyPublishers.ofString(
          // track_total_hits: without it real ES (≥7.0) caps
          // hits.total at 10000, which would make the truncation
          // check below compare 10000 > 10000 and never fire
          "{\"query\":{\"match_all\":{}},\"size\":10000," +
            "\"track_total_hits\":true}"))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() == 404) None
      else if (resp.statusCode() != 200)
        throw new java.io.IOException(
          s"ES _search failed: http ${resp.statusCode()}")
      else {
        val hitsNode = mapper.readTree(resp.body()).path("hits")
        val hits = hitsNode.path("hits")
        val rows = scala.collection.mutable
          .ArrayBuffer.empty[(String, String)]
        val it = hits.elements()
        while (it.hasNext) {
          val h = it.next()
          rows += ((h.path("_id").asText(),
            h.path("_source").toString))
        }
        // a store past the 10k result window must fail loudly, not
        // silently under-report — this read is a verification surface;
        // relation=="gte" means the server itself capped the count
        val totalNode = hitsNode.path("total")
        val total = totalNode.path("value").asLong(-1L)
        val capped = totalNode.path("relation").asText("eq") == "gte"
        if (total > rows.size || (capped && total >= rows.size))
          throw new java.io.IOException(
            s"ES _search window truncated: hits.total=$total" +
              (if (capped) "+ (gte)" else "") +
              s" vs returned ${rows.size} — use scroll/search_after")
        import spark.implicits._
        Some(rows.toSeq.toDF(idCol, "source_json"))
      }
    }
  }
}
