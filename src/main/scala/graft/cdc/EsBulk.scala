package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Elasticsearch `_bulk` PAYLOAD assembly — the wire format the
  * reference ships docs with (postgres_to_es/daemon.py:358-381 via
  * `helpers.bulk`: one `{"index":{"_index":…,"_id":…}}` action line +
  * one source line per doc, batched at `--es-batch`). The payload is a
  * pure deterministic transformation — the byte-exact request bodies
  * are oracle-checked (q267), and [[EsWire.EsDocSink]] POSTs exactly
  * these strings over HTTP.
  *
  * Scale shape: batch assignment is the global rank over `idCol` via
  * range-partitioned prefix arithmetic ([[graft.ops.IdOps.contiguousIds]]
  * — never a one-reducer row_number), and each batch's body is one
  * sorted string aggregation over its ≤ batchSize docs (payload size is
  * bounded by batchSize × doc size BY CONSTRUCTION — the same bound the
  * HTTP POST itself needs).
  */
object EsBulk {

  /** Action-line JSON via `to_json` so `_index`/`_id` values carrying
    * JSON-special characters (quotes, backslashes, control chars) are
    * escaped per RFC 8259 instead of corrupting the NDJSON frame.
    * Byte-identical to naive interpolation for safe values (no spaces,
    * declared key order), which is what q267's oracle renders. A null
    * id would be silently DROPPED by to_json (ignoreNullFields) and
    * desynchronize action/source pairing — guard with raise_error.
    */
  private def actionJson(
      verb: String, index: String, idCol: String) = {
    val id = coalesce(col(idCol).cast("string"),
      raise_error(lit(s"EsBulk: null $idCol — every doc needs an _id")))
    to_json(struct(
      struct(lit(index).as("_index"), id.as("_id")).as(verb)))
  }

  /** Per-doc NDJSON action + source pair. `sourceJson` must already be
    * a deterministic JSON rendering (same field order both engines) and
    * non-null — a null source would collapse the whole concat to null
    * and the doc would vanish from its batch body, so it fails fast.
    */
  def actionLines(
      df: DataFrame, index: String, idCol: String,
      sourceJsonCol: String): DataFrame =
    df.select(col(idCol),
      concat(
        actionJson("index", index, idCol), lit("\n"),
        coalesce(col(sourceJsonCol),
          raise_error(lit(s"EsBulk: null $sourceJsonCol source"))))
        .as("lines"))

  /** Per-id NDJSON delete action (no source line — the `_bulk` delete
    * format): `{"delete":{"_index":…,"_id":…}}`.
    */
  def deleteActionLines(
      df: DataFrame, index: String, idCol: String): DataFrame =
    df.select(col(idCol), actionJson("delete", index, idCol).as("lines"))

  /** Shared body construction for every `_bulk` face: global rank over
    * `idCol` → `es_batch = rank div batchSize` → per-batch body =
    * `join(lines in rank order, "\n") + "\n"`. One definition so the
    * oracle-hashed gate ([[bulkBodies]] / q267) and the wire payloads
    * ([[bulkBodyStrings]] / [[deleteBodyStrings]]) cannot drift.
    */
  private def bodiesOf(
      lines: DataFrame, idCol: String, batchSize: Int): DataFrame = {
    require(batchSize >= 1, "batchSize must be positive")
    val ranked = graft.ops.IdOps.contiguousIds(lines, "__rk", idCol)
    val div = graft.functions.GraftColumns.longDiv _
    ranked
      .withColumn("es_batch", div(col("__rk"), lit(batchSize.toLong)))
      .groupBy(col("es_batch"))
      .agg(count(lit(1)).as("n_docs"),
        concat(array_join(
          transform(
            array_sort(collect_list(struct(col("__rk"), col("lines")))),
            _.getField("lines")),
          "\n"), lit("\n")).as("body"))
  }

  /** The `_bulk` upsert POST payloads themselves:
    * (es_batch, n_docs, body) — what [[EsWire.EsDocSink]] sends.
    */
  def bulkBodyStrings(
      df: DataFrame, index: String, idCol: String,
      sourceJsonCol: String, batchSize: Int): DataFrame =
    bodiesOf(actionLines(df, index, idCol, sourceJsonCol),
      idCol, batchSize)

  /** The `_bulk` delete POST payloads: (es_batch, n_docs, body). */
  def deleteBodyStrings(
      df: DataFrame, index: String, idCol: String,
      batchSize: Int): DataFrame =
    bodiesOf(deleteActionLines(df, index, idCol), idCol, batchSize)

  /** Gate-facing digest of [[bulkBodyStrings]]: (es_batch, n_docs,
    * payload_chars, payload_md5) — the body md5 makes the byte-exact
    * wire format what's hash-checked (q267).
    */
  def bulkBodies(
      df: DataFrame, index: String, idCol: String,
      sourceJsonCol: String, batchSize: Int): DataFrame =
    bulkBodyStrings(df, index, idCol, sourceJsonCol, batchSize)
      .select(col("es_batch"), col("n_docs"),
        length(col("body")).cast("long").as("payload_chars"),
        md5(col("body")).as("payload_md5"))
}
