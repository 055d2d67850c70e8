package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Elasticsearch `_bulk` PAYLOAD assembly — the wire format the
  * reference ships docs with (postgres_to_es/daemon.py:358-381 via
  * `helpers.bulk`: one `{"index":{"_index":…,"_id":…}}` action line +
  * one source line per doc, batched at `--es-batch`). No ES server
  * exists in this sandbox, but the payload itself is a pure
  * deterministic transformation — so the byte-exact request bodies are
  * oracle-checkable, and a live connector reduces to POSTing them
  * (the documented [[DocSink]] bind point).
  *
  * Scale shape: batch assignment is the global rank over `idCol` via
  * range-partitioned prefix arithmetic ([[graft.ops.IdOps.contiguousIds]]
  * — never a one-reducer row_number), and each batch's body is one
  * sorted string aggregation over its ≤ batchSize docs (payload size is
  * bounded by batchSize × doc size BY CONSTRUCTION — the same bound the
  * HTTP POST itself needs).
  */
object EsBulk {

  /** Per-doc NDJSON action + source pair. `sourceJson` must already be
    * a deterministic JSON rendering (same field order both engines).
    */
  def actionLines(
      df: DataFrame, index: String, idCol: String,
      sourceJsonCol: String): DataFrame =
    df.select(col(idCol),
      concat(
        lit("{\"index\":{\"_index\":\"" + index + "\",\"_id\":\""),
        col(idCol).cast("string"), lit("\"}}\n"),
        col(sourceJsonCol)).as("lines"))

  /** Assemble `_bulk` request bodies of `batchSize` docs in `idCol`
    * order: (es_batch, n_docs, payload_chars, payload_md5). The body
    * itself is `join(lines, "\n") + "\n"` per batch; the gate carries
    * its md5 so the byte-exact wire format is what's checked.
    */
  def bulkBodies(
      df: DataFrame, index: String, idCol: String,
      sourceJsonCol: String, batchSize: Int): DataFrame = {
    require(batchSize >= 1, "batchSize must be positive")
    val lines = actionLines(df, index, idCol, sourceJsonCol)
    val ranked = graft.ops.IdOps.contiguousIds(lines, "__rk", idCol)
    val div = graft.functions.GraftColumns.longDiv _
    ranked
      .withColumn("es_batch", div(col("__rk"), lit(batchSize.toLong)))
      .groupBy(col("es_batch"))
      .agg(count(lit(1)).as("n_docs"),
        md5(concat(array_join(
          transform(
            array_sort(collect_list(struct(col("__rk"), col("lines")))),
            _.getField("lines")),
          "\n"), lit("\n"))).as("payload_md5"),
        (sum(length(col("lines"))) + count(lit(1)))
          .as("payload_chars"))
      .select(col("es_batch"), col("n_docs"), col("payload_chars"),
        col("payload_md5"))
  }
}
