package graft.movies

import org.apache.spark.sql.{Column, DataFrame}
import graft.cdc.DocSink

/** [[graft.cdc.DocSink]] face of the updatable [[PostingIndex]] — the
  * reference's full steady state as one component: the CDC loop
  * upserts re-denormalized docs by id (postgres_to_es/daemon.py:
  * 358-381) and the search index SERVES the update moments later
  * (movies.es.schema.json:3, refresh_interval: 1s). Plug it into
  * [[graft.cdc.CdcPipeline.Sinks]] and every tick maintains search
  * serving incrementally — O(|batch| + touched buckets + delta log)
  * per tick, never O(corpus) (CdcSpec drills the composition:
  * update-then-search, replay absorption, ≡ rebuild over the final
  * store).
  *
  * The functional index handle is rebound on every write (single
  * writer, the parquet-sink family contract); [[index]] exposes the
  * live handle for serving. Schedule [[compact]] on the cadence the
  * delta log grows — the [[graft.cdc.LogUpsertSink]] rule.
  *
  * `tokens` = None uses the movies-face analyzer fields; pass the
  * build's token map for a generic index.
  */
final class PostingIndexSink(
    initial: PostingIndex,
    tokens: Option[Map[String, Column]] = None) extends DocSink {

  @volatile private var current: PostingIndex = initial

  /** The live index handle — serve queries off this. */
  def index: PostingIndex = current

  def idCol: String = current.idCol

  def upsert(docs: DataFrame): Unit =
    current = tokens.fold(current.upsert(docs))(t => current.upsert(docs, t))

  def delete(ids: DataFrame): Unit =
    current = current.delete(ids)

  /** The sink-family read view: the index's current doc payloads;
    * None when the store is empty ('isDefined == has docs').
    */
  def read(): Option[DataFrame] =
    if (current.numDocs == 0L) None else Some(current.currentDocs)

  /** Fold the delta log into a fresh base ([[PostingIndex.compact]]). */
  def compact(): Unit =
    current = current.compact()
}
