package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.cdc.DocSink

/** [[graft.cdc.DocSink]] face of the stored IVF×PQ vector index — the
  * ANN counterpart of [[graft.movies.PostingIndexSink]] (VERDICT r12
  * #3). The reference's bulk replace is INDEX-AGNOSTIC
  * (postgres_to_es/daemon.py:358-381: `_id=doc.id` into every index it
  * maintains), so the CDC loop should drive the vector index through
  * the same sink contract it drives the doc stores and the search
  * index: plug this into [[graft.cdc.CdcPipeline.Sinks]] and every
  * tick maintains ANN serving by id — O(|batch|) writes per tick
  * (encode with the FROZEN centers/codebooks + seq-tombstone append),
  * never O(corpus).
  *
  * `docs` batches must carry `idCol` and `vecCol` (extra columns are
  * projected away — the store holds (id, cell, codes, __seq), the
  * quantized form; this sink is an INDEX over the pipeline's doc
  * store, not the store itself, so [[read]] exposes the encoded rows).
  * Serve through [[SimilarityOps.ivfPqTopKStored]] /
  * [[SimilarityOps.ivfPqTopKMultiStored]] against [[dir]].
  *
  * Durability follows the family contract
  * ([[graft.ops.IndexMaintenance]]): single writer, tombstone-first
  * upserts (a torn op never serves two versions), torn compact ⇒
  * rebuild. Quantization stays frozen across ops — re-training for a
  * drifted corpus is a deliberate rebuild (see the recall-drift
  * guidance on [[SimilarityOps.upsertIntoIvfPqIndex]]).
  */
final class IvfPqIndexSink(
    spark: SparkSession,
    val dir: String,
    val idCol: String,
    vecCol: String,
    centers: Array[Array[Double]],
    codebooks: Array[Array[Array[Double]]],
    lease: Option[graft.cdc.WriterLease] = None) extends DocSink {

  private def dirExists: Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  // preventive single-writer layer when a lease is wired (VERDICT r13
  // #5); this family's durability contract (torn op => rebuild) makes
  // pre-write abort especially valuable — the backstop here is the
  // seq discipline, not a publish tripwire
  private def requireLease(): Unit = lease.foreach(_.requireHeld())

  /** Insert-or-replace by id: encode with the frozen quantization and
    * land rows + same-seq tombstones ([[SimilarityOps.upsertIntoIvfPqIndex]]).
    * Replays absorb (higher seq, equal content). Batch must be unique
    * by `idCol` — duplicates trip the loud require.
    */
  def upsert(docs: DataFrame): Unit = {
    requireLease()
    SimilarityOps.upsertIntoIvfPqIndex(dir,
      docs.select(col(idCol), col(vecCol)), idCol, vecCol,
      centers, codebooks)
  }

  /** Tombstone the ids at a fresh seq — O(|request|), absent ids are
    * ignored at read time; idempotent.
    */
  def delete(ids: DataFrame): Unit = {
    requireLease()
    SimilarityOps.removeFromIvfPqIndex(dir, ids.select(col(idCol)), idCol)
  }

  /** The live ENCODED rows (id, cell, codes) — the quantized store
    * view, deterministic in (id → current vector) under the frozen
    * quantization, which is what the differential sink drill compares
    * against a fresh encode of its model. None before the first
    * upsert (and after an empty-collapse compact), the family rule.
    */
  def read(): Option[DataFrame] =
    if (!dirExists) None
    else Some(SimilarityOps.activeIvfPqIndex(spark, dir, idCol)
      .select(col(idCol), col("cell"), col("codes")))

  /** Fold tombstones into the affected cells
    * ([[SimilarityOps.compactIvfPqIndex]]); an emptied index collapses
    * to absent.
    */
  def compact(): Unit = {
    requireLease()
    SimilarityOps.compactIvfPqIndex(spark, dir, idCol)
  }
}
