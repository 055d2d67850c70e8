package graft.streaming

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 streaming source for the CDC keyset scan (SURVEY §2.1
  * S3 / §2.10 T1-T2): the reference daemon's resumable
  * `(updated_at, id)` cursor query (postgres_to_es/daemon.py:90-129) as
  * a real `readStream` source — offsets live in Spark's checkpoint, so
  * restart/replay semantics come from the engine instead of the
  * driver-loop CursorStore (which remains the batch face:
  * cdc.CdcPipeline).
  *
  * Usage:
  * {{{
  * spark.readStream
  *   .format(classOf[KeysetSourceProvider].getName)
  *   .option("path", tableDir)     // parquet table to watch
  *   .option("tsCol", "updated_at")
  *   .option("idCol", "id")        // string-typed tiebreaker key
  *   .option("batchSize", "1000")  // max rows per micro-batch
  *   .load()
  * }}}
  *
  * Semantics:
  *  - Offset = the keyset cursor (ts-micros, last id); batch N+1 reads
  *    rows strictly after offset N in (ts, id) total order.
  *  - Admission control: `batchSize` caps rows per micro-batch via
  *    ReadLimit.maxRows — the reference's pg_batch (daemon.py:397-398).
  *  - Effectively-once: offsets commit after the sink write (engine
  *    contract); replays hit the idempotent DocSink upsert.
  *
  * Scale note: each micro-batch materializes on the driver
  * (executeCollect) before distribution — identical boundedness to the
  * reference daemon's psycopg2 fetch, bounded by batchSize. The 100 TB
  * data plane never flows through a CDC control stream; heavy
  * re-denormalization work happens in the downstream joins, which
  * distribute normally.
  *
  * Consistency contract: the watched table must be APPEND-ONLY (or the
  * downstream sink idempotent by key, as DocSink is) — the same contract
  * the reference daemon has with PostgreSQL. Within one run each
  * micro-batch is collected exactly once, when its end offset is
  * computed (latestOffset), and served from that snapshot in
  * planInputPartitions — so a concurrent in-place rewrite of the table
  * cannot produce a batch that disagrees with its own offset range. Only
  * a batch REPLAYED from the checkpoint after a restart re-reads the
  * live table; if rows inside an already-committed offset range were
  * rewritten in the meantime, the replayed batch reflects the new data —
  * exactly the reference's at-least-once + idempotent-upsert semantics
  * (daemon.py:104-126).
  */
final class KeysetSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SparkSession.active.read.parquet(options.get("path")).schema

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KeysetTable(schema, new CaseInsensitiveStringMap(properties))
}

private final class KeysetTable(
    schema0: StructType, options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  override def name(): String = s"keyset(${options.get("path")})"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema0
        override def toMicroBatchStream(loc: String): MicroBatchStream =
          new KeysetMicroBatchStream(schema0, options)
      }
    }
}

/** Streaming offset = the keyset cursor. */
final case class KeysetOffset(tsMicros: Long, lastId: String) extends Offset {
  override def json(): String = {
    import org.json4s.JsonDSL._
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("ts" -> tsMicros) ~ ("id" -> lastId)))
  }
}

object KeysetOffset {
  val Zero: KeysetOffset = KeysetOffset(Long.MinValue, "")

  def fromJson(s: String): KeysetOffset = {
    import org.json4s._
    val j = jackson.JsonMethods.parse(s)
    val ts = j \ "ts" match {
      case JInt(v) => v.toLong
      case JLong(v) => v
      case x => sys.error(s"bad keyset offset ts: $x")
    }
    val id = j \ "id" match {
      case JString(v) => v
      case x => sys.error(s"bad keyset offset id: $x")
    }
    KeysetOffset(ts, id)
  }
}

private final case class KeysetRowsPartition(rows: Array[InternalRow])
  extends InputPartition

private final class KeysetMicroBatchStream(
    schema: StructType, options: CaseInsensitiveStringMap)
  extends MicroBatchStream with SupportsAdmissionControl {

  private val path = options.get("path")
  private val tsCol = options.get("tsCol")
  private val idCol = options.get("idCol")
  private val maxRows =
    Option(options.get("batchSize")).map(_.toInt).getOrElse(1000)

  private def table = SparkSession.active.read.schema(schema).parquet(path)

  private val tsIdx = schema.fieldIndex(tsCol)
  private val idIdx = schema.fieldIndex(idCol)

  /** The batch collected when its end offset was computed, keyed by the
    * (start, end) offset pair — serves planInputPartitions without a
    * second table scan and pins the batch contents to the moment its
    * offset was decided (see consistency contract above). One entry
    * suffices: the engine plans the batch it just admitted.
    */
  @volatile private var cachedBatch
      : Option[(KeysetOffset, KeysetOffset, Array[InternalRow])] = None

  override def initialOffset(): Offset = KeysetOffset.Zero

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxRows)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val c = start.asInstanceOf[KeysetOffset]
    val n = limit match {
      case mr: ReadMaxRows => math.min(mr.maxRows(), maxRows.toLong).toInt
      case _ => maxRows
    }
    // Shared boundary predicate (cdc.Keyset.lowerBound): ts attribute vs
    // TIMESTAMP literal so the filter reaches parquet PushedFilters —
    // row-group pruning is the whole point of keyset pagination at scale.
    val bounded = table.filter(
      graft.cdc.Keyset.lowerBound(tsCol, idCol, c.tsMicros, c.lastId))
    val batch = bounded
      .orderBy(col(tsCol).asc, col(idCol).asc)
      .limit(n)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val rows = batch.queryExecution.executedPlan.executeCollect()
    val end =
      if (rows.isEmpty) KeysetOffset(c.tsMicros, c.lastId)
      else {
        // TimestampType is micros-since-epoch in InternalRow — the same
        // value unix_micros() computes, so the cursor matches the scan.
        val last = rows(rows.length - 1)
        KeysetOffset(last.getLong(tsIdx), last.getUTF8String(idIdx).toString)
      }
    cachedBatch = Some((c, end, rows))
    end
  }

  override def deserializeOffset(json: String): Offset =
    KeysetOffset.fromJson(json)

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KeysetOffset]
    val e = end.asInstanceOf[KeysetOffset]
    if (s == e) return Array.empty
    cachedBatch match {
      case Some((cs, ce, rows)) if cs == s && ce == e =>
        Array(KeysetRowsPartition(rows))
      case _ =>
        // Replay after restart: the cache died with the previous driver,
        // so re-read the offset range from the live table (at-least-once;
        // see consistency contract above).
        // s may be the Zero offset (first-batch replay) — lowerBound
        // handles it; e always carries a real data timestamp (s == e
        // returned early above).
        val eTs = timestamp_micros(lit(e.tsMicros))
        val lower =
          graft.cdc.Keyset.lowerBound(tsCol, idCol, s.tsMicros, s.lastId)
        val batch = table
          .filter(lower && col(tsCol) <= eTs &&
            ((col(tsCol) === eTs && col(idCol) <= e.lastId) || col(tsCol) < eTs))
          .orderBy(col(tsCol).asc, col(idCol).asc)
          .select(schema.fieldNames.map(col).toIndexedSeq: _*)
        Array(KeysetRowsPartition(
          batch.queryExecution.executedPlan.executeCollect()))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val rows = p.asInstanceOf[KeysetRowsPartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = rows(i)
          override def close(): Unit = ()
        }
      }
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
