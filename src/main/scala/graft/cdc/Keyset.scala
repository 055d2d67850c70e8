package graft.cdc

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Keyset (cursor) incremental scan — the CDC source primitive.
  *
  * Semantics from postgres_to_es/daemon.py:90-129: fetch rows with
  * `(ts = cursor.ts AND id > cursor.id) OR ts > cursor.ts` ordered by
  * `(ts, id)` limited to a batch, then advance the cursor to the last
  * row's `(ts, id)`. The equal-timestamp re-entry makes restarts safe
  * (at-least-once; the idempotent doc upsert makes it effectively-once —
  * T2).
  *
  * Scale: the predicate pushes down to the source scan (parquet stats /
  * JDBC); the `orderBy().limit(n)` plans as TakeOrderedAndProject, so no
  * global sort materializes. Cursor advance reads back exactly one row.
  */
object Keyset {

  /** (ts-micros, id) cursor. Ordering matches the scan order. */
  final case class Cursor(tsMicros: Long, lastId: String) {
    def render: String = s"$tsMicros\n$lastId"
  }
  object Cursor {
    val Zero: Cursor = Cursor(Long.MinValue, "")
    def parse(s: String): Cursor = {
      val Array(ts, id) = s.split("\n", 2)
      Cursor(ts.toLong, id)
    }
  }

  /** The keyset lower-bound predicate — ONE definition for every face
    * (this batch primitive, the DSv2 source's admission scan and its
    * replay path), so the subtle pushdown rewrite below can never
    * drift between them.
    *
    * Boundary compares the ts ATTRIBUTE against TIMESTAMP literals —
    * not unix_micros(ts) against longs. A function call over the
    * attribute is never translated to a source filter, so the
    * unix_micros form read every row group on every tick; the literal
    * form reaches parquet PushedFilters (min/max row-group pruning)
    * and a JDBC WHERE clause alike. The leading `ts >= cursor`
    * conjunct is implied by the keyset Or but stated separately: when
    * idCol is a DERIVED column (q149 pads event_id), the Or as a whole
    * is untranslatable, while the redundant conjunct alone still
    * prunes row groups. (PlansSpec "keyset scan pushes the ts
    * boundary" asserts the pushdown.) The synthetic Zero cursor
    * (Long.MinValue micros) cannot appear as a timestamp literal —
    * filter translation converts literals to java.sql.Timestamp and
    * the Julian rebase overflows. Its boundary is vacuous anyway
    * (everything qualifies), so it reduces to the null-ts drop the
    * boundary form also performs; real cursors always carry a
    * representable data timestamp.
    */
  def lowerBound(
      tsCol: String, idCol: String,
      tsMicros: Long, lastId: String): org.apache.spark.sql.Column =
    if (tsMicros == Long.MinValue) col(tsCol).isNotNull
    else {
      val curTs = timestamp_micros(lit(tsMicros))
      col(tsCol) >= curTs &&
        ((col(tsCol) === curTs && col(idCol) > lastId) ||
          col(tsCol) > curTs)
    }

  /** One keyset batch after `cursor`: (batch, advanced cursor).
    * `table` must carry `tsCol` (timestamp) and `idCol` (string-ordered).
    *
    * Snapshot contract: the advanced cursor is computed with its own
    * bounded scan, and the returned batch is LAZY (so its plan stays
    * inspectable/pushdown-provable and consumers compose it into their
    * own jobs). The two views agree only while `table` is stable — true
    * for parquet tables (immutable files per tick), for
    * [[CdcPipeline]]'s per-tick cached snapshot, and for a JDBC read
    * inside a repeatable-read transaction. Against a LIVE mutable
    * source without such a snapshot, a row committed between the two
    * scans could displace the cursor row past the limit and be skipped
    * forever — use the DSv2 [[graft.streaming.KeysetSourceProvider]]
    * face there: it pins each micro-batch to the moment its offset was
    * computed.
    */
  def nextBatch(
      table: DataFrame,
      tsCol: String,
      idCol: String,
      cursor: Cursor,
      limit: Int): (DataFrame, Cursor) = {
    // Ordering on timestamps is ordering on their micros, so batch
    // contents and cursor advance are unchanged by the literal-form
    // boundary — see [[lowerBound]] for the pushdown rationale.
    val tsMicros = unix_micros(col(tsCol))
    val bounded = table.filter(
      lowerBound(tsCol, idCol, cursor.tsMicros, cursor.lastId))
    val batch = bounded
      .orderBy(col(tsCol).asc, col(idCol).asc)
      .limit(limit)
    val last = batch
      .select(tsMicros.as("__ts"), col(idCol).as("__id"))
      .orderBy(col("__ts").desc, col("__id").desc)
      .limit(1).collect()
    val advanced = last.headOption.fold(cursor) { r: Row =>
      Cursor(r.getLong(0), r.getString(1))
    }
    (batch, advanced)
  }

  /** File-backed cursor store — replaces the reference's Redis state
    * (postgres_to_es/state.py:34-51) with the checkpoint-dir pattern.
    * Writes are atomic (temp file + move) so a crash never leaves a
    * torn cursor.
    */
  final class CursorStore(dir: String) {
    Files.createDirectories(Paths.get(dir))

    private def path(key: String) = Paths.get(dir, s"$key.cursor")

    def load(key: String): Cursor = {
      val p = path(key)
      if (Files.exists(p))
        Cursor.parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      else Cursor.Zero
    }

    def save(key: String, c: Cursor): Unit = {
      val tmp = Paths.get(dir, s".$key.cursor.tmp")
      Files.write(tmp, c.render.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, path(key), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }
}
