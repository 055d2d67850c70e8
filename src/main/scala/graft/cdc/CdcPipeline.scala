package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.movies.Docs

/** The incremental denormalization pipeline: the reference daemon's
  * 7-process change fan-out graph (postgres_to_es/daemon.py:497-535, T4)
  * as keyset batches + semi-join propagation + restricted re-denorm +
  * idempotent upsert.
  *
  * Divergence from the reference, documented per SURVEY §7.3.3:
  *  - changed-id propagation dedupes (`distinct`) before re-denorm (the
  *    reference re-denormalizes duplicates harmlessly but wastefully —
  *    daemon.py:139-152 has no DISTINCT);
  *  - the persons-index process watches `updated_at`, not `created_at`
  *    (reference quirk at daemon.py:522-527 meant person edits never
  *    refreshed the persons index).
  *
  * Scale: each tick touches only `limit` changed rows; propagation is a
  * semi-join from the bridge to a tiny changed-id set (broadcast), and
  * `Docs.*` restricted by docIds only shuffles the affected slice.
  */
object CdcPipeline {

  /** Live views of the 5 normalized tables (re-read per tick so a
    * mutable store — parquet dir, JDBC — shows fresh rows).
    */
  final case class Tables(
      filmWork: () => DataFrame,
      person: () => DataFrame,
      genre: () => DataFrame,
      personFilmWork: () => DataFrame,
      genreFilmWork: () => DataFrame)

  final case class Sinks(
      movies: DocSink, persons: DocSink, genres: DocSink)

  /** One change-detection process: watch `table.tsCol`, map changed rows
    * to target doc ids via `propagate`, tagged with the sink it feeds.
    */
  final case class Process(
      name: String,
      table: () => DataFrame,
      tsCol: String,
      target: String, // movies | persons | genres
      propagate: DataFrame => DataFrame)

  /** The 7 processes (5 → movies, 1 → persons, 1 → genres). */
  def processes(t: Tables): Seq[Process] = {
    def viaBridge(bridge: () => DataFrame, key: String) =
      (changed: DataFrame) =>
        bridge().join(
            broadcast(changed.select(col("id").as(key))), Seq(key), "left_semi")
          .select(col("film_work_id").as("id")).distinct()
    Seq(
      Process("film_work.movies", t.filmWork, "updated_at", "movies",
        changed => changed.select("id")),
      Process("person.movies", t.person, "updated_at", "movies",
        viaBridge(t.personFilmWork, "person_id")),
      Process("genre.movies", t.genre, "updated_at", "movies",
        viaBridge(t.genreFilmWork, "genre_id")),
      Process("person_film_work.movies", t.personFilmWork, "created_at",
        "movies", changed => changed.select(col("film_work_id").as("id"))
          .distinct()),
      Process("genre_film_work.movies", t.genreFilmWork, "created_at",
        "movies", changed => changed.select(col("film_work_id").as("id"))
          .distinct()),
      Process("person.persons", t.person, "updated_at", "persons",
        changed => changed.select("id")),
      Process("genre.genres", t.genre, "updated_at", "genres",
        changed => changed.select("id")))
  }

  /** Rebuild the docs for a driving id set, routed by target index. */
  def rebuild(t: Tables, target: String, docIds: DataFrame): DataFrame =
    target match {
      case "movies" => Docs.movieDocs(
        t.filmWork(), t.person(), t.genre(),
        t.personFilmWork(), t.genreFilmWork(), Some(docIds))
      case "persons" => Docs.personDocs(t.person(), t.personFilmWork(),
        Some(docIds))
      case "genres" => Docs.genreDocs(t.genre(), t.filmWork(),
        t.genreFilmWork(), Some(docIds))
    }

  final case class TickResult(consumed: Boolean, docsWritten: Long)

  /** One full tick over all processes (the reference's poll-loop body,
    * daemon.py:537-542). Restart-safe: cursors only advance after the
    * sink write lands, so a crash replays the batch (idempotent upsert
    * makes the replay a no-op — effectively-once).
    */
  def tick(
      spark: SparkSession,
      t: Tables,
      sinks: Sinks,
      cursors: Keyset.CursorStore,
      batchSize: Int = 1000): Map[String, TickResult] = {
    // One cached scan per source table per tick: the 7 processes (and
    // their rebuilds) otherwise re-read the same 5 tables up to a
    // dozen times, and mid-tick writers would give later processes a
    // different table state than earlier ones. A tick runs against one
    // consistent snapshot; freshness re-enters at the next tick.
    val cached = Seq(t.filmWork(), t.person(), t.genre(),
      t.personFilmWork(), t.genreFilmWork()).map(_.cache())
    val snap = Tables(
      () => cached(0), () => cached(1), () => cached(2),
      () => cached(3), () => cached(4))
    try tickUncached(spark, snap, sinks, cursors, batchSize)
    finally cached.foreach { df => df.unpersist(); () }
  }

  private def tickUncached(
      spark: SparkSession,
      t: Tables,
      sinks: Sinks,
      cursors: Keyset.CursorStore,
      batchSize: Int): Map[String, TickResult] = {
    processes(t).map { p =>
      val cursor = cursors.load(p.name)
      val (batch, advanced) = Keyset.nextBatch(
        p.table(), p.tsCol, "id", cursor, batchSize)
      val result =
        if (advanced == cursor) TickResult(consumed = false, 0L)
        else {
          val ids = p.propagate(batch).cache()
          // rebuild's denorm joins feed BOTH the tick metric (count) and
          // the sink write — cache so they execute once per tick, not
          // twice (the inputs are cached table snapshots, but the join
          // work itself is the expensive part at scale).
          val docs = rebuild(t, p.target, ids).cache()
          try {
            val sink = p.target match {
              case "movies" => sinks.movies
              case "persons" => sinks.persons
              case "genres" => sinks.genres
            }
            val count = docs.count()
            sink.upsert(docs)
            cursors.save(p.name, advanced)
            TickResult(consumed = true, count)
          } finally { docs.unpersist(); ids.unpersist(); () }
        }
      p.name -> result
    }.toMap
  }

  /** Drain mode (Trigger.AvailableNow analogue): tick until no process
    * consumed any rows. A batch can consume rows yet write zero docs
    * (e.g. changed persons that appear in no film), so termination keys
    * off consumption, not doc counts.
    */
  def drain(
      spark: SparkSession,
      t: Tables,
      sinks: Sinks,
      cursors: Keyset.CursorStore,
      batchSize: Int = 1000,
      maxTicks: Int = 1000): Unit = {
    var ticks = 0
    while (ticks < maxTicks &&
      tick(spark, t, sinks, cursors, batchSize).values.exists(_.consumed))
      ticks += 1
  }
}
