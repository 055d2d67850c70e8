package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.movies._

/** Driver-visible end-to-end run of the movies domain: dirty legacy
  * fixture → Ingest.normalize → Docs.movieDocs → Search. Deterministic
  * output (rows-only check — the pipeline is not expressible as one SQL
  * statement over the driver's TPC-H tables; its per-operator semantics
  * are oracle-checked via q01-q36 and unit-tested in MoviesSpec).
  */
object MoviesQueries {

  private def legacyFixture(s: SparkSession) = {
    import s.implicits._
    val movies = Seq(
      ("m1", "Action, Sci-Fi", "George Lucas", "",
        "Star Wars", "A space opera.", "x", "8.6",
        """[{"id":"w1"},{"id":"w2"}]"""),
      ("m2", "Drama", "N/A", "w2",
        "Quiet Film", "N/A", "x", "N/A", ""),
      ("m3", "Action", "Rick Author", "",
        "Loud Film", "Explosions.", "x", "5.1", "")
    ).toDF("id", "genre", "director", "writer", "title", "plot", "ratings",
      "imdb_rating", "writers")
    val actors = Seq((1L, "Mark Hamill"), (2L, "N/A"), (3L, "George Lucas"))
      .toDF("id", "name")
    val writers = Seq(("w1", "Leigh Brackett"), ("w2", "George Lucas"))
      .toDF("id", "name")
    val movieActors = Seq(("m1", "1"), ("m1", "2"), ("m3", "3"))
      .toDF("movie_id", "actor_id")
    (movies, actors, writers, movieActors)
  }

  val all: Seq[GraftQuery] = Seq(
    GraftQuery.noOracle("q40_movies_pipeline") { (s, _) =>
      val (movies, actors, writers, movieActors) = legacyFixture(s)
      val n = Ingest.normalize(movies, actors, writers, movieActors)
      // Materialize the doc store before querying it — the reference
      // serves search from an index, not by re-running the ETL per
      // query; localCheckpoint is the single-job analogue (BM25F needs
      // a corpus-stats pass + a scoring pass over the same docs).
      val docs = Docs.movieDocs(
        n.filmWork, n.person, n.genre, n.personFilmWork, n.genreFilmWork)
        .localCheckpoint()
      Search.search(docs, Some("star wars"), "imdb_rating", asc = false)
        .select(col("id"), col("title"), col("score"),
          // the driver sorts rows by every column; arrays aren't
          // sortable in pandas — stringify them (same as q09)
          array_join(col("actors_names"), ",").as("actors_names"),
          array_join(col("genres_names"), ",").as("genres_names"))
    },

    // Multimodal plumbing, driver-visible: synthetic binary media →
    // partition-wise stub decode → per-type feature rollup. The stub
    // decode is a pure integer function of the blob bytes, and the
    // blob bytes a pure function of the row index, so the whole
    // pipeline is replayable as table-free SQL — that is the oracle.
    GraftQuery(
      "q41_multimodal_features",
      """WITH m AS (
        |  SELECT i,
        |    CASE CAST(i % 3 AS INTEGER) WHEN 0 THEN 'image'
        |         WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |    CAST(16 + (i % 16) AS INTEGER) AS len
        |  FROM generate_series(0, 299) t(i)),
        |b AS (
        |  SELECT media_type, len,
        |    list_transform(generate_series(0, len - 1),
        |      j -> CAST((i*31 + j*7) % 127 AS BIGINT)) AS bytes
        |  FROM m),
        |f AS (
        |  SELECT media_type, len, bytes,
        |    CAST(1 + (bytes[1] % 8) AS BIGINT) AS w,
        |    CAST(1 + (bytes[len] % 8) AS BIGINT) AS h
        |  FROM b),
        |g AS (
        |  SELECT media_type, w, h,
        |    (1000 * CAST(list_sum(list_transform(
        |        generate_series(0, CAST(w*h*3 - 1 AS INTEGER)),
        |        p -> bytes[CAST(p % len AS INTEGER) + 1])) AS BIGINT))
        |      // (255 * w*h*3) AS luma
        |  FROM f)
        |SELECT media_type, COUNT(*) AS n,
        |  CAST(SUM(luma) AS BIGINT) AS sum_luma,
        |  CAST(SUM(w) AS BIGINT) AS sum_w,
        |  CAST(SUM(h) AS BIGINT) AS sum_h
        |FROM g GROUP BY media_type ORDER BY media_type""".stripMargin) {
      (s, _) =>
      import graft.ops.MultimodalOps
      val media = MultimodalOps.syntheticMedia(s, 300)
      val feats = MultimodalOps.decodeImageFeatures(media)
      media.select(col("media_id"), col("meta.media_type").as("media_type"))
        .join(feats, "media_id")
        .groupBy(col("media_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("mean_luma_milli")).as("sum_luma"),
          sum(col("width").cast("long")).as("sum_w"),
          sum(col("height").cast("long")).as("sum_h"))
        .orderBy(col("media_type"))
    })
}
