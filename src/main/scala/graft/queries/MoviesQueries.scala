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
          col("actors_names"), col("genres_names"))
    },

    // Multimodal plumbing, driver-visible: synthetic binary media →
    // partition-wise stub decode → per-type feature rollup (rows-only
    // check; blob bytes are engine-generated, not SQL-reachable).
    GraftQuery.noOracle("q41_multimodal_features") { (s, _) =>
      import graft.ops.MultimodalOps
      val media = MultimodalOps.syntheticMedia(s, 300)
      val feats = MultimodalOps.decodeImageFeatures(media)
      media.select(col("media_id"), col("meta.media_type").as("media_type"))
        .join(feats, "media_id")
        .groupBy(col("media_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("mean_luma_milli")).as("sum_luma"),
          avg(col("width")).as("avg_w"))
        .orderBy(col("media_type"))
    })
}
