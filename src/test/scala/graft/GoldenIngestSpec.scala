package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.movies._

/** Golden end-to-end over the reference's REAL legacy dataset (1000
  * movies / 2683 actors / 1192 writers / 3519 links, exported to JSONL
  * by tools/export_legacy.py): full ingest → denormalization → search,
  * asserting the SURVEY §5.2 invariants.
  */
class GoldenIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def res(name: String): String =
    getClass.getResource(s"/legacy/$name.jsonl").getPath

  private lazy val norm: Ingest.Normalized = {
    def read(name: String, schema: org.apache.spark.sql.types.StructType) =
      spark.read.schema(schema).json(res(name))
    Ingest.normalize(
      read("movies", Schemas.LegacyMovies),
      read("actors", Schemas.LegacyActors),
      read("writers", Schemas.LegacyWriters),
      read("movie_actors", Schemas.LegacyMovieActors))
  }

  private lazy val docs: DataFrame = Docs.movieDocs(
    norm.filmWork, norm.person, norm.genre,
    norm.personFilmWork, norm.genreFilmWork).cache()

  test("golden counts: all 1000 films ingest; dims deduplicate by name; " +
       "sentinel-named people are excluded") {
    assert(norm.filmWork.count() === 1000)
    // persons = distinct full_names across actor dims + writer dims +
    // director CSV names (directors aren't in any dim table, so the
    // total exceeds the 2683+1192 dim rows even after name-dedup)
    val nPersons = norm.person.count()
    assert(nPersons > 1000 && nPersons < 5500, s"persons: $nPersons")
    assert(nPersons ===
      norm.personFilmWork.select("person_id").distinct().count())
    assert(norm.genre.count() > 5 && norm.genre.count() < 50)
    assert(norm.person.filter($"full_name".isin("N/A", "")).count() === 0)
  }

  test("golden docs: one doc per film; arrays non-null; roles in enum; " +
       "names align with structs") {
    assert(docs.count() === 1000)
    val badRole = norm.personFilmWork
      .filter(!$"role".isin("actor", "director", "writer")).count()
    assert(badRole === 0)
    val nullArrays = docs.filter(
      $"actors_names".isNull || $"writers_names".isNull ||
        $"directors_names".isNull || $"genres_names".isNull ||
        $"actors".isNull || $"genres".isNull).count()
    assert(nullArrays === 0)
    val misaligned = docs.filter(
      transform($"actors", a => a.getField("name")) =!= $"actors_names" ||
        transform($"directors", d => d.getField("name")) =!= $"directors_names")
      .count()
    assert(misaligned === 0)
  }

  test("golden ratings: N/A ratings are null, the rest parse as doubles " +
       "in [0,10]") {
    val bad = docs.filter($"imdb_rating".isNotNull &&
      ($"imdb_rating" < 0 || $"imdb_rating" > 10)).count()
    assert(bad === 0)
    assert(docs.filter($"imdb_rating".isNull).count() > 0) // N/A existed
  }

  test("golden search intent: 'Star Wars' ranks Star Wars titles first; " +
       "'George Lucas' films found via role fields") {
    val star = Search.search(docs, Some("Star Wars"), "imdb_rating",
      asc = false, limit = 10)
      .select($"title").as[String].collect()
    assert(star.nonEmpty)
    assert(star.head.toLowerCase.contains("star wars"),
      s"top hit was: ${star.head}")
    val lucas = Search.search(docs, Some("George Lucas"), "imdb_rating",
      asc = false, limit = 50)
      .select($"directors_names", $"writers_names", $"actors_names")
      .collect()
    assert(lucas.nonEmpty)
    val viaRoles = lucas.count { r =>
      (r.getSeq[String](0) ++ r.getSeq[String](1) ++ r.getSeq[String](2))
        .contains("George Lucas")
    }
    assert(viaRoles > 0, "no hit actually involves George Lucas")
  }

  test("golden determinism: rerunning the full pipeline produces " +
       "identical docs (deterministic surrogate ids)") {
    val again = Docs.movieDocs(norm.filmWork, norm.person, norm.genre,
      norm.personFilmWork, norm.genreFilmWork)
    assert(docs.exceptAll(again).count() === 0)
    assert(again.exceptAll(docs).count() === 0)
  }
}
