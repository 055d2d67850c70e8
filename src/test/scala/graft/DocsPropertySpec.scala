package graft

import java.sql.Timestamp
import org.apache.spark.sql.Row
import graft.movies.Docs

/** Differential test of the denormalization: Docs.movieDocs (distributed
  * aggregate-then-join) vs an independent driver-side referee computed
  * with plain Scala collections, over random film/person/genre graphs —
  * the §5.4 "aggregate-then-join ≡ reference lateral semantics on random
  * graphs" property.
  */
class DocsPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("movieDocs equals a plain-Scala referee on random graphs") {
    for (seed <- Seq(2, 11, 23)) {
      val rnd = new scala.util.Random(seed)
      val films = (1 to 8).map(i => (s"f$i", s"Film $i", s"plot $i",
        if (rnd.nextBoolean()) rnd.nextInt(100) / 10.0 else Double.NaN))
      val persons = (1 to 10).map(i => (s"p$i", s"Person $i"))
      val genres = (1 to 4).map(i => (s"g$i", s"Genre $i"))
      val roles = Seq("actor", "director", "writer")
      // random bridges incl. multi-role persons and empty films
      val pfw = (1 to 25).map { i =>
        (s"pfw$i", s"f${1 + rnd.nextInt(8)}", s"p${1 + rnd.nextInt(10)}",
          roles(rnd.nextInt(3)))
      }.distinct.groupBy(r => (r._2, r._3, r._4)).map(_._2.head).toSeq
      val gfw = (1 to 12).map { i =>
        (s"gfw$i", s"f${1 + rnd.nextInt(8)}", s"g${1 + rnd.nextInt(4)}")
      }.distinct.groupBy(r => (r._2, r._3)).map(_._2.head).toSeq

      val filmDf = films.map { case (id, t, d, r) =>
        (id, t, d, if (r.isNaN) None else Some(r), ts(1), ts(1))
      }.toDF("id", "title", "description", "rating",
        "created_at", "updated_at")
      val personDf = persons.map { case (id, n) => (id, n, ts(1), ts(1)) }
        .toDF("id", "full_name", "created_at", "updated_at")
      val genreDf = genres.map { case (id, n) => (id, n, ts(1), ts(1)) }
        .toDF("id", "name", "created_at", "updated_at")
      val pfwDf = pfw.map { case (id, f, p, r) => (id, f, p, r, ts(1)) }
        .toDF("id", "film_work_id", "person_id", "role", "created_at")
      val gfwDf = gfw.map { case (id, f, g) => (id, f, g, ts(1)) }
        .toDF("id", "film_work_id", "genre_id", "created_at")

      val got = Docs.movieDocs(filmDf, personDf, genreDf, pfwDf, gfwDf)
        .collect().map(r => r.getString(0) -> r).toMap

      val personName = persons.toMap
      val genreName = genres.toMap
      for ((fid, _, _, _) <- films) {
        val doc = got(fid)
        def names(role: String): Seq[String] = pfw
          .filter(b => b._2 == fid && b._4 == role)
          .map(b => (personName(b._3), b._3)) // sort key (name, id)
          .sorted.map(_._1)
        assert(doc.getSeq[String](doc.fieldIndex("actors_names"))
          === names("actor"), s"seed=$seed film=$fid actors")
        assert(doc.getSeq[String](doc.fieldIndex("writers_names"))
          === names("writer"), s"seed=$seed film=$fid writers")
        assert(doc.getSeq[String](doc.fieldIndex("directors_names"))
          === names("director"), s"seed=$seed film=$fid directors")
        val expectedGenres = gfw.filter(_._2 == fid)
          .map(b => genreName(b._3)).sorted
        assert(doc.getSeq[String](doc.fieldIndex("genres_names"))
          === expectedGenres, s"seed=$seed film=$fid genres")
        // structs align with names (id field consistent with dim)
        val actorStructs = doc.getSeq[Row](doc.fieldIndex("actors"))
        assert(actorStructs.map(_.getString(1)) === names("actor"))
        actorStructs.foreach(s =>
          assert(personName(s.getString(0)) === s.getString(1)))
      }
    }
  }
}
