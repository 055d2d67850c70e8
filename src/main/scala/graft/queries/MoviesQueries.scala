package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.movies._
import graft.ops.Checkpointer._

/** Driver-visible end-to-end run of the movies domain: dirty legacy
  * fixture → Ingest.normalize → Docs.movieDocs → Search, hash-checked
  * against a DuckDB recomputation of the BM25F scoring math (see q40's
  * oracle comment for the check's scope; per-operator semantics are
  * additionally oracle-checked via q01-q36 and unit-tested in
  * MoviesSpec).
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
    // End-to-end: dirty legacy fixture → normalize → denormalized doc
    // store → BM25F search ("lucas film" matches all three docs through
    // different fields: directors/writers, title+writers, title+actors).
    // The oracle recomputes the BM25F arithmetic (Search.score's
    // documented formula: document-level idf, field-weighted saturated
    // tf, k1=1.2 b=0.75) in DuckDB from the docs' analyzed token lists,
    // which are fixed constants of the static fixture (the analyzer
    // itself is spec-tested in AnalyzerSpec; the ingest/denorm hops are
    // oracle-checked by q01-q17/q53/q54). Scores compare in integer
    // millis so the two engines' double fold orders can't desync the
    // hash.
    GraftQuery(
      "q40_movies_pipeline",
      """WITH toks(id, field, tokens) AS (VALUES
        |  ('m1','actors_names',   ['mark','hamil']),
        |  ('m1','description',    ['space','opera']),
        |  ('m1','directors_names',['georg','luca']),
        |  ('m1','genres_names',   ['action','sci','fi']),
        |  ('m1','title',          ['star','war']),
        |  ('m1','writers_names',  ['georg','luca','leigh','brackett']),
        |  ('m2','actors_names',   CAST([] AS VARCHAR[])),
        |  ('m2','description',    CAST([] AS VARCHAR[])),
        |  ('m2','directors_names',CAST([] AS VARCHAR[])),
        |  ('m2','genres_names',   ['drama']),
        |  ('m2','title',          ['quiet','film']),
        |  ('m2','writers_names',  ['georg','luca']),
        |  ('m3','actors_names',   ['georg','luca']),
        |  ('m3','description',    ['explos']),
        |  ('m3','directors_names',['rick','author']),
        |  ('m3','genres_names',   ['action']),
        |  ('m3','title',          ['loud','film']),
        |  ('m3','writers_names',  CAST([] AS VARCHAR[]))),
        |wts(field, w) AS (VALUES
        |  ('title', 4.0), ('description', 3.0), ('genres_names', 2.0),
        |  ('actors_names', 4.0), ('writers_names', 1.0),
        |  ('directors_names', 3.0)),
        |terms(term) AS (VALUES ('luca'), ('film')),
        |n AS (SELECT CAST(COUNT(DISTINCT id) AS DOUBLE) AS n_docs FROM toks),
        |stats AS (
        |  SELECT field, AVG(CAST(len(tokens) AS DOUBLE)) AS avgdl
        |  FROM toks GROUP BY field),
        |dfs AS (
        |  SELECT term, CAST(COUNT(DISTINCT id) AS DOUBLE) AS df
        |  FROM terms JOIN toks ON list_contains(tokens, term)
        |  GROUP BY term),
        |contrib AS (
        |  SELECT t.id, tr.term,
        |    SUM(w.w * CAST(len(list_filter(t.tokens, x -> x = tr.term)) AS DOUBLE)
        |        / (0.25 + 0.75 * CAST(len(t.tokens) AS DOUBLE)
        |                 / GREATEST(s.avgdl, 1e-9))) AS tft
        |  FROM toks t
        |  JOIN wts w USING (field)
        |  JOIN stats s USING (field)
        |  CROSS JOIN terms tr
        |  GROUP BY t.id, tr.term),
        |score AS (
        |  SELECT c.id,
        |    SUM(ln(1.0 + (n.n_docs - d.df + 0.5) / (d.df + 0.5))
        |        * c.tft / (1.2 + c.tft)) AS score
        |  FROM contrib c JOIN dfs d USING (term) CROSS JOIN n
        |  GROUP BY c.id),
        |docs(id, title, actors_names, genres_names) AS (VALUES
        |  ('m1', 'Star Wars',  'Mark Hamill',  'Action,Sci-Fi'),
        |  ('m2', 'Quiet Film', '',             'Drama'),
        |  ('m3', 'Loud Film',  'George Lucas', 'Action'))
        |SELECT d.id, d.title,
        |  CAST(round(s.score * 1000) AS BIGINT) AS score_milli,
        |  d.actors_names, d.genres_names
        |FROM docs d JOIN score s USING (id)
        |WHERE s.score > 0
        |ORDER BY s.score DESC, d.id""".stripMargin) { (s, _) =>
      val (movies, actors, writers, movieActors) = legacyFixture(s)
      val n = Ingest.normalize(movies, actors, writers, movieActors)
      // Materialize the doc store before querying it — the reference
      // serves search from an index, not by re-running the ETL per
      // query; localCheckpoint is the single-job analogue (BM25F needs
      // a corpus-stats pass + a scoring pass over the same docs).
      // coalesce(1): the fixture doc store is 3 rows — checkpointing it
      // as 32 shuffle partitions makes every downstream pass a 32-task
      // stage of pure scheduling overhead. (A real corpus keeps its
      // partitioning; this is fixture-sizing, not engine tuning.)
      val docs = Docs.movieDocs(
        n.filmWork, n.person, n.genre, n.personFilmWork, n.genreFilmWork)
        .coalesce(1)
        .graftCheckpoint()
      Search.search(docs, Some("lucas film"), "imdb_rating", asc = false)
        .select(col("id"), col("title"),
          round(col("score") * 1000).cast("long").as("score_milli"),
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
    },

    // Multimodal resize: decode → nearest-neighbor 4×4 resample →
    // feature rollup. The oracle replicates the stub decode AND the
    // resampling kernel (dst (x,y,c) ← src (⌊x·sw/4⌋, ⌊y·sh/4⌋, c)) in
    // pure integer SQL, so the resize math is hash-checked end to end.
    GraftQuery(
      "q59_multimodal_resize",
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
        |  SELECT media_type,
        |    (1000 * CAST(list_sum(list_transform(
        |        generate_series(0, 47),
        |        j -> bytes[CAST((((((j // 3) // 4) * h // 4) * w
        |                          + ((j // 3) % 4) * w // 4) * 3
        |                         + (j % 3)) % len AS INTEGER) + 1]))
        |      AS BIGINT)) // (255 * 48) AS luma
        |  FROM f)
        |SELECT media_type, COUNT(*) AS n,
        |  CAST(SUM(luma) AS BIGINT) AS sum_luma
        |FROM g GROUP BY media_type ORDER BY media_type""".stripMargin) {
      (s, _) =>
      import graft.ops.MultimodalOps
      val media = MultimodalOps.syntheticMedia(s, 300)
      val feats = MultimodalOps.resizeImageFeatures(media, 4, 4)
      media.select(col("media_id"), col("meta.media_type").as("media_type"))
        .join(feats, "media_id")
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("mean_luma_milli")).as("sum_luma"))
        .orderBy(col("media_type"))
    },

    // REAL image codec round trip: deterministic pixels → JDK PNG encode
    // (executor-side) → javax.imageio decode → integer luma features.
    // PNG is lossless, so the oracle recomputes the features straight
    // from the pixel formula — any codec bug (channel order, row order,
    // bit depth, stride) breaks the hash. No stub anywhere on this path.
    GraftQuery(
      "q93_png_decode",
      """WITH m AS (
        |  SELECT i, 1 + (i % 8) AS w, 1 + ((i*7) % 8) AS h
        |  FROM generate_series(0, 199) t(i))
        |SELECT 'png' || CAST(i AS VARCHAR) AS media_id,
        |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(3 AS INTEGER) AS n_channels,
        |  (1000 * CAST(list_sum(list_transform(
        |      generate_series(0, CAST(w*h*3 - 1 AS INTEGER)),
        |      p -> (i*31 + p*7) % 256)) AS BIGINT))
        |    // (255 * w*h*3) AS mean_luma_milli
        |FROM m ORDER BY media_id""".stripMargin) { (s, _) =>
      import graft.ops.MultimodalOps
      val media = MultimodalOps.syntheticPngMedia(s, 200)
      MultimodalOps.decodeImageFeatures(media)
        .select(col("media_id"), col("width"), col("height"),
          col("n_channels"), col("mean_luma_milli"))
        .orderBy(col("media_id"))
    },

    // REAL audio codec round trip: deterministic PCM16 samples → JDK WAV
    // encode → javax.sound.sampled decode → exact integer energy (Σ s²).
    // Same lossless-container argument as q93; the oracle recomputes
    // energy from the sample formula.
    GraftQuery(
      "q94_wav_decode",
      """WITH m AS (
        |  SELECT i, CAST(8000 + (i % 3) * 4000 AS INTEGER) AS sample_rate,
        |         CAST(64 + (i % 64) AS INTEGER) AS n_samples
        |  FROM generate_series(0, 299) t(i))
        |SELECT 'wav' || CAST(i AS VARCHAR) AS media_id, sample_rate, n_samples,
        |  CAST(list_sum(list_transform(
        |      generate_series(0, CAST(n_samples - 1 AS INTEGER)),
        |      t2 -> ((i*31 + t2*7) % 2048 - 1024)
        |            * ((i*31 + t2*7) % 2048 - 1024))) AS BIGINT) AS energy
        |FROM m ORDER BY media_id""".stripMargin) { (s, _) =>
      import graft.ops.MultimodalOps
      val media = MultimodalOps.syntheticWavMedia(s, 300)
      MultimodalOps.decodeAudioEnergy(media)
        .orderBy(col("media_id"))
    },

    // Image perceptual hash (aHash) — the image-modality dedup key,
    // completing the text/embedding/image dedup family. Spark decodes
    // the REAL PNG bytes, NN-downsamples to 8×8 (q59's integer kernel),
    // grays each cell (sum of rounded channel bytes), thresholds at the
    // integer mean, and packs 64 bits into two BIGINT halves; the
    // oracle replays the identical integer math straight from the
    // synthetic pixel formula — so both the codec round trip AND the
    // hash arithmetic are hash-checked.
    GraftQuery(
      "q119_image_ahash",
      """WITH m AS (
        |  SELECT i, 1 + (i % 8) AS w, 1 + ((i*7) % 8) AS h
        |  FROM generate_series(0, 199) t(i)),
        |g AS (
        |  SELECT i,
        |    list_transform(generate_series(0, 63), j ->
        |      CAST(list_sum(list_transform(generate_series(0, 2), c ->
        |        (i*31 + ((((j // 8) * h // 8) * w + ((j % 8) * w // 8))
        |                 * 3 + c) * 7) % 256)) AS BIGINT)) AS gray
        |  FROM m),
        |s AS (SELECT i, gray,
        |  CAST(list_sum(gray) AS BIGINT) // 64 AS mean FROM g)
        |SELECT 'png' || CAST(i AS VARCHAR) AS media_id,
        |  CAST(list_sum(list_transform(generate_series(32, 63), j ->
        |    CASE WHEN gray[j+1] > mean
        |      THEN CAST(pow(2, j - 32) AS BIGINT) ELSE 0 END)) AS BIGINT)
        |    AS ahash_hi,
        |  CAST(list_sum(list_transform(generate_series(0, 31), j ->
        |    CASE WHEN gray[j+1] > mean
        |      THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END)) AS BIGINT)
        |    AS ahash_lo
        |FROM s ORDER BY media_id""".stripMargin) { (s, _) =>
      import graft.ops.MultimodalOps
      MultimodalOps.imageAHash(MultimodalOps.syntheticPngMedia(s, 200))
        .orderBy(col("media_id"))
    },

    // Image → patch-embedding prep (MultimodalOps.imagePatchVector):
    // REAL PNG decode → nearest-neighbor 4×4 grid → 16 integer gray
    // cells per image in the exploded (id, dim, value) layout the
    // embedding ops consume (q205/q215/ANN). Spark decodes the actual
    // bytes; the oracle replays the identical integer kernel from the
    // synthetic pixel formula (the q119 contract).
    GraftQuery(
      "q222_patch_embed",
      """WITH m AS (
        |  SELECT i, 1 + (i % 8) AS w, 1 + ((i*7) % 8) AS h
        |  FROM generate_series(0, 199) t(i)),
        |g AS (
        |  SELECT i, u.j AS p,
        |    CAST(list_sum(list_transform(generate_series(0, 2), c ->
        |      (i*31 + ((((u.j // 4) * h // 4) * w
        |               + ((u.j % 4) * w // 4)) * 3 + c) * 7) % 256))
        |      AS BIGINT) AS gray
        |  FROM m, UNNEST(generate_series(0, 15)) AS u(j))
        |SELECT 'png' || CAST(i AS VARCHAR) AS media_id,
        |  CAST(p AS INTEGER) AS p, gray
        |FROM g ORDER BY media_id, p""".stripMargin) { (s, _) =>
      import graft.ops.MultimodalOps
      MultimodalOps.imagePatchVector(
          MultimodalOps.syntheticPngMedia(s, 200), dw = 4, dh = 4)
        .orderBy(col("media_id"), col("p"))
    },

    // Audio fingerprint (energy-delta sign bits) — q119's audio twin:
    // Spark decodes the REAL WAV bytes, windows the PCM16 samples,
    // takes exact integer energies, and packs sign-of-delta bits; the
    // oracle replays the identical arithmetic from the sample formula.
    GraftQuery(
      "q120_audio_fingerprint",
      """WITH m AS (
        |  SELECT i, CAST(64 + (i % 64) AS INTEGER) AS n
        |  FROM generate_series(0, 299) t(i)),
        |e AS (
        |  SELECT i, n // 16 AS nw,
        |    list_transform(generate_series(0, n // 16 - 1), w ->
        |      CAST(list_sum(list_transform(generate_series(0, 15), s ->
        |        ((i*31 + (w*16 + s)*7) % 2048 - 1024)
        |        * ((i*31 + (w*16 + s)*7) % 2048 - 1024))) AS BIGINT))
        |      AS energy
        |  FROM m)
        |SELECT 'wav' || CAST(i AS VARCHAR) AS media_id,
        |  CAST(nw AS INTEGER) AS n_windows,
        |  CAST(list_sum(list_transform(
        |      generate_series(1, CAST(nw - 1 AS INTEGER)), k ->
        |    CASE WHEN energy[k+1] > energy[k]
        |      THEN CAST(pow(2, k - 1) AS BIGINT) ELSE 0 END)) AS BIGINT)
        |    AS fp_bits
        |FROM e ORDER BY media_id""".stripMargin) { (s, _) =>
      import graft.ops.MultimodalOps
      MultimodalOps.audioFingerprint(
          MultimodalOps.syntheticWavMedia(s, 300), windowSamples = 16)
        .orderBy(col("media_id"))
    })
}
