package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.cdc.ManifestUpsertSink

/** [[graft.cdc.ManifestUpsertSink]] — the crash-safe snapshot-commit
  * doc store. Drills the full [[graft.cdc.DocSink]] contract (upsert
  * replace semantics, idempotent replay, targeted + total delete) AND
  * the property the dynamic-overwrite sink cannot give: a crash
  * anywhere between the data write and the manifest swap leaves the
  * previous snapshot bit-for-bit readable, with the orphaned commit
  * garbage-collected by the next successful commit.
  */
class ManifestSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_msink").toString

  private def docs(rows: (String, String)*): DataFrame =
    rows.toDF("id", "title")

  private def idsOf(s: ManifestUpsertSink): Set[(String, String)] =
    s.read().get.as[(String, String)].collect().toSet

  private def commitDirs(dir: String): Set[String] = {
    val d = new java.io.File(s"$dir/data")
    if (!d.exists()) Set.empty
    else d.listFiles().map(_.getName).filter(_.startsWith("commit-")).toSet
  }

  test("upsert-by-id contract: insert, replace, replay no-op, read " +
       "round-trip; absent store reads None") {
    val dir = tmp()
    val sink = new ManifestUpsertSink(spark, dir, "id", nBuckets = 4,
      retainSnapshots = 1)
    assert(sink.read() === None)
    sink.upsert(docs("a" -> "one", "b" -> "two", "c" -> "three"))
    assert(idsOf(sink) === Set("a" -> "one", "b" -> "two", "c" -> "three"))
    // replace one, add one
    sink.upsert(docs("b" -> "TWO", "d" -> "four"))
    assert(idsOf(sink) ===
      Set("a" -> "one", "b" -> "TWO", "c" -> "three", "d" -> "four"))
    // replay the same batch: identical store
    sink.upsert(docs("b" -> "TWO", "d" -> "four"))
    assert(idsOf(sink) ===
      Set("a" -> "one", "b" -> "TWO", "c" -> "three", "d" -> "four"))
    // every upsert rewrote only affected buckets, and gc keeps the dir
    // set == the manifest's referenced set (no unbounded accumulation)
    val referenced = sink.currentManifest().values.toSet
    assert(commitDirs(dir) === referenced)
  }

  test("EMPTY batches are no-ops, not crashes: CdcPipeline ticks can " +
       "consume rows yet emit zero docs (an empty partitioned write " +
       "has no readable schema — staging must detect it, not read it)") {
    val dir = tmp()
    val sink = new ManifestUpsertSink(spark, dir, "id", nBuckets = 4,
      retainSnapshots = 1)
    sink.upsert(docs()) // empty upsert on an ABSENT store
    assert(sink.read() === None)
    sink.upsert(docs("a" -> "one"))
    sink.upsert(docs()) // empty upsert on an existing store
    sink.delete(Seq.empty[String].toDF("id")) // empty delete
    assert(idsOf(sink) === Set("a" -> "one"))
    assert(commitDirs(dir) === sink.currentManifest().values.toSet)
  }

  test("nondeterministic input plan: the batch is staged once, so the " +
       "written buckets and the manifest entries come from the SAME " +
       "evaluation (a re-evaluating plan cannot desync pointers)") {
    import org.apache.spark.sql.functions.{col, concat, lit, rand}
    val dir = tmp()
    val sink = new ManifestUpsertSink(spark, dir, "id", nBuckets = 8,
      retainSnapshots = 1)
    // ids depend on rand(): every evaluation of this plan yields a
    // DIFFERENT id set, hence different buckets — the r9 sink evaluated
    // it twice (affected-set collect, then the commit write)
    val volatile = spark.range(64)
      .select(concat(lit("id_"), (rand() * 1e9).cast("long")).as("id"),
        lit("v").as("title"))
    sink.upsert(volatile)
    // every manifest pointer must resolve to a written bucket dir and
    // the store must read back cleanly
    val m = sink.currentManifest()
    for ((b, c) <- m)
      assert(new java.io.File(s"$dir/data/$c/bucket=$b").exists(),
        s"manifest points at unwritten bucket=$b in $c")
    assert(sink.read().get.count() === 64L)
    // and read() serves every staged row: ids are unique per evaluation
    assert(sink.read().get.select("id").distinct().count() === 64L)
  }

  test("targeted delete removes exactly the requested ids (absent ids " +
       "ignored, replay no-op); deleting everything collapses to absent " +
       "and the next upsert bootstraps") {
    val dir = tmp()
    val sink = new ManifestUpsertSink(spark, dir, "id", nBuckets = 4,
      retainSnapshots = 1)
    sink.upsert(docs((1 to 12).map(i => s"x$i" -> s"v$i"): _*))
    val victims = (1 to 11).map(i => s"x$i")
    sink.delete((victims :+ "never_existed").toDF("id"))
    assert(idsOf(sink) === Set("x12" -> "v12"))
    sink.delete(victims.toDF("id")) // replay
    assert(idsOf(sink) === Set("x12" -> "v12"))
    sink.delete(Seq("x12").toDF("id"))
    assert(sink.read() === None,
      "emptied store must read as absent, not throw")
    assert(commitDirs(dir).isEmpty, "all commits must be gc'd with the store")
    sink.delete(Seq("x12").toDF("id")) // delete against absent store
    assert(sink.read() === None)
    sink.upsert(docs("fresh" -> "start"))
    assert(idsOf(sink) === Set("fresh" -> "start"))
  }

  test("bucket-granular gc: a PARTIALLY superseded commit sheds its " +
       "stale bucket copies immediately (storage == live set, no " +
       "unbounded accumulation under per-tick bucket churn)") {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val dir = tmp()
    val sink = new ManifestUpsertSink(spark, dir, "id", nBuckets = 4,
      retainSnapshots = 1)
    val ids = (1 to 16).map(i => s"d$i")
    // compute each id's bucket the same way the sink does
    val byBucket = ids.toDF("id")
      .select(col("id"), pmod(xxhash64(col("id")), lit(4)).as("b"))
      .as[(String, Long)].collect().toMap
    val idA = ids.head
    val idB = ids.find(i => byBucket(i) != byBucket(idA)).get
    sink.upsert(docs(ids.map(i => i -> s"v_$i"): _*)) // commit-0, all buckets
    sink.upsert(docs(idA -> "REPLACED"))              // commit-1, idA's bucket
    // commit-0 survives (still owns idB's bucket) but its copy of idA's
    // bucket must be gone; commit-1 holds only idA's bucket
    val c0 = new java.io.File(s"$dir/data/commit-0")
    val c1 = new java.io.File(s"$dir/data/commit-1")
    assert(c0.exists() && c1.exists())
    def buckets(f: java.io.File): Set[String] =
      f.listFiles().map(_.getName).filter(_.startsWith("bucket=")).toSet
    assert(!buckets(c0).contains(s"bucket=${byBucket(idA)}"),
      "stale copy of the superseded bucket must be gc'd from commit-0")
    assert(buckets(c0).contains(s"bucket=${byBucket(idB)}"))
    assert(buckets(c1) === Set(s"bucket=${byBucket(idA)}"))
    // content correct: replaced doc + every doc in idA's bucket merged
    // into commit-1, everything else still served from commit-0
    val expect = ids.map(i => i -> (if (i == idA) "REPLACED" else s"v_$i"))
    assert(idsOf(sink) === expect.toSet)
  }

  test("CRASH between data write and manifest swap: previous snapshot " +
       "stays fully readable, recovery replay converges, orphan commit " +
       "dirs are gc'd by the next successful commit") {
    val dir = tmp()
    val stable = new ManifestUpsertSink(spark, dir, "id", nBuckets = 4,
      retainSnapshots = 1)
    stable.upsert(docs("a" -> "one", "b" -> "two", "c" -> "three"))
    val before = idsOf(stable)
    val dirsBefore = commitDirs(dir)

    // a sink whose commit step dies AFTER the new data files exist
    val crashing = new ManifestUpsertSink(spark, dir, "id", nBuckets = 4,
      retainSnapshots = 1,
      beforeCommit = () => throw new RuntimeException("power cut"))
    val boom = intercept[RuntimeException] {
      crashing.upsert(docs("b" -> "TWO", "z" -> "new"))
    }
    assert(boom.getMessage === "power cut")
    // old snapshot intact — the exact data-loss window dynamic
    // overwrite leaves open
    assert(idsOf(stable) === before)
    // the orphaned commit dir exists but is unreferenced
    assert(commitDirs(dir).size === dirsBefore.size + 1)

    // recovery: replay the same batch through a healthy sink (what the
    // retry policy / CDC replay does)
    stable.upsert(docs("b" -> "TWO", "z" -> "new"))
    assert(idsOf(stable) ===
      Set("a" -> "one", "b" -> "TWO", "c" -> "three", "z" -> "new"))
    // gc removed the orphan AND superseded commits: dirs == referenced
    assert(commitDirs(dir) === stable.currentManifest().values.toSet)

    // crash mid-DELETE is equally safe
    val crashingDel = new ManifestUpsertSink(spark, dir, "id", nBuckets = 4,
      retainSnapshots = 1,
      beforeCommit = () => throw new RuntimeException("power cut"))
    val snap = idsOf(stable)
    intercept[RuntimeException] { crashingDel.delete(Seq("a").toDF("id")) }
    assert(idsOf(stable) === snap)
    stable.delete(Seq("a").toDF("id"))
    assert(idsOf(stable) === snap.filterNot(_._1 == "a"))
  }

  test("legacy single-MANIFEST store: readers read it IN PLACE (no " +
       "mutation — read-only mounts stay readable), the first write " +
       "migrates it, and no pre-migration data is lost to gc") {
    val dir = tmp()
    val sink = new ManifestUpsertSink(spark, dir, "id", nBuckets = 4,
      retainSnapshots = 1)
    sink.upsert(docs("a" -> "one", "b" -> "two", "c" -> "three"))
    // devolve the store to the pre-versioning layout
    val v0 = java.nio.file.Paths.get(dir)
      .resolve(new java.io.File(dir).list()
        .find(_.startsWith("MANIFEST-")).get)
    java.nio.file.Files.move(v0, java.nio.file.Paths.get(s"$dir/MANIFEST"))
    // pure read: content served, legacy file untouched
    assert(idsOf(sink) === Set("a" -> "one", "b" -> "two", "c" -> "three"))
    assert(new java.io.File(s"$dir/MANIFEST").exists(),
      "a read must not mutate the store")
    // first write migrates AND keeps every pre-migration doc
    sink.upsert(docs("d" -> "four"))
    assert(!new java.io.File(s"$dir/MANIFEST").exists(),
      "legacy retired (retainSnapshots=1: window already full)")
    assert(idsOf(sink) ===
      Set("a" -> "one", "b" -> "two", "c" -> "three", "d" -> "four"))
    assert(commitDirs(dir) === sink.currentManifest().values.toSet,
      "gc must not touch the legacy snapshot's buckets")
  }

  test("legacy store under retention: the pre-versioning snapshot gets " +
       "the SAME retainSnapshots window as a versioned one — a reader " +
       "holding a legacy plan survives the first post-migration commit") {
    val dir = tmp()
    val sink = new ManifestUpsertSink(spark, dir, "id", nBuckets = 1,
      retainSnapshots = 2)
    sink.upsert(docs("a" -> "v1")) // nBuckets=1: every commit rewrites
    val v0 = java.nio.file.Paths.get(dir)
      .resolve(new java.io.File(dir).list()
        .find(_.startsWith("MANIFEST-")).get)
    java.nio.file.Files.move(v0, java.nio.file.Paths.get(s"$dir/MANIFEST"))
    val reader = sink.read().get // planned against the LEGACY snapshot
    val snapshot = reader.as[(String, String)].collect().toSet
    sink.upsert(docs("a" -> "v2")) // migrates; legacy must survive gc
    assert(new java.io.File(s"$dir/MANIFEST").exists(),
      "legacy counts as a retained snapshot until the window fills")
    assert(reader.as[(String, String)].collect().toSet === snapshot,
      "legacy reader must survive the first post-migration commit")
    sink.upsert(docs("a" -> "v3")) // window full: legacy ages out
    assert(!new java.io.File(s"$dir/MANIFEST").exists())
    assert(idsOf(sink) === Set("a" -> "v3"))
  }

  test("retention window: a reader holding a snapshot-v plan survives " +
       "retainSnapshots - 1 later commits to the SAME bucket, then ages " +
       "out; crash-publish never deletes the live manifest before the " +
       "replacement is durable (fresh-name rename, no clobber)") {
    val dir = tmp()
    val sink = new ManifestUpsertSink(spark, dir, "id", nBuckets = 1,
      retainSnapshots = 3)
    sink.upsert(docs("a" -> "v1"))
    // reader plans against snapshot v0 (nBuckets=1: every later commit
    // rewrites the reader's one bucket — the worst case)
    val reader = sink.read().get
    val snapshot = reader.as[(String, String)].collect().toSet
    sink.upsert(docs("a" -> "v2")) // commit 2
    sink.upsert(docs("a" -> "v3")) // commit 3 — v0 still retained (last 3)
    assert(reader.as[(String, String)].collect().toSet === snapshot,
      "reader plan must survive retainSnapshots - 1 later commits")
    assert(idsOf(sink) === Set("a" -> "v3"), "current snapshot advanced")
    // storage is bounded by the window: exactly the last 3 manifests'
    // referenced dirs survive gc
    val retained = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("MANIFEST-")).sorted.toSeq
    assert(retained.size === 3, s"manifest files pruned to window: $retained")
    sink.upsert(docs("a" -> "v4")) // commit 4 — v0 ages out
    val c0 = commitDirs(dir)
    assert(!c0.contains("commit-0"),
      "snapshot beyond the retention window must be gc'd")
    assert(c0.size === 3, "exactly the retained snapshots' dirs remain")
  }

  test("drop-in DocSink: CdcPipeline drain over manifest sinks matches " +
       "the dynamic-overwrite sinks' final index state") {
    import java.sql.Timestamp
    import graft.cdc._
    def ts(s: Long) = new Timestamp(s * 1000)
    val src = tmp()
    def w(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$src/$name")
    w("film_work", Seq(
      ("f1", "Star Wars", "Space opera", 8.6, ts(100), ts(100)),
      ("f2", "Quiet Film", "Slow burn", 6.0, ts(100), ts(101))
    ).toDF("id", "title", "description", "rating", "created_at", "updated_at"))
    w("person", Seq(("p1", "George Lucas", ts(100), ts(100)))
      .toDF("id", "full_name", "created_at", "updated_at"))
    w("genre", Seq(("g1", "Sci-Fi", ts(100), ts(100)))
      .toDF("id", "name", "created_at", "updated_at"))
    w("person_film_work", Seq(("pfw1", "f1", "p1", "director", ts(100)))
      .toDF("id", "film_work_id", "person_id", "role", "created_at"))
    w("genre_film_work", Seq(("gfw1", "f1", "g1", ts(100)))
      .toDF("id", "film_work_id", "genre_id", "created_at"))
    val t = CdcPipeline.Tables(
      filmWork = () => spark.read.parquet(s"$src/film_work"),
      person = () => spark.read.parquet(s"$src/person"),
      genre = () => spark.read.parquet(s"$src/genre"),
      personFilmWork = () => spark.read.parquet(s"$src/person_film_work"),
      genreFilmWork = () => spark.read.parquet(s"$src/genre_film_work"))

    val a = tmp(); val b = tmp()
    val overwriteSinks = CdcPipeline.Sinks(
      movies = new UpsertSink(spark, s"$a/m", "id", nBuckets = 4),
      persons = new UpsertSink(spark, s"$a/p", "id", nBuckets = 4),
      genres = new UpsertSink(spark, s"$a/g", "id", nBuckets = 4))
    val manifestSinks = CdcPipeline.Sinks(
      movies = new ManifestUpsertSink(spark, s"$b/m", "id", nBuckets = 4),
      persons = new ManifestUpsertSink(spark, s"$b/p", "id", nBuckets = 4),
      genres = new ManifestUpsertSink(spark, s"$b/g", "id", nBuckets = 4))
    CdcPipeline.drain(spark, t, overwriteSinks,
      new Keyset.CursorStore(s"$a/cursors"), batchSize = 1)
    CdcPipeline.drain(spark, t, manifestSinks,
      new Keyset.CursorStore(s"$b/cursors"), batchSize = 1)
    for ((x, y) <- Seq(
        (overwriteSinks.movies, manifestSinks.movies),
        (overwriteSinks.persons, manifestSinks.persons),
        (overwriteSinks.genres, manifestSinks.genres))) {
      val xs = x.read().get.toJSON.collect().sorted.toSeq
      val ys = y.read().get.selectExpr(x.read().get.columns.toIndexedSeq: _*)
        .toJSON.collect().sorted.toSeq
      assert(ys === xs)
    }
  }
}
