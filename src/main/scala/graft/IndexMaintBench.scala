package graft

import java.nio.file.{Files, Paths}

/** Index-MAINTENANCE scaling readout (the round-11 updatable
  * PostingIndex's 100 TB claim, made measurable): for each scale
  * factor, time the posting index's BUILD (the O(corpus) rebuild a
  * maintained index avoids), a FIXED-size UPSERT of new docs (must be
  * ~flat in corpus size — its cost is O(|batch| + batch buckets +
  * delta log)), a fixed-size DELETE, the SERVE over the maintained
  * index (live delta segments in the fold), and COMPACT (the
  * amortized O(base + log) fold). One JSON line per run — the
  * StreamBench artifact pattern.
  *
  *   SPARK_GRAFT_MAINT_DIRS=/root/testdata/sf0.1,/tmp/scale/sf0.2,...
  *   sbt 'runMain graft.IndexMaintBench'
  */
object IndexMaintBench {
  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_MAINT_DIRS",
      "/root/testdata/sf0.1").split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus, "graft-index-maint-bench")
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.movies.PostingIndex

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val terms = Seq("spark", "query", "window")
    val results = dirs.map { sf =>
      val docs = Tables.load(spark, sf, "documents")
        .select($"doc_id", $"text")
      val n = docs.count()
      val toks = graft.ops.TextOps.tokenize($"text")
      val tokens = Map(
        "title" -> slice(toks, 1, 5),
        "body" -> slice(toks, lit(6), size(toks)))
      val weights = Map("title" -> 4, "body" -> 1)
      val dir = Files.createTempDirectory("graft_maintbench").toString + "/idx"
      var idx: PostingIndex = null
      val build = timed { idx = PostingIndex.buildTokenized(docs, dir,
        tokens, weights, idCol = "doc_id",
        nTermBuckets = 8, nDocBuckets = 8) }
      // FIXED 128-doc batch (new ids) — upsert cost must not grow
      // with the corpus behind it
      val batch = docs.orderBy($"doc_id").limit(128)
        .select(($"doc_id" + 100000000L).as("doc_id"), $"text")
        .localCheckpoint()
      val upsert = timed { idx = idx.upsert(batch, tokens) }
      // maintained serve: the fold now carries a live delta segment
      val serveMaint = Seq.fill(2)(
        timed { idx.scoreTerms(terms).count(); () }).min
      val delIds = batch.select($"doc_id").limit(64).localCheckpoint()
      val delete = timed { idx = idx.delete(delIds) }
      val compact = timed { idx = idx.compact() }
      val serveCompacted = Seq.fill(2)(
        timed { idx.scoreTerms(terms).count(); () }).min
      Map("sf" -> sf, "n_docs" -> n, "build" -> build, "upsert" -> upsert,
        "delete" -> delete, "serve_maintained" -> serveMaint,
        "compact" -> compact, "serve_compacted" -> serveCompacted)
    }
    def j(v: Any): String = v match {
      case s: String => "\"" + s + "\""
      // Locale.ROOT: the f-interpolator honors the default locale, and
      // a comma-decimal locale would emit unparseable JSON
      case d: Double =>
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
      case x => x.toString
    }
    val json = results.map(_.map { case (k, v) => j(k) + ":" + j(v) }
      .mkString("{", ",", "}")).mkString("[", ",", "]")
    println(json)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_MAINT_OUT",
      "_index_maint.json")
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
  }
}
