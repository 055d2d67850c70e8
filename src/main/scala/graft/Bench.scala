package graft
import java.nio.file.{Files, Paths}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.build(cpus, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    Tables.validate(spark, sfDir) // fail fast on testdata schema drift
    // Warm the session (codegen, shuffle infra, parquet footer cache, JIT)
    // with one untimed pass over every query, then time the steady-state
    // pass. First-execution codegen costs seconds per query shape and would
    // otherwise dominate the sub-second query times at this scale.
    // Dev iteration aids (driver ignores them): SPARK_GRAFT_ONLY=q40,q31
    // restricts to named queries; SPARK_GRAFT_REPS=3 times each query N
    // times and reports the minimum (cuts this box's ±2× timing noise).
    val keep = SparkEntry.onlyFilter()
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => keep(n) }
    ordered.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
    }
    // A failing query is a loud per-query error record, never a fake
    // timing (VERDICT r7 #3): timings and errors are disjoint keys.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = ordered.flatMap { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          errors.getOrElseUpdate(name,
            Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(3).mkString(" | "))
          None
        }
      }
      if (times.isEmpty) None else Some(name -> times.min)
    }
    // Build-vs-serve split for the stored-index gates (round-10 task
    // #6): the per-gate totals above include each gate's PER-RUN index
    // build, so the serve-side cost was not auditable from artifacts.
    // These supplementary readings time build and serve separately,
    // with the gates' own parameters, under a SEPARATE JSON key — the
    // "queries" map stays exactly the registry. Skipped when a
    // SPARK_GRAFT_ONLY filter excludes q291 (dev iteration).
    val indexReadings: Seq[(String, Double)] =
      if (!keep("q291_pruned_search")) Seq.empty
      else try {
        import org.apache.spark.sql.functions._
        import spark.implicits._
        import graft.ops.{BucketingOps, DedupOps, SimilarityOps, TextOps}
        def timed[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime()
          val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val out = scala.collection.mutable.ListBuffer.empty[(String, Double)]
        def scratch(p: String) = java.nio.file.Files
          .createTempDirectory(p).toString + "/idx"
        // q291 shape: posting-pruned BM25F over documents
        val toks = TextOps.tokenize($"text")
        val (pidx, pb) = timed(graft.movies.PostingIndex.buildTokenized(
          Tables.load(spark, sfDir, "documents").select($"doc_id", $"text"),
          scratch("graft_bench_pidx"),
          tokens = Map(
            "title" -> slice(toks, 1, 5),
            "body" -> slice(toks, lit(6), size(toks))),
          weights = Map("title" -> 4, "body" -> 1),
          idCol = "doc_id", nTermBuckets = 8, nDocBuckets = 8))
        out += "q291_build" -> pb
        // serves: min of 2 (the steady-state discipline of the main
        // loop's warm-up pass — a single cold run would time codegen)
        out += "q291_serve" -> Seq.fill(2)(timed(
          pidx.scoreTerms(Seq("spark", "query", "window")).count())._2).min
        // q292 shape, STORED face: cell-partitioned IVF×PQ layout
        val centers = Array.tabulate(8)(c =>
          Array.tabulate(64)(i => if (i == c * 8) 8.0 else 0.0))
        val codebooks = Array.tabulate(2)(sp => Array.tabulate(4)(c =>
          Array.tabulate(32)(i => ((sp * 31 + c * 7 + i) % 5 - 2).toDouble)))
        val e = Tables.load(spark, sfDir, "embeddings")
        val idir = scratch("graft_bench_ivfpq")
        val (_, ib) = timed(SimilarityOps.writeIvfPqIndex(
          SimilarityOps.ivfPqIndex(
            e.select($"vec_id", $"embedding"), "vec_id", "embedding",
            centers, codebooks), idir, "vec_id"))
        out += "q292_build" -> ib
        val ivfQueries = e.filter($"vec_id" < 5L)
          .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
        out += "q292_serve" -> Seq.fill(2)(
          timed(SimilarityOps.ivfPqTopKMultiStored(
            spark, idir, "vec_id", e, "vec_id", "embedding",
            ivfQueries, "query_id", "qvec", centers, codebooks,
            nProbe = 2, shortlist = 50, k = 10).count())._2).min
        // q70 shape: bucketed LSH band-key index + incremental probe
        val sig = DedupOps.minhashSignatures(
          Tables.load(spark, sfDir, "documents").select($"doc_id",
            TextOps.shingleHashes($"text", 3).as("hashes")),
          "doc_id", "hashes", 16).localCheckpoint()
        val (_, lb) = timed(BucketingOps.writeBucketed(
          DedupOps.lshBandKeyTable(
            sig.filter($"doc_id" < 400), "doc_id", "sig", 4, 4),
          "graft_bench_lsh_idx", Seq("band", "bh"), nBuckets = 8))
        out += "q70_build" -> lb
        out += "q70_serve" -> Seq.fill(2)(timed(
          DedupOps.lshCandidatePairsIncrementalIndexed(
            spark.table("graft_bench_lsh_idx"),
            sig.filter($"doc_id" >= 400), "doc_id", "sig", 4, 4)
          .count())._2).min
        out.toList
      } catch { case e: Throwable =>
        System.err.println(s"[bench] index readings failed: $e")
        Seq.empty
      }
    def qesc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v) => qesc(k) + ":" + v }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => qesc(k) + ":" + qesc(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val ir = indexReadings.map { case (k, v) => qesc(k) + ":" + v }
      .mkString("{", ",", "}")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"index_readings":$ir,"sf":"$sfDir"}"""
    // stdout is the driver contract, but the driver records only a 2 KB
    // tail — also write the full line as a file artifact (mirrors
    // Verify's _errors.json pattern) so per-query numbers for the whole
    // suite survive machine-readable. Override path via env.
    println(json)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "_bench.json")
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(
        s"[bench] ${errors.size} queries FAILED: " + errors.keys.mkString(", "))
      sys.exit(1)
    }
  }
}
