package graft.movies

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inverted-index search serving: BM25F over a CANDIDATE set found by a
  * term→posting join, instead of scoring the whole corpus per query —
  * the shape the reference delegates to Elasticsearch's inverted index
  * (movies.es.schema.json:4-40, search_api/api.py:93-100).
  *
  * [[Search.score]] / [[SearchIndex.score]] evaluate the BM25F column
  * over EVERY document and keep `score > 0`. That is the right
  * oracle/batch-scoring face, but as a serving path it reads 100 TB to
  * answer a 2-term query. Since a document scores > 0 iff ANY field
  * contains ≥ 1 query term (idf > 0 always holds for the documented
  * idf = ln(1 + (N-df+0.5)/(df+0.5))), the match set is EXACTLY the
  * union of the query terms' posting lists — so pruning to posting
  * candidates changes nothing about results, only about bytes read.
  *
  * Stored layout (one build pass, immutable; rebuild = re-run build):
  *
  *   dir/docs/__db=<b>/      the analyzed corpus (payload + `__toks_*`
  *                           token columns), hash-partitioned by id —
  *                           candidate fetch reads only candidate
  *                           id-buckets (PartitionFilters prune)
  *   dir/postings/__tb=<b>/  (term, id) pairs, hash-partitioned by
  *                           term — a query reads only its own terms'
  *                           buckets (PartitionFilters prune)
  *   dir/stats.json          N, exact dl sums per field, weights, column order
  *
  * Query path: terms route to posting buckets (driver holds ≤ |terms|
  * hashes), candidate ids come off the pruned posting scan, candidate
  * id-buckets (≤ nDocBuckets, a bounded collect) prune the docs scan,
  * and [[Search.bm25f]] — the same expression as the full-scan faces,
  * with the same build-time stats — scores only the candidates. Ranks
  * are bit-identical to [[Search.score]] (MoviesSpec asserts it);
  * PlansSpec asserts both scans carry partition filters.
  *
  * Scale: per query, work is O(postings of the query's terms +
  * candidate docs), never O(corpus). df comes from the pruned posting
  * scan itself (count per term == document frequency, because postings
  * hold DISTINCT (term, doc) pairs), so no corpus-stats pass at query
  * time either.
  */
final class PostingIndex private (
    spark: SparkSession,
    dir: String,
    val idCol: String,
    fields: Seq[String],
    weights: Map[String, Int],
    sumdls: Map[String, Long],
    nDocs: Long,
    docCols: Seq[String],
    nTermBuckets: Int,
    nDocBuckets: Int) {

  // avgdl derives from EXACT integer token-count sums — the same value
  // Spark's avg() computes (integral sums are exact in double far past
  // any real dl total), which is what keeps build + refresh + the
  // full-scan referee bit-identical: integer sums add associatively,
  // so refresh(delta) and rebuild(corpus ∪ delta) derive the SAME
  // double, something incremental float means could never promise.
  private val avgdls: Map[String, Double] = fields.map(f =>
    f -> (if (nDocs == 0L) 0.0 else sumdls(f).toDouble / nDocs)).toMap

  import PostingIndex.{DocBucketCol, TermBucketCol}

  private def docsPath = s"$dir/docs"
  private def postingsPath = s"$dir/postings"

  private def outCols: Seq[Column] = docCols.map(col) :+ col("score")

  /** A corpus can be non-empty yet tokenize to ZERO terms (all
    * whitespace/stop-words): the postings write then leaves only a
    * `_SUCCESS` marker — no partition dirs, no readable schema — so
    * every query path must detect it and serve empty instead of
    * throwing at the scan.
    */
  private def hasPostings: Boolean = {
    val p = new Path(postingsPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p)
      .exists(_.getPath.getName.startsWith(s"$TermBucketCol="))
  }

  /** Empty result with the exact full-face schema (payload + score). */
  private def emptyScored(): DataFrame =
    spark.read.parquet(docsPath).limit(0)
      .withColumn("score", lit(0.0)).filter(col("score") > 0)
      .select(outCols: _*)

  /** One tiny driver job (the [[Search.analyzeQuery]] pattern) maps
    * each term to its posting bucket with the ENGINE's own hash — the
    * routing function cannot drift from the layout's.
    */
  private def termBuckets(terms: Seq[String]): Seq[Int] = {
    import spark.implicits._
    terms.toDF("t")
      .select(pmod(xxhash64(col("t")), lit(nTermBuckets)).cast("int"))
      .distinct().collect().map(_.getInt(0)).toSeq
  }

  /** BM25F over the posting-pruned candidate set — result-identical to
    * `Search.score(corpus, query)` at posting-join cost.
    */
  def score(query: String): DataFrame =
    scoreTerms(Search.analyzeQuery(spark.range(1).toDF(), query))

  /** Same, for callers that tokenized the query themselves (the
    * oracle-gate face uses whitespace terms, no stemmer).
    */
  def scoreTerms(terms0: Seq[String]): DataFrame = {
    val terms = terms0.distinct
    if (terms.isEmpty || nDocs == 0L || !hasPostings) return emptyScored()

    val posts = spark.read.parquet(postingsPath)
      .filter(col(TermBucketCol).isin(termBuckets(terms): _*) &&
        col("term").isin(terms: _*))
    // df per term off the pruned posting scan: ≤ |terms| rows
    val dfs = posts.groupBy(col("term")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (dfs.isEmpty) return emptyScored()

    val candidates = posts.select(col(idCol)).distinct()
    // candidate id-buckets: bounded by nDocBuckets, prunes the doc scan
    val candBuckets = candidates
      .select(pmod(xxhash64(col(idCol)), lit(nDocBuckets)).cast("int"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val pruned = spark.read.parquet(docsPath)
      .filter(col(DocBucketCol).isin(candBuckets: _*))
      .join(candidates, Seq(idCol), "left_semi")

    pruned
      .withColumn("score",
        Search.bm25f(terms, fields, weights, avgdls, dfs, nDocs.toDouble))
      .filter(col("score") > 0)
      .select(outCols: _*)
  }

  /** Batched serving — queries as a TABLE (the round-9/10 multi-query
    * discipline: zero per-query driver actions or jobs), each row
    * carrying its own analyzed term array. One pruned posting scan
    * serves the whole batch; per-(term, doc) BM25F contributions are
    * computed ONCE and shared across queries (idf·saturated-tf̃ does
    * not depend on the query beyond term membership), then each
    * (query, doc) folds its contributions IN THE QUERY'S TERM ORDER —
    * a sorted in-row fold, not a float groupBy sum — so every score is
    * bit-identical to [[scoreTerms]] run per query (MoviesSpec walks
    * the equality). The only driver state is the probed bucket lists
    * (≤ nTermBuckets + nDocBuckets values).
    *
    * idf stays a DRIVER computation — one bounded collect of (term,
    * df) for the whole batch (≤ the batch's distinct-term vocabulary,
    * a caller-controlled bound like the grouped-MMR shortlist), then a
    * broadcast (term, idf) join. Computing `log` in-plan instead is a
    * genuine 1-ulp trap: codegen'd Math.log JIT-compiles to the C2
    * intrinsic while the driver's literal uses the library path, and
    * the two disagree on some inputs — caught by this spec's
    * bit-equality assertion.
    *
    * Output: (queryIdCol, doc columns..., score) — one row per
    * (query, matching doc); queries with no matching term contribute
    * no rows (the `score > 0` contract, per query).
    */
  def scoreTermsMulti(
      queries: DataFrame, queryIdCol: String,
      termsCol: String): DataFrame = {
    require(!docCols.contains(queryIdCol),
      s"query id column '$queryIdCol' collides with a doc column — " +
        "both sides appear in the output")
    if (nDocs == 0L || !hasPostings) // driver-local, before any job
      return emptyScoredMulti(queries, queryIdCol)
    // PIN the analyzed query batch: the plan below references it from
    // the routing collect, the posting semi-join, the candidate set
    // and the final fold — unpinned, a nondeterministic queries plan
    // could route term t to a bucket list that a later evaluation's
    // terms don't match, silently dropping docs (the
    // ivfPqTopKMultiStored probe-pinning rule); it also runs the
    // query analyzer exactly once per batch
    val qterms = queries.select(col(queryIdCol),
      posexplode(array_distinct(col(termsCol)))
        .as(Seq("__tidx", "term")))
      .localCheckpoint()
    // bucket routing for the whole batch: ≤ nTermBuckets values
    val tb = qterms
      .select(pmod(xxhash64(col("term")), lit(nTermBuckets)).cast("int"))
      .distinct().collect().map(_.getInt(0)).toSeq
    if (tb.isEmpty) return emptyScoredMulti(queries, queryIdCol)
    val posts = spark.read.parquet(postingsPath)
      .filter(col(TermBucketCol).isin(tb: _*))
      .join(qterms.select(col("term")).distinct(), Seq("term"),
        "left_semi")
    // per-term idf on the driver (bit-parity with the single face's
    // math.log literal — see the Scaladoc note), bounded by the
    // batch's distinct-term vocabulary
    import spark.implicits._
    val idfDf = posts.groupBy(col("term")).count()
      .collect().map { r =>
        val df = r.getLong(1).toDouble
        (r.getString(0),
          math.log(1.0 + (nDocs.toDouble - df + 0.5) / (df + 0.5)))
      }.toSeq.toDF("term", "__idf")
    val candidates = posts.select(col(idCol)).distinct()
    val candBuckets = candidates
      .select(pmod(xxhash64(col(idCol)), lit(nDocBuckets)).cast("int"))
      .distinct().collect().map(_.getInt(0)).toSeq
    // ONE pruned doc definition carrying tokens AND payload; the two
    // references below (contribution inputs, final payload attach) are
    // identical subtrees, so Spark's exchange/scan reuse applies —
    // never a second candidate derivation
    val prunedDocs = spark.read.parquet(docsPath)
      .filter(col(DocBucketCol).isin(candBuckets: _*))
      .join(candidates, Seq(idCol), "left_semi")
    val tftCol = fields.map { f =>
      val avgdl = math.max(avgdls(f), 1e-9)
      val dl = size(Search.toks(f)).cast("double")
      val tf = size(filter(Search.toks(f), x => x === col("term")))
        .cast("double")
      lit(weights(f).toDouble) * tf /
        (lit(1 - Search.B) + lit(Search.B) * dl / lit(avgdl))
    }.reduce(_ + _)
    val contribs = posts.join(broadcast(idfDf), Seq("term"))
      .join(prunedDocs.select((col(idCol) +: fields.map(Search.toks)): _*),
        Seq(idCol))
      .withColumn("__tft", tftCol)
      .select(col("term"), col(idCol),
        (col("__idf") * col("__tft") / (lit(Search.K1) + col("__tft")))
          .as("__contrib"))
    // per (query, doc): fold contributions in the query's term order —
    // deterministic association, bit-equal to the single face's Σ_t
    val scores = qterms.join(contribs, Seq("term"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(collect_list(struct(col("__tidx"), col("__contrib")))
        .as("__cs"))
      .withColumn("score",
        aggregate(array_sort(col("__cs")), lit(0.0),
          (acc, x) => acc + x.getField("__contrib")))
      .select(col(queryIdCol), col(idCol), col("score"))
    scores.join(prunedDocs, Seq(idCol))
      .select((col(queryIdCol) +: outCols): _*)
  }

  /** Movies-face batched serving: analyze each query string IN-PLAN
    * (the same analyzer expression the corpus was built with) and
    * serve the batch through [[scoreTermsMulti]].
    */
  def scoreMulti(
      queries: DataFrame, queryIdCol: String,
      queryCol: String): DataFrame =
    scoreTermsMulti(
      queries.select(col(queryIdCol),
        Analyzer.analyze(col(queryCol)).as("__terms")),
      queryIdCol, "__terms")

  private def emptyScoredMulti(
      queries: DataFrame, queryIdCol: String): DataFrame =
    queries.limit(0).select(col(queryIdCol))
      .crossJoin(spark.read.parquet(docsPath).limit(0)
        .withColumn("score", lit(0.0)).select(outCols: _*))

  /** APPEND-ONLY index refresh (the [[graft.ops.SimilarityOps
    * .refreshIvfPqIndex]] pattern): encode the delta with the SAME
    * token expressions as the build and append into the existing
    * bucket layouts — new files land inside `__db=b` / `__tb=b` dirs,
    * so serve-time pruning is untouched. Stats update by EXACT integer
    * sums, so the refreshed index's scores are bit-identical to a
    * from-scratch rebuild over corpus ∪ delta (MoviesSpec asserts it).
    * Contract: delta ids must be NEW (upsert/delete of existing docs
    * is a rebuild — BM25F's corpus stats make in-place doc replacement
    * a different, deliberate operation), and the delta plan runs once
    * (localCheckpoint). Single writer; not crash-atomic (a failed
    * refresh ⇒ rebuild), unlike the CDC-facing ManifestUpsertSink.
    */
  def refresh(
      newDocs: DataFrame, tokens: Map[String, Column]): PostingIndex = {
    require(tokens.keySet == weights.keySet,
      s"token columns ${tokens.keySet} must match weights ${weights.keySet}")
    require(newDocs.columns.toSeq == docCols,
      s"delta columns ${newDocs.columns.toSeq} must match the built " +
        s"corpus's $docCols")
    if (nDocs == 0L) {
      // the empty build wrote an unpartitioned placeholder — replace it
      val fs = new Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(dir), true)
      PostingIndex.buildTokenized(newDocs, dir, tokens, weights, idCol,
        nTermBuckets, nDocBuckets)
    } else {
      val analyzed = fields.foldLeft(newDocs)((d, f) =>
        d.withColumn(s"__toks_$f", tokens(f))).localCheckpoint()
      // same aggregate as the build (PostingIndex.sumStats) over the
      // PINNED delta — the refresh ≡ rebuild parity rests on both
      // paths summing the identical integers
      val (stats, dn) = PostingIndex.sumStats(analyzed, fields)
      if (dn == 0L) this
      else {
        analyzed
          .withColumn(DocBucketCol,
            pmod(xxhash64(col(idCol)), lit(nDocBuckets)))
          .write.mode("append").partitionBy(DocBucketCol)
          .parquet(docsPath)
        analyzed
          .select(col(idCol), explode(array_distinct(
            concat(fields.map(Search.toks): _*))).as("term"))
          .withColumn(TermBucketCol,
            pmod(xxhash64(col("term")), lit(nTermBuckets)))
          .write.mode("append").partitionBy(TermBucketCol)
          .parquet(postingsPath)
        val m = PostingIndex.Meta(idCol, fields, weights,
          fields.map(f =>
            f -> (sumdls(f) + stats.getAs[Long](s"sumdl_$f"))).toMap,
          nDocs + dn, docCols, nTermBuckets, nDocBuckets)
        PostingIndex.writeStats(spark, dir, m)
        PostingIndex.fromMeta(spark, dir, m)
      }
    }
  }

  /** Movies-face refresh: the analyzer token expressions re-derive
    * from the field names.
    */
  def refresh(newDocs: DataFrame): PostingIndex =
    refresh(newDocs,
      fields.map(f => f -> Search.analyzedField(f)).toMap)

  /** Full search-API semantics over the pruned path ([[Search.search]]
    * contract). query = None is a pure browse: no posting work, the
    * doc store streams under the sort.
    *
    * MOVIES-FACE ONLY: the 422 contract (sortField in
    * id/title/imdb_rating) and the `id` tie-break are the reference
    * API's — an index built with a different idCol serves through
    * [[score]]/[[scoreTerms]]/[[scoreTermsMulti]] instead.
    */
  def search(
      query: Option[String],
      sortField: String = "id",
      asc: Boolean = true,
      page: Int = 1,
      limit: Int = 50): DataFrame = {
    require(idCol == "id",
      "search() is the movies-face API (422 sort contract + 'id' " +
        s"tie-break); this index's idCol is '$idCol' — use scoreTerms*")
    Search.validateSearchArgs(sortField, page, limit)
    val base = query.fold(
      spark.read.parquet(docsPath)
        .withColumn("score", lit(0.0)).select(outCols: _*))(score)
    Search.orderAndPage(base, query.isDefined, sortField, asc, page, limit)
  }
}

object PostingIndex {

  private[movies] val DocBucketCol = "__db"
  private[movies] val TermBucketCol = "__tb"

  /** Movies face: analyzer-backed fields from [[Search.DefaultWeights]]
    * (or any weights map over string/array<string> doc columns).
    */
  def build(
      docs: DataFrame,
      dir: String,
      weights: Map[String, Int] = Search.DefaultWeights,
      idCol: String = "id",
      nTermBuckets: Int = 16,
      nDocBuckets: Int = 16): PostingIndex = {
    val fields = weights.keys.toSeq.sorted
    buildTokenized(docs, dir,
      fields.map(f => f -> Search.analyzedField(f)).toMap,
      weights, idCol, nTermBuckets, nDocBuckets)
  }

  /** Generic face: `tokens` maps each field to a column producing its
    * analyzed array<string> — the oracle gate uses plain whitespace
    * tokens so DuckDB can replay the scoring.
    *
    * Stats (avgdl, N) are computed over the SAME pre-write plan shape
    * as [[Search.score]]'s per-query aggregate, so the stored stats
    * are bit-identical to what the full-scan face would compute —
    * that, plus sharing the [[Search.bm25f]] expression, is what makes
    * the pruned face's doubles exactly equal the referee's.
    */
  def buildTokenized(
      docs: DataFrame,
      dir: String,
      tokens: Map[String, Column],
      weights: Map[String, Int],
      idCol: String = "id",
      nTermBuckets: Int = 16,
      nDocBuckets: Int = 16): PostingIndex = {
    require(tokens.keySet == weights.keySet,
      s"token columns ${tokens.keySet} must match weights ${weights.keySet}")
    require(nTermBuckets > 0 && nDocBuckets > 0, "bucket counts must be > 0")
    val spark = docs.sparkSession
    val fields = weights.keys.toSeq.sorted
    val docCols = docs.columns.toSeq
    val analyzed = fields.foldLeft(docs)((d, f) =>
      d.withColumn(s"__toks_$f", tokens(f)))

    // the input plan executes exactly ONCE — the doc-store write; the
    // stats aggregate AND the postings both derive from the WRITTEN
    // copy, so a nondeterministic input cannot desync stats.json or
    // the posting lists from the stored docs (the ManifestUpsertSink
    // staging discipline), and the analyzer never runs a second
    // corpus pass. Token arrays round-trip parquet exactly, so the
    // integer dl sums — hence avgdl — still equal what the full-scan
    // referee computes over the in-memory plan.
    val withDb = analyzed
      .withColumn(DocBucketCol, pmod(xxhash64(col(idCol)), lit(nDocBuckets)))
    withDb.write.partitionBy(DocBucketCol).parquet(s"$dir/docs")
    val fs = new Path(s"$dir/docs")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val wroteRows = fs.listStatus(new Path(s"$dir/docs"))
      .exists(_.getPath.getName.startsWith(s"$DocBucketCol="))
    if (!wroteRows) {
      // empty corpus: a partitioned empty write has no readable schema
      // — replace it with a plain placeholder (limit(0) is row-free
      // and deterministic), so emptyScored() can still resolve columns
      fs.delete(new Path(s"$dir/docs"), true)
      withDb.limit(0).repartition(1).write.parquet(s"$dir/docs")
    }
    val stored = spark.read.parquet(s"$dir/docs")
    val (stats, n) = sumStats(stored, fields)
    val sumdls = fields.map(f =>
      f -> (if (n == 0L) 0L else stats.getAs[Long](s"sumdl_$f"))).toMap
    if (n > 0L) {
      stored
        .select(col(idCol), explode(array_distinct(
          concat(fields.map(Search.toks): _*))).as("term"))
        .withColumn(TermBucketCol, pmod(xxhash64(col("term")), lit(nTermBuckets)))
        .write.partitionBy(TermBucketCol).parquet(s"$dir/postings")
    }

    val meta = Meta(idCol, fields, weights, sumdls, n,
      docCols, nTermBuckets, nDocBuckets)
    writeStats(spark, dir, meta)
    fromMeta(spark, dir, meta)
  }

  private def sumStats(analyzed: DataFrame, fields: Seq[String]) = {
    val aggs =
      fields.map(f =>
        sum(size(Search.toks(f)).cast("long")).as(s"sumdl_$f")) :+
        count(lit(1)).as("n_docs")
    val stats = analyzed.agg(aggs.head, aggs.tail: _*).head()
    (stats, stats.getAs[Long]("n_docs"))
  }

  private[movies] def fromMeta(
      spark: SparkSession, dir: String, m: Meta): PostingIndex =
    new PostingIndex(spark, dir, m.idCol, m.fields, m.weights, m.sumdls,
      m.nDocs, m.docCols, m.nTermBuckets, m.nDocBuckets)

  /** Re-open a built index from its directory (serving restarts). */
  def open(spark: SparkSession, dir: String): PostingIndex =
    fromMeta(spark, dir, readStats(spark, dir))

  private[movies] case class Meta(
      idCol: String, fields: Seq[String], weights: Map[String, Int],
      sumdls: Map[String, Long], nDocs: Long, docCols: Seq[String],
      nTermBuckets: Int, nDocBuckets: Int)

  // stats.json via jackson (ships with Spark) — a handful of numbers,
  // exact doubles preserved through Double.toString round-trip
  private def writeStats(spark: SparkSession, dir: String, m: Meta): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("idCol", m.idCol)
    root.put("nDocs", m.nDocs)
    root.put("nTermBuckets", m.nTermBuckets)
    root.put("nDocBuckets", m.nDocBuckets)
    val fa = root.putArray("fields"); m.fields.foreach(fa.add)
    val ca = root.putArray("docCols"); m.docCols.foreach(ca.add)
    val wo = root.putObject("weights")
    m.fields.foreach(f => wo.put(f, m.weights(f)))
    val ao = root.putObject("sumdls")
    m.fields.foreach(f => ao.put(f, m.sumdls(f)))
    val p = new Path(dir, "stats.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(mapper.writeValueAsBytes(root)) finally out.close()
  }

  private def readStats(spark: SparkSession, dir: String): Meta = {
    val p = new Path(dir, "stats.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val root =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
      finally in.close()
    import scala.jdk.CollectionConverters._
    val fields = root.path("fields").elements().asScala.map(_.asText()).toSeq
    Meta(
      idCol = root.path("idCol").asText(),
      fields = fields,
      weights = fields.map(f =>
        f -> root.path("weights").path(f).asInt()).toMap,
      sumdls = fields.map(f =>
        f -> root.path("sumdls").path(f).asLong()).toMap,
      nDocs = root.path("nDocs").asLong(),
      docCols = root.path("docCols").elements().asScala.map(_.asText()).toSeq,
      nTermBuckets = root.path("nTermBuckets").asInt(),
      nDocBuckets = root.path("nDocBuckets").asInt())
  }
}
