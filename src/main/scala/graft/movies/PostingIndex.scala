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
  *   dir/stats.json          N, avgdl per field, weights, column order
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
    avgdls: Map[String, Double],
    nDocs: Long,
    docCols: Seq[String],
    nTermBuckets: Int,
    nDocBuckets: Int) {

  import PostingIndex.{DocBucketCol, TermBucketCol}

  private def docsPath = s"$dir/docs"
  private def postingsPath = s"$dir/postings"

  private def outCols: Seq[Column] = docCols.map(col) :+ col("score")

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
    if (terms.isEmpty || nDocs == 0L) return emptyScored()

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

  /** Full search-API semantics over the pruned path ([[Search.search]]
    * contract). query = None is a pure browse: no posting work, the
    * doc store streams under the sort.
    */
  def search(
      query: Option[String],
      sortField: String = "id",
      asc: Boolean = true,
      page: Int = 1,
      limit: Int = 50): DataFrame = {
    require(Seq("id", "title", "imdb_rating").contains(sortField),
      s"unsupported sort field: $sortField")
    require(page > 0 && limit > 0, "page/limit must be positive")
    val sortCol = if (asc) col(sortField).asc_nulls_last
                  else col(sortField).desc_nulls_last
    val base = query.fold(
      spark.read.parquet(docsPath)
        .withColumn("score", lit(0.0)).select(outCols: _*))(score)
    val ordered = query match {
      case Some(_) =>
        base.orderBy(col("score").desc, sortCol, col("id").asc)
      case None => base.orderBy(sortCol, col("id").asc)
    }
    ordered.offset((page - 1) * limit).limit(limit)
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

    // one corpus-stats pass (the SearchIndex.build aggregate)
    val statAggs =
      fields.map(f => avg(size(Search.toks(f))).as(s"avgdl_$f")) :+
        count(lit(1)).as("n_docs")
    val stats = analyzed.agg(statAggs.head, statAggs.tail: _*).head()
    val n = stats.getAs[Long]("n_docs")
    val avgdls = fields.map { f =>
      f -> (if (n == 0L) 0.0 else stats.getAs[Double](s"avgdl_$f"))
    }.toMap

    // doc store, id-bucketed (empty corpus: keep the schema readable —
    // no partitionBy, the query path early-outs on nDocs == 0)
    val withDb = analyzed
      .withColumn(DocBucketCol, pmod(xxhash64(col(idCol)), lit(nDocBuckets)))
    if (n == 0L) withDb.repartition(1).write.parquet(s"$dir/docs")
    else withDb.write.partitionBy(DocBucketCol).parquet(s"$dir/docs")

    // postings derive from the WRITTEN doc store (frozen copy), so a
    // nondeterministic input plan cannot desync postings from docs;
    // distinct terms per doc ⇒ count(term) == document frequency
    if (n > 0L) {
      spark.read.parquet(s"$dir/docs")
        .select(col(idCol), explode(array_distinct(
          concat(fields.map(Search.toks): _*))).as("term"))
        .withColumn(TermBucketCol, pmod(xxhash64(col("term")), lit(nTermBuckets)))
        .write.partitionBy(TermBucketCol).parquet(s"$dir/postings")
    }

    writeStats(spark, dir, Meta(idCol, fields, weights, avgdls, n,
      docCols, nTermBuckets, nDocBuckets))
    new PostingIndex(spark, dir, idCol, fields, weights, avgdls, n,
      docCols, nTermBuckets, nDocBuckets)
  }

  /** Re-open a built index from its directory (serving restarts). */
  def open(spark: SparkSession, dir: String): PostingIndex = {
    val m = readStats(spark, dir)
    new PostingIndex(spark, dir, m.idCol, m.fields, m.weights, m.avgdls,
      m.nDocs, m.docCols, m.nTermBuckets, m.nDocBuckets)
  }

  private case class Meta(
      idCol: String, fields: Seq[String], weights: Map[String, Int],
      avgdls: Map[String, Double], nDocs: Long, docCols: Seq[String],
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
    val ao = root.putObject("avgdls")
    m.fields.foreach(f => ao.put(f, m.avgdls(f)))
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
      avgdls = fields.map(f =>
        f -> root.path("avgdls").path(f).asDouble()).toMap,
      nDocs = root.path("nDocs").asLong(),
      docCols = root.path("docCols").elements().asScala.map(_.asText()).toSeq,
      nTermBuckets = root.path("nTermBuckets").asInt(),
      nDocBuckets = root.path("nDocBuckets").asInt())
  }
}
