package graft.movies

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted multi-field full-text search over movie docs — our engine's
  * re-expression of the ES `multi_match` query (search_api/api.py:93-100)
  * with the reference's boosts: title^4, description^3, genres_names^2,
  * actors_names^4, writers_names^1, directors_names^3.
  *
  * Scoring (documented, ours — ES BM25 exactness is out of scope, SURVEY
  * §7.3.1): per field, score_f = Σ over distinct analyzed query terms of
  * tf(term, field); total = Σ_f weight_f * score_f. Docs scoring 0 drop.
  * Ordering: score desc, then id asc (stable pagination).
  *
  * Scale: the query token array is a literal broadcast into a codegen'd
  * per-row expression — scoring is one streaming pass over the corpus,
  * no shuffle until the final top-k / pagination sort.
  */
object Search {

  val DefaultWeights: Map[String, Int] = Map(
    "title" -> 4, "description" -> 3, "genres_names" -> 2,
    "actors_names" -> 4, "writers_names" -> 1, "directors_names" -> 3)

  /** Analyzed-token columns for each searchable field; array fields are
    * analyzed element-wise and flattened.
    */
  def analyzedField(field: String): Column = field match {
    case "title" | "description" => Analyzer.analyze(col(field))
    case arrayField =>
      coalesce(
        flatten(transform(col(arrayField), e => Analyzer.analyze(e))),
        array().cast("array<string>"))
  }

  /** tf of each query term in the token array, summed. */
  private def tfScore(tokens: Column, queryTerms: Seq[String]): Column =
    if (queryTerms.isEmpty) lit(0L)
    else queryTerms.map { t =>
      size(filter(tokens, x => x === lit(t))).cast("long")
    }.reduce(_ + _)

  /** Score docs against a free-text query; returns the input plus a
    * `score` column, filtered to score > 0.
    */
  def score(
      docs: DataFrame,
      query: String,
      weights: Map[String, Int] = DefaultWeights): DataFrame = {
    val spark = docs.sparkSession
    // analyze the query with the same pipeline as the documents
    val terms = spark.range(1).select(
      Analyzer.analyze(lit(query)).as("t"))
      .head.getSeq[String](0).distinct
    val total = weights.toSeq.sortBy(_._1).map { case (f, w) =>
      tfScore(analyzedField(f), terms) * lit(w.toLong)
    }.reduceOption(_ + _).getOrElse(lit(0L))
    docs.withColumn("score", total).filter(col("score") > 0)
  }

  /** Full search-API semantics (api.py:63-111): optional query, sort
    * (id | title | imdb_rating, asc|desc), limit/offset pagination.
    * When a query is present, primary order is relevance.
    */
  def search(
      docs: DataFrame,
      query: Option[String],
      sortField: String = "id",
      asc: Boolean = true,
      page: Int = 1,
      limit: Int = 50): DataFrame = {
    require(Seq("id", "title", "imdb_rating").contains(sortField),
      s"unsupported sort field: $sortField") // api.py:68-70 (422 contract)
    require(page > 0 && limit > 0, "page/limit must be positive")
    val sortCol = if (asc) col(sortField).asc_nulls_last
                  else col(sortField).desc_nulls_last
    val base = query.fold(docs.withColumn("score", lit(0L)))(q => score(docs, q))
    val ordered = query match {
      case Some(_) => base.orderBy(col("score").desc, sortCol, col("id").asc)
      case None => base.orderBy(sortCol, col("id").asc)
    }
    ordered.offset((page - 1) * limit).limit(limit)
  }
}
