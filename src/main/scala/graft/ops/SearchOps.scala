package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Positional and fuzzy search operators — the serving-side text
  * features beyond BM25F ranking (`graft.movies.Search`): phrase /
  * proximity matching over token positions and SymSpell-style fuzzy
  * term lookup. Each replaces a quadratic naive form with an equi-join
  * on a derived key (position+offset, deletion neighborhood).
  */
object SearchOps {

  private def toks(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Reciprocal-rank fusion (Cormack–Clarke–Buettcher 2009) of N
    * rankers' shortlists — THE standard hybrid-retrieval merge
    * (lexical BM25 + embedding ANN feed one fused list in virtually
    * every RAG serving stack). Each input holds one ranker's top-N per
    * query as (queryCol, idCol, rankCol rank ≥ 1); an item missing
    * from a ranker's shortlist contributes 0 — exactly the published
    * semantics, no sentinel ranks.
    *
    *   rrf(q, d) = Σ_rankers ⌊1e6 / (k + rank_r(q,d))⌋    (integer ppm)
    *
    * Shape: union → one groupBy(query, id) sum (map-side combinable)
    * → per-query top-`topK` window. Every stage is bounded by
    * |queries|·|shortlist|·|rankers|, never the corpus — the corpus
    * was cut down by the upstream rankers (ANN index / posting lists),
    * which is what makes the fusion itself corpus-size-free at 100 TB.
    * Ties break to the smaller id (pinned on both engines).
    *
    * Output: (queryCol, idCol, rrf, rank), rank 1..topK per query.
    */
  def rrfFuse(
      rankings: Seq[DataFrame], queryCol: String, idCol: String,
      rankCol: String, kRrf: Long = 60L, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kRrf >= 0, "kRrf must be >= 0")
    val div = graft.functions.GraftColumns.longDiv _
    val contrib = rankings
      .map(_.select(col(queryCol), col(idCol),
        div(lit(1000000L), lit(kRrf) + col(rankCol)).as("__w")))
      .reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryCol))
      .orderBy(col("rrf").desc, col(idCol).asc)
    contrib
      .groupBy(col(queryCol), col(idCol))
      .agg(sum(col("__w")).as("rrf"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }

  /** Token positions: (id, __p, __t) with 0-based positions. */
  private def positions(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("__d"),
      posexplode(toks(col(textCol))).as(Seq("__p", "__t")))

  /** Phrase / proximity search (the match_phrase-with-slop semantics):
    * documents containing `terms` in order, each term within `slop`
    * positions after the previous one. slop=1 is the exact phrase.
    *
    * Positions meet through EQUI-joins on (doc, pos+offset) with the
    * 1..slop offsets exploded (the q170 skip-gram shape) — cost is
    * |matching positions|·slop per chain step, never a per-document
    * position cross join. The frontier shrinks monotonically: after
    * step i it holds only chains matching the first i terms.
    *
    * Output: (id, n_matches, first_pos) per matching document —
    * n_matches counts qualifying chains (a term repeated inside one
    * window yields one chain per path), first_pos is the smallest
    * start position.
    */
  def phraseMatches(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], slop: Int): DataFrame = {
    require(terms.size >= 2, "phrase needs at least two terms")
    require(slop >= 1, "slop must be >= 1")
    val pos = positions(docs, idCol, textCol)
    var cur = pos.filter(col("__t") === terms.head)
      .select(col("__d"), col("__p").as("__start"), col("__p").as("__cur"))
    terms.tail.foreach { t =>
      val nxt = pos.filter(col("__t") === t)
        .select(col("__d"), col("__p").as("__p2"))
      cur = cur
        .withColumn("__off", explode(sequence(lit(1), lit(slop))))
        .withColumn("__p2", col("__cur") + col("__off"))
        .join(nxt, Seq("__d", "__p2"))
        .select(col("__d"), col("__start"), col("__p2").as("__cur"))
    }
    cur.groupBy(col("__d").as(idCol))
      .agg(count(lit(1)).as("n_matches"),
        min(col("__start")).as("first_pos"))
  }

  /** Single-deletion neighborhood of a word: the word itself plus every
    * string obtained by removing one character, deduplicated. Two
    * words are within (plain Levenshtein) distance 1 ONLY IF their
    * neighborhoods intersect — deletion covers deletes, inserts, and
    * substitutions at once (Garbe's SymSpell key insight).
    */
  def deletionKeys(w: Column): Column =
    array_distinct(concat(array(w),
      transform(sequence(lit(1), length(w)),
        i => concat(w.substr(lit(1), i - 1),
          w.substr(i + 1, length(w))))))

  /** SymSpell-style fuzzy term lookup at max distance 1: candidates
    * come from an EQUI-join of the two deletion-neighborhood key
    * streams, then exact Levenshtein verification — identical results
    * to the exhaustive distance filter (q88's shape), at index cost
    * ×(len+1) per term instead of |queries|·|dictionary| distance
    * computations. This is the indexed fuzzy-search path a
    * 100M-term dictionary needs; the cross product never forms.
    *
    * Output: (query, term, dist) with dist ≤ 1, deduplicated.
    */
  def symspellMatches(
      dict: DataFrame, termCol: String,
      queries: DataFrame, queryCol: String): DataFrame = {
    // alias first, explode in a second projection — a generator over an
    // expression on a same-select alias trips Spark's lateral-column-
    // alias resolution (INTERNAL_ERROR: LateralColumnAliasReference)
    val dk = dict.select(col(termCol).as("term"))
      .select(col("term"), explode(deletionKeys(col("term"))).as("__k"))
    val qk = queries.select(col(queryCol).as("query"))
      .select(col("query"), explode(deletionKeys(col("query"))).as("__k"))
    qk.join(dk, Seq("__k"))
      .select(col("query"), col("term")).distinct()
      // cheap length prune before the verify (standard SymSpell order)
      .filter(abs(length(col("query")) - length(col("term"))) <= 1)
      .withColumn("dist", levenshtein(col("query"), col("term")))
      .filter(col("dist") <= 1)
  }
}
