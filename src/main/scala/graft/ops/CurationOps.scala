package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-curation operators that need a DataFrame (join/sample) shape
  * rather than a per-row expression: benchmark decontamination and
  * deterministic stratified sampling — the two standard steps between
  * dedup and training-set assembly.
  */
object CurationOps {

  /** Benchmark decontamination: per document, the number of DISTINCT
    * n-gram shingles it shares with the evaluation corpus. Training
    * docs overlapping an eval/benchmark set leak test data — the
    * curation rule is "drop docs with ≥ k shared n-grams".
    *
    * Shape: the eval set's distinct shingle hashes form one side of an
    * inverted-index equi-join (an eval corpus is vastly smaller than
    * the training corpus, so this side broadcasts); the training
    * corpus streams through exploded and never self-joins. Returns
    * (idCol, n_shared) for docs with ≥1 shared shingle.
    */
  def evalOverlap(
      docs: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalTextCol: String, n: Int): DataFrame = {
    val evalShingles = evalDocs
      .select(explode(TextOps.shingleHashes(col(evalTextCol), n)).as("__h"))
      .distinct()
    docs
      .select(col(idCol),
        explode(TextOps.shingleHashes(col(textCol), n)).as("__h"))
      .join(broadcast(evalShingles), Seq("__h"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Deterministic stratified sampling: row survives iff
    * hash(key:salt) mod 1000 < ratePerMille(group). The data-mixing
    * primitive ("keep 30% of web, all of books"): a pure function of
    * (key, salt, group), so the sample is reproducible across runs,
    * engines, repartitionings, and incremental corpus growth — the
    * same property as TextOps.stableSplit, applied per stratum.
    * Unknown groups get `defaultPerMille`.
    */
  def stratifiedSample(
      df: DataFrame, keyCol: String, groupCol: String, salt: String,
      ratesPerMille: Map[String, Int],
      defaultPerMille: Int = 0): DataFrame = {
    val rate = ratesPerMille.toSeq.sortBy(_._1)
      .foldRight(lit(defaultPerMille.toLong)) { case ((g, r), acc) =>
        when(col(groupCol) === g, lit(r.toLong)).otherwise(acc)
      }
    val h = pmod(
      TextOps.polyHash(concat(col(keyCol).cast("string"), lit(":" + salt))),
      lit(1000L))
    df.filter(h < rate)
  }
}
