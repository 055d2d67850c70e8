package graft

import org.apache.spark.sql.functions._
import graft.movies.Analyzer

/** The fused native analyzer (functions.AnalyzeText) must match the
  * layered Column/UDF reference formulation token-for-token — checked
  * on edge cases and on the full golden ru/en movie corpus.
  */
class AnalyzeNativeSpec extends SparkTestBase {
  import spark.implicits._

  test("native analyze ≡ layered formulation on edge cases") {
    val cases = Seq(
      "Star Wars: Episode IV — A New Hope",
      "Звёздные войны. Эпизод IV: Новая надежда",
      "the and of",                    // all stopwords -> []
      "",                              // empty -> []
      "  \t\n ",                       // whitespace only
      "O'Neill's dog-house x2",        // apostrophes + possessive
      "ПРИВЕТ мир hello WORLD",        // mixed script + case
      "значимость южных войн",         // ru inflections
      "123 4match номер5",             // digits inside tokens
      null.asInstanceOf[String])
    val df = cases.toDF("t")
    val diff = df.select(
        Analyzer.analyze($"t").as("native"),
        Analyzer.analyzeHof($"t").as("layered"))
      .filter($"native" =!= $"layered")
    assert(diff.count() === 0,
      s"divergence: ${diff.collect().mkString("; ")}")
  }

  test("StemTokens: SQL registration, per-script stemming, null " +
       "array and null elements") {
    graft.functions.GraftFunctions.register(spark)
    // per-script behavior matches the driver-side kernel
    val toks = Seq(Seq("running", "войны", "x2"))
    val out = toks.toDF("a")
      .selectExpr("graft_stem_tokens(a) AS s")
      .as[Seq[String]].head()
    assert(out === toks.head.map(Analyzer.stemToken))
    // null array → null (the Column face is wrapped in coalesce upstream)
    val nullArr = spark.sql(
      "SELECT graft_stem_tokens(CAST(NULL AS ARRAY<STRING>)) AS s")
      .collect().head
    assert(nullArr.isNullAt(0))
    // null elements pass through
    val withNull = spark.sql(
      "SELECT graft_stem_tokens(array('films', NULL)) AS s")
      .collect().head.getSeq[String](0)
    assert(withNull === Seq(Analyzer.stemToken("films"), null))
  }

  test("native analyze ≡ layered formulation on the golden corpus") {
    val movies = spark.read.json(
      getClass.getResource("/legacy/movies.jsonl").getPath)
    val texts = movies.select($"title".as("t"))
      .unionByName(movies.select($"plot".as("t")))
    val diff = texts.select(
        $"t",
        Analyzer.analyze($"t").as("native"),
        Analyzer.analyzeHof($"t").as("layered"))
      .filter($"native" =!= $"layered")
      .limit(5).collect()
    assert(diff.isEmpty,
      s"divergence on golden corpus: ${diff.mkString("; ")}")
  }
}
