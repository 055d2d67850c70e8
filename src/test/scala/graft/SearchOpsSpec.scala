package graft

import org.apache.spark.sql.functions._
import graft.ops.{SearchOps, TextOps}

class SearchOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("deletionKeys: the word plus every single-character deletion, " +
       "deduplicated") {
    val got = Seq("abc", "aab", "x").toDF("w")
      .select($"w", SearchOps.deletionKeys($"w").as("k"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("abc").toSet === Set("abc", "bc", "ac", "ab"))
    // deleting either 'a' of "aab" yields the same "ab" — deduped
    assert(got("aab").toSet === Set("aab", "ab", "aa"))
    assert(got("x").toSet === Set("x", ""))
  }

  test("symspellMatches ≡ the exhaustive Levenshtein ≤ 1 filter " +
       "(q88's shape) on a random dictionary — the index changes the " +
       "plan, never the answer") {
    val rnd = new scala.util.Random(19)
    def word() = (1 to 3 + rnd.nextInt(4))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val dict = (1 to 60).map(_ => word()).distinct
    val qs = (1 to 25).map(_ => word()).distinct
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      q <- qs; t <- dict; d = lev(q, t); if d <= 1
    } yield (q, t, d.toLong)).toSet
    val got = SearchOps.symspellMatches(
        dict.toDF("term").repartition(5), "term",
        qs.toDF("query"), "query")
      .select($"query", $"term", $"dist".cast("long"))
      .as[(String, String, Long)].collect().toSet
    assert(got === expected)
  }

  test("phraseMatches: order and slop enforced, chains counted per " +
       "path, first_pos is the earliest start") {
    val docs = Seq(
      (1L, "a b c"),        // a→b slop1: match at 0
      (2L, "a x b"),        // gap 2: needs slop ≥ 2
      (3L, "b a"),          // wrong order: never matches
      (4L, "a b a b"),      // chains (0,1), (2,3), and (0→b@3 at slop 3)
      (5L, "a x x b")       // gap 3: outside slop 2
    ).toDF("id", "text")
    def run(slop: Int) = SearchOps.phraseMatches(
        docs, "id", "text", Seq("a", "b"), slop)
      .select($"id", $"n_matches", $"first_pos".cast("long"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val s1 = run(1)
    assert(s1 === Map(1L -> ((1L, 0L)), 4L -> ((2L, 0L))))
    val s2 = run(2)
    assert(s2 === Map(1L -> ((1L, 0L)), 2L -> ((1L, 0L)),
      4L -> ((2L, 0L))))
    val s3 = run(3)
    // doc 4 at slop 3: a@0→b@1, a@0→b@3, a@2→b@3
    assert(s3(4L) === ((3L, 0L)) && s3(5L) === ((1L, 0L)))
    // three-term phrase: frontier chains across both joins
    val three = SearchOps.phraseMatches(
        Seq((7L, "a b c d")).toDF("id", "text"), "id", "text",
        Seq("a", "b", "c"), slop = 1)
      .select($"n_matches").as[Long].head()
    assert(three === 1L)
  }

  test("kwicSnippet: clamps at both ends, absent term yields pos 0 " +
       "and null snippet") {
    val got = Seq(
      (1L, "a b c d e f g"), // hit mid-array
      (2L, "hit b c"),       // hit at the start — left clamp
      (3L, "a b hit"),       // hit at the end — right clamp
      (4L, "none here")
    ).toDF("id", "text")
      .select($"id", TextOps.kwicSnippet($"text",
        when($"id" === 1L, "d").otherwise("hit"), window = 2).as("s"))
      .select($"id", $"s.pos", $"s.snippet")
      .as[(Long, Long, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((4L, Some("b c d e f"))))
    assert(got(2L) === ((1L, Some("hit b c"))))
    assert(got(3L) === ((3L, Some("a b hit"))))
    assert(got(4L) === ((0L, None)))
  }

  test("rrfFuse: hand-computed fusion; single-list items score one " +
       "term; equal scores tie to the smaller id") {
    import graft.ops.SearchOps
    def w(r: Long) = 1000000L / (60L + r)
    // ranker A: d1@1 d2@2 d3@3; ranker B: d2@1 d4@2
    val a = Seq((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L))
      .toDF("q", "d", "r")
    val b = Seq((1L, 2L, 1L), (1L, 4L, 2L)).toDF("q", "d", "r")
    val got = SearchOps.rrfFuse(Seq(a, b), "q", "d", "r",
        kRrf = 60L, topK = 10)
      .orderBy($"rank").select($"d", $"rrf", $"rank")
      .as[(Long, Long, Int)].collect().toSeq
    assert(got === Seq((2L, w(2) + w(1), 1), (1L, w(1), 2),
      (4L, w(2), 3), (3L, w(3), 4)))
    // tie: d5 and d6 each rank 1 on exactly one list -> equal rrf,
    // smaller id first; topK cuts the tail
    val ta = Seq((9L, 5L, 1L), (9L, 7L, 2L)).toDF("q", "d", "r")
    val tb = Seq((9L, 6L, 1L)).toDF("q", "d", "r")
    val tied = SearchOps.rrfFuse(Seq(ta, tb), "q", "d", "r",
        kRrf = 60L, topK = 2)
      .orderBy($"rank").select($"d", $"rank")
      .as[(Long, Int)].collect().toSeq
    assert(tied === Seq((5L, 1), (6L, 2)))
  }
}
