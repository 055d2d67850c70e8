package graft

import org.apache.spark.sql.functions._
import graft.ops.BpeOps

/** BPE merge learning vs a sequential plain-Scala referee implementing
  * the published algorithm directly — same tie-break, same in-order
  * non-overlapping merge semantics.
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // ---- referee: sequential BPE over a word-frequency map ----
  private def mergeSeq(
      syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toVector
  }

  private def refereeMerges(
      words: Map[String, Long], k: Int): Seq[(String, String)] = {
    var dict: Map[Vector[String], Long] =
      words.map { case (w, n) => w.split("").filter(_.nonEmpty).toVector -> n }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < k && !done) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, w) <- dict; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += w
      if (counts.isEmpty) done = true
      else {
        val ((a, b), _) = counts.toSeq
          .minBy { case ((a, b), w) => (-w, a, b) }
        merges += ((a, b))
        dict = dict.map { case (s, w) => mergeSeq(s, a, b) -> w }
      }
    }
    merges.toSeq
  }

  test("learnMerges: hand-checked tiny corpus, early exhaustion") {
    val df = Seq("aa aa ab").toDF("text")
    // dict: aa(2)=[a,a], ab(1)=[a,b]; pairs (a,a)->2, (a,b)->1
    // merge 1 = (a,a) -> dict [aa](2), [a,b](1); merge 2 = (a,b);
    // then no pairs remain -> stops at 2 despite k=5
    assert(BpeOps.learnMerges(df, "text", 5) ===
      Seq(("a", "a"), ("a", "b")))
  }

  test("learnMerges ≡ sequential referee on a real corpus sample (k=8), " +
       "including fused-symbol merges; deterministic under repartition") {
    val docs = Tables.load(spark, sfDir, "documents").limit(60)
      .select($"text").cache()
    val words = docs
      .select(explode(split($"text", "\\s+")).as("w"))
      .filter($"w" =!= "").groupBy($"w").count()
      .as[(String, Long)].collect().toMap
    val expect = refereeMerges(words, 8)
    val got = BpeOps.learnMerges(docs, "text", 8)
    assert(got === expect)
    // multi-char fused symbols must appear by merge 8 on real text
    assert(expect.exists { case (a, b) => a.length > 1 || b.length > 1 })
    val got7 = BpeOps.learnMerges(docs.repartition(7), "text", 8)
    assert(got7 === expect)
  }

  test("applyMerges: encoding each distinct word with the learned list " +
       "reproduces the trained dictionary's final symbol sequences") {
    val corpus = Seq("banana bandana ban anna banana ban").toDF("text")
    val merges = BpeOps.learnMerges(corpus, "text", 6)
    // referee final dict
    val words = "banana bandana ban anna banana ban".split(" ")
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    var dict = words.map { case (w, n) =>
      w -> w.split("").filter(_.nonEmpty).toVector }
    merges.foreach { case (a, b) =>
      dict = dict.map { case (w, s) => w -> mergeSeq(s, a, b) } }
    val got = words.keys.toSeq.toDF("word")
      .select($"word", BpeOps.applyMerges($"word", merges).as("pieces"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector)
      .toMap
    dict.foreach { case (w, s) =>
      assert(got(w) === s, s"pieces for '$w'")
      assert(s.mkString === w, "concatenation invariant")
    }
  }
}
