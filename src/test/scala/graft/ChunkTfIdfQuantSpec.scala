package graft

import org.apache.spark.sql.functions._
import graft.ops.{SimilarityOps, TextOps}

/** Semantic properties of the round-4 training-prep ops: chunking
  * (coverage/overlap/boundaries), TF-IDF top-k (ranking laws), and int8
  * quantization (range, reconstruction error, zero vector).
  */
class ChunkTfIdfQuantSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("chunkDocs: every token covered in order; consecutive chunks " +
       "share exactly `overlap` tokens; tail clamps") {
    val n = 100
    val text = (0 until n).map(i => s"t$i").mkString(" ")
    val out = TextOps.chunkDocs(docs(1L -> text), "doc_id", "text", 32, 8)
      .orderBy("chunk_id").collect()
    val chunks = out.map(_.getAs[String]("chunk_text").split(" ").toSeq)
    // stride 24: chunk k starts at token 24k
    chunks.zipWithIndex.foreach { case (c, k) =>
      assert(c.head === s"t${24 * k}", s"chunk $k start")
      assert(c.length <= 32)
    }
    // coverage: concatenating de-overlapped chunks recovers the doc
    val rebuilt = chunks.head ++ chunks.tail.flatMap(_.drop(8))
    assert(rebuilt === (0 until n).map(i => s"t$i"))
    // overlap: last 8 of chunk k == first 8 of chunk k+1 (when full)
    chunks.sliding(2).foreach { pair =>
      if (pair.length == 2 && pair(0).length == 32)
        assert(pair(0).takeRight(8) === pair(1).take(8))
    }
    // chunk count: 1 + ceil((100-32)/24) = 4
    assert(chunks.length === 4)
  }

  test("chunkDocs edge cases: short doc = 1 chunk; empty text = 1 empty " +
       "chunk; exact-boundary doc has no empty tail chunk") {
    val out = TextOps.chunkDocs(
      docs(1L -> "a b c", 2L -> "", 3L -> (0 until 56).map("w" + _).mkString(" ")),
      "doc_id", "text", 32, 8)
      .orderBy("doc_id", "chunk_id").collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc(1L).length === 1 && byDoc(1L).head.getInt(2) === 3)
    assert(byDoc(2L).length === 1 && byDoc(2L).head.getInt(2) === 0)
    // 56 = 32 + 24 exactly → 2 chunks, second is full-stride, none empty
    assert(byDoc(3L).length === 2)
    assert(byDoc(3L).forall(_.getInt(2) > 0))
  }

  test("tfIdfTopTerms: ubiquitous terms rank below distinctive ones; " +
       "scores match the integer formula; k bounds per-doc rows") {
    val d = docs(
      1L -> "common rare1 common common",
      2L -> "common rare2",
      3L -> "common rare3 rare3")
    val out = TextOps.tfIdfTopTerms(d, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getAs[String]("term"),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc.values.forall(_.length <= 2))
    // doc 3: rare3 (tf=2, df=1) must outrank common (tf=1, df=3)
    val d3 = byDoc(3L).sortBy(_._6)
    assert(d3.head._2 === "rare3")
    // formula: score = 1e6 * tf * N / df (N=3)
    val rare3 = d3.head
    assert(rare3._5 === 1000000L * 2 * 3 / 1)
    val common3 = d3(1)
    assert(common3._2 === "common" && common3._5 === 1000000L * 1 * 3 / 3)
  }

  test("quantizeInt8: codes in [-127,127], max|code| = 127 for nonzero " +
       "vectors, zero vector -> zero codes, reconstruction error <= " +
       "half a quantization step") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(1e-4f, -3e-4f, 2e-4f, 1e-4f)),
      (4L, Array(100f, -50f, 25f, 12.5f))
    ).toDF("id", "vec")
    val out = vecs.select($"id",
        $"vec", SimilarityOps.quantizeInt8($"vec").as("codes"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getSeq[Int](2)))
    out.foreach { case (id, v, codes) =>
      assert(codes.length === v.length)
      assert(codes.forall(c => c >= -127 && c <= 127), s"range for $id")
      val maxAbs = v.map(math.abs).max
      if (maxAbs == 0f) assert(codes.forall(_ === 0))
      else {
        assert(codes.map(math.abs).max === 127, s"scale pegged for $id")
        // dequantized error bounded by half a step
        val step = maxAbs / 127.0
        v.zip(codes).foreach { case (x, c) =>
          assert(math.abs(c * step - x) <= step / 2 + 1e-9,
            s"reconstruction for $id: $x vs ${c * step}")
        }
      }
    }
  }
}
