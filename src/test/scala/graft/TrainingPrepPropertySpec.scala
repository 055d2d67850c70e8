package graft

import graft.ops.{SimilarityOps, TextOps}

/** Differential tests of the training-prep ops against plain-Scala
  * referees on randomized inputs — chunking (random corpora × random
  * maxTokens/overlap) and int8 quantization (random vectors incl.
  * negatives, tiny magnitudes, zero vectors).
  */
class TrainingPrepPropertySpec extends SparkTestBase {
  import spark.implicits._

  test("chunkDocs ≡ plain-Scala referee over random corpora and " +
       "(maxTokens, overlap) settings; coverage invariant holds") {
    for (seed <- Seq(3, 17, 41)) {
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 30).map { i =>
        val n = rnd.nextInt(120) // includes empty docs
        (i.toLong, (0 until n).map(_ => s"w${rnd.nextInt(50)}")
          .mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      for ((maxT, ov) <- Seq((32, 8), (16, 0), (7, 6), (1, 0))) {
        val stride = maxT - ov
        // referee: sequential chunking
        val expect = docs.flatMap { case (id, text) =>
          val toks = text.split("\\s+").filter(_.nonEmpty).toVector
          val nChunks =
            if (toks.length <= maxT) 1
            else 1 + (toks.length - maxT + stride - 1) / stride
          (0 until nChunks).map { k =>
            val c = toks.slice(k * stride, k * stride + maxT)
            (id, k, c.length, c.mkString(" "))
          }
        }.toSet
        val got = TextOps.chunkDocs(df, "doc_id", "text", maxT, ov)
          .collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
          .toSet
        assert(got === expect, s"seed=$seed maxT=$maxT ov=$ov")
        // coverage: de-overlapped concatenation rebuilds each doc
        docs.foreach { case (id, text) =>
          val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
          val chunks = got.filter(_._1 == id).toSeq.sortBy(_._2)
            .map(_._4.split(" ").filter(_.nonEmpty).toSeq)
          val rebuilt = chunks.head ++ chunks.tail.flatMap(_.drop(ov))
          assert(rebuilt === toks, s"coverage for doc $id")
        }
      }
    }
  }

  test("quantizeInt8 ≡ plain-Scala referee on random vectors " +
       "(negatives, denormals, zero vectors, varied dims)") {
    for (seed <- Seq(5, 29)) {
      val rnd = new scala.util.Random(seed)
      val vecs = (0 until 40).map { i =>
        val dim = 1 + rnd.nextInt(16)
        val scale = math.pow(10, rnd.nextInt(8) - 4).toFloat
        val v = Array.fill(dim)(
          if (rnd.nextInt(10) == 0) 0f
          else (rnd.nextFloat() * 2 - 1) * scale)
        (i.toLong, if (rnd.nextInt(10) == 0) Array.fill(dim)(0f) else v)
      }
      val got = vecs.toDF("id", "vec")
        .select($"id", SimilarityOps.quantizeInt8($"vec").as("codes"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      vecs.foreach { case (id, v) =>
        val maxAbs = v.map(math.abs).max
        val expect =
          if (maxAbs == 0f) v.map(_ => 0).toSeq
          else v.map(x =>
            math.floor(x.toDouble * 127.0 / maxAbs.toDouble + 0.5).toInt)
            .toSeq
        assert(got(id) === expect, s"seed=$seed id=$id")
      }
    }
  }
}
