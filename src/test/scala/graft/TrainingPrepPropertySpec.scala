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

  test("round-8 batch-2 ops are partitioning-invariant: NB predictions, " +
       "RRF fusion, covariance and silhouette values do not depend on " +
       "physical layout") {
    import graft.ops.{ClassifierOps, SearchOps, SimilarityOps}
    val rnd = new scala.util.Random(8)
    val langs = Seq("aa", "bb", "cc")
    val docs = (0 until 120).map { i =>
      val l = langs(i % 3)
      val toks = (0 until 5 + rnd.nextInt(10))
        .map(_ => s"$l${rnd.nextInt(6)}")
      (i.toLong, toks.mkString(" "), l)
    }.toDF("id", "text", "lang")
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() - 0.5f), (i % 4).toLong)
    }.toDF("id", "emb", "cl")

    def nbRun(p: Int) = {
      val d = docs.repartition(p)
      val m = ClassifierOps.nbTrain(d.filter($"id" % 4 =!= 0),
        "text", "lang")
      ClassifierOps.nbPredict(d.filter($"id" % 4 === 0),
          "id", "text", m)
        .orderBy($"id").as[(Long, String, Long)].collect().toSeq
    }
    assert(nbRun(1) === nbRun(13))

    def covRun(p: Int) = SimilarityOps
      .embeddingCovariance(vecs.repartition(p), "emb")
      .orderBy($"j", $"k").as[(Long, Long, Long, Long)].collect().toSeq
    assert(covRun(1) === covRun(7))

    def silRun(p: Int) = SimilarityOps
      .simplifiedSilhouette(vecs.repartition(p), "id", "emb", "cl")
      .orderBy($"id").as[(Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(silRun(1) === silRun(7))

    val ra = (0 until 30).map(i =>
      (i.toLong % 3, i.toLong, i.toLong / 3 + 1)).toDF("q", "d", "r")
    val rb = (0 until 30).map(i =>
      (i.toLong % 3, (i * 7 % 30).toLong, i.toLong / 3 + 1))
      .toDF("q", "d", "r")
    def rrfRun(p: Int) = SearchOps
      .rrfFuse(Seq(ra.repartition(p), rb.repartition(p)),
        "q", "d", "r", kRrf = 60L, topK = 5)
      .orderBy($"q", $"rank").as[(Long, Long, Long, Int)]
      .collect().toSeq
    assert(rrfRun(1) === rrfRun(5))
  }
}
