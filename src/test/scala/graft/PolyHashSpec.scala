package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.ops.TextOps

class PolyHashSpec extends SparkTestBase {
  import spark.implicits._

  test("all native expressions are SQL-registered and callable via expr") {
    GraftFunctions.register(spark)
    val row = Seq(("star wars", Seq(1.0f, -2.0f), 5L, 3L))
      .toDF("t", "v", "a", "b")
      .select(
        expr("graft_analyze(t)").as("toks"),
        expr("graft_srp_bands(v, 2, 3)").as("bands"),
        expr("graft_zinterleave(a, b, 21)").as("z"),
        expr("graft_cosine_micro(v, v)").as("cos"))
      .head()
    assert(row.getSeq[String](0) === Seq("star", "war"))
    assert(row.getSeq[Long](1).length === 2)
    assert(row.getLong(2) === 27L)
    assert(row.getLong(3) === 1000000L)
  }

  test("expression matches the HOF composition on real text, " +
       "stays inside WholeStageCodegen, and handles null/empty") {
    GraftFunctions.register(spark)
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text")
    val both = docs.select(
      TextOps.polyHashHof($"text").as("hof"),
      expr("graft_polyhash(text)").as("native"))
    assert(both.filter($"hof" =!= $"native").count() === 0)

    // the HOF lambdas are CodegenFallback and knock the whole stage out
    // of codegen; the native expression keeps the stage fused — that is
    // the point of having it.
    val nativeOnly = docs.select(expr("graft_polyhash(text)").as("h"))
    nativeOnly.collect()
    // "*(n)" prefixes mark WholeStageCodegen stages in the tree string
    val plan = nativeOnly.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_polyhash"),
      s"not codegen'd:\n$plan")

    val edge = Seq(Some("abc"), Some(""), None).toDF("s")
      .select(expr("graft_polyhash(s)")).collect()
    assert(edge(0).getLong(0) === 96354L)
    assert(edge(1).getLong(0) === 0L)
    assert(edge(2).isNullAt(0))
  }

  test("all three natives are SQL-callable after registration; " +
       "shingle n must be a literal") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_simhash32(array(CAST(5 AS BIGINT))) AS sh,
        |  graft_polyhash('abc') AS h,
        |  graft_cosine_micro(array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),
        |                     array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE))) AS c,
        |  graft_shingle_hash('a b c d', 3) AS s""".stripMargin).head
    assert(r.getLong(0) === 5L) // single hash: simhash == the hash
    assert(r.getLong(1) === 96354L)
    assert(r.getLong(2) === 1000000L)
    assert(r.getSeq[Long](3).length === 2) // shingles: "a b c", "b c d"
    val err = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hash('a b', 1 + 2)").head
    }
    assert(err.getMessage.contains("INT literal"), err.getMessage)
  }

  test("native expression is not slower than the HOF composition") {
    GraftFunctions.register(spark)
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select($"text").cache()
    docs.count()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val hof = () => docs.select(TextOps.polyHashHof($"text").as("h"))
      .agg(sum($"h")).collect()
    val native = () => docs.select(expr("graft_polyhash(text)").as("h"))
      .agg(sum($"h")).collect()
    hof(); native()
    val tHof = (1 to 3).map(_ => time(hof())).min
    val tNat = (1 to 3).map(_ => time(native())).min
    info(f"polyhash sf0.01: hof=${tHof}%.3fs native=${tNat}%.3fs")
    docs.unpersist()
    // generous bound — guards against the Expression being a regression
    assert(tNat <= tHof * 1.5, f"native $tNat%.3f vs hof $tHof%.3f")
  }

  test("ArgMinCell matches a plain-Scala referee on real embeddings, " +
       "stays inside WholeStageCodegen, and handles nulls and ties") {
    import graft.functions.GraftColumns
    val rnd = new scala.util.Random(3)
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextGaussian()))
    def referee(v: Seq[Float]): Int = {
      var best = 0; var bestD = Double.MaxValue
      for (c <- centers.indices) {
        val ctr = centers(c)
        var d = 0.0
        for (i <- 0 until math.min(ctr.length, v.length))
          d += (v(i) - ctr(i)) * (v(i) - ctr(i))
        if (d < bestD) { bestD = d; best = c }
      }
      best
    }
    val e = Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding")
    val got = e.select($"vec_id",
        GraftColumns.argMinCell($"embedding", centers).as("cell"))
      .as[(Long, Int)].collect().toMap
    val vecs = e.as[(Long, Seq[Float])].collect().toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) === referee(v), s"cell for vec $id")
    }
    // whole-stage codegen keeps the corpus pass fused
    val plan = e.select(GraftColumns.argMinCell($"embedding", centers))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_argmin_cell"),
      s"not codegen'd:\n$plan")
    // ties go to the lowest index (duplicate centroids), nulls stay null
    val dup = Array(Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
    val edge = Seq(Some(Seq(1.0f, 0.0f)), None).toDF("v")
      .select(GraftColumns.argMinCell($"v", dup)).collect()
    assert(edge(0).getInt(0) === 0)
    assert(edge(1).isNullAt(0))
  }

  test("native cosineMicro matches the HOF fold bit-for-bit on real " +
       "embeddings, including self-similarity") {
    import graft.ops.SimilarityOps
    val e = Tables.load(spark, sfDir, "embeddings")
    val a = e.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = e.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val pairs = a.join(b, $"ia" % 7 === $"ib" % 7) // a deterministic subset
      .select(
        SimilarityOps.cosineMicro($"va", $"vb").as("native"),
        SimilarityOps.cosineMicroHof($"va", $"vb").as("hof"))
    assert(pairs.filter($"native" =!= $"hof").count() === 0)
    val self = e.select(
      SimilarityOps.cosineMicro($"embedding", $"embedding")).distinct()
      .as[Long].collect()
    assert(self === Array(1000000L))
  }

  test("binLog2Q20 matches an exact integer referee across magnitudes, " +
       "is exact on powers of two, and rejects non-positive input") {
    import graft.functions.GraftColumns
    def ref(v: Long): Long = {
      val p = 63 - java.lang.Long.numberOfLeadingZeros(v)
      var y = if (p <= 30) v << (30 - p) else v >> (p - 30)
      var acc = 0L
      for (_ <- 1 to 20) {
        val y2 = (y * y) >> 30
        if (y2 >= (1L << 31)) { y = y2 / 2; acc = acc * 2 + 1 }
        else { y = y2; acc = acc * 2 }
      }
      p.toLong * (1L << 20) + acc
    }
    val vs = Seq(1L, 2L, 3L, 7L, 1000L, 1048575L, 1048576L,
      2147483647L, 2147483648L, 1000000007L * 1000L,
      (1L << 62) - 1, 1L << 62)
    val got = vs.toDF("v")
      .select(GraftColumns.binLog2Q20($"v")).as[Long].collect()
    assert(got.toSeq === vs.map(ref))
    // powers of two are exact: log2(2^k) = k exactly in Q20
    for (k <- Seq(0, 1, 10, 31, 62)) {
      assert(ref(1L << k) === k.toLong * (1L << 20), s"2^$k")
    }
    // ~2^-20 relative accuracy vs floating log2 on shift-up inputs
    for (v <- Seq(3L, 1000L, 999999937L)) {
      val err = math.abs(ref(v) / 1048576.0 - math.log(v.toDouble) / math.log(2))
      assert(err < 1e-5, s"v=$v err=$err")
    }
    val e = intercept[Exception] {
      Seq(0L).toDF("v")
        .select(GraftColumns.binLog2Q20($"v")).collect()
    }
    assert(e.getMessage.contains("binLog2Q20"))
  }
}
