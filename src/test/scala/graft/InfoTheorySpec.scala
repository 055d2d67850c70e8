package graft

import org.apache.spark.sql.functions._
import graft.ops.{CurationOps, TextOps}

/** Q20 information-theoretic signals: per-document token entropy
  * (TextOps.tokenEntropyQ20) and corpus KL divergence
  * (CurationOps.klDivergenceQ20). Hand-computed exact values where the
  * logs are powers of two, double-precision referees with a Q20-scale
  * tolerance elsewhere, and the exact-cancellation law KL(P‖P) = 0.
  */
class InfoTheorySpec extends SparkTestBase {
  import spark.implicits._

  private val Q20 = 1048576L

  private def entropy(texts: String*): Seq[Long] =
    texts.toDF("text")
      .select(TextOps.tokenEntropyQ20($"text").as("h"))
      .collect().map(_.getLong(0)).toSeq

  test("hand-exact entropies on power-of-two distributions") {
    // uniform over 2 tokens = 1 bit; all-same = 0; single token = 0;
    // uniform over 4 = 2 bits; {a:2,b:1,c:1} = 1.5 bits
    assert(entropy("a b") == Seq(Q20))
    assert(entropy("a a a a") == Seq(0L))
    assert(entropy("a") == Seq(0L))
    assert(entropy("a b c d") == Seq(2 * Q20))
    assert(entropy("a a b c") == Seq(Q20 * 3 / 2))
  }

  test("entropy referee: double-precision Shannon within Q20 rounding") {
    val rnd = new scala.util.Random(11)
    val docs = Seq.tabulate(50)(_ =>
      Seq.fill(rnd.nextInt(60) + 1)("w" + rnd.nextInt(12)).mkString(" "))
    val got = entropy(docs: _*)
    docs.zip(got).foreach { case (doc, hQ20) =>
      val toks = doc.split("\\s+")
      val n = toks.length.toDouble
      val hTrue = toks.groupBy(identity).values
        .map(_.length.toDouble)
        .map(c => -(c / n) * (math.log(c / n) / math.log(2))).sum
      // binLog2Q20 is ~2^-20 relative per log; counts ≤ 64 keep the
      // accumulated error far below 1e-3 bits
      assert(math.abs(hQ20.toDouble / Q20 - hTrue) < 1e-3,
        s"doc '$doc': got ${hQ20.toDouble / Q20}, want $hTrue")
    }
  }

  test("entropy is order- and naming-invariant, zero iff degenerate") {
    val Seq(a, b) = entropy("x y x y z", "z x y y x")
    assert(a == b && a > 0)
  }

  test("KL(P ‖ P) is exactly zero — every log pair cancels") {
    val docs = Seq("alpha beta gamma", "beta beta delta", "gamma alpha")
      .toDF("text")
    val out = CurationOps.klDivergenceQ20(docs, docs, "text",
      dim = 16, salt = "t")
    val rows = out.collect()
    assert(rows.length == 16)
    assert(rows.forall(_.getAs[Long]("l_q20") == 0L))
    assert(rows.forall(_.getAs[Long]("kl_q20") == 0L))
  }

  test("KL referee: double-precision divergence within Q20 rounding") {
    val rnd = new scala.util.Random(5)
    def corpus(bias: Int) = Seq.tabulate(40)(_ =>
      Seq.fill(30)("w" + (rnd.nextInt(10) + bias)).mkString(" "))
    val p = corpus(0).toDF("text")
    val q = corpus(4).toDF("text")
    val dim = 32
    val out = CurationOps.klDivergenceQ20(p, q, "text", dim, "t")
      .orderBy($"bucket").collect()
    val cp = out.map(_.getAs[Long]("cp").toDouble)
    val cq = out.map(_.getAs[Long]("cq").toDouble)
    val (np, nq) = (cp.sum + dim, cq.sum + dim)
    val klTrue = cp.indices.map { i =>
      val pi = (cp(i) + 1) / np
      val qi = (cq(i) + 1) / nq
      pi * (math.log(pi / qi) / math.log(2))
    }.sum
    val klGot = out.head.getAs[Long]("kl_q20").toDouble / Q20
    assert(out.map(_.getAs[Long]("kl_q20")).distinct.length == 1)
    assert(math.abs(klGot - klTrue) < 1e-3, s"got $klGot want $klTrue")
    assert(klGot >= -1e-3, "KL must be non-negative up to rounding")
  }

  test("KL bucket rows cover the full dim spine, unseen buckets smoothed") {
    val p = Seq("only one doc").toDF("text")
    val q = Seq("another tiny doc").toDF("text")
    val out = CurationOps.klDivergenceQ20(p, q, "text", dim = 64, "t")
      .collect()
    assert(out.length == 64)
    assert(out.map(_.getAs[Long]("bucket")).sorted.toSeq ==
      (0L until 64L).toSeq)
  }

  test("PSI(P ‖ P) is exactly zero — every contribution's count factor " +
       "vanishes; shifted corpora give strictly positive PSI with all " +
       "contributions nonnegative") {
    val docs = Seq("alpha beta gamma", "beta beta delta", "gamma alpha")
      .toDF("text")
    val self = CurationOps.psiQ20(docs, docs, "text", dim = 32, "ps")
      .collect()
    assert(self.forall(_.getAs[Long]("contrib") == 0L))
    assert(self.forall(_.getAs[Long]("psi_q20") == 0L))
    val q = Seq("epsilon zeta", "zeta epsilon eta").toDF("text")
    val shifted = CurationOps.psiQ20(docs, q, "text", dim = 32, "ps")
      .collect()
    assert(shifted.forall(_.getAs[Long]("contrib") >= 0L))
    assert(shifted.head.getAs[Long]("psi_q20") > 0L)
  }

  test("grouped Poisson bootstrap slices one corpus-wide resample: " +
       "per-replica group sums equal the global bootstrap exactly") {
    import graft.ops.EvalOps
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(300)(i =>
      ("g" + (i % 3), i.toLong, rnd.nextInt(500).toLong))
    val df = rows.toDF("g", "id", "v")
    val grouped = EvalOps.poissonBootstrapMeansGrouped(
        df, "g", "id", "v", replicas = 8, salt = "gb")
      .groupBy($"replica")
      .agg(org.apache.spark.sql.functions.sum($"n_eff").as("n_eff"),
        org.apache.spark.sql.functions.sum($"value_sum").as("value_sum"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val global = EvalOps.poissonBootstrapMeans(
        df, "id", "v", replicas = 8, salt = "gb")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(grouped === global)
  }
}
