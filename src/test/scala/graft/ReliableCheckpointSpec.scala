package graft

import org.apache.spark.sql.functions._
import graft.ops.{BpeOps, DedupOps, GraphOps, TextOps}

/** Reliable-checkpoint breadth (round-8 VERDICT advisory #2): every
  * iterative loop routes lineage truncation through
  * [[graft.ops.Checkpointer]], so a configured checkpoint dir flips
  * ALL of them to executor-loss-safe reliable checkpoints at once.
  * GraphOpsSpec proves the mode for CC/PageRank; this suite proves the
  * remaining loop families produce BIT-IDENTICAL results under it —
  * BPE merge learning, the incremental dedup probe (the q70 refresh
  * shape), BFS seed distances, LPA, and HITS — and that each run
  * really wrote checkpoint part-files.
  */
class ReliableCheckpointSpec extends SparkTestBase {
  import spark.implicits._

  /** Run `f` with a reliable checkpoint dir configured, assert real
    * checkpoint files appeared, then restore local mode for the other
    * shared-session suites (GraphOpsSpec:569's pattern).
    */
  private def withReliableDir[T](f: => T): T = {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty, "suite assumes local mode")
    val dir = java.nio.file.Files.createTempDirectory("graft_rckpt")
    sc.setCheckpointDir(dir.toString)
    try {
      val out = f
      val files = java.nio.file.Files.walk(dir).iterator()
        .asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      var nParts = 0
      while (files.hasNext) {
        if (files.next().getFileName.toString.startsWith("part-"))
          nParts += 1
      }
      assert(nParts > 0, s"no reliable checkpoint files under $dir")
      out
    } finally {
      // checkpointDir is a private[spark] var — reflection is the only
      // public-API-free way back to local mode
      val m = sc.getClass.getMethod(
        "checkpointDir_$eq", classOf[Option[String]])
      m.invoke(sc, None)
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
  }

  test("BPE learnMerges: reliable mode ≡ local mode on a real corpus " +
       "sample, and the merge loop wrote real checkpoint files") {
    val docs = Tables.load(spark, sfDir, "documents").limit(40)
      .select($"text").cache()
    val local = BpeOps.learnMerges(docs, "text", 6)
    assert(local.size === 6)
    assert(withReliableDir(BpeOps.learnMerges(docs, "text", 6)) === local)
  }

  test("incremental dedup probe (the q70 refresh shape): reliable " +
       "mode ≡ local mode on real signatures") {
    val sh = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", TextOps.shingleHashes($"text", 3).as("hashes"))
    val sig = DedupOps.minhashSignatures(sh, "doc_id", "hashes", 16)
      .cache()
    def run() = DedupOps.lshCandidatePairsIncremental(
        sig.filter($"doc_id" < 300), sig.filter($"doc_id" >= 300),
        "doc_id", "sig", 4, 4)
      .as[(Long, Long)].collect().toSet
    val local = run()
    assert(local.nonEmpty, "fixture must produce candidate pairs")
    assert(withReliableDir(run()) === local)
  }

  test("BFS seed distances, LPA, and HITS: reliable mode ≡ local mode " +
       "bit-for-bit on a random graph") {
    val rnd = new scala.util.Random(41)
    val edges = (0 until 300).map(_ =>
      (rnd.nextInt(90).toLong, rnd.nextInt(90).toLong))
      .filter(e => e._1 != e._2).toDF("a", "b").cache()
    val seeds = Seq(1L, 2L, 3L).toDF("id")
    def bfs() = GraphOps.seedDistances(edges, "a", "b", seeds, "id",
        rounds = 4)
      .as[(Long, Long)].collect().sorted.toSeq
    def lpa() = GraphOps.labelPropagation(edges, "a", "b", rounds = 3)
      .as[(Long, Long)].collect().sorted.toSeq
    def hit() = GraphOps.hits(edges, "a", "b", rounds = 3)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val (b0, l0, h0) = (bfs(), lpa(), hit())
    withReliableDir {
      assert(bfs() === b0)
      assert(lpa() === l0)
      assert(hit() === h0)
    }
  }
}
