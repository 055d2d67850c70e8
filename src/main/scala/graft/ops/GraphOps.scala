package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-dup pair graph — the finisher of
  * corpus deduplication: LSH/Jaccard stages emit PAIRS, but a dup
  * cluster is the transitive closure of pairs, and exactly one doc per
  * cluster survives.
  *
  * Algorithm: iterated min-label propagation (each node takes the min
  * label among itself and its neighbors) until a fixpoint — the
  * map-reduce classic. Per iteration: one equi-join (labels→edges) +
  * one min-aggregate, both key-partitioned shuffles that scale with
  * |E|; converges in O(component diameter) rounds, and near-dup
  * clusters are shallow (dup chains are short) so 3-5 rounds is
  * typical at any corpus size. Each round localCheckpoints: iterative
  * dataflows otherwise stack lineage until planning, not compute,
  * dominates. A convergence probe (one count of changed labels) runs
  * per round — the control-plane cost of a data-dependent loop.
  */
object GraphOps {

  /** (id, component) for every node in `edges`, component = min node id
    * reachable in the undirected graph.
    */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .localCheckpoint()
    var labels = e.select(col("a").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()
    // Convergence probe: one scalar aggregate per round (no
    // join-against-previous). The id set is fixed across rounds, so the
    // (id, component) multiset fingerprint — a sum of 64-bit row hashes,
    // widened to decimal so the sum can't wrap — changes iff any label
    // changed, up to a 2^-64 hash-collision risk per round. Hashing (not
    // summing the label itself) keeps the probe correct for ANY id type:
    // a numeric cast would be NULL for string ids, making every round
    // "converged" after one propagation step.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(xxhash64(col("id"), col("component"))
        .cast("decimal(30,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val msgs = e
        .join(labels.withColumnRenamed("id", "a"), Seq("a"))
        .select(col("b").as("id"), col("component"))
      val next = labels.union(msgs)
        .groupBy(col("id")).agg(min(col("component")).as("component"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      labels.unpersist()  // bound executor storage to 2 label copies
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      iter += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "component diameter exceeds the cap; raise maxIter")
    labels
  }

  /** Fixed-iteration PageRank in exact integer arithmetic — importance
    * scoring over reference graphs (citation/link/co-occurrence), the
    * graph-analytics companion to [[connectedComponents]].
    *
    * Total mass is `mass` integer units (default 1e12 — fine-grained
    * enough that `div`-truncation noise stays ~1e-6 relative at 10⁸
    * nodes); per iteration r' = ((1e6−d)·(M div N)) div 1e6 +
    * (d·(Σ_in contrib + dangling div N)) div 1e6 with d in ppm, every
    * step BIGINT `div` — so two engines replay the identical value
    * (q106 unrolls the same iterations in SQL). Deliberately NOT
    * float PageRank: floats would converge faster per bit but the
    * fold-order ambiguity of a float sum across partitions is exactly
    * what the determinism contract bans.
    *
    * Per iteration: one equi-join (ranks→edges on src), one
    * map-side-combined in-sum, one scalar dangling aggregate, one
    * left join back to the node set — all key-partitioned shuffles
    * scaling with |E|; iterations are FIXED (not convergence-probed):
    * ranking use-cases read relative order, which stabilizes in a few
    * rounds.
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampingPpm: Long = 850000L,
      mass: Long = 1000000000000L): DataFrame = {
    require(iters >= 0 && dampingPpm >= 0 && dampingPpm <= 1000000L)
    // Static tables checkpoint ONCE; the dangling-mass scalar joins
    // into the plan as a broadcast 1-row aggregate, so each iteration
    // is a single action (the checkpoint) — no per-round driver
    // collect, no recomputed degree aggregate.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    val n = nodes.count()
    // empty graph → empty ranks (not a divide-by-zero on mass/N)
    if (n == 0) return nodes.withColumn("r", lit(0L))
    // degree folds into the edge table once — not re-joined per round
    val eDeg = e.join(outDeg, Seq("src")).localCheckpoint()
    val base = ((1000000L - dampingPpm) * (mass / n)) / 1000000L
    // the static dangling flag RIDES IN the rank table, so the per-round
    // dangling-mass aggregate is a scan (no join, no separate id table)
    var ranks = nodes
      .join(outDeg.select(col("src").as("id"), lit(false).as("__dg")),
        Seq("id"), "left_outer")
      .select(col("id"), lit(mass / n).as("r"),
        coalesce(col("__dg"), lit(true)).as("__dg"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val dang = ranks.filter(col("__dg"))
        .agg(coalesce(sum(col("r")), lit(0L)).as("__dang"))
      val inSums = eDeg
        .join(ranks.select(col("id").as("src"), col("r")), Seq("src"))
        .withColumn("c", expr("r div deg"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("c")).as("in_sum"))
      val prev = ranks
      ranks = prev.select(col("id"), col("__dg"))
        .join(inSums, Seq("id"), "left_outer")
        .crossJoin(broadcast(dang))
        .select(col("id"),
          // BIGINT `div` end to end — Column./ and .divide are DOUBLE
          // true division and would break the integer contract
          expr(s"$base + ($dampingPpm * (coalesce(in_sum, " +
              s"CAST(0 AS BIGINT)) + __dang div $n)) div 1000000")
            .as("r"),
          col("__dg"))
        .localCheckpoint()
      prev.unpersist()    // bound executor storage to 2 rank copies
    }
    ranks.select(col("id"), col("r"))
  }

  /** INCREMENTAL connected components: merge a batch of NEW edges into
    * an existing (id, component) labeling without touching the old
    * edge set — the daily-increment companion to
    * [[connectedComponents]] (pairs with DedupOps'
    * lshCandidatePairsIncremental for dedup-cluster maintenance).
    *
    * Key identity: relabeling after new edges only needs the COMPONENT
    * CONTRACTION graph — map each new edge's endpoints to their current
    * labels (unseen nodes label themselves), drop intra-component
    * edges, and run CC on what remains. That graph has one node per
    * TOUCHED COMPONENT, not per corpus row — a daily delta touches
    * thousands of clusters, not billions of documents, so the
    * iterative part runs on a graph ~|delta| regardless of corpus
    * size; the corpus-sized work is one labels join and one final
    * remap join. Labels stay canonical (min id): a merged cluster's
    * new label is the min over its old labels, each of which was a min
    * id — so merge ≡ full recompute bit-for-bit (GraphOpsSpec proves
    * it on random graph splits).
    */
  def mergeComponents(
      prevLabels: DataFrame, newEdges: DataFrame,
      srcCol: String, dstCol: String): DataFrame = {
    val lab = prevLabels.select(col("id"), col("component"))
    val e = newEdges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
    val compEdges = e
      .join(lab.select(col("id").as("__a"), col("component").as("__la")),
        Seq("__a"), "left_outer")
      .join(lab.select(col("id").as("__b"), col("component").as("__lb")),
        Seq("__b"), "left_outer")
      .select(coalesce(col("__la"), col("__a")).as("la"),
        coalesce(col("__lb"), col("__b")).as("lb"))
      .filter(col("la") =!= col("lb"))
    val remap = connectedComponents(compEdges, "la", "lb")
      .select(col("id").as("__old"), col("component").as("__new"))
    val newNodes = e.select(col("__a").as("id"))
      .union(e.select(col("__b").as("id"))).distinct()
      .join(lab.select(col("id")), Seq("id"), "left_anti")
      .withColumn("component", col("id"))
    lab.unionByName(newNodes)
      .join(remap, col("component") === col("__old"), "left_outer")
      .select(col("id"),
        coalesce(col("__new"), col("component")).as("component"))
  }

  /** Keep one row per near-dup cluster (the min id), plus every row
    * that appears in no pair — the canonical-doc selection step after
    * candidate generation + verification.
    */
  def dropNearDuplicates(
      df: DataFrame, idCol: String, pairs: DataFrame,
      srcCol: String = "id_a", dstCol: String = "id_b"): DataFrame = {
    val losers = connectedComponents(pairs, srcCol, dstCol)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
