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
