package graft.ops

import graft.ops.Checkpointer._
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
      .graftCheckpoint()
    var labels = e.select(col("a").as("id")).distinct()
      .withColumn("component", col("id"))
      .graftCheckpoint()
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
        .cast("decimal(30,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val msgs = e
        .join(labels.withColumnRenamed("id", "a"), Seq("a"))
        .select(col("b").as("id"), col("component"))
      val next = labels.union(msgs)
        .groupBy(col("id")).agg(min(col("component")).as("component"))
        .graftCheckpoint()
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

  /** Connected components via alternating LARGE-STAR / SMALL-STAR
    * contraction (Kiveris et al. 2014, "Connected Components in
    * MapReduce and Beyond" — public algorithm): converges in O(log n)
    * rounds on ANY graph, vs O(diameter) for [[connectedComponents]]'s
    * min-label propagation. Near-dup clusters are shallow, so min-label
    * wins there; reach for this variant when components can be DEEP —
    * reply chains, citation paths, session graphs — where diameter
    * grows with data size and label propagation's round count grows
    * with it.
    *
    * Per round, with edges kept canonically as (a > b):
    *  - large-star: every node u connects its LARGER neighbors to the
    *    minimum of its neighborhood (incl. u) — one groupBy(min) + one
    *    equi-join over the symmetrized edges;
    *  - small-star: every node u connects its smaller neighbors (and
    *    itself) to that minimum — same shape over the canonical edges.
    * Both emit strictly-canonical edges, so no orientation pass is
    * needed; neither builds a neighbor LIST (no collect_list — hot
    * nodes stream through aggregates, the same hazard the LSH star cap
    * guards). Fixpoint = the edge multiset hash is stable, at which
    * point the edge set IS the star forest (leaf → component-min root).
    *
    * Output contract identical to [[connectedComponents]]: (id,
    * component = min reachable id) for every non-isolated node;
    * GraphOpsSpec proves equivalence on random graphs.
    */
  def connectedComponentsStar(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 30): DataFrame = {
    var e = edges
      .select(col(srcCol).as("x"), col(dstCol).as("y"))
      .filter(col("x") =!= col("y"))
      .select(greatest(col("x"), col("y")).as("a"),
        least(col("x"), col("y")).as("b"))
      .distinct().graftCheckpoint()
    def edgeSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(xxhash64(col("a"), col("b"))
        .cast("decimal(30,0)"))).head().getDecimal(0)
    var prevSum = edgeSum(e)
    var iter = 0
    var converged = false
    // One large-star + small-star contraction, lazily composed.
    // (r17 measured, kept OUT: an explicit repartition(u) /
    // repartition(a) before each phase — so the phase's min-aggregate
    // and min-attach join share one exchange — read as guide §2.4 on
    // paper but MEASURED WORSE under AQE at sf0.1: jobs 109 → 118,
    // shuffle 75.6 → 94.3 MB, because AQE's coalesced repartition
    // output is not reusable by the join's requirement and the raw
    // 2|E| rows shuffle without the aggregate's partial combine.)
    def contract(in: DataFrame): DataFrame = {
      val sym = in.select(col("a").as("u"), col("b").as("v"))
        .union(in.select(col("b").as("u"), col("a").as("v")))
      // no dedup here: each (u,v) direction emits at most once, the
      // min-aggregate below absorbs duplicates, and the round's single
      // distinct canonicalizes — one less shuffle per round
      val lmin = sym.groupBy(col("u")).agg(min(col("v")).as("mnv"))
      val large = sym.join(lmin, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("a"),
          least(col("mnv"), col("u")).as("b"))
      // small-star over the (a > b) canonical edges: group by the larger
      // endpoint; m = min smaller-neighbor (m < a by construction)
      val smin = large.groupBy(col("a")).agg(min(col("b")).as("m"))
      val withMin = large.join(smin, Seq("a"))
      withMin.select(col("a"), col("m").as("b"))
        .union(withMin.filter(col("b") =!= col("m"))
          .select(col("b").as("a"), col("m").as("b")))
        .distinct()
    }
    // (r17 measured, also kept OUT: TWO lazily-composed contraction
    // rounds per materialization + probe — halves the checkpoint/probe
    // cadence on paper, but the unmaterialized inner round's subtree
    // re-evaluates across the outer round's multiple references under
    // AQE: jobs 109 → 128, shuffle read 75.6 → 135.9 MB at sf0.1.
    // One materialized round per probe is the measured floor here.)
    while (iter < maxIter && !converged) {
      val next = contract(e).graftCheckpoint()
      val nextSum = edgeSum(next)
      e.unpersist() // bound executor storage to 2 edge copies
      e = next
      converged = nextSum == prevSum // null == null covers the empty graph
      prevSum = nextSum
      iter += 1
    }
    require(converged,
      s"connectedComponentsStar did not converge in $maxIter rounds")
    e.select(col("a").as("id"), col("b").as("component"))
      .union(e.select(col("b").as("id"), col("b").as("component")))
      .distinct()
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
      mass: Long = 1000000000000L): DataFrame =
    pageRankLoop(edges, srcCol, dstCol, iters, dampingPpm, mass,
      tolerance = None)

  /** CONVERGENCE-PROBED PageRank: same exact integer arithmetic as
    * [[pageRank]] (bit-identical ranks for any round the two both
    * execute), but iterating until the L∞ rank movement between rounds
    * is at most `tolerance` mass units — the contract for callers that
    * need "ranks stopped moving" rather than a fixed round count.
    * Integer ranks make the probe itself deterministic: the same input
    * converges after the same round on any partitioning. Costs one
    * max-abs-diff aggregate per round (a join of consecutive rank
    * tables on id) on top of the fixed-round plan.
    */
  def pageRankConverged(
      edges: DataFrame, srcCol: String, dstCol: String,
      tolerance: Long, maxIter: Int = 50, dampingPpm: Long = 850000L,
      mass: Long = 1000000000000L): DataFrame = {
    require(tolerance >= 0, "tolerance must be >= 0")
    pageRankLoop(edges, srcCol, dstCol, maxIter, dampingPpm, mass,
      tolerance = Some(tolerance))
  }

  /** PERSONALIZED PageRank (topic-sensitive PageRank, Haveliwala 2002):
    * the restart vector is the SEED SET instead of uniform — both the
    * (1−d) teleport share and the dangling-mass redistribution return
    * to the seeds (uniformly across them), so rank measures proximity
    * to the seeds rather than global importance. The seed-based quality
    * propagation companion to [[seedDistances]]: distances give hops
    * from trusted seeds, PPR gives a flow-weighted endorsement score.
    *
    * Same exact integer arithmetic and per-round plan as [[pageRank]]
    * (one checkpoint per round, in-plan dangling scalar, BIGINT `div`
    * end to end), same FIXED-round contract — which is what lets a
    * fixed-unroll SQL oracle (q141) replay it bit-for-bit. Seeds not
    * present in the graph are ignored; at least one seed must be a
    * graph node. Nodes start at 0 (seeds at mass/|S|), so after R
    * rounds a node's rank reflects paths of length ≤ R from the seeds
    * — unreached nodes hold rank 0.
    */
  def personalizedPageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iters: Int,
      dampingPpm: Long = 850000L,
      mass: Long = 1000000000000L): DataFrame =
    pageRankLoop(edges, srcCol, dstCol, iters, dampingPpm, mass,
      tolerance = None,
      seeds = Some(seeds.select(col(seedCol).as("id")).distinct()))

  private def pageRankLoop(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampingPpm: Long, mass: Long,
      tolerance: Option[Long],
      seeds: Option[DataFrame] = None): DataFrame = {
    require(iters >= 0 && dampingPpm >= 0 && dampingPpm <= 1000000L)
    // dampingPpm * (in_sum + dang div n) must not wrap: in_sum and the
    // dangling share are each bounded by the total mass, so the factor
    // in the worst case is ppm(1e6) * 2*mass — fail loudly instead of
    // silently corrupting ranks for an oversized caller-supplied mass.
    require(mass > 0 && mass <= Long.MaxValue / 2000000L,
      s"mass=$mass out of range: ppm-scaled rank arithmetic overflows " +
        s"Long above ${Long.MaxValue / 2000000L}")
    // Static tables checkpoint ONCE; the dangling-mass scalar joins
    // into the plan as a broadcast 1-row aggregate, so each iteration
    // is a single action (the checkpoint) — no per-round driver
    // collect, no recomputed degree aggregate.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .graftCheckpoint()
    // ONE |E| pass builds the node set WITH its out-degree (explode
    // each edge to a src stub counting 1 and a dst stub counting 0,
    // sum per id): the separate outDeg groupBy + src∪dst distinct +
    // dangling-flag left join cost three |E|-shuffles and two extra
    // checkpoint actions for the same information (guide §2.4 —
    // deg = 0 IS the dangling flag).
    val nodesDeg = e.select(explode(array(
        struct(col("src").as("id"), lit(1L).as("__c")),
        struct(col("dst").as("id"), lit(0L).as("__c")))).as("__s"))
      .select(col("__s.id").as("id"), col("__s.__c").as("__c"))
      .groupBy(col("id")).agg(sum(col("__c")).as("deg"))
      .graftCheckpoint()
    val nodes = nodesDeg.select(col("id"))
    val n = nodesDeg.count()
    // empty graph → empty ranks (not a divide-by-zero on mass/N)
    if (n == 0) return nodes.withColumn("r", lit(0L))
    // seed handling: restrict to seeds that ARE graph nodes; the
    // restart denominator is |S ∩ nodes|
    val seedIds = seeds.map(_.join(nodes, Seq("id"), "left_semi")
      .graftCheckpoint())
    val sOpt = seedIds.map(_.count())
    sOpt.foreach(s => require(s > 0, "no seed is a graph node"))
    // degree folds into the edge table once — not re-joined per round.
    // (A repartition("src")+persist pin that would let every round's
    // join skip the |E| exchange was MEASURED in r16 and reverted: the
    // columnar cache build/scan cost and GC dwarfed the saved shuffle
    // — taskTime 6.5 s → 58.9 s on q106 at sf0.1 — and a checkpoint
    // rebases to UnknownPartitioning, so the per-round exchange stays.)
    val eDeg = e.join(nodesDeg.filter(col("deg") > 0L)
      .select(col("id").as("src"), col("deg")), Seq("src"))
      .graftCheckpoint()
    // restart terms: uniform over N, or (personalized) over the seeds —
    // the seed flag rides in the rank table like the dangling flag
    val baseCase = sOpt match {
      case Some(s) =>
        val baseS = ((1000000L - dampingPpm) * (mass / s)) / 1000000L
        s"(CASE WHEN __sd THEN CAST($baseS AS BIGINT) " +
          "ELSE CAST(0 AS BIGINT) END)"
      case None =>
        s"CAST(${((1000000L - dampingPpm) * (mass / n)) / 1000000L} " +
          "AS BIGINT)"
    }
    val dangShare = sOpt match {
      case Some(s) =>
        s"(CASE WHEN __sd THEN __dang div $s ELSE CAST(0 AS BIGINT) END)"
      case None => s"__dang div $n"
    }
    // the static dangling flag RIDES IN the rank table, so the per-round
    // dangling-mass aggregate is a scan (no join, no separate id table);
    // deg = 0 in the fused node table IS the flag — no join at all
    val flagged = nodesDeg
      .select(col("id"), (col("deg") === 0L).as("__dg"))
    val withSd = seedIds match {
      case Some(sd) => flagged
        .join(sd.withColumn("__sd0", lit(true)), Seq("id"), "left_outer")
        .withColumn("__sd", coalesce(col("__sd0"), lit(false)))
        .drop("__sd0")
      case None => flagged.withColumn("__sd", lit(false))
    }
    val initR = sOpt match {
      case Some(s) => when(col("__sd"), lit(mass / s)).otherwise(lit(0L))
      case None    => lit(mass / n)
    }
    var ranks = withSd
      .select(col("id"), initR.as("r"), col("__dg"), col("__sd"))
      .graftCheckpoint()
    var iter = 0
    var converged = false
    while (iter < iters && !converged) {
      val dang = ranks.filter(col("__dg"))
        .agg(coalesce(sum(col("r")), lit(0L)).as("__dang"))
      val inSums = eDeg
        .join(ranks.select(col("id").as("src"), col("r")), Seq("src"))
        .withColumn("c", expr("r div deg"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("c")).as("in_sum"))
      val prev = ranks
      ranks = prev.select(col("id"), col("__dg"), col("__sd"))
        .join(inSums, Seq("id"), "left_outer")
        .crossJoin(broadcast(dang))
        .select(col("id"),
          // BIGINT `div` end to end — Column./ and .divide are DOUBLE
          // true division and would break the integer contract
          expr(s"$baseCase + ($dampingPpm * (coalesce(in_sum, " +
              s"CAST(0 AS BIGINT)) + $dangShare)) div 1000000")
            .as("r"),
          col("__dg"), col("__sd"))
        .graftCheckpoint()
      tolerance.foreach { tol =>
        // L∞ movement probe: deterministic because the ranks are exact
        // integers — the same input converges on the same round under
        // any partitioning
        val maxMove = prev.select(col("id"), col("r").as("__pr"))
          .join(ranks.select(col("id"), col("r")), Seq("id"))
          .agg(coalesce(max(abs(col("r") - col("__pr"))), lit(0L)))
          .head().getLong(0)
        converged = maxMove <= tol
      }
      prev.unpersist()    // bound executor storage to 2 rank copies
      iter += 1
    }
    require(tolerance.isEmpty || converged || iters == 0,
      s"pageRankConverged did not reach tolerance in $iters rounds — " +
        "raise maxIter or loosen the tolerance")
    ranks.select(col("id"), col("r"))
  }

  /** Threshold cascade (Watts 2002 / bootstrap percolation): a node
    * ACTIVATES when at least `k` distinct neighbors are active —
    * complex contagion, where [[seedDistances]]' BFS is the k = 1
    * simple case. Fixed synchronous rounds; returns (id, rnd) with
    * rnd the FIRST round each node activated (seeds at 0). Per round:
    * one edge-against-active join + a distinct-count per candidate +
    * an anti-join against the already-active set — all key-partitioned,
    * |E|-scaling.
    */
  def thresholdCascade(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    // canonical-distinct THEN symmetrize (guide §2.3 — shuffle fewer
    // bytes): deduping the |E| canonical pairs and unioning both
    // directions after yields the identical symmetrized edge set as
    // the previous union-then-distinct, at half the distinct
    // exchange's input (least/greatest skip nulls, so a null endpoint
    // still collapses to a self-pair and drops at the a ≠ b filter,
    // as before)
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
    val e = canon
      .union(canon.select(col("b").as("a"), col("a").as("b")))
      .graftCheckpoint()
    var active = seeds.select(col(seedCol).as("id")).distinct()
      .withColumn("rnd", lit(0L)).graftCheckpoint()
    var r = 0
    while (r < rounds) {
      // count(), not countDistinct(): `e` is distinct by construction
      // (the .distinct() above) and `active` holds unique ids (distinct
      // seeds ∪ anti-joined groupBy outputs), so the join emits at most
      // one row per (a, b) — the distinct-count's two-phase expand
      // (extra exchange per round, guide §2.4) buys nothing. Same
      // BIGINT value, bit-identical activation rounds.
      val newly = e
        .join(active.select(col("id").as("a")), Seq("a"))
        .groupBy(col("b").as("id"))
        .agg(count(lit(1)).as("__na"))
        .where(col("__na") >= k.toLong)
        .join(active.select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), lit(r + 1L).as("rnd"))
      val next = active.union(newly).graftCheckpoint()
      active.unpersist()
      active = next
      r += 1
    }
    active
  }

  /** Time-respecting reachability (temporal BFS): a node is reached at
    * time t if some edge (a, b, t) has t ≥ the time a was reached —
    * paths must move forward in time (contact networks, contagion
    * through trades; Holme & Saramäki 2012). Fixed-round frontier
    * relaxation carrying the EARLIEST arrival time per node — the
    * min-combine loop of [[weightedSeedDistances]] with the edge's own
    * timestamp as the relaxed value and the t ≥ arrival(a) gate on the
    * join. Seeds start at `startT`. Per round one key-partitioned join
    * + min-combine; |E|-scaling shuffles, fixed rounds ⇒
    * engine-replayable.
    */
  def temporalReach(
      edges: DataFrame, srcCol: String, dstCol: String, tCol: String,
      seeds: DataFrame, seedCol: String, rounds: Int,
      startT: Long = 0L): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    // canonical-dedup then symmetrize (see thresholdCascade): the
    // (a, b, t) triple set is identical, the dedup exchange carries
    // |E| canonical rows instead of 2|E| directed ones
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"),
        col(tCol).cast("long").as("t"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .groupBy(col("a"), col("b"), col("t")).agg(count(lit(1)).as("__d"))
      .drop("__d")
    val e = canon
      .union(canon.select(col("b").as("a"), col("a").as("b"), col("t")))
      .graftCheckpoint()
    var reach = seeds.select(col(seedCol).as("id")).distinct()
      .withColumn("arr", lit(startT)).graftCheckpoint()
    var r = 0
    while (r < rounds) {
      val msgs = e
        .join(reach.select(col("id").as("a"), col("arr")), Seq("a"))
        .where(col("t") >= col("arr"))
        .select(col("b").as("id"), col("t").as("arr"))
      val next = reach.union(msgs)
        .groupBy(col("id")).agg(min(col("arr")).as("arr"))
        .graftCheckpoint()
      reach.unpersist()
      reach = next
      r += 1
    }
    reach
  }

  /** WEIGHTED PageRank: rank flows along each edge in proportion to
    * its positive integer weight's share of the source's total
    * outgoing weight — `transfer = (r·w) div wsum` instead of
    * [[pageRank]]'s uniform `r div deg`; everything else is the same
    * audited integer loop (one checkpoint action per round, dangling
    * mass as an in-plan broadcast 1-row scalar, BIGINT `div` end to
    * end, fixed rounds ⇒ fixed-unroll SQL oracles replay it
    * bit-for-bit). Parallel edges weight-combine before the loop.
    *
    * Overflow contract: r·w must stay under 2^63 — with rank bounded
    * by `mass`, keep mass · max(weight) < 9.2e18 (the default 1e12
    * mass allows weights to ~9e6; rescale weights upstream beyond
    * that — only their RATIOS per source matter).
    */
  def weightedPageRank(
      edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
      iters: Int, dampingPpm: Long = 850000L,
      mass: Long = 1000000000000L): DataFrame = {
    require(iters >= 0 && dampingPpm >= 0 && dampingPpm <= 1000000L)
    require(mass > 0 && mass <= Long.MaxValue / 2000000L,
      s"mass=$mass out of range (see pageRank)")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("long").as("w"))
      .filter(col("w") > 0L)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .graftCheckpoint()
    // fused node + out-weight pass (see pageRankLoop): wsum = 0 IS the
    // dangling flag — one |E| shuffle instead of three plus a join
    val nodesW = e.select(explode(array(
        struct(col("src").as("id"), col("w").as("__c")),
        struct(col("dst").as("id"), lit(0L).as("__c")))).as("__s"))
      .select(col("__s.id").as("id"), col("__s.__c").as("__c"))
      .groupBy(col("id")).agg(sum(col("__c")).as("wsum"))
      .graftCheckpoint()
    val n = nodesW.count()
    if (n == 0) return nodesW.select(col("id"), lit(0L).as("r"))
    val baseCase =
      s"CAST(${((1000000L - dampingPpm) * (mass / n)) / 1000000L} " +
        "AS BIGINT)"
    val eW = e.join(nodesW.filter(col("wsum") > 0L)
      .select(col("id").as("src"), col("wsum")), Seq("src"))
      .graftCheckpoint()
    val flagged = nodesW
      .select(col("id"), (col("wsum") === 0L).as("__dg"))
    var ranks = flagged
      .select(col("id"), lit(mass / n).as("r"), col("__dg"))
      .graftCheckpoint()
    var iter = 0
    while (iter < iters) {
      val dang = ranks.filter(col("__dg"))
        .agg(coalesce(sum(col("r")), lit(0L)).as("__dang"))
      val inSums = eW
        .join(ranks.select(col("id").as("src"), col("r")), Seq("src"))
        .withColumn("c", expr("(r * w) div wsum"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("c")).as("in_sum"))
      val prev = ranks
      ranks = prev.select(col("id"), col("__dg"))
        .join(inSums, Seq("id"), "left_outer")
        .crossJoin(broadcast(dang))
        .select(col("id"),
          expr(s"$baseCase + ($dampingPpm * (coalesce(in_sum, " +
              s"CAST(0 AS BIGINT)) + __dang div $n)) div 1000000")
            .as("r"),
          col("__dg"))
        .graftCheckpoint()
      prev.unpersist()
      iter += 1
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

  /** [[dropNearDuplicates]] with a QUALITY-AWARE survivor: keep the row
    * with the highest `scoreCol` (ties to the lower id) per near-dup
    * cluster instead of the arbitrary min-id member — the production
    * curation policy (a cluster of a clean original and its truncated/
    * mangled copies should keep the clean one, which min-id cannot
    * guarantee). Rows in no pair survive untouched. The per-cluster
    * pick is a window over the CLUSTERED rows only — |paired ids|, not
    * |corpus| — partitioned by component, so no task sees more than
    * one cluster's rows.
    */
  def dropNearDuplicatesByScore(
      df: DataFrame, idCol: String, scoreCol: String, pairs: DataFrame,
      srcCol: String = "id_a", dstCol: String = "id_b"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val losers = connectedComponents(pairs, srcCol, dstCol)
      .withColumnRenamed("id", idCol)
      .join(df.select(col(idCol), col(scoreCol).as("__s")), Seq(idCol))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("component"))
          .orderBy(col("__s").desc, col(idCol).asc)))
      .filter(col("__rk") > 1)
      .select(col(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** K-core decomposition by iterative peeling: repeatedly drop nodes
    * of degree < k (and their edges) until every remaining node has at
    * least k neighbors within the survivor set — the standard
    * graph-density filter (a node in the k-core has k independent
    * in-core endorsements, robust to the long tail of weakly-attached
    * spam/boilerplate nodes that degree alone can't separate).
    *
    * Per round: one symmetrized degree aggregate + two semi-joins
    * (keep edges whose BOTH endpoints survive) — all key-partitioned,
    * scaling with |E|; no adjacency lists. Peeling only ever REMOVES
    * edges, so the edge count is a monotone convergence probe (stable
    * count ⇔ fixpoint — no hashing needed), one scalar action per
    * round. Rounds are data-dependent but short in practice: each
    * round strips a full "shell" of weakly-attached nodes.
    *
    * Peeling is idempotent at the fixpoint — extra rounds are no-ops —
    * which is what lets a fixed-unroll SQL oracle (q137) replay a
    * convergence-probed run exactly: any unroll depth ≥ the actual
    * round count yields the identical survivor set.
    *
    * Output: (node, deg) for every k-core member, deg = its degree
    * WITHIN the core (≥ k by construction).
    */
  def kCore(
      edges: DataFrame, aCol: String, bCol: String, k: Int,
      maxIter: Int = 50): DataFrame =
    kCoreWithRounds(edges, aCol, bCol, k, maxIter)._1

  /** [[kCore]] plus the observed peel-round count (rounds to reach the
    * fixpoint, INCLUDING the final no-change probe round). The round
    * count is data-dependent, so a fixed-unroll oracle replay is only
    * valid when its unroll depth covers the observed count — callers
    * gating against such an oracle should assert
    * `rounds <= unrollDepth` to turn a too-shallow oracle into a loud
    * failure instead of a silent hash divergence.
    */
  def kCoreWithRounds(
      edges: DataFrame, aCol: String, bCol: String, k: Int,
      maxIter: Int = 50): (DataFrame, Int) = {
    require(k >= 1, s"k must be >= 1, got $k")
    var e = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct().graftCheckpoint()
    def degrees(df: DataFrame): DataFrame = df
      .select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    var prevCount = e.count()
    var iter = 0
    var converged = prevCount == 0L
    while (iter < maxIter && !converged) {
      val keep = degrees(e).filter(col("d") >= k).select(col("n"))
      val next = e
        .join(keep.select(col("n").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("n").as("b")), Seq("b"), "left_semi")
        .graftCheckpoint()
      val nextCount = next.count()
      e.unpersist()   // bound executor storage to 2 edge copies
      e = next
      converged = nextCount == prevCount
      prevCount = nextCount
      iter += 1
    }
    require(converged,
      s"kCore did not converge in $maxIter rounds — raise maxIter")
    (degrees(e).select(col("n").as("node"), col("d").as("deg")), iter)
  }

  /** Multi-source BFS over an undirected graph: hop distance from the
    * nearest seed, capped at `rounds` (nodes farther than `rounds` —
    * or unreachable — are absent from the output). The curation
    * signal behind seed-based quality propagation: start from a
    * trusted seed set (curated domains, verified authors) and keep
    * documents within a small graph distance of it.
    *
    * Fixed-round integer relaxation (the q106 PageRank contract, not
    * a fixpoint probe): round r sets dist = min(dist, neighbor dist
    * + 1), so after R rounds every distance ≤ R is exact — which is
    * the whole output, making a fixed-unroll SQL oracle replay the
    * result bit-for-bit. Per round: one equi-join (frontier→edges) +
    * one min-aggregate, key-partitioned shuffles scaling with |E|;
    * localCheckpoint per round truncates the iterative lineage.
    *
    * Output: (id, dist) with 0 ≤ dist ≤ rounds; seeds not present in
    * `edges` still appear at dist 0.
    */
  def seedDistances(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    // canonical-dedup then symmetrize (see thresholdCascade): same
    // edge set, half the distinct exchange's input
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
    val e = canon
      .union(canon.select(col("b").as("a"), col("a").as("b")))
      .graftCheckpoint()
    var dist = seeds.select(col(seedCol).as("id")).distinct()
      .withColumn("dist", lit(0L)).graftCheckpoint()
    var r = 0
    while (r < rounds) {
      val msgs = e
        .join(dist.select(col("id").as("a"), col("dist")), Seq("a"))
        .select(col("b").as("id"), (col("dist") + 1L).as("dist"))
      val next = dist.union(msgs)
        .groupBy(col("id")).agg(min(col("dist")).as("dist"))
        .graftCheckpoint()
      dist.unpersist()  // bound executor storage to 2 frontier copies
      dist = next
      r += 1
    }
    dist
  }

  /** Weighted seed distances — Bellman–Ford relaxation with a fixed
    * round count, the min-PLUS form of [[seedDistances]] (cheapest
    * cost to reach each node within ≤ `rounds` hops from any seed).
    * Nonnegative integer weights; undirected (each edge relaxes both
    * ways). Per round: one key-partitioned join + min-combine —
    * shuffles scale with |E|, state with |reached nodes|; fixed rounds
    * keep every reported cost exact and engine-replayable (the q138/
    * q106 fixed-round contract — no data-dependent convergence probe
    * in the gate path).
    */
  def weightedSeedDistances(
      edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
      seeds: DataFrame, seedCol: String, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds >= 0, got $rounds")
    // canonical min-combine then symmetrize (see thresholdCascade):
    // in the old directed groupBy each direction's group saw ALL of a
    // pair's weights anyway (both directions of every edge were
    // present), so min per canonical pair — half the combine
    // exchange's input — yields the identical weighted edge set
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"),
        col(wCol).cast("long").as("w"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .groupBy(col("a"), col("b")).agg(min(col("w")).as("w"))
    val e = canon
      .union(canon.select(col("b").as("a"), col("a").as("b"), col("w")))
      .graftCheckpoint()
    var dist = seeds.select(col(seedCol).as("id")).distinct()
      .withColumn("cost", lit(0L)).graftCheckpoint()
    var r = 0
    while (r < rounds) {
      val msgs = e
        .join(dist.select(col("id").as("a"), col("cost")), Seq("a"))
        .select(col("b").as("id"), (col("cost") + col("w")).as("cost"))
      val next = dist.union(msgs)
        .groupBy(col("id")).agg(min(col("cost")).as("cost"))
        .graftCheckpoint()
      dist.unpersist()
      dist = next
      r += 1
    }
    dist
  }

  /** Synchronous label propagation (Raghavan et al. 2007) for community
    * detection: labels start as node ids; each round every node adopts
    * the most frequent label among its NEIGHBORS, ties to the smallest
    * label. Unlike [[connectedComponents]] (where any label spreads to
    * the whole component), labels here COMPETE by frequency, so dense
    * regions keep their own majority label and the graph partitions
    * into communities — on a connected graph the two results genuinely
    * differ from round 2 on.
    *
    * Deterministic by construction: synchronous updates (no visit
    * order), smallest-label tie-break, FIXED rounds — the q106
    * contract, so a fixed-unroll SQL oracle replays it exactly.
    * (Async LPA with random visit order — the paper's variant — is
    * not reproducible across engines; the synchronous form is the
    * standard determinization.)
    *
    * Per round: one equi-join (labels→edges), one map-side-combined
    * (node, label) count, and an ALGEBRAIC argmax — min(struct(−cnt,
    * label)) — instead of a per-node window, so a hub node's million
    * neighbor labels reduce via partial aggregation, never a one-task
    * sort. Isolated nodes keep their own label (left join + coalesce).
    *
    * Output: (id, label) after `rounds` rounds.
    */
  def labelPropagation(
      edges: DataFrame, aCol: String, bCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    // canonical-dedup then symmetrize (see thresholdCascade): same
    // edge set, half the distinct exchange's input
    val canon = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
    val und = canon
      .union(canon.select(col("b").as("a"), col("a").as("b")))
      .graftCheckpoint()
    val nodes = und.select(col("a").as("id")).distinct().graftCheckpoint()
    var labels = nodes.withColumn("label", col("id"))
    var r = 0
    while (r < rounds) {
      val votes = und
        .join(labels.select(col("id").as("b"), col("label")), Seq("b"))
        .groupBy(col("a").as("id"), col("label"))
        .agg(count(lit(1)).as("__cnt"))
      val picked = votes
        .groupBy(col("id"))
        .agg(min(struct((-col("__cnt")).as("nc"), col("label").as("l")))
          .as("__best"))
        .select(col("id"), col("__best.l").as("__new"))
      labels = labels.join(picked, Seq("id"), "left")
        .select(col("id"), coalesce(col("__new"), col("label")).as("label"))
        .graftCheckpoint()
      r += 1
    }
    labels
  }

  /** HITS hubs & authorities (Kleinberg, JACM 1999) in exact integer
    * arithmetic: per round auth(n) = Σ_{m→n} hub(m) then hub(n) =
    * Σ_{n→m} auth(m), each vector renormalized to `scale` ppm of its
    * MAXIMUM. L∞ normalization instead of Kleinberg's L2: dividing a
    * vector by a positive scalar preserves every score ratio and
    * therefore the ranking — and it keeps the whole loop in BIGINT
    * `div` (no sqrt), so a fixed-round SQL oracle replays it
    * bit-for-bit (the q106 determinism contract).
    *
    * Per round: two equi-joins (scores→edges) + two map-side-combined
    * sum aggregates, all key-partitioned shuffles scaling with |E|;
    * the normalization maximum enters the plan as a broadcast 1-row
    * aggregate (no driver collect). Each half-round's score table is
    * localCheckpoint'd (the [[pageRank]] pattern): every normalize
    * references its input twice (max aggregate + the scores
    * themselves), so an unbroken lineage re-executes the edge joins
    * combinatorially across half-rounds — measured 7.3 s vs 2.x s on
    * the 600k-edge bench graph. (Within ONE half-round the two
    * references are canonically identical, so AQE's stage cache runs
    * the underlying shuffles once — r16 measured that an extra
    * pre-normalize pin buys nothing.)
    *
    * Overflow: scores ≤ scale after each normalization, so a sum is
    * ≤ scale·maxDegree — Long-safe while |E| ≤ 9.2e18/scale (9.2e12
    * at the default ppm scale).
    *
    * Output: (id, hub_ppm, auth_ppm) over all nodes. On a bipartite
    * graph (e.g. buyer→supplier) hubs rank the source side and
    * authorities the destination side; the other side's score is 0.
    */
  def hits(
      edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int, scale: Long = 1000000L): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(scale > 0, "scale must be positive")
    val div = graft.functions.GraftColumns.longDiv _
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().graftCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().graftCheckpoint()
    def normalize(scores: DataFrame): DataFrame = {
      val mx = scores.agg(max(col("score")).as("__mx"))
      scores.crossJoin(broadcast(mx))
        .select(col("id"),
          when(col("__mx") > 0, div(col("score") * scale, col("__mx")))
            .otherwise(lit(0L)).as("score"))
    }
    def pull(scores: DataFrame, from: String, to: String): DataFrame = {
      // Union-based zero-fill (guide §2.4 — remove shuffles outright):
      // nodes that receive no message must score 0 for the next
      // half-round's join and the final output. The previous
      // nodes⟕sums left join cost one |V| exchange per half-round ON
      // TOP of the sums aggregate; unioning a zero stub per node UNDER
      // that same aggregate zero-fills inside it — one id-keyed
      // exchange per half-round instead of two. Exact equivalence:
      // sum over (msgs ∪ {0L}) = coalesce(sum over msgs, 0L) for
      // BIGINT scores, and every edge endpoint is in `nodes`, so the
      // id set is identical.
      val msgs = e
        .join(scores.select(col("id").as(from), col("score")), Seq(from))
        .select(col(to).as("id"), col("score"))
      normalize(msgs
        .union(nodes.select(col("id"), lit(0L).as("score")))
        .groupBy(col("id")).agg(sum(col("score")).as("score")))
        .graftCheckpoint()
    }
    var hub = nodes.select(col("id"), lit(scale).as("score"))
    var auth = nodes.select(col("id"), lit(0L).as("score"))
    for (_ <- 1 to rounds) {
      auth = pull(hub, from = "src", to = "dst")
      hub = pull(auth, from = "dst", to = "src")
    }
    hub.select(col("id"), col("score").as("hub_ppm"))
      .join(auth.select(col("id"), col("score").as("auth_ppm")), Seq("id"))
  }

  /** Per-node triangle counts via degree-ordered edge orientation
    * (Cohen's MapReduce triangle algorithm / the compact-forward
    * family): orient every undirected edge from its lower-(degree, id)
    * endpoint to the higher one, build wedges by self-joining oriented
    * edges on their source, and close each wedge with one more
    * oriented-edge equi-join.
    *
    * Why orientation matters at scale: wedges from a node are
    * quadratic in its OUT-degree, and orienting toward higher degree
    * caps every out-degree at O(√m) — a celebrity node with 10⁷
    * neighbors contributes no wedges at all (all its edges point IN),
    * where the naive neighbor self-join would explode quadratically.
    * Every step is an equi-join; no adjacency lists are materialized.
    *
    * Output: (node, tri_count) for every node in at least one
    * triangle; each triangle contributes to its three corners.
    */
  def triangleCounts(
      edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val und = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
    val deg = und
      .select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // (degree, id) is a total order on nodes; orient low -> high
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
    val aLower = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val o = withDeg.select(
      when(aLower, col("a")).otherwise(col("b")).as("src"),
      when(aLower, col("b")).otherwise(col("a")).as("dst"),
      when(aLower, col("db")).otherwise(col("da")).as("ddst"))
    // wedges (src; v, w) with k(v) < k(w) close iff oriented edge v->w
    // exists — the closure join hits at most once per wedge.
    val w1 = o.select(col("src"), col("dst").as("v"), col("ddst").as("dv"))
    val w2 = o.select(col("src"), col("dst").as("w"), col("ddst").as("dw"))
    val wedges = w1.join(w2, Seq("src"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    val closed = wedges
      .join(o.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
    closed
      .select(explode(array(col("src"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("tri_count"))
  }

  /** Deterministic random-walk corpus generation (DeepWalk/node2vec
    * prep: the walk sequences ARE the training corpus for graph
    * embeddings): `walksPerNode` walks of `steps` hops from every node,
    * each hop picking the neighbor at index
    * `polyHash(start:walk:step:cur:salt) mod degree` of the SORTED
    * neighbor array — a pure function of (walk identity, position,
    * current node), so every engine, run, and partitioning emits the
    * identical corpus (and an oracle can replay the walks hop by hop).
    *
    * Scale shape: the adjacency table materializes each node's sorted
    * neighbor array ONCE, truncated to the `maxDegree` smallest
    * neighbors (documented hub cap — a celebrity node's walk
    * distribution is approximated by its first `maxDegree` sorted
    * neighbors; set it to cover the real degree distribution). Each hop
    * is one equi-join of the walk frontier (|V|·walksPerNode rows)
    * against the adjacency — `steps` joins total, no explosion.
    *
    * Output: (start, walk, path) with path the space-joined node
    * sequence of length steps+1.
    */
  def randomWalks(
      edges: DataFrame, srcCol: String, dstCol: String,
      walksPerNode: Int, steps: Int, salt: String,
      maxDegree: Int = 1024): DataFrame = {
    require(walksPerNode >= 1 && walksPerNode <= 1000,
      "walksPerNode in [1, 1000]")
    require(steps >= 1 && steps <= 50, "steps in [1, 50]")
    val und = edges
      .select(col(srcCol).cast("string").as("a"),
        col(dstCol).cast("string").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
    // no .distinct() before the groupBy: collect_set dedups each
    // node's neighbors itself (partially on the map side too), so the
    // separate distinct was a full 2|E| exchange producing the
    // identical adjacency (guide §2.4 — remove shuffles outright)
    val adj = und.union(und.select(col("b").as("a"), col("a").as("b")))
      .groupBy(col("a").as("__cur"))
      .agg(slice(sort_array(collect_set(col("b"))), 1, maxDegree)
        .as("__nbrs"))
      .graftCheckpoint() // reused by every hop
    var frontier = adj.select(col("__cur").as("__start"))
      .withColumn("__walk",
        explode(sequence(lit(0), lit(walksPerNode - 1))))
      .withColumn("__cur", col("__start"))
      .withColumn("__path", col("__start"))
    for (step <- 1 to steps) {
      val h = pmod(
        graft.functions.GraftColumns.polyHash(
          concat(col("__start"), lit(":"),
            col("__walk").cast("string"), lit(s":$step:"),
            col("__cur"), lit(":" + salt))),
        size(col("__nbrs")).cast("long"))
      frontier = frontier.join(adj, Seq("__cur"))
        .withColumn("__next",
          element_at(col("__nbrs"), (h + 1L).cast("int")))
        .select(col("__start"),
          col("__walk"),
          col("__next").as("__cur"),
          concat(col("__path"), lit(" "), col("__next")).as("__path"))
    }
    frontier.select(col("__start").as("start"),
      col("__walk").cast("long").as("walk"), col("__path").as("path"))
  }

  /** Link-prediction scores over a bipartite basket graph (order→item,
    * doc→entity, user→topic): for every right-node pair sharing at
    * least one left node ("basket"), the three classic similarity
    * signals —
    *
    *  - `cn`: common-neighbor count (#shared baskets),
    *  - `aa_micro`: Adamic–Adar in micro units with a base-2 log,
    *    Σ_baskets 1e6 div log2(basket size) — rare (small) baskets
    *    weigh more; exact integer via a literal Q20-log weight table
    *    indexed by basket size (bounded by `maxBasket`, so the table is
    *    a constant — the q191 NDCG-weights pattern),
    *  - `jaccard_ppm`: cn·1e6 div (deg_a + deg_b − cn) over the kept
    *    edge set.
    *
    * Scale shape: candidate generation is the WEDGE equi-join on the
    * basket id — Σ basket² rows, bounded by `maxBasket`·|E| because
    * oversized baskets are dropped whole (the honest hot-center cap: a
    * boilerplate basket shared by 10⁶ items predicts nothing and would
    * alone emit 10¹² wedges). Degrees attach as two posting-count
    * equi-joins. No adjacency lists materialize. Size-1 baskets emit no
    * wedges (and log2(1) = 0 never divides).
    *
    * Output: (id_a, id_b, cn, aa_micro, jaccard_ppm), id_a < id_b.
    */
  def bipartiteLinkScores(
      edges: DataFrame, leftCol: String, rightCol: String,
      maxBasket: Int = 64): DataFrame = {
    require(maxBasket >= 2 && maxBasket <= 100000,
      "maxBasket in [2, 100000]")
    val div = graft.functions.GraftColumns.longDiv _
    val e = edges
      .select(col(leftCol).as("__l"), col(rightCol).as("__r"))
      .filter(col("__l").isNotNull && col("__r").isNotNull)
      .distinct()
    val bsize = e.groupBy(col("__l")).agg(count(lit(1)).as("__bs"))
    val kept = e.join(bsize, Seq("__l"))
      .filter(col("__bs") >= 2 && col("__bs") <= maxBasket)
    // literal AA weight table: w(s) = 1e6·2^20 div log2Q20(s) — the
    // same host-precomputed-literals idiom as EvalOps.ndcgWeights, so
    // the oracle consumes identical integers
    val weights = typedLit(EvalOps.aaWeightsMicro(maxBasket))
    val deg = kept.groupBy(col("__r")).agg(count(lit(1)).as("__d"))
    val e1 = kept.select(col("__l"), col("__r").as("id_a"), col("__bs"))
    val e2 = kept.select(col("__l"), col("__r").as("id_b"))
    e1.join(e2, Seq("__l"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("__w", element_at(weights, col("__bs").cast("int")))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("cn"), sum(col("__w")).as("aa_micro"))
      .join(deg.select(col("__r").as("id_a"), col("__d").as("__da")),
        Seq("id_a"))
      .join(deg.select(col("__r").as("id_b"), col("__d").as("__db")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("cn"), col("aa_micro"),
        div(col("cn") * 1000000L, col("__da") + col("__db") - col("cn"))
          .as("jaccard_ppm"))
  }

  /** Newman modularity of a community partition over an undirected
    * pair graph — the "did the clustering find real structure?" score
    * for LPA/CC outputs (Q ≈ 0: no better than random wiring; the
    * 0.3–0.7 band is classic community structure). Exact
    * single-fraction integer form — per-community floors would drift:
    *
    *   Q_ppm = (4m·Σ_c e_c − Σ_c d_c²)·1e6 div (4m²)
    *
    * (algebra of Σ_c [e_c/m − (d_c/2m)²] over one denominator).
    * Long-safe while 4m²·1e6 &lt; 2^63, i.e. m ≲ 1.5e6 edges; rescale
    * to per-mille above that.
    *
    * Shape: degrees in one |E| aggregate, intra-edge counts via two
    * label equi-joins on the edge list, community rollup map-side
    * combined; m and Q attach as in-plan broadcast 1-row aggregates
    * (q96 scalar pattern). Everything scales with |E| + |communities|.
    *
    * Input: `pairs` with each undirected edge ONCE (a &lt; b, no
    * duplicates — q165's pair-graph contract); `labels` with one row
    * per node. Labeled nodes with no incident edge (isolated) are
    * KEPT: they count toward n_nodes with d_sum contribution 0
    * (degrees attach via left join). Output: (community, n_nodes,
    * e_intra, d_sum, q_ppm).
    */
  def modularity(
      pairs: DataFrame, aCol: String, bCol: String,
      labels: DataFrame, idCol: String, labelCol: String): DataFrame = {
    val div = graft.functions.GraftColumns.longDiv _
    val e = pairs.select(col(aCol).as("__a"), col(bCol).as("__b"))
    val deg = e.union(e.select(col("__b"), col("__a")))
      .groupBy(col("__a").as("__id")).agg(count(lit(1)).as("__d"))
    val lbl = labels.select(col(idCol).as("__id"),
      col(labelCol).as("community"))
    val m = e.agg(count(lit(1)).as("__m"))
    // LEFT join + coalesce so degree-0 (isolated) labeled nodes still
    // count toward n_nodes with d_sum contribution 0 — an inner join
    // would silently drop them and lose all-isolated communities from
    // the readout entirely (Q itself is unaffected either way).
    val comm = lbl.join(deg, Seq("__id"), "left")
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(coalesce(col("__d"), lit(0L))).as("d_sum"))
    val intra = e
      .join(lbl.select(col("__id").as("__a"),
        col("community").as("__ca")), Seq("__a"))
      .join(lbl.select(col("__id").as("__b"),
        col("community").as("__cb")), Seq("__b"))
      .filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("community"))
      .agg(count(lit(1)).as("e_intra"))
    // parts feeds BOTH the output rows and the broadcast Q scalar; no
    // pin is needed — the two references are canonically identical
    // subplans, so AQE's runtime stage cache executes the comm/intra
    // shuffles once and reuses them across the broadcast boundary
    // (verified in the r16 job profile: the modularity tail runs its
    // aggregate jobs once; an experimental checkpoint here only added
    // an action and 32-block rescans).
    val parts = comm.join(intra, Seq("community"), "left")
      .select(col("community"), col("n_nodes"),
        coalesce(col("e_intra"), lit(0L)).as("e_intra"), col("d_sum"))
    val q = parts.crossJoin(broadcast(m))
      .agg(div((lit(4L) * min(col("__m")) * sum(col("e_intra")) -
          sum(col("d_sum") * col("d_sum"))) * 1000000L,
        lit(4L) * min(col("__m")) * min(col("__m"))).as("q_ppm"))
    parts.crossJoin(broadcast(q))
  }
}
