package graft

import graft.ops.GraphOps

class GraphOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("connectedComponents: a long chain (diameter > 2) collapses to " +
       "one component labeled by its min node") {
    // chain 1-2-3-4-5-6-7 plus separate pair (10, 11): min-label needs
    // multiple propagation rounds to cross the chain
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (6L, 5L), (6L, 7L),
      (10L, 11L)
    ).toDF("id_a", "id_b")
    val cc = GraphOps.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    (1L to 7L).foreach(n => assert(cc(n) === 1L, s"node $n"))
    assert(cc(10L) === 10L && cc(11L) === 10L)
  }

  test("connectedComponents works for STRING ids (chain needs multiple " +
       "rounds — regression: numeric-cast probe declared convergence " +
       "after one round on non-numeric ids)") {
    // doc-id-shaped string keys; chain a-b-c-d-e has diameter 4, so a
    // premature fixpoint would leave e labeled c (one hop) instead of a
    val edges = Seq(
      ("doc-b", "doc-a"), ("doc-b", "doc-c"), ("doc-d", "doc-c"),
      ("doc-d", "doc-e"), ("img-9", "img-7")
    ).toDF("id_a", "id_b")
    val cc = GraphOps.connectedComponents(edges, "id_a", "id_b")
      .as[(String, String)].collect().toMap
    Seq("doc-a", "doc-b", "doc-c", "doc-d", "doc-e")
      .foreach(n => assert(cc(n) === "doc-a", s"node $n"))
    assert(cc("img-7") === "img-7" && cc("img-9") === "img-7")
  }

  test("dropNearDuplicates keeps the min id per cluster and every " +
       "unpaired row") {
    val docs = Seq(
      (1L, "a"), (2L, "a'"), (3L, "a''"), // cluster {1,2,3}
      (7L, "b"), (9L, "b'"),              // cluster {7,9}
      (5L, "unique")                      // no pairs
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val kept = GraphOps.dropNearDuplicates(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 5L, 7L))
  }

  test("dropNearDuplicatesByScore keeps the HIGHEST-score member per " +
       "cluster (ties to the lower id), unpaired rows survive") {
    val docs = Seq(
      (1L, 10L), (2L, 99L), (3L, 50L), // cluster {1,2,3}: 2 wins
      (7L, 5L), (9L, 5L),              // cluster {7,9}: tie → 7 wins
      (5L, 1L)                         // no pairs: survives
    ).toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val kept = GraphOps.dropNearDuplicatesByScore(
        docs, "doc_id", "quality", pairs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(2L, 5L, 7L)) // min-id would have kept 1, not 2
  }

  test("connectedComponents matches a union-find referee on seeded " +
       "random graphs") {
    // plain-Scala referee: weighted-ish union-find with path compression
    def referee(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x
        else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // min-id labeling: union toward the smaller root keeps root = min
      parent.keys.map(k => k -> find(k)).toMap
    }
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(60)(
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(e => e._1 != e._2)
      val expected = referee(edges)
      val got = GraphOps.connectedComponents(
          edges.toDF("id_a", "id_b"), "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      assert(got === expected, s"seed $seed")
    }
  }

  test("connectedComponents is deterministic across reruns") {
    val edges = Seq((3L, 9L), (9L, 4L), (12L, 15L)).toDF("id_a", "id_b")
    val a = GraphOps.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = GraphOps.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
    assert(a === Seq((3L, 3L), (4L, 3L), (9L, 3L), (12L, 12L), (15L, 12L)))
  }

  test("mergeComponents ≡ full recompute on random graph splits: " +
       "delta edges bridging old components, brand-new nodes, and " +
       "intra-component no-ops") {
    for (seed <- Seq(13, 29, 57)) {
      val rnd = new scala.util.Random(seed)
      val all = (1 to 60).map(_ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(p => p._1 != p._2).distinct
      val (oldE, deltaE) = all.partition(_ => rnd.nextBoolean())
      if (oldE.nonEmpty && deltaE.nonEmpty) {
        val oldDf = oldE.toDF("id_a", "id_b")
        val deltaDf = deltaE.toDF("id_a", "id_b")
        val full = GraphOps.connectedComponents(
            all.toDF("id_a", "id_b"), "id_a", "id_b")
          .as[(Long, Long)].collect().toMap
        val prev = GraphOps.connectedComponents(oldDf, "id_a", "id_b")
        val merged = GraphOps.mergeComponents(prev, deltaDf, "id_a", "id_b")
          .as[(Long, Long)].collect().toMap
        assert(merged === full, s"seed=$seed")
      }
    }
    // empty delta: labels unchanged
    val prev = GraphOps.connectedComponents(
      Seq((1L, 2L)).toDF("id_a", "id_b"), "id_a", "id_b")
    val same = GraphOps.mergeComponents(prev,
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(same === Map(1L -> 1L, 2L -> 1L))
  }

  test("connectedComponentsStar ≡ min-label connectedComponents on " +
       "seeded random graphs and string ids") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(60)(
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(e => e._1 != e._2)
      val df = edges.toDF("id_a", "id_b")
      val expected = GraphOps.connectedComponents(df, "id_a", "id_b")
        .as[(Long, Long)].collect().toSet
      val got = GraphOps.connectedComponentsStar(df, "id_a", "id_b")
        .as[(Long, Long)].collect().toSet
      assert(got === expected, s"seed $seed")
    }
    val strEdges = Seq(
      ("doc-b", "doc-a"), ("doc-b", "doc-c"), ("doc-d", "doc-c"),
      ("doc-d", "doc-e"), ("img-9", "img-7")).toDF("id_a", "id_b")
    val cc = GraphOps.connectedComponentsStar(strEdges, "id_a", "id_b")
      .as[(String, String)].collect().toMap
    Seq("doc-a", "doc-b", "doc-c", "doc-d", "doc-e")
      .foreach(n => assert(cc(n) === "doc-a", s"node $n"))
    assert(cc("img-7") === "img-7" && cc("img-9") === "img-7")
  }

  test("connectedComponentsStar collapses a 1000-node chain in O(log n) " +
       "rounds (min-label would need ~999)") {
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // maxIter = 12 doubles as the round-count assertion: the require
    // inside fires if contraction hasn't converged by then
    val cc = GraphOps.connectedComponentsStar(chain, "id_a", "id_b",
        maxIter = 12)
      .as[(Long, Long)].collect()
    assert(cc.length === 1000)
    assert(cc.forall(_._2 === 0L))
  }

  test("pageRankConverged: tolerance-0 run reaches the integer fixpoint " +
       "(≡ a long fixed-round run), and oversized mass fails loudly") {
    val edges = Seq(
      ("a", "hub"), ("b", "hub"), ("c", "hub"), ("d", "hub"),
      ("x", "y")).toDF("src", "dst")
    val converged = GraphOps.pageRankConverged(
        edges, "src", "dst", tolerance = 0L, maxIter = 100)
      .as[(String, Long)].collect().toMap
    // integer ranks reach an exact fixpoint; a long fixed run lands there
    val fixed = GraphOps.pageRank(edges, "src", "dst", iters = 60)
      .as[(String, Long)].collect().toMap
    assert(converged === fixed)
    // the probe is deterministic under repartition
    val again = GraphOps.pageRankConverged(
        edges.repartition(5), "src", "dst", tolerance = 0L, maxIter = 100)
      .as[(String, Long)].collect().toMap
    assert(again === converged)
    // ppm-scaled arithmetic would wrap above Long.MaxValue/2e6 — guarded
    val err = intercept[IllegalArgumentException] {
      GraphOps.pageRank(edges, "src", "dst", iters = 1,
        mass = Long.MaxValue / 1000L)
    }
    assert(err.getMessage.contains("overflows"))
  }

  test("pageRank: hub outranks leaves, mass approximately conserved " +
       "(div truncation only), dangling sink absorbs and redistributes, " +
       "repartition-invariant") {
    // star into "hub" (dangling sink) + a 2-chain off to the side
    val edges = Seq(
      ("a", "hub"), ("b", "hub"), ("c", "hub"), ("d", "hub"),
      ("x", "y")).toDF("src", "dst")
    val ranks = GraphOps.pageRank(edges, "src", "dst", iters = 3)
      .as[(String, Long)].collect().toMap
    val mass = 1000000000000L
    assert(ranks.size === 7)
    val hub = ranks("hub")
    // the hub receives 4 spokes' mass; everything else must rank below
    assert(ranks.filter(_._1 != "hub").values.forall(_ < hub),
      ranks.toString)
    // y receives one spoke -> above sources
    assert(ranks("y") > ranks("a"))
    // mass conservation up to div truncation (each div loses < 1 unit
    // per row per step; 7 nodes x 3 iters x 3 divs is < 100 units, be
    // generous and allow 1e6 slack on 1e12)
    val total = ranks.values.sum
    assert(total <= mass && total > mass - 1000000L, s"total=$total")
    val again = GraphOps.pageRank(
        edges.repartition(5), "src", "dst", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(again === ranks, "partitioning must not change integer ranks")
  }

  test("personalizedPageRank: seeds-everywhere equals uniform pageRank " +
       "bit-for-bit; seed mass stays on the seeds' side of a " +
       "disconnected graph; repartition-invariant") {
    // two disconnected components: a star into hub1, and a 2-chain
    val edges = Seq(
      ("a", "hub"), ("b", "hub"), ("c", "hub"),
      ("x", "y")).toDF("src", "dst")
    val allNodes = Seq("a", "b", "c", "hub", "x", "y").toDF("seed")
    // restart over ALL nodes == uniform PageRank (same denominators,
    // same init, same per-round arithmetic)
    val uniform = GraphOps.pageRank(edges, "src", "dst", iters = 3)
      .as[(String, Long)].collect().toMap
    val seededAll = GraphOps.personalizedPageRank(
        edges, "src", "dst", allNodes, "seed", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(seededAll === uniform)
    // seeds only in the star component: the chain component never
    // receives mass — its ranks are exactly 0
    val ppr = GraphOps.personalizedPageRank(
        edges, "src", "dst", Seq("a", "b").toDF("seed"), "seed", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(ppr("x") === 0L && ppr("y") === 0L, ppr.toString)
    assert(ppr("hub") > 0L, "seed outflow must reach the hub")
    assert(ppr("a") > ppr("c"), "non-seed source must rank below a seed")
    // seeds outside the graph are ignored; empty effective set fails
    val withGhost = GraphOps.personalizedPageRank(
        edges, "src", "dst", Seq("a", "b", "ghost").toDF("seed"), "seed",
        iters = 3)
      .as[(String, Long)].collect().toMap
    assert(withGhost === ppr)
    intercept[IllegalArgumentException] {
      GraphOps.personalizedPageRank(
        edges, "src", "dst", Seq("ghost").toDF("seed"), "seed", iters = 3)
    }
    // partitioning must not change integer ranks
    val again = GraphOps.personalizedPageRank(
        edges.repartition(5), "src", "dst",
        Seq("a", "b").toDF("seed"), "seed", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(again === ppr)
  }

  test("kCore: matches an iterative-peel referee on a random graph, " +
       "clique survives while a dangling path strips, high k empties") {
    // K5 (every node degree 4) with a path 100-101-102 hanging off
    // node 1: the path peels away at k=2 round by round, the clique
    // survives intact
    val k5 = (for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j))
    val g = (k5 ++ Seq((1L, 100L), (100L, 101L), (101L, 102L))).toDF("a", "b")
    val got2 = GraphOps.kCore(g, "a", "b", k = 2)
      .as[(Long, Long)].collect().toMap
    assert(got2 === Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L, 5L -> 4L))
    assert(GraphOps.kCore(g, "a", "b", k = 5).count() === 0)
    // random graph referee: peel with plain collections until stable
    val rnd = new scala.util.Random(31)
    val edges = (0 until 400).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    def refCore(k: Int): Map[Long, Long] = {
      var und = edges.map(e => (e._1 min e._2, e._1 max e._2)).toSet
      var changed = true
      while (changed) {
        val deg = und.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
        val keep = deg.filter(_._2 >= k).keySet
        val next = und.filter(e => keep(e._1) && keep(e._2))
        changed = next != und
        und = next
      }
      und.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    }
    for (k <- Seq(2, 4, 7)) {
      val got = GraphOps.kCore(edges.toDF("a", "b"), "a", "b", k)
        .as[(Long, Long)].collect().toMap
      assert(got === refCore(k), s"k=$k")
    }
  }

  test("seedDistances: matches a BFS referee capped at rounds, " +
       "isolated seeds appear at 0, far nodes are absent") {
    // path 1-2-3-4-5-6, seed {1}: dist_i = i-1, capped at rounds=3
    val path = (1L to 5L).map(i => (i, i + 1)).toDF("a", "b")
    val seeds1 = Seq(1L).toDF("s")
    val got = GraphOps.seedDistances(path, "a", "b", seeds1, "s", 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // a seed with no edges still reports dist 0
    val lone = GraphOps.seedDistances(path, "a", "b",
      Seq(99L).toDF("s"), "s", 2).as[(Long, Long)].collect().toMap
    assert(lone(99L) === 0L)
    // random graph + multi-seed referee
    val rnd = new scala.util.Random(47)
    val edges = (0 until 300).map(_ =>
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(e => e._1 != e._2)
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    val seedSet = Set(3L, 44L, 71L)
    var ref = seedSet.map(_ -> 0L).toMap
    for (r <- 1 to 4) {
      val frontier = ref.filter(_._2 == r - 1).keySet
      val nbrs = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
      ref = ref ++ nbrs.filterNot(ref.contains).map(_ -> r.toLong)
    }
    val gotR = GraphOps.seedDistances(edges.toDF("a", "b"), "a", "b",
      seedSet.toSeq.toDF("s"), "s", 4).as[(Long, Long)].collect().toMap
    assert(gotR === ref)
  }

  test("triangleCounts: matches a brute-force referee on a random " +
       "graph, K4 and star fixtures behave, duplicate/reversed edges " +
       "collapse") {
    import org.apache.spark.sql.functions._
    // K4: 4 triangles, every node in 3; edges given in mixed order and
    // with duplicates/reversals
    val k4 = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (3L, 4L), (2L, 4L), (4L, 2L)).toDF("a", "b")
    val gotK4 = GraphOps.triangleCounts(k4, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(gotK4 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // star graph: the hub has every edge but zero triangles
    val star = (1L to 50L).map(i => (0L, i)).toDF("a", "b")
    assert(GraphOps.triangleCounts(star, "a", "b").count() === 0)
    // random graph referee
    val rnd = new scala.util.Random(23)
    val edges = (0 until 600).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    val und = edges.map(e => (e._1 min e._2, e._1 max e._2)).toSet
    val refCounts = collection.mutable.Map[Long, Long]()
    val ns = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    for (i <- ns.indices; j <- i + 1 until ns.length;
         k <- j + 1 until ns.length) {
      val (x, y, z) = (ns(i), ns(j), ns(k))
      if (und((x, y)) && und((y, z)) && und((x, z))) {
        Seq(x, y, z).foreach(n =>
          refCounts(n) = refCounts.getOrElse(n, 0L) + 1L)
      }
    }
    val got = GraphOps.triangleCounts(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got === refCounts.toMap)
  }

  test("labelPropagation: labels compete by frequency — two dense " +
       "communities keep distinct labels where CC would merge them") {
    // K4 on {1,2,3,4} + K4 on {10,11,12,13} + bridge 4–10: one
    // component, but each clique's majority label holds on round 2
    def k4(ns: Seq[Long]) =
      for (a <- ns; b <- ns if a < b) yield (a, b)
    val edges = (k4(Seq(1L, 2L, 3L, 4L)) ++
      k4(Seq(10L, 11L, 12L, 13L)) :+ ((4L, 10L))).toDF("a", "b")
    val lpa = GraphOps.labelPropagation(edges, "a", "b", rounds = 2)
      .as[(Long, Long)].collect().toMap
    val cc = GraphOps.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet.size === 1) // CC: one component
    // LPA: the second clique's nodes all carry a label from their own
    // clique, never label 1
    Seq(11L, 12L, 13L).foreach(n => assert(lpa(n) >= 10L, s"node $n"))
    assert(Seq(1L, 2L, 3L).forall(n => lpa(n) <= 4L))
    assert(lpa.values.toSet.size > 1) // genuinely more than one community
  }

  test("labelPropagation: driver-computed synchronous referee with " +
       "min-label tie-break, partitioning-invariant; rounds=0 is " +
       "the identity labeling") {
    val rnd = new scala.util.Random(17)
    val edges = (0 until 120).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(e => e._1 != e._2)
    val und = edges.flatMap(e => Seq(e, e.swap)).distinct
    val adj = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var ref = adj.keys.map(n => n -> n).toMap
    (1 to 3).foreach { _ =>
      ref = ref.map { case (n, _) =>
        val votes = adj(n).map(ref).groupBy(identity)
          .map { case (l, v) => (l, v.size) }
        n -> votes.toSeq.map { case (l, c) => (-c, l) }.min._2
      }
    }
    Seq(1, 6).foreach { p =>
      val got = GraphOps.labelPropagation(
          edges.toDF("a", "b").repartition(p), "a", "b", rounds = 3)
        .as[(Long, Long)].collect().toMap
      assert(got === ref, s"partitions=$p")
    }
    val id0 = GraphOps.labelPropagation(edges.toDF("a", "b"), "a", "b", 0)
      .as[(Long, Long)].collect().toMap
    assert(id0.forall { case (n, l) => n === l })
  }

  test("hits: hand-computed 2-round values on a bipartite fixture; " +
       "pure sides score 0 on the other axis") {
    // c1→{s1,s2}, c2→{s1}. Round 1: a(s1)=2e6, a(s2)=1e6 → norm
    // (1e6, 5e5); h(c1)=1.5e6, h(c2)=1e6 → norm (1e6, 666666).
    // Round 2: a(s1)=1666666, a(s2)=1e6 → (1e6, 600000);
    // h(c1)=1.6e6, h(c2)=1e6 → (1e6, 625000).
    val edges = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1"))
      .toDF("src", "dst")
    val got = GraphOps.hits(edges, "src", "dst", rounds = 2)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("c1") === ((1000000L, 0L)))
    assert(got("c2") === ((625000L, 0L)))
    assert(got("s1") === ((0L, 1000000L)))
    assert(got("s2") === ((0L, 600000L)))
  }

  test("hits: duplicate edges collapse; partitioning-invariant; " +
       "general (non-bipartite) graphs give every node both scores") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val dup = (base ++ base ++ base).toDF("src", "dst")
    val a = GraphOps.hits(dup, "src", "dst", rounds = 3)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val b = GraphOps.hits(
        base.toDF("src", "dst").repartition(7), "src", "dst", rounds = 3)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a === b)
    // cycle + chord: node 1 points at 2 and 3, node 3 is pointed at by
    // 1 and 2 — the top hub/authority must be 1/3 respectively
    val byId = a.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L)._1 === 1000000L) // strongest hub
    assert(byId(3L)._2 === 1000000L) // strongest authority
    assert(a.forall(r => r._2 >= 0 && r._2 <= 1000000L &&
      r._3 >= 0 && r._3 <= 1000000L))
  }

  test("thresholdCascade: one active neighbor never fires a k=2 node, " +
       "two do; rounds cap the spread; k=1 reproduces BFS reachability") {
    // seeds {1, 2}; node 3 sees both (fires round 1); node 4 sees only
    // 3 (one neighbor — never fires at k=2); node 5 sees 3 and 1
    // (fires round 2, after 3 activates)
    val g = Seq((1L, 3L), (2L, 3L), (3L, 4L), (3L, 5L), (1L, 5L))
      .toDF("a", "b")
    val seeds = Seq(1L, 2L).toDF("s")
    val got = GraphOps.thresholdCascade(g, "a", "b", seeds, "s",
        k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 5L -> 2L))
    // rounds = 1 stops before node 5
    val r1 = GraphOps.thresholdCascade(g, "a", "b", seeds, "s",
        k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 === Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
    // k = 1 is plain BFS reachability (rounds = hop bound)
    val bfs = GraphOps.thresholdCascade(g, "a", "b", seeds, "s",
        k = 1, rounds = 4)
      .as[(Long, Long)].collect().toMap.keySet
    val ref = GraphOps.seedDistances(g, "a", "b", seeds, "s", 4)
      .as[(Long, Long)].collect().toMap.keySet
    assert(bfs === ref)
  }

  test("weightedPageRank: uniform weights reproduce unweighted pageRank " +
       "bit-for-bit (floor((r·c)/(c·deg)) = floor(r/deg)); asymmetric " +
       "weights shift rank toward the heavy edge") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(31)
    val edges = (0 until 200).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).distinct
    val uni = edges.map(e => (e._1, e._2, 7L)).toDF("a", "b", "w")
    val got = GraphOps.weightedPageRank(uni, "a", "b", "w", iters = 3)
      .as[(Long, Long)].collect().toMap
    val ref = GraphOps.pageRank(edges.toDF("a", "b"), "a", "b", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === ref)
    // star: 1 -> {2, 3} with weight 9:1 — node 2 must outrank node 3
    val star = Seq((1L, 2L, 9L), (1L, 3L, 1L)).toDF("a", "b", "w")
    val r = GraphOps.weightedPageRank(star, "a", "b", "w", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r(2L) > r(3L))
  }

  test("weightedSeedDistances: a cheap long path beats an expensive " +
       "short one within the hop budget but not beyond it; parallel " +
       "edges min-combine; Bellman-Ford referee on a random graph") {
    import org.apache.spark.sql.functions._
    // seed 1; direct 1-4 costs 10, detour 1-2-3-4 costs 3×1
    val g = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    def run(edges: Seq[(Long, Long, Long)], rounds: Int) =
      GraphOps.weightedSeedDistances(edges.toDF("a", "b", "w"),
        "a", "b", "w", Seq(1L).toDF("s"), "s", rounds)
        .as[(Long, Long)].collect().toMap
    assert(run(g, 3)(4L) === 3L) // detour found within 3 hops
    assert(run(g, 1)(4L) === 10L) // hop budget 1: only the direct edge
    // a cheaper parallel copy of the direct edge wins immediately
    assert(run(g :+ ((1L, 4L, 2L)), 1)(4L) === 2L)
    // random-graph referee: rounds-capped Bellman-Ford on the driver
    val rnd = new scala.util.Random(11)
    val edges = (0 until 250).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong,
        (1 + rnd.nextInt(9)).toLong)).filter(e => e._1 != e._2)
    val undirected = edges ++ edges.map(e => (e._2, e._1, e._3))
    val minEdge = undirected.groupBy(e => (e._1, e._2))
      .map { case (k, xs) => (k._1, k._2, xs.map(_._3).min) }.toSeq
    val seeds = Set(5L, 17L)
    var ref = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to 4) {
      val relaxed = minEdge.flatMap { case (a, b, w) =>
        ref.get(a).map(d => b -> (d + w))
      }.groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).min }
      ref = (ref.keySet ++ relaxed.keySet).map { n =>
        n -> math.min(ref.getOrElse(n, Long.MaxValue),
          relaxed.getOrElse(n, Long.MaxValue))
      }.toMap
    }
    val got = GraphOps.weightedSeedDistances(
        edges.toDF("a", "b", "w"), "a", "b", "w",
        seeds.toSeq.toDF("s"), "s", 4)
      .as[(Long, Long)].collect().toMap
    assert(got === ref)
  }

  test("bipartiteLinkScores: hand-computed CN/AA/Jaccard on a small " +
       "basket fixture; size-1 baskets emit nothing; the basket cap " +
       "drops oversized baskets WHOLE (degrees included)") {
    val edges = Seq(
      ("o1", "a"), ("o1", "b"), ("o1", "c"),
      ("o2", "a"), ("o2", "b"),
      ("o3", "b"), ("o3", "c"), ("o3", "d"),
      ("o4", "x") // size-1: no wedges, no degree contribution
    ).toDF("o", "p")
    val w = graft.ops.EvalOps.aaWeightsMicro(64)
    val w2 = w(1); val w3 = w(2)
    assert(w2 === 1000000L, "log2(2) is exact in Q20")
    val got = GraphOps.bipartiteLinkScores(edges, "o", "p")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got(("a", "b")) === ((2L, w3 + w2, 666666L)))
    assert(got(("a", "c")) === ((1L, w3, 333333L)))
    assert(got(("b", "c")) === ((2L, 2 * w3, 666666L)))
    assert(got(("b", "d")) === ((1L, w3, 333333L)))
    assert(got(("c", "d")) === ((1L, w3, 500000L)))
    assert(got.size === 5)
    // cap = 2: both size-3 baskets drop whole; only o2 survives, and
    // the Jaccard degrees shrink with it (a and b now have degree 1)
    val capped = GraphOps.bipartiteLinkScores(edges, "o", "p",
        maxBasket = 2)
      .as[(String, String, Long, Long, Long)].collect()
    assert(capped.toSeq === Seq(("a", "b", 1L, w2, 1000000L)))
  }

  test("reliable-checkpoint mode: with a configured checkpoint dir the " +
       "iterative loops write REAL reliable checkpoints (executor-loss " +
       "-safe) and produce bit-identical results to local mode") {
    val rnd = new scala.util.Random(23)
    val edges = (0 until 400).map(_ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(e => e._1 != e._2).toDF("a", "b")
    def ccRun() = GraphOps.connectedComponentsStar(edges, "a", "b")
      .as[(Long, Long)].collect().sorted.toSeq
    def prRun() = GraphOps.pageRank(edges, "a", "b", iters = 3)
      .as[(Long, Long)].collect().sorted.toSeq
    val (ccLocal, prLocal) = (ccRun(), prRun())
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty, "suite assumes local mode")
    val dir = java.nio.file.Files.createTempDirectory("graft_reliable_ckpt")
    sc.setCheckpointDir(dir.toString)
    try {
      assert(ccRun() === ccLocal)
      assert(prRun() === prLocal)
      // the loops really went through the reliable path: checkpoint
      // part-files exist under the configured dir
      val files = java.nio.file.Files.walk(dir).iterator().asInstanceOf[
        java.util.Iterator[java.nio.file.Path]]
      var nParts = 0
      while (files.hasNext) {
        if (files.next().getFileName.toString.startsWith("part-"))
          nParts += 1
      }
      assert(nParts > 0, s"no reliable checkpoint files under $dir")
    } finally {
      // restore local mode for the rest of the shared-session suites
      // (checkpointDir is a private[spark] var — reflection is the only
      // public-API-free way back)
      val m = sc.getClass.getMethod(
        "checkpointDir_$eq", classOf[Option[String]])
      m.invoke(sc, None)
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
  }
  test("randomWalks: every hop follows a real edge, walks are " +
       "partitioning-invariant, and the maxDegree cap restricts hops " +
       "to the sorted-neighbor prefix") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 5L), (5L, 1L)
    ).toDF("a", "b")
    val und = Seq((1L,2L),(2L,3L),(3L,4L),(4L,1L),(2L,5L),(5L,1L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    def run(parts: Int) = GraphOps.randomWalks(
        edges.repartition(parts), "a", "b",
        walksPerNode = 2, steps = 4, salt = "t1")
      .as[(String, Long, String)].collect().sortBy(r => (r._1, r._2))
    val w = run(1)
    assert(w.length === 5 * 2, "every node starts walksPerNode walks")
    w.foreach { case (start, _, path) =>
      val hops = path.split(" ").map(_.toLong)
      assert(hops.length === 5, s"path length: $path")
      assert(hops.head.toString === start)
      hops.sliding(2).foreach { case Array(x, y) =>
        assert(und.contains((x, y)), s"non-edge hop $x->$y in $path")
      }
    }
    assert(run(7).toSeq === w.toSeq, "partitioning must not change walks")
    // cap = 1: every hop must go to the SMALLEST neighbor
    val capped = GraphOps.randomWalks(edges, "a", "b",
        walksPerNode = 1, steps = 2, salt = "t1", maxDegree = 1)
      .as[(String, Long, String)].collect()
    val minNbr = und.groupBy(_._1).map { case (n, es) =>
      n -> es.map(_._2).min }
    capped.foreach { case (_, _, path) =>
      val hops = path.split(" ").map(_.toLong)
      hops.sliding(2).foreach { case Array(x, y) =>
        assert(y === minNbr(x), s"cap=1 must hop to min neighbor: $path")
      }
    }
  }

  test("modularity: two triangles + bridge under the perfect " +
       "partition score the textbook 70/196; merged-into-one scores 0") {
    import graft.ops.GraphOps
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("a", "b")
    val good = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L),
      (5L, 20L), (6L, 20L)).toDF("id", "c")
    val got = GraphOps.modularity(pairs, "a", "b", good, "id", "c")
      .orderBy($"community")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // m=7; e_c=3 each; degrees 2,2,3 per triangle -> d_c=7 each
    // Q = (4*7*6 - 2*49)*1e6 // (4*49) = 70e6 // 196 = 357142
    assert(got === Seq((10L, 3L, 3L, 7L, 357142L),
      (20L, 3L, 3L, 7L, 357142L)))
    // everything in one community: Q = (4m*m - (2m)^2) / 4m^2 = 0
    val one = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L), (5L, 9L),
      (6L, 9L)).toDF("id", "c")
    val g1 = GraphOps.modularity(pairs, "a", "b", one, "id", "c")
      .select($"q_ppm").as[Long].collect().toSeq
    assert(g1 === Seq(0L))
  }

  test("modularity: isolated labeled nodes are kept with d_sum " +
       "contribution 0, and an all-isolated community still appears") {
    import graft.ops.GraphOps
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    // node 4 is isolated inside community 10; community 30 is ONLY
    // isolated nodes (5, 6) — both must survive the degree join
    val lbl = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L),
      (5L, 30L), (6L, 30L)).toDF("id", "c")
    val got = GraphOps.modularity(pairs, "a", "b", lbl, "id", "c")
      .orderBy($"community")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // m=3; community 10: 4 nodes (incl. isolated 4), e=3, d_sum=6;
    // community 30: 2 nodes, e=0, d_sum=0
    // Q = (4*3*3 - 36)*1e6 // 36 = 0
    assert(got === Seq((10L, 4L, 3L, 6L, 0L), (30L, 2L, 0L, 0L, 0L)))
  }
}
