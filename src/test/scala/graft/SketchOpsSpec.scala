package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates — the fixed-memory path when exact distinct/rank
  * state would not fit at 100 TB. Exactness is not the contract (and
  * sketches can't hash-match a DuckDB oracle); bounded error vs the
  * exact answers is, so that is what these tests pin, at the sf0.01
  * corpus against the exact aggregates from the conformance suite.
  */
class SketchOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val sf01 = "/root/testdata/sf0.01"

  test("approx_count_distinct stays within its rsd bound (HLL++, " +
       "mergeable => map-side partial at any scale)") {
    val e = Tables.load(spark, sf01, "events")
    val exact = e.select(countDistinct($"user_id")).head.getLong(0)
    val approx = e.select(approx_count_distinct($"user_id", rsd = 0.02))
      .head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.06,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx lands within rank tolerance of the exact " +
       "nearest-rank percentiles (q47 semantics)") {
    val e = Tables.load(spark, sf01, "events")
      .select($"event_type", round($"value" * 100, 0).cast("long").as("v"))
    val acc = 1000 // rank error ≤ n/acc
    val approx = e.groupBy($"event_type")
      .agg(percentile_approx($"v", lit(0.9), lit(acc)).as("p90"))
      .as[(String, Long)].collect().toMap
    val n = e.groupBy($"event_type").count()
      .as[(String, Long)].collect().toMap
    // exact rank window per type: values at ranks ceil(0.9n)±(n/acc + 1)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"event_type").orderBy($"v")
    val ranked = e.withColumn("rn", row_number().over(w))
    n.keys.foreach { t =>
      val total = n(t)
      val target = math.ceil(0.9 * total).toLong
      val slack = total / acc + 1
      val window = ranked
        .filter($"event_type" === t &&
          $"rn" >= target - slack && $"rn" <= target + slack)
        .select($"v").as[Long].collect()
      assert(window.min <= approx(t) && approx(t) <= window.max,
        s"$t: approx=${approx(t)} allowed=[${window.min},${window.max}]")
    }
  }

  test("count-min sketch: never under-counts, exact for collision-free " +
       "terms, and merges algebraically (sketch(A++B) == cellwise " +
       "sum of sketches)") {
    import graft.ops.SketchOps
    val rnd = new scala.util.Random(7)
    val a = Seq.fill(400)(s"w${rnd.nextInt(30)}").toDF("term")
    val b = Seq.fill(300)(s"w${rnd.nextInt(50)}").toDF("term")
    val (d, w, salt) = (4, 64, "cmSpec")
    val skA = SketchOps.countMinSketch(a, "term", d, w, salt)
    val skB = SketchOps.countMinSketch(b, "term", d, w, salt)
    val skAll = SketchOps.countMinSketch(
      a.unionByName(b), "term", d, w, salt)
    // algebraic merge: union + re-sum cells equals the one-shot sketch
    val merged = skA.unionByName(skB)
      .groupBy("r", "bucket").agg(sum("cnt").as("cnt"))
    assert(merged.as[(Int, Long, Long)].collect().toSet ===
      skAll.as[(Int, Long, Long)].collect().toSet)
    // estimates: upper bound for every term; exact when no collision
    val truth = a.unionByName(b).groupBy("term").count()
      .as[(String, Long)].collect().toMap
    val probes = truth.keys.toSeq.toDF("term")
    val est = SketchOps.countMinEstimate(
      skAll, probes, "term", d, w, salt)
      .as[(String, Long)].collect().toMap
    truth.foreach { case (t, c) =>
      assert(est(t) >= c, s"under-count for $t")
    }
    // with 50 distinct terms in 4x64 buckets most estimates are exact
    val exact = truth.count { case (t, c) => est(t) == c }
    assert(exact >= truth.size / 2, s"only $exact/${truth.size} exact")
  }

  test("grouped count-min: per-group merge law holds, each group's " +
       "sketch equals a solo build on that group, estimates upper-bound") {
    import graft.ops.SketchOps
    val rnd = new scala.util.Random(11)
    val langs = Seq("en", "ru", "de")
    def mk(n: Int, terms: Int) = Seq.fill(n)(
      (langs(rnd.nextInt(3)), s"w${rnd.nextInt(terms)}")).toDF("lang", "term")
    val a = mk(500, 30)
    val b = mk(400, 45)
    val (d, w, salt) = (4, 64, "cmgSpec")
    val skA = SketchOps.countMinSketchGrouped(a, Seq("lang"), "term", d, w, salt)
    val skB = SketchOps.countMinSketchGrouped(b, Seq("lang"), "term", d, w, salt)
    val skAll = SketchOps.countMinSketchGrouped(
      a.unionByName(b), Seq("lang"), "term", d, w, salt)
    // merge law per group: union + re-sum ≡ one-shot build
    val merged = SketchOps.mergeCountMinSketchesGrouped(skA, skB, Seq("lang"))
    assert(merged.as[(String, Int, Long, Long)].collect().toSet ===
      skAll.as[(String, Int, Long, Long)].collect().toSet)
    // group isolation: the "en" slice of the grouped sketch is exactly
    // the global sketch of the "en" rows alone (same salt ⇒ same cells)
    val enSolo = SketchOps.countMinSketch(
      a.unionByName(b).filter($"lang" === "en"), "term", d, w, salt)
    assert(skAll.filter($"lang" === "en").drop("lang")
      .as[(Int, Long, Long)].collect().toSet ===
      enSolo.as[(Int, Long, Long)].collect().toSet)
    // estimates: never under-count within any group
    val truth = a.unionByName(b).groupBy("lang", "term").count()
      .as[(String, String, Long)].collect()
    val probes = truth.map { case (l, t, _) => (l, t) }.toSeq
      .toDF("lang", "term")
    val est = SketchOps.countMinEstimateGrouped(
      skAll, probes, Seq("lang"), "term", d, w, salt)
      .as[(String, String, Long)].collect()
      .map { case (l, t, e) => (l, t) -> e }.toMap
    truth.foreach { case (l, t, c) =>
      assert(est((l, t)) >= c, s"under-count for ($l, $t)")
    }
  }

  test("quantile sketch: shard merge equals the one-shot sketch exactly, " +
       "estimates are rank-accurate and partitioning-invariant") {
    import graft.ops.SketchOps
    val orders = Tables.load(spark, sfDir, "orders")
      .select($"o_orderkey", floor($"o_totalprice" * 100).as("cents"))
    val (k, salt) = (256, "qt")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toSet
    val whole = SketchOps.quantileSketch(orders, "o_orderkey", "cents", k, salt)
    // algebraic merge: per-shard bottom-k folds to the whole's bottom-k
    val shards = (0 until 3).map(i =>
      SketchOps.quantileSketch(
        orders.filter($"o_orderkey" % 3 === i), "o_orderkey", "cents",
        k, salt))
    val merged = shards.reduce(
      SketchOps.mergeQuantileSketches(_, _, "cents", k))
    assert(rows(merged) === rows(whole))
    // partitioning-invariant build
    assert(rows(SketchOps.quantileSketch(
      orders.repartition(13), "o_orderkey", "cents", k, salt)) ===
      rows(whole))
    // rank accuracy: each estimate's TRUE rank within ~4/sqrt(k) of the
    // requested quantile (uniform-sample bound, generous constant)
    val n = orders.count()
    val qs = Seq(100000L, 500000L, 900000L)
    val est = SketchOps.quantileEstimates(whole, "cents", qs)
      .as[(Long, Long)].collect().toMap
    qs.foreach { q =>
      val trueRankPpm = orders.filter($"cents" <= est(q)).count() *
        1000000L / n
      val tol = (4.0 / math.sqrt(k) * 1000000L).toLong
      assert(math.abs(trueRankPpm - q) <= tol,
        s"q=$q est=${est(q)} landed at rank $trueRankPpm ppm")
    }
    // estimates are monotone in q
    val all = SketchOps.quantileEstimates(
        whole, "cents", Seq(10000L, 250000L, 500000L, 750000L, 990000L))
      .orderBy($"q_ppm").as[(Long, Long)].collect().map(_._2)
    assert(all.sameElements(all.sorted))
  }

  test("KMV distinct sketch: shard merge equals the one-shot sketch, " +
       "two-level build is fanout- and partitioning-invariant, exact " +
       "below k, and the estimator lands within the 1/sqrt(k) band") {
    import graft.ops.SketchOps
    val orders = Tables.load(spark, sfDir, "orders")
      .select($"o_orderpriority", $"o_custkey")
    val (k, salt) = (128, "kmvSpec")
    val groups = Seq("o_orderpriority")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long)].collect().toSet
    val whole = SketchOps.kmvSketch(orders, groups, "o_custkey", k, salt)
    // fixed size: at most k kept hashes per group
    val sizes = whole.groupBy($"o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ <= k))
    // algebraic merge: shard sketches fold to the whole's sketch
    val shards = (0 until 3).map(i =>
      SketchOps.kmvSketch(
        orders.filter($"o_custkey" % 3 === i), groups, "o_custkey",
        k, salt))
    val merged = shards.reduce(
      SketchOps.mergeKmvSketches(_, _, groups, k))
    assert(rows(merged) === rows(whole))
    // the two-level bottom-k is invariant in fanout and partitioning
    assert(rows(SketchOps.kmvSketch(
      orders, groups, "o_custkey", k, salt, fanout = 1)) === rows(whole))
    assert(rows(SketchOps.kmvSketch(
      orders.repartition(13), groups, "o_custkey", k, salt)) ===
      rows(whole))
    // estimator accuracy: within 4/sqrt(k) relative error of the truth
    // (the standard KMV band, generous constant for one draw)
    val truth = orders.groupBy($"o_orderpriority")
      .agg(countDistinct($"o_custkey").as("d"))
      .as[(String, Long)].collect().toMap
    val est = SketchOps.kmvEstimate(whole, groups, k)
      .select($"o_orderpriority", $"est_distinct")
      .as[(String, Long)].collect().toMap
    val tol = 4.0 / math.sqrt(k)
    truth.foreach { case (g, d) =>
      assert(math.abs(est(g) - d).toDouble / d <= tol,
        s"$g: est=${est(g)} true=$d")
    }
    // exact-below-k: a group with fewer than k distinct keys reports
    // its true cardinality (every distinct hash survived)
    val small = orders.filter($"o_custkey" < 50)
    val smallEst = SketchOps.kmvEstimate(
        SketchOps.kmvSketch(small, groups, "o_custkey", k, salt),
        groups, k)
      .select($"o_orderpriority", $"est_distinct")
      .as[(String, Long)].collect().toMap
    val smallTruth = small.groupBy($"o_orderpriority")
      .agg(countDistinct($"o_custkey").as("d"))
      .as[(String, Long)].collect().toMap
    assert(smallEst === smallTruth)
  }

  test("KMV set estimate: union/intersection/Jaccard land within the " +
       "1/sqrt(k) band and are exact below k") {
    import graft.ops.SketchOps
    val orders = Tables.load(spark, sfDir, "orders")
      .select($"o_orderstatus", $"o_orderpriority", $"o_custkey")
    val (k, salt) = (128, "kmvSetSpec")
    val groups = Seq("o_orderstatus")
    def corpus(prio: String) =
      orders.filter($"o_orderpriority" === prio)
    def sketch(df: org.apache.spark.sql.DataFrame) =
      SketchOps.kmvSketch(df, groups, "o_custkey", k, salt)
    def truthSets(df: org.apache.spark.sql.DataFrame) =
      df.select($"o_orderstatus", $"o_custkey").distinct()
        .as[(String, Long)].collect().groupBy(_._1)
        .map { case (g, xs) => g -> xs.map(_._2).toSet }
    val (ta, tb) = (truthSets(corpus("1-URGENT")), truthSets(corpus("2-HIGH")))
    val est = SketchOps.kmvSetEstimate(
        sketch(corpus("1-URGENT")), sketch(corpus("2-HIGH")), groups, k)
      .select($"o_orderstatus", $"est_union", $"est_intersection",
        $"containment_a_ppm")
      .as[(String, Long, Long, Long)].collect()
    assert(est.nonEmpty)
    val tol = 4.0 / math.sqrt(k)
    est.foreach { case (g, eu, ei, ca) =>
      val (u, i) = ((ta(g) | tb(g)).size, (ta(g) & tb(g)).size)
      assert(math.abs(eu - u).toDouble / u <= tol, s"$g union: $eu vs $u")
      // intersection error compounds (Jaccard x union) — wider band,
      // absolute in units of the union size
      assert(math.abs(ei - i).toDouble / u <= 2 * tol,
        s"$g inter: $ei vs $i")
      // containment = |A∩B|/|A| as a ratio of two sample counts —
      // same compounded band
      val caTrue = i.toDouble / ta(g).size
      assert(math.abs(ca / 1e6 - caTrue) <= 2 * tol,
        s"$g containment: ${ca / 1e6} vs $caTrue")
    }
    // exact-below-k: restrict both corpora to < k distinct keys
    val sm = orders.filter($"o_custkey" < 50)
    def smCorpus(prio: String) = sm.filter($"o_orderpriority" === prio)
    val (sa, sb) = (truthSets(smCorpus("1-URGENT")), truthSets(smCorpus("2-HIGH")))
    SketchOps.kmvSetEstimate(
        sketch(smCorpus("1-URGENT")), sketch(smCorpus("2-HIGH")), groups, k)
      .select($"o_orderstatus", $"est_union", $"est_intersection",
        $"jaccard_ppm", $"containment_a_ppm", $"containment_b_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .foreach { case (g, eu, ei, jp, ca, cb) =>
        val (ua, ub) = (sa.getOrElse(g, Set.empty), sb.getOrElse(g, Set.empty))
        val (u, i) = ((ua | ub).size.toLong, (ua & ub).size.toLong)
        assert(eu === u, s"$g union")
        assert(ei === i, s"$g inter")
        assert(jp === i * 1000000L / u, s"$g jaccard")
        assert(ca === (if (ua.isEmpty) 0L else i * 1000000L / ua.size),
          s"$g containment a")
        assert(cb === (if (ub.isEmpty) 0L else i * 1000000L / ub.size),
          s"$g containment b")
      }
  }

  test("grouped quantile sketch: shard merge equals the one-shot sketch " +
       "exactly, build is fanout/partitioning invariant, estimates are " +
       "rank-accurate per group, and exact below k") {
    import graft.ops.SketchOps
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"lang", $"doc_id", $"n_chars")
    val (k, salt) = (128, "qgSpec")
    val groups = Seq("lang")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"lang", $"__pri", $"n_chars")
        .as[(String, Long, Long)].collect().toSet
    val whole = SketchOps.quantileSketchGrouped(
      docs, groups, "doc_id", "n_chars", k, salt)
    val sizes = whole.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ <= k))
    // exact per-group merge of shard sketches
    val merged = (0 until 3)
      .map(i => SketchOps.quantileSketchGrouped(
        docs.filter($"doc_id" % 3 === i), groups, "doc_id", "n_chars",
        k, salt))
      .reduce(SketchOps.mergeQuantileSketchesGrouped(
        _, _, groups, "n_chars", k))
    assert(rows(merged) === rows(whole))
    // invariance in fanout and input partitioning
    assert(rows(SketchOps.quantileSketchGrouped(
      docs, groups, "doc_id", "n_chars", k, salt, fanout = 1)) ===
      rows(whole))
    assert(rows(SketchOps.quantileSketchGrouped(
      docs.repartition(13), groups, "doc_id", "n_chars", k, salt)) ===
      rows(whole))
    // per-group rank accuracy: the estimate's true rank lands within
    // ~4/sqrt(k) of the requested quantile
    val qs = Seq(250000L, 500000L, 750000L)
    val est = SketchOps.quantileEstimatesGrouped(
        whole, groups, "n_chars", qs)
      .as[(String, Long, Long)].collect()
    val byLang = docs.select($"lang", $"n_chars")
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (g, xs) => g -> xs.map(_._2).sorted }
    val tol = 4.0 / math.sqrt(k)
    est.foreach { case (g, q, v) =>
      val vals = byLang(g)
      val rank = vals.count(_ <= v).toDouble / vals.length
      val lo = vals.count(_ < v).toDouble / vals.length
      val target = q / 1e6
      assert(lo - tol <= target && target <= rank + tol,
        s"$g q=$q est=$v rank=[$lo,$rank]")
    }
    // exact below k: a group smaller than k keeps every row, so the
    // estimate IS the nearest-rank-lower percentile of the truth
    val small = docs.filter($"doc_id" < 100)
    val smallEst = SketchOps.quantileEstimatesGrouped(
        SketchOps.quantileSketchGrouped(
          small, groups, "doc_id", "n_chars", k, salt),
        groups, "n_chars", qs)
      .as[(String, Long, Long)].collect()
    val smallTruth = small.select($"lang", $"n_chars")
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (g, xs) => g -> xs.map(_._2).sorted }
    smallEst.foreach { case (g, q, v) =>
      val vals = smallTruth(g)
      val expected = vals(((vals.length - 1).toLong * q / 1000000L).toInt)
      assert(v === expected, s"$g q=$q")
    }
  }

  test("Misra-Gries heavy hitters: matches the offline canonical form, " +
       "is fanout/partitioning invariant, and the shard merge keeps " +
       "the mergeable-summaries bounds") {
    import graft.ops.{SketchOps, TextOps}
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = docs
      .select($"lang", explode(TextOps.tokenize($"text")).as("token"))
    val k = 16
    val groups = Seq("lang")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, String, Long)].collect().toSet
    val whole = SketchOps.mgSketch(toks, groups, "token", k)
    // driver referee: exact counts -> canonical offline MG per group
    val counts = toks.groupBy($"lang", $"token")
      .agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
    val ref = counts.groupBy(_._1).toSeq.flatMap { case (g, xs) =>
      val sorted = xs.map { case (_, t, c) => (t, c) }
        .sortBy { case (t, c) => (-c, t) }
      val thr = if (sorted.length > k) sorted(k)._2 else 0L
      sorted.take(k).collect {
        case (t, c) if c - thr > 0 => (g, t, c - thr)
      }
    }.toSet
    assert(rows(whole) === ref)
    assert(ref.groupBy(_._1).values.forall(_.size <= k))
    // two-level build is invariant in fanout and input partitioning
    assert(rows(SketchOps.mgSketch(
      toks, groups, "token", k, fanout = 1)) === ref)
    assert(rows(SketchOps.mgSketch(
      toks.repartition(13), groups, "token", k)) === ref)
    // shard merge: counters never over-count, under-count bounded by
    // n/(k+1), and every key heavier than n/(k+1) survives (the
    // mergeable-summaries guarantees; merge is NOT exact recovery)
    def shard(i: Int) = docs.filter($"doc_id" % 3 === i)
      .select($"lang", explode(TextOps.tokenize($"text")).as("token"))
    val merged = (0 until 3)
      .map(i => SketchOps.mgSketch(shard(i), groups, "token", k))
      .reduce(SketchOps.mergeMgSketches(_, _, groups, "token", k))
    val est = rows(merged).map { case (g, t, c) => (g, t) -> c }.toMap
    val truth = counts.map { case (g, t, c) => (g, t) -> c }.toMap
    val n = counts.groupBy(_._1)
      .map { case (g, xs) => g -> xs.map(_._3).sum }
    assert(est.keySet.subsetOf(truth.keySet))
    est.foreach { case (kt, c) => assert(c <= truth(kt), s"$kt over") }
    truth.foreach { case ((g, t), c) =>
      val bound = n(g).toDouble / (k + 1)
      val under = c - est.getOrElse((g, t), 0L)
      assert(under.toDouble <= bound, s"$g/$t under=$under bound=$bound")
    }
  }

  test("kmvJoinCardinality: EXACT below k; within ~3/sqrt(k) above it; " +
       "disjoint keys estimate 0; partitioning-invariant") {
    import graft.ops.SketchOps
    import org.apache.spark.sql.functions.col
    // 12 distinct keys < k=64 → the sample holds every key → exact
    val a = (1 to 200).map(i => i % 12).toDF("ka")
    val b = (1 to 150).map(i => i % 10).toDF("kb")
    val exactSmall = (0 until 12).map(ka =>
      (1 to 200).count(_ % 12 == ka).toLong *
        (1 to 150).count(x => x % 10 == ka && ka < 10).toLong).sum
    val got = SketchOps.kmvJoinCardinality(a, "ka", b, "kb", 64, "t1")
      .select("n_kept", "est_join").as[(Long, Long)].head()
    assert(got._1 < 64 && got._2 === exactSmall)
    // 500 distinct many-to-many keys > k → estimator path; band check
    val rnd = new scala.util.Random(3)
    val bigA = (1 to 4000).map(_ => rnd.nextInt(500)).toDF("ka")
    val bigB = (1 to 3000).map(_ => rnd.nextInt(400)).toDF("kb")
    val exact = bigA.join(bigB, col("ka") === col("kb")).count()
    Seq(1, 9).foreach { p =>
      val e = SketchOps.kmvJoinCardinality(
          bigA.repartition(p), "ka", bigB.repartition(p), "kb",
          k = 128, salt = "t2")
        .select("est_join").as[Long].head()
      assert(math.abs(e - exact).toDouble / exact < 3.0 / math.sqrt(128),
        s"est=$e exact=$exact partitions=$p")
    }
    // disjoint key spaces → every sampled product is 0
    val d1 = (1 to 50).map(i => i).toDF("ka")
    val d2 = (1 to 50).map(i => i + 1000).toDF("kb")
    val dj = SketchOps.kmvJoinCardinality(d1, "ka", d2, "kb", 32, "t3")
      .select("est_join").as[Long].head()
    assert(dj === 0L)
  }
}
