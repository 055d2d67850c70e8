package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketch structures built from portable integer hashing.
  *
  * Unlike the built-in HLL++/KLL aggregates (used via
  * `approx_count_distinct`/`percentile_approx`, spec-only because their
  * internals are engine-specific), a count-min sketch is DETERMINISTIC
  * given its hash functions — with the repo's portable polynomial hash
  * it is reproducible across engines and therefore gate-checkable
  * (q111), while keeping the sketch property that matters at 100 TB:
  * the structure is a fixed d×w integer grid, mergeable by cell-wise
  * addition, no matter how many tokens stream through it.
  */
object SketchOps {

  /** Nonlinear mix: h² mod p (same prime as the polynomial hash). A
    * plain polynomial hash has ROW-INVARIANT differences — for two
    * same-length inputs, h_r(a) − h_r(b) depends only on where they
    * differ, not on the row/hash-index prefix — so two terms would
    * collide in every row or in none and the min-over-rows (or
    * all-k-bits test) would add nothing. Squaring breaks the additive
    * structure: h_a² − h_b² = (h_a − h_b)(h_a + h_b), and the sum DOES
    * vary with the prefix. Stays in BIGINT: h < 1e9+7 ⇒ h² < 1e18.
    */
  private def mix(h: Column): Column = pmod(h * h, lit(1000000007L))

  /** Row-r bucket of a term: mixed portable hash of (r:salt:term) mod
    * w. The row index is a PREFIX (suffixing it would make the d row
    * hashes consecutive integers).
    */
  private def bucket(
      term: Column, r: Column, w: Int, salt: String): Column =
    pmod(mix(TextOps.polyHash(
      concat(r.cast("string"), lit(s":$salt:"), term))), lit(w.toLong))

  /** Build a d×w count-min sketch over a term column: one exploded
    * pass (d copies per term occurrence), one map-side-combined
    * aggregate → (r, bucket, cnt) cells. Merge two sketches by
    * unioning and re-summing cells (algebraic — same contract as
    * mergeRollup).
    */
  def countMinSketch(
      terms: DataFrame, termCol: String,
      d: Int, w: Int, salt: String): DataFrame = {
    require(d > 0 && w > 0, "sketch dims must be positive")
    terms
      .select(col(termCol).as("__t"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col("r"), bucket(col("__t"), col("r"), w, salt).as("bucket"))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate term frequencies from a sketch: est(t) = min over
    * rows of cell(r, h_r(t)) — an upper bound on the true count (never
    * under-counts; over-counts only on bucket collisions). Probe terms
    * fan out to d cells each and equi-join the sketch — the sketch
    * itself is d×w rows, broadcastable at any corpus size.
    */
  def countMinEstimate(
      sketch: DataFrame, probes: DataFrame, termCol: String,
      d: Int, w: Int, salt: String): DataFrame =
    probes
      .select(col(termCol), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("bucket", bucket(col(termCol), col("r"), w, salt))
      .join(broadcast(sketch), Seq("r", "bucket"), "left_outer")
      .groupBy(col(termCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Per-group [[countMinSketch]] — one d×w sketch per group key
    * (per-language term frequencies, per-tenant event counts), built in
    * ONE exploded pass with the group columns folded into the cell key.
    * Unlike the grouped quantile build there is no two-level window
    * trick to need: the cell aggregate is already algebraic, so Spark's
    * partial aggregation IS the per-shard build and the final merge —
    * a hot group costs a wider partial map, never a single-task sort.
    * Output: groupCols + (r, bucket, cnt); ≤ |groups|·d·w rows.
    */
  def countMinSketchGrouped(
      terms: DataFrame, groupCols: Seq[String], termCol: String,
      d: Int, w: Int, salt: String): DataFrame = {
    require(d > 0 && w > 0, "sketch dims must be positive")
    require(groupCols.nonEmpty,
      "groupCols must be non-empty (use countMinSketch for a global sketch)")
    val g = groupCols.map(col)
    terms
      .select(g :+ col(termCol).as("__t"): _*)
      .withColumn("r", explode(sequence(lit(0), lit(d - 1))))
      .select(g ++ Seq(col("r"),
        bucket(col("__t"), col("r"), w, salt).as("bucket")): _*)
      .groupBy(g ++ Seq(col("r"), col("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-group point estimates: est(g, t) = min over rows of
    * cell(g, r, h_r(t)). The join is an equi-join on (group, r,
    * bucket); the sketch side is ≤ |groups|·d·w rows — broadcastable
    * for any realistic group count, but left to Catalyst/AQE here
    * since |groups| is data-dependent. Hash-independent of the group
    * (same salt ⇒ same buckets per term across groups), so cross-group
    * estimates are comparable.
    */
  def countMinEstimateGrouped(
      sketch: DataFrame, probes: DataFrame, groupCols: Seq[String],
      termCol: String, d: Int, w: Int, salt: String): DataFrame = {
    val g = groupCols.map(col)
    probes
      .select(g :+ col(termCol): _*)
      .withColumn("r", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("bucket", bucket(col(termCol), col("r"), w, salt))
      .join(sketch, groupCols ++ Seq("r", "bucket"), "left_outer")
      .groupBy(g :+ col(termCol): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Fold two grouped sketches built with the same (d, w, salt): union
    * and re-sum cells per (group, r, bucket). Exact/algebraic — the
    * merged sketch is cell-identical to a one-shot build over the
    * concatenated inputs (spec-checked per group in SketchOpsSpec).
    */
  def mergeCountMinSketchesGrouped(
      a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    a.unionByName(b)
      .groupBy(g ++ Seq(col("r"), col("bucket")): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  // ---------------------------------------------------------------- bloom

  /** r-th bit position of a key in an m-bit bloom filter: portable hash
    * of (r:salt:key) mod m — identical on build and probe side, so the
    * filter has NO false negatives by construction (false positives are
    * pruned by the exact join that follows). r is a prefix and the hash
    * is [[mix]]ed for the same independence reasons as [[bucket]]:
    * suffixing r would make the k bit positions consecutive (an
    * effectively 1-hash filter), and an unmixed polynomial would give
    * same-length keys row-invariant bit differences.
    */
  private def bloomBit(
      key: Column, r: Column, mBits: Int, salt: String): Column =
    pmod(mix(TextOps.polyHash(
      concat(r.cast("string"), lit(s":$salt:"), key.cast("string")))),
      lit(mBits.toLong))

  /** 1L << i for i in 0..63 — literal mask table so the probe needs no
    * variable-shift expression (Spark's shiftleft takes only literal
    * shifts).
    */
  private val WordMasks: Array[Long] = Array.tabulate(64)(i => 1L << i)

  /** Build an m-bit / k-hash bloom filter over a key column, as packed
    * 64-bit words. One exploded pass (k rows per key) + one
    * map-side-combined `bit_or` aggregate. The driver collect is bounded
    * BY CONSTRUCTION at mBits/64 longs — the size of the filter itself,
    * independent of build-side cardinality (at ~10 bits/key a 100M-key
    * dimension is a 125 MB filter: executor-shippable where the
    * dimension's row data is not).
    */
  def bloomBuild(
      keys: DataFrame, keyCol: String,
      mBits: Int, numHash: Int, salt: String): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0,
      "mBits must be a positive multiple of 64")
    require(numHash > 0, "numHash must be positive")
    // NULL keys are dropped: they can never match an equi-join anyway,
    // and a null hash would otherwise propagate into the word index
    // (NPE at collect). The probe side is consistent — mightContain of
    // a NULL key is NULL, which a filter drops.
    val cells = keys
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("__k"),
        explode(sequence(lit(0), lit(numHash - 1))).as("__r"))
      .select(bloomBit(col("__k"), col("__r"), mBits, salt).as("__bit"))
      .select(
        shiftright(col("__bit").cast("int"), 6).as("__w"),
        element_at(typedLit(WordMasks),
          (pmod(col("__bit"), lit(64L)) + 1).cast("int")).as("__m"))
      .groupBy(col("__w"))
      .agg(bit_or(col("__m")).as("__bits"))
      .collect()
    val words = new Array[Long](mBits / 64)
    cells.foreach(row => words(row.getInt(0)) = row.getLong(1))
    words
  }

  /** Merge two bloom filters built with the same (mBits, numHash, salt):
    * element-wise OR. Build per shard / per day / per partition and OR
    * the words together — the merged filter is EXACTLY the filter of
    * the union (bit_or is associative and commutative), which is what
    * makes the structure incremental at 100 TB.
    */
  def bloomMerge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length,
      "filters must share mBits (and be built with the same numHash/salt)")
    Array.tabulate(a.length)(i => a(i) | b(i))
  }

  /** Membership probe against a built filter: all k bits set. A pure
    * per-row expression over the literal word array — runs inside the
    * scan stage, so a fact table is pruned BEFORE its shuffle (semi-join
    * reduction): only rows that can possibly match travel to the join.
    */
  def bloomMightContain(
      key: Column, words: Array[Long], numHash: Int,
      salt: String): Column = {
    require(words.nonEmpty && numHash > 0, "empty filter or no hashes")
    val w = typedLit(words)
    forall(sequence(lit(0), lit(numHash - 1)), r => {
      val bit = bloomBit(key, r, words.length * 64, salt)
      val word = element_at(w, shiftright(bit.cast("int"), 6) + 1)
      val mask = element_at(typedLit(WordMasks),
        (pmod(bit, lit(64L)) + 1).cast("int"))
      word.bitwiseAND(mask) =!= lit(0L)
    })
  }

  // ------------------------------------------------------------ quantiles

  /** Deterministic bottom-k quantile sketch: keep the `k` rows whose
    * mixed portable hash of the KEY is smallest — a uniform
    * pseudo-random value sample that, unlike the built-in KLL behind
    * `percentile_approx` (engine-specific internals, spec-only), is
    *
    *   (a) deterministic across engines, runs, and partitionings (the
    *       priority is pure arithmetic on the key, so the sample is
    *       hash-checkable — the q111 count-min trick applied to
    *       quantiles);
    *   (b) algebraically mergeable:
    *       `bottomK(A ∪ B) == bottomK(bottomK(A) ∪ bottomK(B))` exactly
    *       (the k smallest priorities of the union survive any shard
    *       split), so shards/days sketch independently and fold with
    *       [[mergeQuantileSketches]] — never re-touching the data;
    *   (c) fixed-size: k rows no matter the input cardinality.
    *
    * Plans as TakeOrderedAndProject (per-partition heaps + one k-row
    * driver merge, no global sort). Estimation error is the standard
    * uniform-sample bound (~1/√k rank error); raise k to tighten.
    * Output: (__pri, `valueCol`).
    */
  def quantileSketch(
      df: DataFrame, keyCol: String, valueCol: String,
      k: Int, salt: String): DataFrame = {
    require(k > 0, "sketch size must be positive")
    df.select(
        mix(TextOps.polyHash(
          concat(col(keyCol).cast("string"), lit(s":$salt")))).as("__pri"),
        col(valueCol))
      .orderBy(col("__pri"), col(valueCol))
      .limit(k)
  }

  /** Fold two bottom-k sketches built with the same (k, salt): union
    * and re-take the bottom k. Exact — the merged sketch is the sketch
    * of the concatenated input.
    */
  def mergeQuantileSketches(
      a: DataFrame, b: DataFrame, valueCol: String, k: Int): DataFrame =
    a.unionByName(b)
      .orderBy(col("__pri"), col(valueCol))
      .limit(k)

  // ------------------------------------------------------------ quantiles

  /** Quantile point estimates from a sketch: the value at integer rank
    * `(n−1)·q_ppm div 1e6` of the value-sorted sample (the
    * "nearest-rank, lower" policy — integer-exact, engine-replayable,
    * no interpolation). Output: (q_ppm, est), one row per requested
    * quantile. The single-partition window is over the k-row sample,
    * never the data.
    */
  def quantileEstimates(
      sketch: DataFrame, valueCol: String,
      quantilesPpm: Seq[Long]): DataFrame = {
    require(quantilesPpm.nonEmpty &&
      quantilesPpm.forall(q => q >= 0L && q <= 1000000L),
      "quantiles must be in [0, 1e6] ppm")
    import org.apache.spark.sql.expressions.Window
    val spark = sketch.sparkSession
    import spark.implicits._
    val div = graft.functions.GraftColumns.longDiv _
    // bounded-domain contract: the global rank window runs over the
    // SKETCH (≤ k rows by construction), never the corpus
    val ranked = sketch
      .select(col(valueCol).as("__v"))
      .withColumn("__rk",
        row_number().over(Window.orderBy(col("__v"))).cast("long") - 1L)
    val n = sketch.agg(count(lit(1)).as("__n"))
    // resolve each quantile to its target rank FIRST (|quantiles| rows ×
    // a broadcast 1-row scalar), then EQUI-join the ranked sample on the
    // rank — a hash join, not a nested-loop condition join
    val targets = quantilesPpm.toDF("q_ppm")
      .crossJoin(broadcast(n))
      .select(col("q_ppm"),
        div((col("__n") - 1L) * col("q_ppm"), lit(1000000L)).as("__rk"))
    ranked.join(broadcast(targets), Seq("__rk"))
      .select(col("q_ppm"), col("__v").as("est"))
  }

  /** Per-group [[quantileSketch]]: keep the k rows with the smallest
    * mixed key hash WITHIN EACH GROUP — grouped percentiles (doc-length
    * p50/p95 per language, latency quantiles per tenant) at a fixed
    * k-row cost per group. Same properties as the global form:
    * deterministic (hash-checkable), exactly mergeable per group
    * ([[mergeQuantileSketchesGrouped]]), fixed-size. The global form
    * plans TakeOrderedAndProject; per group that becomes TWO window
    * passes — pass 1 ranks within (group, __pri mod `fanout`) so no
    * task ever sorts a hot group's full row set, pass 2 ranks the ≤
    * fanout·k survivors (the [[kmvSketch]] build shape; two-level ≡
    * single-level because the order (__pri, value) restricted to any
    * sub-bucket preserves the global bottom-k). Output: groupCols +
    * (__pri, `valueCol`).
    */
  def quantileSketchGrouped(
      df: DataFrame, groupCols: Seq[String], keyCol: String,
      valueCol: String, k: Int, salt: String,
      fanout: Int = 32): DataFrame = {
    require(k > 0 && fanout > 0, "k and fanout must be positive")
    require(groupCols.nonEmpty,
      "groupCols must be non-empty (use quantileSketch for a global sample)")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val pri = mix(TextOps.polyHash(
      concat(col(keyCol).cast("string"), lit(s":$salt")))).as("__pri")
    val ord = Seq(col("__pri").asc, col(valueCol).asc)
    df.select(g :+ pri :+ col(valueCol): _*)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(g :+ pmod(col("__pri"), lit(fanout.toLong)): _*)
          .orderBy(ord: _*)))
      .filter(col("__rk") <= k).drop("__rk")
      .withColumn("__rk", row_number().over(
        Window.partitionBy(g: _*).orderBy(ord: _*)))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Fold two grouped sketches built with the same (keyCol, k, salt):
    * union, re-take the per-group bottom k. Exact, like the global
    * merge.
    */
  def mergeQuantileSketchesGrouped(
      a: DataFrame, b: DataFrame, groupCols: Seq[String],
      valueCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    a.unionByName(b)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(groupCols.map(col): _*)
          .orderBy(col("__pri"), col(valueCol))))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Per-group quantile point estimates from a grouped sketch — the
    * [[quantileEstimates]] nearest-rank-lower policy applied within
    * each group. The target table is |groups| × |quantiles| rows
    * (group counts crossed with the literal quantile list — both
    * bounded), and the rank join is an equi-join on (group, rank).
    * Output: groupCols + (q_ppm, est).
    */
  def quantileEstimatesGrouped(
      sketch: DataFrame, groupCols: Seq[String], valueCol: String,
      quantilesPpm: Seq[Long]): DataFrame = {
    require(quantilesPpm.nonEmpty &&
      quantilesPpm.forall(q => q >= 0L && q <= 1000000L),
      "quantiles must be in [0, 1e6] ppm")
    import org.apache.spark.sql.expressions.Window
    val spark = sketch.sparkSession
    import spark.implicits._
    val div = graft.functions.GraftColumns.longDiv _
    val g = groupCols.map(col)
    val ranked = sketch
      .withColumn("__rk", row_number().over(
        Window.partitionBy(g: _*).orderBy(col(valueCol)))
        .cast("long") - 1L)
    val targets = sketch.groupBy(g: _*).agg(count(lit(1)).as("__n"))
      .crossJoin(broadcast(quantilesPpm.toDF("q_ppm")))
      .select(g :+ col("q_ppm") :+
        div((col("__n") - 1L) * col("q_ppm"), lit(1000000L)).as("__rk"): _*)
    ranked.join(targets, groupCols :+ "__rk")
      .select(g ++ Seq(col("q_ppm"), col(valueCol).as("est")): _*)
  }

  // ---------------------------------------------------------- cardinality

  /** Hash-space size of the portable mixed hash: values lie in [0, M).
    * The KMV estimator reads a hash as a uniform draw from this range.
    */
  private val HashSpace = 1000000007L

  /** KMV (k-minimum-values) distinct-count sketch per group: the k
    * smallest DISTINCT mixed portable hashes of the key within each
    * group — the cardinality companion to [[countMinSketch]]
    * (frequencies) and [[quantileSketch]] (ranks). Like those, it
    * trades the built-in HLL++ (`approx_count_distinct`, spec-only:
    * engine-specific registers) for a structure that is
    *
    *   (a) deterministic across engines/runs/partitionings — the kept
    *       hashes are pure arithmetic on the keys, so the sketch AND
    *       the estimate are hash-checkable (q143);
    *   (b) exactly mergeable: the k smallest distinct hashes of A ∪ B
    *       are recoverable from the two per-shard sketches
    *       ([[mergeKmvSketches]]), so shards/days sketch independently;
    *   (c) fixed-size: ≤ k rows per group regardless of cardinality.
    *
    * Scale shape: one distinct-shuffle on (group, hash), then per-group
    * bottom-k in TWO window passes — pass 1 ranks within (group,
    * hash mod `fanout`) so no single task ever sorts more than
    * ~distinct/fanout rows (a 100M-distinct hot group is a real input
    * at 100 TB), pass 2 ranks the ≤ fanout·k survivors per group. The
    * two-level result equals the single-level bottom-k exactly (every
    * globally-kept hash is also within its sub-bucket's bottom-k — the
    * merge property applied internally). Output: groupCols + __h.
    */
  def kmvSketch(
      df: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int, salt: String, fanout: Int = 32): DataFrame = {
    require(k > 0 && fanout > 0, "k and fanout must be positive")
    require(groupCols.nonEmpty,
      "groupCols must be non-empty (use a literal group for a global sketch)")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val h = mix(TextOps.polyHash(
      concat(col(keyCol).cast("string"), lit(s":$salt"))))
    val distinctHashes = df
      .filter(col(keyCol).isNotNull)
      .select(g :+ h.as("__h"): _*)
      .distinct()
    bottomKPerGroup(bottomKPerGroup(distinctHashes, groupCols, k,
      Window.partitionBy((g :+ pmod(col("__h"), lit(fanout.toLong))): _*)
        .orderBy(col("__h"))),
      groupCols, k,
      Window.partitionBy(g: _*).orderBy(col("__h")))
  }

  private def bottomKPerGroup(
      df: DataFrame, groupCols: Seq[String], k: Int,
      win: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
    df.withColumn("__rk", row_number().over(win))
      .filter(col("__rk") <= k)
      .drop("__rk")

  /** Fold two KMV sketches built with the same (keyCol, k, salt): union,
    * re-distinct (the same key may survive in both shards), and re-take
    * the bottom k per group. Exact — the merged sketch is the sketch of
    * the concatenated input.
    */
  def mergeKmvSketches(
      a: DataFrame, b: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    bottomKPerGroup(a.unionByName(b).distinct(), groupCols, k,
      Window.partitionBy(groupCols.map(col): _*).orderBy(col("__h")))
  }

  /** Distinct-count estimates from a KMV sketch: per group, if fewer
    * than k hashes were kept the count is EXACT (every distinct hash
    * survived); otherwise the standard KMV estimator
    * `(k−1)·M div h_(k)` — the k-th smallest of n uniform draws on
    * [0, M) sits near k·M/n, so inverting it estimates n with ~1/√k
    * relative error. Integer division end-to-end; engine-replayable.
    * Output: groupCols + (n_kept, est_distinct).
    */
  def kmvEstimate(
      sketch: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val div = graft.functions.GraftColumns.longDiv _
    sketch.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max(col("__h")).as("__kth"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(div(lit((k - 1L) * HashSpace),
            greatest(col("__kth"), lit(1L)))))
      .drop("__kth")
  }

  /** Set-operation estimates from two KMV sketches built with the same
    * (keyCol, k, salt) — the theta-sketch read path (Beyer et al. 2007;
    * the Apache DataSketches theta family): per group,
    *
    *   - merge to the union's bottom-k U (exact, [[mergeKmvSketches]]);
    *   - `n_shared` = hashes of U present in BOTH input sketches. Every
    *     h ∈ U is below both sides' retention thresholds (U's hashes
    *     are the globally smallest), so membership of h in A's sketch ⇔
    *     membership of the key in corpus A — U is a uniform distinct-key
    *     sample of A∪B with known intersection marks;
    *   - `est_union` = the [[kmvEstimate]] estimator on U (exact below
    *     k), `jaccard_ppm` = n_shared·1e6 div |U|, `est_intersection` =
    *     n_shared·est_union div |U| (all exact below k);
    *   - `containment_a_ppm` = n_shared·1e6 div n_a where n_a = U
    *     members present in A's sketch (and symmetrically b) — the
    *     ASYMMETRIC overlap "what fraction of A's distinct keys are in
    *     B", the standard benchmark-decontamination readout (an eval
    *     set fully contained in a training corpus has containment 1
    *     but near-zero Jaccard). n_a/n_kept is itself the
    *     |A|/|A∪B| fraction on the uniform sample, so the ratio
    *     n_shared/n_a estimates |A∩B|/|A|.
    *
    * Distinct-set overlap between corpora at a fixed k-row cost per
    * group — the cardinality-level contamination / coverage readout
    * (doc-level removal is q62's semi-join; this prices the overlap
    * without the join). Output: groupCols + (n_kept, n_shared,
    * est_union, est_intersection, jaccard_ppm, containment_a_ppm,
    * containment_b_ppm).
    */
  def kmvSetEstimate(
      a: DataFrame, b: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    val div = graft.functions.GraftColumns.longDiv _
    val keyCols = groupCols :+ "__h"
    val g = groupCols.map(col)
    val u = mergeKmvSketches(a, b, groupCols, k)
    // one row per (group, hash) in each sketch by construction, so the
    // left joins are 1:1 lookups and the flags are exact membership
    u.join(a.select(keyCols.map(col): _*)
          .withColumn("__ina", lit(1L)), keyCols, "left")
      .join(b.select(keyCols.map(col): _*)
          .withColumn("__inb", lit(1L)), keyCols, "left")
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_kept"), max(col("__h")).as("__kth"),
        sum(coalesce(col("__ina"), lit(0L))).as("n_a"),
        sum(coalesce(col("__inb"), lit(0L))).as("n_b"),
        sum(when(col("__ina").isNotNull && col("__inb").isNotNull, 1L)
          .otherwise(0L)).as("n_shared"))
      .withColumn("est_union",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(div(lit((k - 1L) * HashSpace),
            greatest(col("__kth"), lit(1L)))))
      .withColumn("est_intersection",
        div(col("n_shared") * col("est_union"), col("n_kept")))
      .withColumn("jaccard_ppm",
        div(col("n_shared") * lit(1000000L), col("n_kept")))
      .withColumn("containment_a_ppm",
        when(col("n_a") > 0L,
          div(col("n_shared") * lit(1000000L), col("n_a")))
          .otherwise(lit(0L)))
      .withColumn("containment_b_ppm",
        when(col("n_b") > 0L,
          div(col("n_shared") * lit(1000000L), col("n_b")))
          .otherwise(lit(0L)))
      .select((g ++ Seq(col("n_kept"), col("n_shared"),
        col("est_union"), col("est_intersection"), col("jaccard_ppm"),
        col("containment_a_ppm"), col("containment_b_ppm"))): _*)
  }

  /** Join-cardinality estimation from a KMV key sample — the optimizer
    * statistic that decides join strategy BEFORE paying for the join
    * (|A ⋈ B| can be orders of magnitude above both inputs under
    * many-to-many keys; knowing that early is what picks shuffle
    * strategy, skew handling, or an early abort at 100 TB).
    *
    * Estimator: the merged bottom-k sketch of A∪B's distinct key
    * hashes is a uniform distinct-key sample at exact rate
    * n_kept / U (U = the KMV union estimate). |A ⋈ B| = Σ_keys
    * ca(k)·cb(k), so the sample's Σ ca·cb scales by U div n_kept.
    * Per-key multiplicities attach by joining the ≤k-row sample to the
    * two per-key count tables ON THE KEY HASH (the hash is a pure
    * function of the key, so both engines replay it; a colliding pair
    * would merge two keys' counts deterministically — at M = 1e9+7 and
    * optimizer-grade accuracy, ignorable). Below k kept the estimate
    * is EXACT automatically (sample rate 1).
    *
    * Cost: two distinct-shuffles + two map-side-combined count
    * aggregates + joins against a ≤k-row side — never the join itself.
    * Output (one row): n_kept, est_union, sum_prod_sampled, est_join.
    */
  def kmvJoinCardinality(
      a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      k: Int, salt: String): DataFrame = {
    val div = graft.functions.GraftColumns.longDiv _
    def keyed(df: DataFrame, key: String) = df
      .filter(col(key).isNotNull)
      .select(col(key).as("__k")).withColumn("__g", lit("all"))
    val ska = kmvSketch(keyed(a, aKey), Seq("__g"), "__k", k, salt)
    val skb = kmvSketch(keyed(b, bKey), Seq("__g"), "__k", k, salt)
    val u = mergeKmvSketches(ska, skb, Seq("__g"), k)
    def hashCounts(df: DataFrame, key: String) = df
      .filter(col(key).isNotNull)
      .groupBy(mix(TextOps.polyHash(
        concat(col(key).cast("string"), lit(s":$salt")))).as("__h"))
      .agg(count(lit(1)).as("__c"))
    u
      .join(hashCounts(a, aKey).withColumnRenamed("__c", "__ca"),
        Seq("__h"), "left")
      .join(hashCounts(b, bKey).withColumnRenamed("__c", "__cb"),
        Seq("__h"), "left")
      .agg(count(lit(1)).as("n_kept"), max(col("__h")).as("__kth"),
        coalesce(sum(coalesce(col("__ca"), lit(0L)) *
          coalesce(col("__cb"), lit(0L))), lit(0L))
          .as("sum_prod_sampled"))
      .withColumn("est_union",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(div(lit((k - 1L) * HashSpace),
            greatest(col("__kth"), lit(1L)))))
      .select(col("n_kept"), col("est_union"), col("sum_prod_sampled"),
        div(col("sum_prod_sampled") * col("est_union"),
          greatest(col("n_kept"), lit(1L))).as("est_join"))
  }

  // -------------------------------------------------------- heavy hitters

  /** Misra–Gries heavy-hitters summary per group: the top-k keys by
    * count, each carrying its count REDUCED by the (k+1)-th largest
    * count in the group (the MG threshold; keys that don't clear it are
    * dropped). The frequency-TOP member of the deterministic sketch
    * family ([[countMinSketch]] point frequencies, [[kmvSketch]]
    * cardinality, [[quantileSketch]] ranks) — this is the offline
    * canonical form of the Misra–Gries stream summary, with the same
    * guarantees (n = group's total count):
    *
    *   - `cnt_lb` never over-counts: cnt_lb ≤ true count;
    *   - under-count is bounded: true − cnt_lb ≤ n/(k+1) (the k+1
    *     keys at or above the threshold each contribute ≥ t to n);
    *   - completeness: every key with true count > n/(k+1) is present.
    *
    * Unlike a plain top-k, the summary is MERGEABLE with those bounds
    * intact (Agarwal et al. 2012, "Mergeable Summaries"): sum counters
    * key-wise, re-threshold ([[mergeMgSketches]]) — shards/days
    * summarize independently and fold without re-touching the data.
    * No hashing anywhere, so the sketch is bit-replayable in plain SQL
    * (q145). Fixed ≤ k rows per group. Output: groupCols + (keyCol,
    * cnt_lb).
    *
    * Scale shape: exact counts are one map-side-combined shuffle; the
    * (k+1)-ranking is TWO window passes — pass 1 ranks within (group,
    * key-hash mod `fanout`) so no task ever sorts a hot group's full
    * vocabulary (a 100M-term group is a real input at 100 TB), pass 2
    * ranks the ≤ fanout·(k+1) survivors per group. Two-level ≡
    * single-level exactly: the global top-(k+1) under the total order
    * (count desc, key asc) is contained in every sub-bucket's
    * top-(k+1) under the same order.
    */
  def mgSketch(
      df: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int, fanout: Int = 32): DataFrame = {
    require(k > 0 && fanout > 0, "k and fanout must be positive")
    require(groupCols.nonEmpty,
      "groupCols must be non-empty (use a literal group for a global summary)")
    mgThreshold(
      df.filter(col(keyCol).isNotNull)
        .groupBy((groupCols :+ keyCol).map(col): _*)
        .agg(count(lit(1)).as("__c")),
      groupCols, keyCol, k, fanout)
  }

  /** Fold two MG summaries built with the same (keyCol, k): sum
    * counters key-wise, re-apply the (k+1)-th-largest threshold. The
    * error bounds compound additively and stay ≤ n_total/(k+1) — the
    * mergeable-summaries fold, not an exact recovery of the one-shot
    * summary (unlike the KMV/bottom-k merges, MG discards mass by
    * design).
    */
  def mergeMgSketches(
      a: DataFrame, b: DataFrame, groupCols: Seq[String],
      keyCol: String, k: Int, fanout: Int = 32): DataFrame =
    mgThreshold(
      a.unionByName(b)
        .groupBy((groupCols :+ keyCol).map(col): _*)
        .agg(sum(col("cnt_lb")).as("__c")),
      groupCols, keyCol, k, fanout)

  /** Shared MG reduction over a (groupCols, keyCol, __c) count table:
    * two-level top-(k+1) by (__c desc, key asc), subtract the rank-
    * (k+1) count, keep the strictly-positive survivors of ranks 1..k.
    */
  private def mgThreshold(
      counts: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int, fanout: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val sub = pmod(mix(TextOps.polyHash(col(keyCol).cast("string"))),
      lit(fanout.toLong))
    val ord = Seq(col("__c").desc, col(keyCol).asc)
    val top = counts
      .withColumn("__rk", row_number().over(
        Window.partitionBy(g :+ sub: _*).orderBy(ord: _*)))
      .filter(col("__rk") <= k + 1).drop("__rk")
      .withColumn("__rk", row_number().over(
        Window.partitionBy(g: _*).orderBy(ord: _*)))
      .filter(col("__rk") <= k + 1)
    val t = coalesce(
      max(when(col("__rk") === k + 1, col("__c")))
        .over(Window.partitionBy(g: _*)), lit(0L))
    top.withColumn("__t", t)
      .filter(col("__rk") <= k && col("__c") - col("__t") > 0)
      .select(g ++ Seq(col(keyCol),
        (col("__c") - col("__t")).as("cnt_lb")): _*)
  }
}
