package graft.ops

import graft.ops.Checkpointer._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-curation operators that need a DataFrame (join/sample) shape
  * rather than a per-row expression: benchmark decontamination and
  * deterministic stratified sampling — the two standard steps between
  * dedup and training-set assembly.
  */
object CurationOps {

  /** Benchmark decontamination: per document, the number of DISTINCT
    * n-gram shingles it shares with the evaluation corpus. Training
    * docs overlapping an eval/benchmark set leak test data — the
    * curation rule is "drop docs with ≥ k shared n-grams".
    *
    * Shape: the eval set's distinct shingle hashes form one side of an
    * inverted-index equi-join (an eval corpus is vastly smaller than
    * the training corpus, so this side broadcasts); the training
    * corpus streams through exploded and never self-joins. Returns
    * (idCol, n_shared) for docs with ≥1 shared shingle.
    */
  def evalOverlap(
      docs: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalTextCol: String, n: Int): DataFrame = {
    val evalShingles = evalDocs
      .select(explode(TextOps.shingleHashes(col(evalTextCol), n)).as("__h"))
      .distinct()
    docs
      .select(col(idCol),
        explode(TextOps.shingleHashes(col(textCol), n)).as("__h"))
      .join(broadcast(evalShingles), Seq("__h"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Cross-document paragraph deduplication (the C4 rule: drop every
    * repeated occurrence of a line/paragraph ACROSS the whole corpus,
    * keeping only its globally-first occurrence by (id, position)).
    *
    * Scale shape: explode to (id, idx, line), then ONE aggregation —
    * `min(struct(id, idx))` grouped by line — picks each line's first
    * occurrence. min is algebraic, so map-side partial aggregation
    * absorbs the hot keys (site-wide boilerplate appears in millions of
    * docs; a row_number window over `partition by line` would funnel
    * every occurrence of the hottest line through one task — this
    * formulation never materializes more than one (line, min) pair per
    * map partition). Reassembly is a second keyed aggregation on id.
    *
    * Returns (idCol, textCol, n_kept); documents whose every line was
    * seen earlier disappear from the output (zero kept lines).
    */
  def dedupParagraphsGlobal(
      df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    val lines = df.select(
      col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__idx", "__line")))
    val firsts = lines
      .groupBy(col("__line"))
      .agg(min(struct(col(idCol), col("__idx"))).as("__first"))
      .select(
        col("__first")(idCol).as(idCol),
        col("__first")("__idx").as("__idx"),
        col("__line"))
    firsts
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("__idx"), col("__line")))),
            _.getField("__line")),
          sep).as(textCol),
        count(lit(1)).as("n_kept"))
  }

  /** Corpus-relative quality filtering: keep the documents whose integer
    * score is at or above the corpus's descending nearest-rank
    * percentile threshold for `keepPerMille` (e.g. 400 = keep the top
    * ~40%, ties at the threshold included — so the kept count can
    * exceed the target by the tie width, never undershoot it).
    *
    * Scale shape: the threshold comes from a HISTOGRAM of the score
    * (one map-side-combined groupBy over a domain of ≤ a few hundred
    * distinct integer values — collected rows are bounded by the score
    * DOMAIN, not the corpus), then one codegen'd filter pass. The
    * row_number-over-everything formulation this replaces funnels the
    * corpus through one reducer. `scoreCol` must be low-cardinality
    * integer (our quality scores are 0-100 by construction).
    */
  def qualityPercentileFilter(
      df: DataFrame, scoreCol: String, keepPerMille: Int): DataFrame = {
    require(keepPerMille > 0 && keepPerMille <= 1000,
      "keepPerMille must be in (0, 1000]")
    // null scores are excluded from BOTH the histogram and the kept set
    // (the final >= filter drops them anyway); without this a single
    // null row NPEs the driver-side threshold scan and skews `total`
    val hist = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol)).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getAs[Long]("n")))
      .sortBy(-_._1)
    val total = hist.map(_._2).sum
    if (total == 0L) df
    else {
      val k = math.max(1L, (total * keepPerMille + 999) / 1000)
      var cum = 0L
      var threshold = Long.MinValue
      val it = hist.iterator
      while (cum < k && it.hasNext) {
        val (s, n) = it.next(); cum += n; threshold = s
      }
      df.filter(col(scoreCol) >= threshold)
    }
  }

  /** Deterministic stratified sampling: row survives iff
    * hash(key:salt) mod 1000 < ratePerMille(group). The data-mixing
    * primitive ("keep 30% of web, all of books"): a pure function of
    * (key, salt, group), so the sample is reproducible across runs,
    * engines, repartitionings, and incremental corpus growth — the
    * same property as TextOps.stableSplit, applied per stratum.
    * Unknown groups get `defaultPerMille`.
    */
  def stratifiedSample(
      df: DataFrame, keyCol: String, groupCol: String, salt: String,
      ratesPerMille: Map[String, Int],
      defaultPerMille: Int = 0): DataFrame = {
    val rate = ratesPerMille.toSeq.sortBy(_._1)
      .foldRight(lit(defaultPerMille.toLong)) { case ((g, r), acc) =>
        when(col(groupCol) === g, lit(r.toLong)).otherwise(acc)
      }
    val h = pmod(
      TextOps.polyHash(concat(col(keyCol).cast("string"), lit(":" + salt))),
      lit(1000L))
    df.filter(h < rate)
  }

  /** Per-key cap (hot-domain downsampling): keep at most `maxN` rows
    * per value of `keyCol`, chosen deterministically as the `maxN`
    * smallest portable hashes of `idCol` — i.e. a fixed uniform random
    * sample per key, stable across runs, partitionings, and engines.
    * The web-corpus rule: no single domain may dominate the training
    * mix.
    *
    * Scale shape: a single row_number over `keyCol` funnels each hot
    * key through ONE task — a domain with 10⁸ pages serializes. This
    * runs the classic two-level exact top-N instead: rows first rank
    * within (key, hash-bucket) sub-partitions — `nBuckets`-way
    * parallel even for one key — and only the ≤ nBuckets×maxN
    * per-bucket survivors reach the per-key rank. The global top-maxN
    * is a subset of the per-bucket top-maxNs, so the two-phase result
    * is EXACTLY the single-window result (the conformance oracle is
    * that single window).
    *
    * Ordering is total — (hash, id) — so ties in the hash can't make
    * the kept set ambiguous.
    */
  def capPerKey(
      df: DataFrame, keyCol: String, idCol: String, maxN: Int,
      salt: String, nBuckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = TextOps.polyHash(
      concat(col(idCol).cast("string"), lit(":" + salt)))
    val withH = df.withColumn("__h", h)
      .withColumn("__b", pmod(col("__h"), lit(nBuckets.toLong)))
    val local = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col("__h").asc, col(idCol).asc)
    val global = Window.partitionBy(col(keyCol))
      .orderBy(col("__h").asc, col(idCol).asc)
    withH
      .withColumn("__lr", row_number().over(local))
      .filter(col("__lr") <= maxN)
      .withColumn("__gr", row_number().over(global))
      .filter(col("__gr") <= maxN)
      .drop("__h", "__b", "__lr", "__gr")
  }

  /** Corpus-rarity scoring — the integer-portable analogue of unigram
    * perplexity filtering: score = mean inverse corpus frequency of the
    * document's tokens, in ppm (token with corpus count c contributes
    * 1e6 ∕ c; all-rare gibberish → ~1e6, all-boilerplate → ~0). Both
    * filtering tails are useful: high cut drops OCR noise / random
    * strings, low cut drops templated boilerplate — same role as an LM
    * perplexity filter, but exact integer arithmetic end to end (a real
    * -log p would hash-drift on transcendental ulps; monotonicity in
    * token frequency is what the filter needs).
    *
    * Shape: explode → vocabulary-sized frequency aggregate → equi-join
    * back (AQE broadcasts it when small) → per-doc mean. No global
    * window, no rank — scales as two shuffles on (term) and (doc).
    */
  def rarityScorePpm(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(TextOps.tokenize(col(textCol)), t => t =!= "")
    val docTok = df.select(col(idCol), explode(toks).as("__term"))
    val freq = docTok.groupBy(col("__term"))
      .agg(count(lit(1)).as("__cnt"))
    docTok.join(freq, Seq("__term"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(expr("1000000 div __cnt")).as("__sum_inv"))
      .withColumn("rarity_ppm", expr("__sum_inv div n_tokens"))
      .drop("__sum_inv")
  }

  /** Deterministic data-mixture sampling: downsample each class (source,
    * domain, language, ...) toward target proportions — the training-mix
    * step (Pile-style source weighting) between curation and packing.
    *
    * `weightsPpm(class)` is the class's target share of `nTarget` rows
    * in parts-per-million. Per class: rate_ppm = min(1e6,
    * nTarget·w_ppm ∕ count) in exact integer arithmetic, and a row
    * survives iff polyhash(key:salt) mod 1e6 < rate_ppm — the same
    * pure-hash contract as [[stratifiedSample]]/stableSplit, so the
    * sample is reproducible across runs, partitionings, engines, and
    * incremental corpus growth (only rate changes re-deal, not layout).
    * Classes absent from the weight map are dropped (rate 0).
    *
    * Shape: one map-side-combined count per class (class-cardinality
    * aggregate), broadcast back as rates, then a scan-speed hash
    * filter. Oversubscribed classes (needed > available) cap at keep-
    * everything; the realized mix then under-represents them — report
    * via the returned rate column rather than silently resampling
    * others.
    */
  def mixtureSample(
      df: DataFrame, keyCol: String, classCol: String,
      weightsPpm: Map[String, Long], nTarget: Long,
      salt: String): DataFrame = {
    require(nTarget > 0, "nTarget must be positive")
    require(weightsPpm.values.forall(_ >= 0), "weights must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val w = weightsPpm.toSeq.toDF(classCol, "__w_ppm")
    val rates = df.groupBy(col(classCol))
      .agg(count(lit(1)).as("__c"))
      .join(w, Seq(classCol))
      .withColumn("__rate_ppm",
        least(lit(1000000L), expr(s"($nTarget * __w_ppm) div __c")))
      .select(col(classCol), col("__rate_ppm"))
    val h = pmod(TextOps.polyHash(
      concat(col(keyCol).cast("string"), lit(":" + salt))), lit(1000000L))
    df.join(broadcast(rates), Seq(classCol))
      .filter(h < col("__rate_ppm"))
      .drop("__rate_ppm")
  }

  /** Temperature-smoothed mixture sampling at α = 0.5 (the standard
    * multilingual rebalancing: target share ∝ count^α flattens the
    * head without exploding the tail — α = 0.5 makes the smoothing an
    * exact integer sqrt, no transcendental drift): class keep-rate =
    * min(1e6, nTarget·√c_i·1e6 div (Σ_j √c_j · c_i)) ppm, keep
    * decision the same pure (key, salt) hash as [[mixtureSample]].
    *
    * √ is floor(IEEE sqrt(double)) — exact floor for any count below
    * 2^50 (sqrt of an exact small integer is correctly rounded and an
    * irrational true root sits ≥ 1/(2√c) from the nearest integer,
    * far beyond the ulp), so both engines derive identical rates.
    * Class spine is |classes|-sized; totals attach as a broadcast
    * 1-row aggregate.
    */
  def temperatureMixtureSample(
      df: DataFrame, keyCol: String, classCol: String, nTarget: Long,
      salt: String): DataFrame = {
    require(nTarget > 0, "nTarget must be positive")
    val div = graft.functions.GraftColumns.longDiv _
    val sq = df.groupBy(col(classCol))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__s", floor(sqrt(col("__c").cast("double")))
        .cast("long"))
    val tot = sq.agg(sum(col("__s")).as("__ts"))
    val rates = sq.crossJoin(broadcast(tot))
      .withColumn("__rate_ppm", least(lit(1000000L),
        div(lit(nTarget) * col("__s") * 1000000L,
          col("__ts") * col("__c"))))
      .select(col(classCol), col("__rate_ppm"))
    val h = pmod(TextOps.polyHash(
      concat(col(keyCol).cast("string"), lit(":" + salt))), lit(1000000L))
    df.join(broadcast(rates), Seq(classCol))
      .filter(h < col("__rate_ppm"))
      .drop("__rate_ppm")
  }

  /** Deterministic source-weighted UPSAMPLING (epoch mixing — the
    * "2.7 epochs of source A" step of a pre-training data recipe, the
    * complement of [[mixtureSample]]'s down-sampling): every document
    * of class c repeats `factorsPpm(c)/1e6` times — full copies for the
    * integer part, plus one extra copy when the document's hash lands
    * under the fractional part. Survival and copy count are pure
    * functions of (key, salt, class), so the expanded corpus is
    * identical across runs, engines, and partitionings. Classes absent
    * from the factor map are dropped (same contract as mixtureSample);
    * a `copy_id` column (1-based) distinguishes replicas for
    * downstream shuffling/salting.
    *
    * Scale: one broadcast join (factor table = #classes rows) + one
    * explode; output grows by exactly the recipe factor — no shuffle.
    */
  def upsampleMixture(
      df: DataFrame, keyCol: String, classCol: String,
      factorsPpm: Map[String, Long], salt: String): DataFrame = {
    require(factorsPpm.values.forall(_ >= 0), "factors must be >= 0")
    require(!df.columns.contains("copy_id"),
      "input already has a copy_id column")
    val spark = df.sparkSession
    import spark.implicits._
    val div = graft.functions.GraftColumns.longDiv _
    val f = factorsPpm.toSeq.toDF(classCol, "__f_ppm")
    val h = pmod(TextOps.polyHash(
      concat(col(keyCol).cast("string"), lit(":" + salt))), lit(1000000L))
    df.join(broadcast(f), Seq(classCol))
      .withColumn("__copies",
        div(col("__f_ppm"), lit(1000000L)) +
          when(h < pmod(col("__f_ppm"), lit(1000000L)), lit(1L))
            .otherwise(lit(0L)))
      .filter(col("__copies") > 0)
      .withColumn("copy_id",
        explode(sequence(lit(1L), col("__copies"))))
      .drop("__f_ppm", "__copies")
  }

  /** Priority sampling (inspired by Duffield–Lund–Thorup, JACM 2007):
    * deterministic weighted sampling without replacement. Each key draws
    * a pseudo-uniform u ∈ [1, 1e6] from the portable hash of (key:salt)
    * and gets priority w·1e6 div u; the sample is the top-k by priority
    * — items are included with probability increasing in weight. (Only
    * the top-k rows are returned, so the (k+1)-th-priority threshold
    * that DLT subset-sum *estimation* needs is not part of this output;
    * this operator is the selection step only.)
    *
    * Weights must be in [0, Long.MaxValue/1e6 ≈ 9.2e12] — a row outside
    * that domain raises an error rather than silently wrapping BIGINT.
    * The priority itself is computed in two steps
    * (`(w div u)·1e6 + ((w mod u)·1e6) div u`, algebraically equal to
    * `w·1e6 div u`) so no intermediate product overflows anywhere in
    * the valid domain.
    *
    * 100 TB shape: top-k plans as TakeOrderedAndProject — per-partition
    * heaps + one k-row merge at the driver, no global sort. The
    * deterministic u makes the sample reproducible across engines, runs,
    * and partitionings.
    */
  def prioritySample(
      df: DataFrame, keyCol: String, weightCol: String,
      salt: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(!df.columns.contains("priority") && !df.columns.contains("__u"),
      "input already has a priority/__u column")
    val div = graft.functions.GraftColumns.longDiv _
    val maxW = Long.MaxValue / 1000000L
    val w = col(weightCol).cast("long")
    val u = col("__u")
    df
      .withColumn("__u", pmod(TextOps.polyHash(
        concat(col(keyCol).cast("string"), lit(":" + salt))),
        lit(1000000L)) + 1)
      .withColumn("priority",
        when(w < 0 || w > maxW, raise_error(concat(
          lit(s"prioritySample: weight out of [0, $maxW]: "),
          w.cast("string"))))
          .otherwise(
            div(w, u) * lit(1000000L) + div(pmod(w, u) * lit(1000000L), u)))
      .orderBy(col("priority").desc, col(keyCol))
      .limit(k)
      .drop("__u")
  }

  /** A-ES weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    * 2006), integer-exact: each key draws a pseudo-uniform
    * u = v/2^20 (v = mixed portable hash + 1 ∈ [1, 2^20]) and gets the
    * exponential-jitter key `E/w` where E = −log2(u) — the top-k by
    * SMALLEST key is distributed exactly as k sequential weighted
    * draws without replacement (A-ES keys u^(1/w) largest ⇔ −log2(u)/w
    * smallest; the ln↔log2 base change is a global constant that
    * cancels in the ordering). This is the true-WOR companion to
    * [[prioritySample]] (whose w·1e6/u priorities implement the
    * Duffield–Lund–Thorup scheme — a different inclusion law).
    *
    * NO transcendental functions: −log2(u) is computed in Q20 fixed
    * point by the classic normalize-then-20-square-steps binary-log
    * recurrence — pure integer multiply/divide/compare, so any engine
    * replays every key bit-for-bit (the q142 oracle runs the identical
    * recurrence in SQL). Per-row cost is 20 integer steps regardless
    * of the weight's magnitude (the naive max-of-w-hashes equivalent
    * is O(w)).
    *
    * key = ((20−p)·2^20 − frac) · 1e6 div w, where p = ⌊log2 v⌋ and
    * frac = 20 square-step bits; E ≤ 20·2^20 so the product never
    * nears Long range. Weights must be ≥ 1 (raises otherwise). Top-k
    * plans as TakeOrderedAndProject. Output: input columns + aes_key,
    * k rows with the smallest (aes_key, keyCol).
    */
  def weightedSampleAes(
      df: DataFrame, keyCol: String, weightCol: String,
      salt: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(!df.columns.contains("aes_key") && !df.columns.contains("__v"),
      "input already has an aes_key/__v column")
    val div = graft.functions.GraftColumns.longDiv _
    val q30 = 1073741824L  // 2^30
    val q31 = 2147483648L  // 2^31
    val h = TextOps.polyHash(
      concat(col(keyCol).cast("string"), lit(":" + salt)))
    val v = pmod(pmod(h * h, lit(1000000007L)), lit(1048576L)) + 1L
    val w = col(weightCol).cast("long")
    val p = (length(bin(col("__v"))) - 1).cast("long")
    // normalize v to Q30 in [2^30, 2^31): y0 = v · 2^(30−p); p ≤ 20 so
    // the power-of-two factor is exact in double and the cast is exact
    val y0 = (col("__v") * pow(lit(2.0), lit(30L) - p).cast("long"))
    // 20 binary-log square steps: y ← y² (Q30); overflow past 2 shifts
    // out one integer bit and records a 1 in the fraction accumulator
    val stepped = aggregate(
      sequence(lit(1), lit(20)),
      struct(y0.as("y"), lit(0L).as("acc")),
      (s, _) => {
        val y2 = div(s.getField("y") * s.getField("y"), lit(q30))
        when(y2 >= q31,
          struct(div(y2, lit(2L)).as("y"),
            (s.getField("acc") * 2L + 1L).as("acc")))
          .otherwise(
            struct(y2.as("y"), (s.getField("acc") * 2L).as("acc")))
      })
    val eQ20 = (lit(20L) - p) * lit(1048576L) - stepped.getField("acc")
    df
      .withColumn("__v", v)
      .withColumn("aes_key",
        when(w < 1L, raise_error(concat(
          lit("weightedSampleAes: weight must be >= 1, got "),
          w.cast("string"))))
          .otherwise(div(eQ20 * lit(1000000L), w)))
      .orderBy(col("aes_key"), col(keyCol))
      .limit(k)
      .drop("__v")
  }

  /** Hashed token-bucket counts of a corpus: (bucket, ct) over
    * occurrences (with multiplicity), plus the total under `__n` on
    * every row — the sufficient statistics for DSIR-style importance
    * weighting. dim bounds the table size regardless of corpus size.
    */
  def bucketFreqs(
      docs: DataFrame, textCol: String, dim: Int,
      salt: String): DataFrame =
    docs
      .select(explode(
        ClassifierOps.featureBuckets(col(textCol), dim, salt)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("ct"))

  /** DSIR-style importance ratios (Xie et al. 2023, integer log-free
    * variant): per observed source bucket,
    * `ratio_micro = 1e6·p_target div p_source` with both proportions in
    * add-one-smoothed micros (`p = 1e6·(ct+1) div (N+dim)`). Buckets
    * unseen in the target get the smoothed floor. The two-step micro
    * form keeps every product ≤ ~1e12 at any corpus size (a direct
    * cross-multiplied ratio would overflow BIGINT at 100 TB token
    * counts). Output: (bucket, ratio_micro) — at most dim rows,
    * broadcastable by construction.
    */
  def importanceRatios(
      target: DataFrame, source: DataFrame, textCol: String,
      dim: Int, salt: String): DataFrame = {
    val div = graft.functions.GraftColumns.longDiv _
    // One corpus pass per side: the frequency tables are ≤ dim rows BY
    // CONSTRUCTION, so materializing them (localCheckpoint) is bounded
    // and everything downstream — totals, the ratio join, the eventual
    // broadcast — reads the dim-row tables, never the corpus again.
    val tf = bucketFreqs(target, textCol, dim, salt).graftCheckpoint()
    val sf = bucketFreqs(source, textCol, dim, salt).graftCheckpoint()
    // coalesce: an EMPTY corpus must yield total 0 (sum over zero rows
    // is NULL), so the smoothed proportions degrade to the add-one
    // floor instead of NULLing every ratio in the output table.
    val tN = tf.agg(coalesce(sum(col("ct")), lit(0L)).as("__nt"))
    val sN = sf.agg(coalesce(sum(col("ct")), lit(0L)).as("__ns"))
    sf.withColumnRenamed("ct", "ct_s")
      .join(tf.withColumnRenamed("ct", "ct_t"), Seq("bucket"), "left_outer")
      .crossJoin(broadcast(tN)).crossJoin(broadcast(sN))
      .select(col("bucket"),
        div(lit(1000000L) *
            div(lit(1000000L) * (coalesce(col("ct_t"), lit(0L)) + 1L),
              col("__nt") + lit(dim.toLong)),
          greatest(
            div(lit(1000000L) * (col("ct_s") + 1L),
              col("__ns") + lit(dim.toLong)), lit(1L))).as("ratio_micro"))
  }

  /** Score documents by mean hashed-bucket importance ratio (micros) —
    * the DSIR data-selection signal: high scores mean the document's
    * token distribution looks like the target domain. One explode +
    * one broadcast join (ratio table ≤ dim rows) + per-doc re-agg;
    * docs with no tokens score 0.
    */
  def dsirScore(
      docs: DataFrame, idCol: String, textCol: String,
      ratios: DataFrame, dim: Int, salt: String): DataFrame =
    // explode_OUTER keeps token-less documents as one null-bucket row:
    // every document survives in ONE corpus pass (no join-back scan);
    // the null row matches nothing in the ratio table, count(bucket)
    // skips it, and the all-null sum coalesces to score 0.
    docs
      .select(col(idCol), explode_outer(
        ClassifierOps.featureBuckets(col(textCol), dim, salt)).as("bucket"))
      .join(broadcast(ratios), Seq("bucket"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(col("bucket")).as("n_feats"),
        sum(when(col("bucket").isNotNull,
          coalesce(col("ratio_micro"), lit(0L)))).as("__sr"))
      .select(col(idCol),
        col("n_feats"),
        coalesce(graft.functions.GraftColumns.longDiv(
          col("__sr"), col("n_feats")), lit(0L)).as("score_micro"))

  /** Blocklist filtering (the bad-word/bad-domain curation stage): per
    * document, count token occurrences that hit a blocklist TABLE and
    * keep documents whose hit ratio stays at or below
    * `maxRatioMilli` per mille of their token count.
    *
    * The blocklist is a relation, not a regex alternation: a
    * million-entry list joins as an ordinary (broadcast when small,
    * shuffled when not) equi-join on the token, where a compiled
    * `term1|term2|…` pattern degrades linearly in list size per row
    * and can't be pushed into a join at all. Exact-token semantics
    * (not substring) — blocklists of words/domains are token-shaped;
    * substring policies belong to redactPii-style scan expressions.
    *
    * One corpus pass: explode_outer keeps token-less documents (0
    * hits, always kept); hits counted with map-side combine on the
    * doc-id shuffle. Output: (id, n_tokens, hits, hit_ratio_milli,
    * kept) — callers filter on `kept`; emitting the flag keeps the
    * decision auditable (the reject stream is the complement).
    */
  def blocklistFilter(
      docs: DataFrame, idCol: String, textCol: String,
      blocklist: DataFrame, termCol: String,
      maxRatioMilli: Long): DataFrame = {
    require(maxRatioMilli >= 0, "ratio is per-mille")
    val div = graft.functions.GraftColumns.longDiv _
    val bl = blocklist.select(col(termCol).as("__term")).distinct()
    docs
      .select(col(idCol),
        explode_outer(TextOps.tokenize(col(textCol))).as("__tok"))
      .join(bl, col("__tok") === col("__term"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(col("__tok")).as("n_tokens"),
        count(col("__term")).as("hits"))
      .select(col(idCol), col("n_tokens"), col("hits"),
        // token-less docs (null/empty text) are 0-hit, ratio 0 — a bare
        // div would raise DIVIDE_BY_ZERO under ANSI mode
        when(col("n_tokens") > 0, div(col("hits") * 1000L, col("n_tokens")))
          .otherwise(lit(0L)).as("hit_ratio_milli"))
      .withColumn("kept", col("hit_ratio_milli") <= maxRatioMilli)
  }

  /** Robust per-group winsorization: clip each row's value into
    * [median − k·MAD, median + k·MAD] of its group (MAD = median
    * absolute deviation — the robust outlier fence; mean ± k·σ moves
    * with the very outliers it should fence off, median/MAD doesn't).
    *
    * Exact medians WITHOUT sorting any group's raw rows: both median
    * passes run over the per-group VALUE HISTOGRAM — groupBy(group,
    * value) with map-side combine collapses the rows, then the
    * cumulative-count window walks distinct values only (bounded by
    * the value domain, not the row count: a billion-row group with
    * 50k distinct cents values windows over 50k rows). Nearest-rank-
    * lower on (n+1) div 2, the q140/q146 rank policy.
    *
    * `valueCol` must already be integer units (cents/micros — the
    * determinism contract). Output: input columns + (med, mad,
    * clipped) where clipped = least(greatest(v, lo), hi).
    */
  def robustClip(
      df: DataFrame, groupCol: String, valueCol: String,
      k: Long = 3L): DataFrame = {
    require(k >= 0, "k must be >= 0")
    val withMed = df.join(
      histogramMedian(df, groupCol, valueCol)
        .withColumnRenamed("__median", "med"), Seq(groupCol))
    val dev = withMed.withColumn("__dev",
      abs(col(valueCol) - col("med")))
    val withMad = dev.join(
      histogramMedian(dev, groupCol, "__dev")
        .withColumnRenamed("__median", "mad"), Seq(groupCol))
    withMad
      .withColumn("clipped",
        least(greatest(col(valueCol), col("med") - lit(k) * col("mad")),
          col("med") + lit(k) * col("mad")))
      .drop("__dev")
  }

  /** Per-group percentile-rank normalization (score calibration): each
    * row gets pct_ppm = strictly-below-count · 1e6 div group size —
    * the rank transform that makes a quality threshold comparable
    * ACROSS groups (a 0.7-quantile cut means the same thing in every
    * language, where a raw-score cut does not; per-language percentile
    * gates are the standard multilingual curation calibration).
    *
    * Same scale shape as [[robustClip]]: the cumulative window walks
    * the per-group VALUE HISTOGRAM (distinct values), never raw rows;
    * the per-row attach is one (group, value) equi-join back. Exact,
    * integer, deterministic — ties share a pct_ppm by construction.
    *
    * Output: input columns + pct_ppm ∈ [0, 1e6).
    */
  def percentileNormalize(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val div = graft.functions.GraftColumns.longDiv _
    val hist = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col(groupCol))
    val pct = hist
      .withColumn("__below", sum(col("__c")).over(w) - col("__c"))
      .withColumn("__n", sum(col("__c")).over(tot))
      .select(col(groupCol), col(valueCol),
        div(col("__below") * 1000000L, col("__n")).as("pct_ppm"))
    df.join(pct, Seq(groupCol, valueCol))
  }

  /** Exact per-group median over the value histogram (nearest-rank-
    * lower at (n+1) div 2): one map-side-combined groupBy collapses
    * rows to (group, value, cnt), one window walks each group's
    * DISTINCT values in order. Returns (group, __median).
    */
  /** KL(P‖Q) domain-shift score between two corpora over hashed token
    * buckets (the DSIR feature space, [[bucketFreqs]]), in Q20 fixed
    * point: with add-one smoothing ap = cp_b+1, aq = cq_b+1,
    * denP = Np+dim, denQ = Nq+dim,
    * `KL = Σ_b (ap/denP)·log2((ap·denQ)/(aq·denP))`, every log a
    * separate [[graft.functions.GraftColumns.binLog2Q20]] call (q153
    * rule: no product near Long range at any corpus size) and the
    * division deferred to the final total so all per-bucket state is
    * integer-exact.
    *
    * Output: one row per bucket 0..dim−1 (including unseen buckets —
    * smoothing gives them mass, so dropping them would bias the
    * divergence): (bucket, cp, cq, l_q20) plus the corpus-level
    * `kl_q20 = Σ ap·l_q20 div denP` attached as an in-plan 1-row
    * scalar. Monitors ingestion drift / quantifies domain shift
    * between data recipes; `klDivergenceQ20(p,q) ≠ klDivergenceQ20(q,p)`
    * by design (use the symmetrized sum if needed).
    *
    * Scale design: two corpus passes (one per side) reduce to dim-row
    * frequency tables; everything downstream joins/aggregates ≤ dim
    * rows. The totals ride as broadcast 1-row aggregates.
    */
  def klDivergenceQ20(
      p: DataFrame, q: DataFrame, textCol: String,
      dim: Int, salt: String): DataFrame = {
    val lg = graft.functions.GraftColumns.binLog2Q20 _
    val div = graft.functions.GraftColumns.longDiv _
    val pf = bucketFreqs(p, textCol, dim, salt).graftCheckpoint()
    val qf = bucketFreqs(q, textCol, dim, salt).graftCheckpoint()
    val spine = p.sparkSession.range(dim.toLong)
      .select(col("id").cast("long").as("bucket"))
    val np = pf.agg(coalesce(sum(col("ct")), lit(0L)).as("__np"))
    val nq = qf.agg(coalesce(sum(col("ct")), lit(0L)).as("__nq"))
    val terms = spine
      .join(pf.withColumnRenamed("ct", "cp"), Seq("bucket"), "left_outer")
      .join(qf.withColumnRenamed("ct", "cq"), Seq("bucket"), "left_outer")
      .crossJoin(broadcast(np)).crossJoin(broadcast(nq))
      .select(col("bucket"),
        coalesce(col("cp"), lit(0L)).as("cp"),
        coalesce(col("cq"), lit(0L)).as("cq"),
        col("__np"), col("__nq"))
      .withColumn("l_q20",
        lg(col("cp") + 1L) + lg(col("__nq") + dim.toLong) -
          lg(col("cq") + 1L) - lg(col("__np") + dim.toLong))
    val total = terms
      .agg(div(sum((col("cp") + 1L) * col("l_q20")),
        max(col("__np")) + dim.toLong).as("kl_q20"))
    terms.crossJoin(broadcast(total))
      .select(col("bucket"), col("cp"), col("cq"), col("l_q20"),
        col("kl_q20"))
  }

  /** Population stability index (the industry-standard drift monitor,
    * symmetric where [[klDivergenceQ20]] is directional):
    * `PSI = Σ_b (p_b − q_b)·log2(p_b/q_b)` over the same hashed-bucket
    * feature space, add-one smoothed, in Q20 bits. Integer form:
    * per-bucket contribution `(ap·denQ − aq·denP)·l_q20` with
    * l_q20 = lg ap + lg denQ − lg aq − lg denP (four separate Q20
    * logs, the q153 rule); the division by denP·denQ is deferred to
    * the final total, so every per-bucket value is exact and the
    * contribution is always ≥ 0 (both factors share sign).
    * Output: (bucket, cp, cq, l_q20, contrib, psi_q20) with psi_q20
    * an in-plan 1-row scalar.
    *
    * Overflow bound: Σ_b ap·denQ·|l| ≤ denP·denQ·63·2^20 needs
    * denP·denQ ≲ 1.4e11 — fine to ~300M tokens per side; rescale the
    * bucket counts upstream beyond that (the ratio PSI depends on is
    * scale-free).
    */
  def psiQ20(
      p: DataFrame, q: DataFrame, textCol: String,
      dim: Int, salt: String): DataFrame = {
    val lg = graft.functions.GraftColumns.binLog2Q20 _
    val div = graft.functions.GraftColumns.longDiv _
    val pf = bucketFreqs(p, textCol, dim, salt).graftCheckpoint()
    val qf = bucketFreqs(q, textCol, dim, salt).graftCheckpoint()
    val spine = p.sparkSession.range(dim.toLong)
      .select(col("id").cast("long").as("bucket"))
    val np = pf.agg(coalesce(sum(col("ct")), lit(0L)).as("__np"))
    val nq = qf.agg(coalesce(sum(col("ct")), lit(0L)).as("__nq"))
    val terms = spine
      .join(pf.withColumnRenamed("ct", "cp"), Seq("bucket"), "left_outer")
      .join(qf.withColumnRenamed("ct", "cq"), Seq("bucket"), "left_outer")
      .crossJoin(broadcast(np)).crossJoin(broadcast(nq))
      .select(col("bucket"),
        coalesce(col("cp"), lit(0L)).as("cp"),
        coalesce(col("cq"), lit(0L)).as("cq"),
        col("__np"), col("__nq"))
      .withColumn("l_q20",
        lg(col("cp") + 1L) + lg(col("__nq") + dim.toLong) -
          lg(col("cq") + 1L) - lg(col("__np") + dim.toLong))
      .withColumn("contrib",
        ((col("cp") + 1L) * (col("__nq") + dim.toLong) -
          (col("cq") + 1L) * (col("__np") + dim.toLong)) * col("l_q20"))
    val total = terms
      .agg(div(sum(col("contrib")),
        (max(col("__np")) + dim.toLong) *
          (max(col("__nq")) + dim.toLong)).as("psi_q20"))
    terms.crossJoin(broadcast(total))
      .select(col("bucket"), col("cp"), col("cq"), col("l_q20"),
        col("contrib"), col("psi_q20"))
  }

  private def histogramMedian(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(groupCol), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col(groupCol))
    hist
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(tot))
      .filter(col("__cum") >= graft.functions.GraftColumns.longDiv(
        col("__n") + 1, lit(2L)))
      .groupBy(col(groupCol)).agg(min(col("__v")).as("__median"))
  }

  /** Gopher-family repetition filters (Rae et al. 2021 §A1.1, the
    * duplicate-n-gram half of [[gopherQualityFlags]]): per document,
    *
    *  - `top2_frac_milli`: characters covered by the most frequent word
    *    2-gram (count × gram length, space included) per mille of total
    *    word characters — boilerplate loops repeat one phrase;
    *  - `dup3_frac_milli`: characters in word 3-grams occurring ≥ 2
    *    times (count × gram length summed over such grams) per mille —
    *    broader templating.
    *
    * Exact integer definition (stated here because published
    * implementations differ on overlap accounting: this one counts
    * count × len per gram, not deduplicated character spans). Shape:
    * explode → map-side-combined (doc, gram) counts → one argmax/sum
    * aggregate back to the doc — two key-partitioned shuffles, no
    * per-doc quadratic HOFs. Thresholds (top2 > 200‰, dup3 > 100‰ →
    * drop) follow the paper.
    */
  def repetitionStats(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val div = graft.functions.GraftColumns.longDiv _
    val words = filter(split(col(textCol), "\\s+"), w => w =!= "")
    val base = df.select(col(idCol), col(textCol))
      .withColumn("__w", words)
      .withColumn("__chars",
        aggregate(col("__w"), lit(0L), (acc, w) => acc + length(w)))
      .select(col(idCol), col("__w"), col("__chars"))
    def gramCounts(n: Int) = base
      .select(col(idCol), col("__chars"),
        explode(when(size(col("__w")) >= n,
          transform(sequence(lit(1), size(col("__w")) - lit(n - 1)),
            i => concat_ws(" ", slice(col("__w"), i, lit(n)))))
          .otherwise(array().cast("array<string>"))).as("__g"))
      .groupBy(col(idCol), col("__g"))
      .agg(count(lit(1)).as("__c"), min(col("__chars")).as("__chars"))
    // top 2-gram by (count, gram) — the q246 struct-argmax idiom, ties
    // to the lexicographically LARGER gram (hash-stable on any engine)
    val top2 = gramCounts(2)
      .groupBy(col(idCol))
      .agg(max(struct(col("__c"), col("__g"))).as("__m"),
        min(col("__chars")).as("__chars"))
      .select(col(idCol),
        (col("__m.__c") * length(col("__m.__g"))).as("__t2chars"),
        col("__chars"))
    val dup3 = gramCounts(3)
      .filter(col("__c") >= 2L)
      .groupBy(col(idCol))
      .agg(sum(col("__c") * length(col("__g"))).as("__d3chars"))
    base.select(col(idCol), col("__chars"))
      .join(top2.drop("__chars"), Seq(idCol), "left")
      .join(dup3, Seq(idCol), "left")
      .select(col(idCol),
        col("__chars").as("word_chars"),
        when(col("__chars") > 0L, div(
          coalesce(col("__t2chars"), lit(0L)) * 1000L, col("__chars")))
          .otherwise(0L).as("top2_frac_milli"),
        when(col("__chars") > 0L, div(
          coalesce(col("__d3chars"), lit(0L)) * 1000L, col("__chars")))
          .otherwise(0L).as("dup3_frac_milli"))
      .withColumn("keep",
        col("top2_frac_milli") <= 200L && col("dup3_frac_milli") <= 100L)
  }

  /** Gopher-family composite quality rules (Rae et al. 2021 §A1.1 —
    * the third published rule set next to the C4 (q68/q69) and
    * RefinedWeb (q110) gates): per-document boolean flags for the seven
    * classic filters, all exact integer/string arithmetic so every
    * engine evaluates identically —
    *
    *  - `ok_words`: 50 ≤ word count ≤ 100 000
    *  - `ok_mean_wlen`: mean word length in [3, 10] chars (milli-exact)
    *  - `ok_symbol`: words containing '#' or '...' ≤ 10% of words
    *  - `ok_bullet`: ≤ 10% of non-blank lines start with a bullet
    *  - `ok_ellipsis`: ≤ 30% of non-blank lines end with '...'
    *  - `ok_alpha`: ≥ 80% of words contain an ASCII letter
    *  - `ok_stop`: ≥ 2 distinct stop words present
    *
    * plus `keep` = all seven. One projection pass, no shuffle — the
    * rules run inside the scan stage (line-less documents pass the line
    * rules vacuously: 0 ≤ 0).
    */
  def gopherQualityFlags(
      df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String] = Seq(
        "the", "be", "to", "of", "and", "that", "have", "with"))
      : DataFrame = {
    val div = graft.functions.GraftColumns.longDiv _
    val stop = stopwords
    val words = filter(split(col(textCol), "\\s+"), w => w =!= "")
    val lines = filter(split(col(textCol), "\n"), l => trim(l) =!= "")
    val out = df.select(col(idCol), col(textCol))
      .withColumn("__w", words)
      .withColumn("__l", lines)
      .withColumn("n_words", size(col("__w")).cast("long"))
      .withColumn("__chars",
        aggregate(col("__w"), lit(0L), (acc, w) => acc + length(w)))
      .withColumn("mean_wlen_milli",
        when(col("n_words") > 0L,
          div(col("__chars") * 1000L, col("n_words"))).otherwise(0L))
      .withColumn("__sym", size(filter(col("__w"),
        w => w.contains("#") || w.contains("..."))).cast("long"))
      .withColumn("__alpha", size(filter(col("__w"),
        w => w.rlike("[A-Za-z]"))).cast("long"))
      .withColumn("__nl", size(col("__l")).cast("long"))
      .withColumn("__bul", size(filter(col("__l"), l =>
        substring(ltrim(l), 1, 1).isin("-", "*", "•"))).cast("long"))
      .withColumn("__ell", size(filter(col("__l"),
        l => rtrim(l).endsWith("..."))).cast("long"))
      .withColumn("__stop", size(array_intersect(
        transform(col("__w"), w => lower(w)),
        typedLit(stop))).cast("long"))
    out.select(col(idCol),
      col("n_words"), col("mean_wlen_milli"),
      (col("n_words") >= 50L && col("n_words") <= 100000L).as("ok_words"),
      col("mean_wlen_milli").between(3000L, 10000L).as("ok_mean_wlen"),
      (col("__sym") * 10L <= col("n_words")).as("ok_symbol"),
      (col("__bul") * 10L <= col("__nl")).as("ok_bullet"),
      (col("__ell") * 10L <= col("__nl") * 3L).as("ok_ellipsis"),
      (col("__alpha") * 10L >= col("n_words") * 8L).as("ok_alpha"),
      (col("__stop") >= 2L).as("ok_stop"))
      .withColumn("keep",
        col("ok_words") && col("ok_mean_wlen") && col("ok_symbol") &&
          col("ok_bullet") && col("ok_ellipsis") && col("ok_alpha") &&
          col("ok_stop"))
  }
}
