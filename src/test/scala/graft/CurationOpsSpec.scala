package graft

import org.apache.spark.sql.functions._
import graft.ops.{CurationOps, IdOps}

class CurationOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("stratifiedSample: deterministic, rate-monotone (lower-rate " +
       "sample is a subset), unknown groups get the default") {
    def ids(rate: Int) = CurationOps.stratifiedSample(
        docs, "doc_id", "lang", "mix1", Map("en" -> rate))
      .filter($"lang" === "en").select("doc_id").as[Long].collect().toSet
    val s300 = ids(300)
    val s700 = ids(700)
    assert(s300 === ids(300), "same salt+rate must re-deal identically")
    assert(s300.subsetOf(s700),
      "hash-threshold sampling must be monotone in the rate")
    assert(ids(1000).size ===
      docs.filter($"lang" === "en").count().toInt)
    // groups without a rate fall to defaultPerMille = 0 -> dropped
    val kept = CurationOps.stratifiedSample(
      docs, "doc_id", "lang", "mix1", Map("en" -> 1000))
    assert(kept.select("lang").distinct().as[String].collect().toSeq ===
      Seq("en"))
  }

  test("evalOverlap counts distinct shared shingles, planted fixture") {
    val eval = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "alpha beta gamma epsilon"),     // shares "alpha beta gamma"
      (11L, "zeta eta theta iota"),          // no overlap
      (12L, "alpha beta gamma delta prime")  // shares 2 shingles
    ).toDF("doc_id", "text")
    val got = CurationOps.evalOverlap(train, "doc_id", "text", eval, "text", 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 1L, 12L -> 2L))
  }

  test("dedupLines keeps first occurrences in order; unique docs pass " +
       "through unchanged") {
    import graft.ops.TextOps
    val got = Seq(
      "nav\ncontent A\nnav\ncontent B\nnav",
      "only\nunique\nlines",
      "x\nx\nx"
    ).toDF("t").select(TextOps.dedupLines($"t").as("d"))
      .as[String].collect().toSeq
    assert(got === Seq(
      "nav\ncontent A\ncontent B", "only\nunique\nlines", "x"))
  }

  test("dedupParagraphsGlobal keeps each line only at its globally-first " +
       "(id, position); fully-duplicate docs vanish") {
    val docs = Seq(
      (1L, "boiler\nalpha\nboiler"),
      (2L, "boiler\nbeta"),
      (3L, "alpha\nbeta") // every line seen earlier -> doc vanishes
    ).toDF("doc_id", "t")
    val got = CurationOps.dedupParagraphsGlobal(docs, "doc_id", "t")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "boiler\nalpha", 2L), (2L, "beta", 1L)))
  }

  test("qualityPercentileFilter: nearest-rank threshold, ties kept, " +
       "never undershoots the target") {
    // scores: 90 ×2, 70 ×3, 50 ×5 — top 40% of 10 = 4 rows → threshold
    // falls on 70; ties at 70 are all kept → 5 rows
    val df = (Seq.fill(2)(90L) ++ Seq.fill(3)(70L) ++ Seq.fill(5)(50L))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "score")
    val kept = CurationOps.qualityPercentileFilter(df, "score", 400)
      .select("score").as[Long].collect().sorted
    assert(kept === Array(70L, 70L, 70L, 90L, 90L))
    // keep-all and keep-top-1
    assert(CurationOps.qualityPercentileFilter(df, "score", 1000)
      .count() === 10)
    assert(CurationOps.qualityPercentileFilter(df, "score", 1)
      .select("score").as[Long].collect().forall(_ === 90L))
  }

  test("dedupParagraphsGlobal matches a plain-Scala referee on seeded " +
       "random corpora (heavy cross-doc line collisions)") {
    (1 to 3).foreach { trial =>
      val rnd = new scala.util.Random(trial * 7L)
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
      val docs = (0 until 40).map { id =>
        val lines = Seq.fill(1 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size)))
        (id.toLong, lines.mkString("\n"))
      }
      val seen = scala.collection.mutable.Set[String]()
      val expected = docs.flatMap { case (id, t) =>
        val kept = t.split("\n", -1).filter(seen.add)
        if (kept.nonEmpty) Some((id, kept.mkString("\n"), kept.length.toLong))
        else None
      }
      val got = CurationOps.dedupParagraphsGlobal(
          docs.toDF("doc_id", "t"), "doc_id", "t")
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      assert(got === expected.sortBy(_._1), s"trial $trial")
    }
  }

  test("canonicalizeUrl: host lowercased, path case kept, fragment and " +
       "utm params stripped, separators tidied") {
    import graft.ops.TextOps
    val got = Seq(
      "HTTPS://WWW.Example.COM/Path/Page?utm_source=x&id=5&utm_term=y#frag",
      "http://site.org/a?utm_campaign=z",
      "https://plain.net/KeepCase",
      "ftp://Host.Net/File?x=1#f",
      // anchoring cases: 'utm_' in the PATH must survive; an embedded
      // 'xutm_b' param must survive; runs of utm params all strip
      "https://ex.com/blog/utm_tips=a/page?id=2",
      "https://ex.com/q?a=1&xutm_b=2",
      "https://ex.com/r?utm_a=1&utm_b=2&utm_c=3&id=4",
      "https://ex.com/s?utm_a=1&utm_b=2"
    ).toDF("u").select(TextOps.canonicalizeUrl($"u")).as[String]
      .collect().toSeq
    assert(got === Seq(
      "https://www.example.com/Path/Page?id=5",
      "http://site.org/a",
      "https://plain.net/KeepCase",
      "ftp://host.net/File?x=1",
      "https://ex.com/blog/utm_tips=a/page?id=2",
      "https://ex.com/q?a=1&xutm_b=2",
      "https://ex.com/r?id=4",
      "https://ex.com/s"))
  }

  test("packIntoSequences: offsets are the exclusive prefix sum in the " +
       "total order; sequence ids advance every `budget` tokens") {
    import graft.ops.TextOps
    val t = docs.select($"doc_id",
      TextOps.tokenCount($"text").cast("long").as("n_tok"))
    val got = IdOps.packIntoSequences(
        t, "n_tok", 100L, "token_start", "seq_id", "doc_id")
      .select("doc_id", "n_tok", "token_start", "seq_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // referee: plain Scala scan over the doc_id order
    var acc = 0L
    got.foreach { case (id, n, start, seq) =>
      assert(start === acc, s"doc $id offset")
      assert(seq === acc / 100L, s"doc $id seq")
      acc += n
    }
    // rerun is identical (pure function of the total order)
    val again = IdOps.packIntoSequences(
        t, "n_tok", 100L, "token_start", "seq_id", "doc_id")
      .select("doc_id", "n_tok", "token_start", "seq_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === again.toSeq)
  }

  test("contiguousIds: dense 0-based ids equal to the total-order rank, " +
       "deterministic across reruns") {
    val df = docs.select($"doc_id")
    val a = IdOps.contiguousIds(df, "new_id", "doc_id")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(a.map(_._1).toSeq === a.indices.map(_.toLong).toSeq, "dense ids")
    assert(a.map(_._2).toSeq === a.map(_._2).toSeq.sorted,
      "ids follow the doc_id order")
    val b = IdOps.contiguousIds(df, "new_id", "doc_id")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("capPerKey: two-phase bucketed top-N equals the single-window " +
       "referee; caps above the group size keep everything") {
    import org.apache.spark.sql.expressions.Window
    def referee(maxN: Int) = {
      val h = graft.ops.TextOps.polyHash(
        concat($"doc_id".cast("string"), lit(":cap1")))
      val w = Window.partitionBy($"source")
        .orderBy(h.asc, $"doc_id".asc)
      docs.withColumn("__rk", row_number().over(w))
        .filter($"__rk" <= maxN).drop("__rk")
        .select("doc_id").as[Long].collect().toSet
    }
    for (maxN <- Seq(1, 7, 10); nBuckets <- Seq(1, 3, 8)) {
      val capped = CurationOps.capPerKey(
          docs, "source", "doc_id", maxN, "cap1", nBuckets)
        .select("doc_id").as[Long].collect().toSet
      assert(capped === referee(maxN),
        s"maxN=$maxN nBuckets=$nBuckets diverges from the single window")
    }
    val all = CurationOps.capPerKey(
      docs, "source", "doc_id", maxN = 1000000, "cap1", nBuckets = 8)
    assert(all.count() === docs.count(), "over-cap must be identity")
  }

  test("mixtureSample: kept set matches a plain-Scala referee (same hash " +
       "+ integer rates); unweighted classes dropped; oversubscribed " +
       "class capped at keep-all; repartition-invariant") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source")
    val weights: Map[String, Long] =
      Map("src0" -> 100000L, "src1" -> 900000L, "src2" -> 0L)
    val nTarget = 40L
    def polyHash(str: String): Long =
      str.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
    val rows = docs.as[(Long, String)].collect()
    val counts = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expect = rows.filter { case (id, src) =>
      weights.get(src).exists { w =>
        val rate = math.min(1000000L, nTarget * w / counts(src))
        polyHash(s"$id:mixS") % 1000000L < rate
      }
    }.map(_._1).toSet
    val got = CurationOps.mixtureSample(
        docs, "doc_id", "source", weights, nTarget, "mixS")
      .select("doc_id").as[Long].collect().toSet
    assert(got === expect)
    // src1 at 900000 ppm wants 36 of 25 rows -> rate caps at 1e6 (all)
    val bySrc = rows.filter(r => got(r._1)).groupBy(_._2)
      .view.mapValues(_.length).toMap
    assert(bySrc.get("src1").contains(counts("src1").toInt))
    assert(!bySrc.contains("src2"), "zero-weight class dropped")
    assert(!bySrc.keys.exists(k => !weights.contains(k)),
      "unweighted classes dropped")
    val got7 = CurationOps.mixtureSample(
        docs.repartition(7), "doc_id", "source", weights, nTarget, "mixS")
      .select("doc_id").as[Long].collect().toSet
    assert(got7 === got, "partitioning must not re-deal the sample")
  }

  test("upsampleMixture: copy counts match the driver referee " +
       "(integer + hash-gated fractional part), zero-factor classes " +
       "drop, and expansion is partitioning-invariant") {
    import org.apache.spark.sql.functions._
    val docs = (0L until 300L).map(i => (i, s"cls${i % 3}"))
      .toDF("id", "cls")
    val factors = Map("cls0" -> 2300000L, "cls1" -> 700000L, "cls2" -> 0L)
    def polyHash(str: String): Long =
      str.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
    val referee = (0L until 300L).flatMap { i =>
      val f = factors(s"cls${i % 3}")
      val copies = f / 1000000L +
        (if (polyHash(s"$i:upS") % 1000000L < f % 1000000L) 1L else 0L)
      (1L to copies).map(c => (i, c))
    }.toSet
    val got = CurationOps.upsampleMixture(docs, "id", "cls", factors, "upS")
      .select($"id", $"copy_id").as[(Long, Long)].collect().toSet
    assert(got === referee)
    assert(!got.exists(_._1 % 3 == 2), "zero-factor class must drop")
    // cls0 at 2.3 epochs: every doc at least twice
    val cls0 = got.filter(_._1 % 3 == 0).groupBy(_._1).view.mapValues(_.size)
    assert(cls0.values.forall(_ >= 2))
    val got7 = CurationOps.upsampleMixture(
        docs.repartition(7), "id", "cls", factors, "upS")
      .select($"id", $"copy_id").as[(Long, Long)].collect().toSet
    assert(got7 === got)
  }

  test("prioritySample: matches the driver-side referee, favors " +
       "weight, and is partitioning-invariant") {
    import org.apache.spark.sql.functions._
    // two weight classes: ids 0-199 weigh 1, ids 200-399 weigh 1000
    val df = (0L until 400L).map(i => (i, if (i < 200) 1L else 1000L))
      .toDF("id", "w")
    def polyHash(str: String): Long =
      str.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
    val referee = (0L until 400L).map { i =>
      val w = if (i < 200) 1L else 1000L
      val u = polyHash(s"$i:pz") % 1000000L + 1
      (i, w * 1000000L / u)
    }.sortBy { case (id, p) => (-p, id) }.take(50)
    val got = CurationOps.prioritySample(df, "id", "w", "pz", 50)
      .select($"id", $"priority").as[(Long, Long)].collect().toSeq
    assert(got === referee)
    // the heavy class should dominate the sample
    assert(got.count(_._1 >= 200L) > 40, s"heavy class underrepresented")
    val got13 = CurationOps.prioritySample(
        df.repartition(13), "id", "w", "pz", 50)
      .select($"id", $"priority").as[(Long, Long)].collect().toSeq
    assert(got13 === got, "partitioning must not re-deal the sample")
  }

  test("prioritySample: near-max weights compute exactly (two-step " +
       "scaling, no intermediate overflow) and bad weights fail loudly") {
    import org.apache.spark.sql.functions._
    def polyHash(str: String): Long =
      str.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
    val maxW = Long.MaxValue / 1000000L
    // w*1e6 would wrap BIGINT for these weights; the two-step form must
    // still equal the exact BigInt referee.
    val df = (0L until 10L).map(i => (i, maxW - i)).toDF("id", "w")
    val got = CurationOps.prioritySample(df, "id", "w", "ov", 10)
      .select($"id", $"priority").as[(Long, Long)].collect().toMap
    (0L until 10L).foreach { i =>
      val u = BigInt(polyHash(s"$i:ov") % 1000000L + 1)
      val want = (BigInt(maxW - i) * 1000000 / u).toLong
      assert(got(i) === want, s"id $i")
    }
    // out-of-domain weights raise instead of silently wrapping
    val bad = Seq((1L, Long.MaxValue), (2L, 5L)).toDF("id", "w")
    val ex = intercept[Exception] {
      CurationOps.prioritySample(bad, "id", "w", "ov", 2).collect()
    }
    assert(ex.getMessage.contains("weight out of") ||
      ex.getCause != null, s"unexpected: ${ex.getMessage}")
    val neg = Seq((1L, -3L)).toDF("id", "w")
    intercept[Exception] {
      CurationOps.prioritySample(neg, "id", "w", "ov", 1).collect()
    }
  }

  test("weightedSampleAes: keys match an exact driver-side fixed-point " +
       "referee, inclusion is monotone in weight, WOR, partitioning-" +
       "invariant, bad weights fail loudly") {
    import org.apache.spark.sql.functions._
    def polyHash(str: String): Long =
      str.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
    // exact replica of the Q20 binary-log recurrence
    def aesKey(id: Long, w: Long, salt: String): Long = {
      val h = polyHash(s"$id:$salt")
      val v = (h * h % 1000000007L) % 1048576L + 1
      val p = 63 - java.lang.Long.numberOfLeadingZeros(v)
      var y = v << (30 - p)
      var acc = 0L
      (1 to 20).foreach { _ =>
        y = (y * y) >> 30
        if (y >= (1L << 31)) { y >>= 1; acc = acc * 2 + 1 }
        else acc = acc * 2
      }
      ((20L - p) * 1048576L - acc) * 1000000L / w
    }
    // two weight classes: ids 0-199 weigh 1, ids 200-399 weigh 50
    val df = (0L until 400L).map(i => (i, if (i < 200) 1L else 50L))
      .toDF("id", "w")
    val got = CurationOps.weightedSampleAes(df, "id", "w", "az", 100)
      .select($"id", $"aes_key").as[(Long, Long)].collect().toSeq
    val referee = (0L until 400L)
      .map(i => (i, aesKey(i, if (i < 200) 1L else 50L, "az")))
      .sortBy { case (id, key) => (key, id) }.take(100)
    assert(got === referee)
    // WOR: no id repeats; heavy class dominates the sample
    assert(got.map(_._1).distinct.size === got.size)
    assert(got.count(_._1 >= 200L) > 80,
      s"heavy class underrepresented: ${got.count(_._1 >= 200L)}/100")
    // partitioning must not re-deal the sample
    val got13 = CurationOps.weightedSampleAes(
        df.repartition(13), "id", "w", "az", 100)
      .select($"id", $"aes_key").as[(Long, Long)].collect().toSeq
    assert(got13 === got)
    // weights < 1 raise instead of corrupting keys
    intercept[Exception] {
      CurationOps.weightedSampleAes(
        Seq((1L, 0L)).toDF("id", "w"), "id", "w", "az", 1).collect()
    }
  }

  test("importanceRatios: empty TARGET corpus degrades to the smoothed " +
       "floor on every bucket — never a NULL ratio") {
    import org.apache.spark.sql.functions._
    val source = Seq((1L, "alpha beta gamma"), (2L, "beta beta"))
      .toDF("doc_id", "text")
    val empty = source.filter($"doc_id" < 0)
    val ratios = CurationOps.importanceRatios(empty, source, "text", 64, "et")
      .select($"bucket", $"ratio_micro").as[(Long, Option[Long])].collect()
    assert(ratios.nonEmpty)
    assert(ratios.forall(_._2.isDefined), "NULL ratio_micro leaked")
    // p_t = 1e6*1/(0+64) = 15625 for every bucket; p_s varies — the
    // ratio is the smoothed floor, positive and finite.
    assert(ratios.forall(_._2.get > 0L))
  }

  test("bucketedBatches: equals the per-bucket row_number referee and " +
       "is partitioning-invariant") {
    import org.apache.spark.sql.functions._
    import graft.ops.IdOps
    val rnd = new scala.util.Random(11)
    val df = (0L until 500L).map(i => (i, 5L + rnd.nextInt(200).toLong))
      .toDF("id", "len")
    def run(d: org.apache.spark.sql.DataFrame) =
      IdOps.bucketedBatches(d, "len", "id", 32L, 8L, "bucket", "batch")
        .select($"id", $"bucket", $"batch")
        .as[(Long, Long, Long)].collect()
        .map { case (i, b, t) => i -> (b, t) }.toMap
    val got = run(df)
    // referee: per-bucket rank by (len, id), batch = rank div 8
    val rows = df.as[(Long, Long)].collect()
    val referee = rows.groupBy(_._2 / 32).toSeq.flatMap { case (b, grp) =>
      grp.sortBy(r => (r._2, r._1)).zipWithIndex.map { case ((id, _), rn) =>
        id -> ((b, rn.toLong / 8))
      }
    }.toMap
    assert(got === referee)
    assert(run(df.repartition(13)) === got,
      "partitioning must not re-deal batches")
    // padding quality: every batch spans at most one 32-token bucket
    val spans = IdOps.bucketedBatches(df, "len", "id", 32L, 8L, "bucket", "batch")
      .groupBy($"bucket", $"batch")
      .agg((max($"len") - min($"len")).as("spread"))
      .agg(max($"spread")).as[Long].head()
    assert(spans < 32L, s"batch length spread $spans >= bucket width")
  }

  test("dsirScore: documents from the target domain outscore " +
       "off-domain documents on average") {
    import org.apache.spark.sql.functions._
    // target-domain docs speak one vocabulary, off-domain another;
    // mixed docs sit in between.
    val mk = (i: Long, words: Seq[String]) =>
      (i, words.mkString(" "), if (i < 20) "tgt" else "other")
    val tgtWords = Seq("alpha", "beta", "gamma", "delta")
    val offWords = Seq("omega", "sigma", "kappa", "theta")
    val docs = ((0L until 20L).map(i =>
        mk(i, Seq.fill(10)(tgtWords((i % 4).toInt)))) ++
      (20L until 40L).map(i =>
        mk(i, Seq.fill(10)(offWords((i % 4).toInt)))))
      .toDF("doc_id", "text", "dom")
    val ratios = CurationOps.importanceRatios(
      docs.filter($"dom" === "tgt"), docs, "text", 512, "dz")
    val scored = CurationOps.dsirScore(docs, "doc_id", "text", ratios, 512, "dz")
      .join(docs.select($"doc_id", $"dom"), "doc_id")
    val avg = scored.groupBy($"dom")
      .agg(org.apache.spark.sql.functions.avg($"score_micro").as("s"))
      .as[(String, Double)].collect().toMap
    assert(avg("tgt") > 3 * avg("other"),
      s"target docs must dominate: $avg")
    // empty doc scores zero and survives
    val withEmpty = docs.unionByName(Seq((99L, "", "other")).toDF("doc_id", "text", "dom"))
    val z = CurationOps.dsirScore(withEmpty, "doc_id", "text", ratios, 512, "dz")
      .filter($"doc_id" === 99L).select($"n_feats", $"score_micro")
      .as[(Long, Long)].head()
    assert(z === ((0L, 0L)))
  }

  test("blocklistFilter: occurrence counts (not distinct terms), ratio " +
       "threshold, null text survives, duplicate blocklist rows collapse") {
    val fixture = Seq(
      (1L, "bad word bad"),       // 2 hits / 3 tokens = 666‰ → dropped
      (2L, "all clean here now"), // 0 hits → kept
      (3L, "one bad in twenty a b c d e f g h i j k l m n o p"),
      (4L, null.asInstanceOf[String]) // no tokens → 0/0 → kept
    ).toDF("doc_id", "text")
    val bl = Seq("bad", "bad", "evil").toDF("term") // dup row collapses
    val got = CurationOps.blocklistFilter(
        fixture, "doc_id", "text", bl, "term", maxRatioMilli = 100L)
      .select($"doc_id", $"n_tokens", $"hits", $"hit_ratio_milli", $"kept")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 3L, 2L, 666L, false)))
    assert(got(2L) === ((2L, 4L, 0L, 0L, true)))
    assert(got(3L) === ((3L, 20L, 1L, 50L, true))) // 50‰ ≤ 100‰
    assert(got(4L) === ((4L, 0L, 0L, 0L, true)))
    assert(got.size === 4) // one row per input doc, always
  }

  test("robustClip: hand-computed median/MAD fences; clip only acts " +
       "outside them; partitioning-invariant") {
    // group g1 = [1,2,3,100]: n=4 → rank (4+1) div 2 = 2 → med 2;
    // deviations [1,0,1,98] → rank 2 → mad 1; fences [-1, 5] → 100→5
    // group g2 = [10,50,90]: med 50, deviations [40,0,40] → mad 40;
    // fences [-70, 170] → nothing clips
    val fx = Seq(("g1", 1L), ("g1", 2L), ("g1", 3L), ("g1", 100L),
      ("g2", 10L), ("g2", 50L), ("g2", 90L)).toDF("g", "v")
    Seq(1, 5).foreach { p =>
      val got = CurationOps.robustClip(fx.repartition(p), "g", "v", k = 3)
        .select($"g", $"v", $"med", $"mad", $"clipped")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(got === Set(
        ("g1", 1L, 2L, 1L, 1L), ("g1", 2L, 2L, 1L, 2L),
        ("g1", 3L, 2L, 1L, 3L), ("g1", 100L, 2L, 1L, 5L),
        ("g2", 10L, 50L, 40L, 10L), ("g2", 50L, 50L, 40L, 50L),
        ("g2", 90L, 50L, 40L, 90L)), s"partitions=$p")
    }
    // k=0 clips everything to the median
    val k0 = CurationOps.robustClip(fx, "g", "v", k = 0)
      .filter($"g" === "g1").select($"clipped").as[Long].collect().toSet
    assert(k0 === Set(2L))
  }

  test("percentileNormalize: strictly-below ranks, ties share a " +
       "pct_ppm, groups calibrate independently, referee across " +
       "partitionings") {
    // g1 = [10, 20, 20, 40]: below-counts 0,1,1,3 → 0, 250000,
    // 250000, 750000; g2 = [5, 6]: 0, 500000
    val fx = Seq(("g1", 10L), ("g1", 20L), ("g1", 20L), ("g1", 40L),
      ("g2", 5L), ("g2", 6L)).toDF("g", "v")
    val got = CurationOps.percentileNormalize(fx, "g", "v")
      .select($"g", $"v", $"pct_ppm")
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("g1", 10L, 0L), ("g1", 20L, 250000L),
      ("g1", 40L, 750000L), ("g2", 5L, 0L), ("g2", 6L, 500000L)))
    // row multiplicity is preserved (the tie appears twice)
    assert(CurationOps.percentileNormalize(fx, "g", "v").count() === 6L)
    // referee on pseudo-random data across partitionings
    val rnd = new scala.util.Random(13)
    val rows = for (g <- Seq("x", "y"); _ <- 1 to 50)
      yield (g, rnd.nextInt(12).toLong)
    val expected = rows.groupBy(_._1).flatMap { case (g, v) =>
      val vs = v.map(_._2)
      vs.distinct.map(x =>
        (g, x) -> vs.count(_ < x).toLong * 1000000L / vs.size)
    }
    Seq(1, 7).foreach { p =>
      val got2 = CurationOps.percentileNormalize(
          rows.toDF("g", "v").repartition(p), "g", "v")
        .select($"g", $"v", $"pct_ppm")
        .as[(String, Long, Long)].collect().toSet
      assert(got2.map(r => (r._1, r._2) -> r._3).toMap === expected,
        s"partitions=$p")
    }
  }
  test("gopherQualityFlags: hand-checked rule flags — a healthy doc " +
       "keeps, bullet/symbol/short docs fail their specific rule, and " +
       "line-less docs pass the line rules vacuously") {
    val good = (("the quick brown fox jumps over and that have with " * 6)
      .trim) // 60 words, all alpha, two+ stopwords, no lines
    val bullets = "- one\n- two\n- three\nplain line of text here"
    val symbols = ("tag# " * 60).trim
    val short = "tiny doc"
    val rows = Seq((1L, good), (2L, bullets), (3L, symbols), (4L, short))
      .toDF("id", "t")
    val got = CurationOps.gopherQualityFlags(rows, "id", "t")
      .orderBy($"id").collect()
    val byId = got.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Boolean]("keep"), byId(1L).toString)
    assert(!byId(2L).getAs[Boolean]("ok_bullet"), byId(2L).toString)
    assert(!byId(3L).getAs[Boolean]("ok_symbol"), byId(3L).toString)
    assert(!byId(4L).getAs[Boolean]("ok_words"), byId(4L).toString)
    // good doc has no newline: 1 non-blank line, 0 bullets -> vacuous
    assert(byId(1L).getAs[Boolean]("ok_bullet"))
    // word count exact: 60
    assert(byId(1L).getAs[Long]("n_words") === 60L)
  }

  test("repetitionStats: hand-computed top-2-gram and dup-3-gram " +
       "fractions; unique text scores 0; sub-2-word docs are zeros") {
    // "a b a b a b": words=6, chars=6; 2-grams: "a b"x3, "b a"x2 ->
    // top2 = 3*3=9 chars -> 1500 milli of 6; 3-grams: "a b a"x2,
    // "b a b"x2 -> dup3 = 4*5=20 -> 3333 milli
    val rows = Seq(
      (1L, "a b a b a b"),
      (2L, "every word here is totally unique"),
      (3L, "solo")).toDF("id", "t")
    val got = CurationOps.repetitionStats(rows, "id", "t")
      .orderBy($"id")
      .select($"id", $"word_chars", $"top2_frac_milli",
        $"dup3_frac_milli", $"keep")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(got(0) === ((1L, 6L, 1500L, 3333L, false)))
    // unique text: every 2-gram count 1 — argmax ties to the
    // lexicographically largest gram, "word here" (9 chars of 28 word
    // chars = 321‰). NB the top2 rule intentionally over-fires on tiny
    // docs (one bigram IS a large char fraction) — the length rule
    // (gopherQualityFlags ok_words ≥ 50) screens those first.
    assert(got(1) === ((2L, 28L, 321L, 0L, false)))
    assert(got(2) === ((3L, 4L, 0L, 0L, true)))
  }

  test("temperatureMixtureSample: rates follow sqrt-count shares (head " +
       "flattened vs proportional), keep set is a pure hash function " +
       "(partitioning-invariant)") {
    val rows = (1 to 900).map(i => (i.toLong, "big")) ++
      (901 to 1000).map(i => (i.toLong, "small"))
    val df = rows.toDF("id", "cls")
    val kept = CurationOps.temperatureMixtureSample(
        df, "id", "cls", nTarget = 200L, salt = "s1")
      .select($"id").as[Long].collect().toSet
    // expected rates: sqrt(900)=30, sqrt(100)=10, ts=40
    // big: 200*30*1e6/(40*900) = 166666 ppm; small: 200*10*1e6/(40*100)
    // = 500000 ppm -> small's keep-rate is 3x big's (flattening), where
    // proportional sampling would give both 200000 ppm
    val keptBig = kept.count(_ <= 900L)
    val keptSmall = kept.size - keptBig
    assert(keptSmall > keptBig / 4,
      s"flattening must oversample the tail: $keptSmall vs $keptBig")
    Seq(1, 13).foreach { p =>
      val again = CurationOps.temperatureMixtureSample(
          df.repartition(p), "id", "cls", nTarget = 200L, salt = "s1")
        .select($"id").as[Long].collect().toSet
      assert(again === kept, s"partitions=$p")
    }
  }
  test("prefixSums/prefixMaxes: random-data referee against the window " +
       "formulation (inclusive + exclusive, multi-column), " +
       "partitioning-invariant; empty input yields empty output") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(i =>
      (i.toLong * 3 % 997, rnd.nextInt(100).toLong,
        rnd.nextInt(100).toLong - 50L))
    val df = rows.toDF("k", "a", "b")
    val wCum = Window.orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPre = Window.orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = df
      .withColumn("sa", sum($"a").over(wCum))
      .withColumn("sb", sum($"b").over(wCum))
      .withColumn("xa", coalesce(sum($"a").over(wPre), lit(0L)))
      .withColumn("ma", max($"a").over(wPre)) // null on the first row
      .select($"k", $"sa", $"sb", $"xa", $"ma")
      .as[(Long, Long, Long, Long, Option[Long])].collect().toSet
    Seq(1, 13).foreach { p =>
      val d = df.repartition(p)
      val inc = IdOps.prefixSums(d, Seq("a", "b"), Seq("sa", "sb"),
          inclusive = true, "k")
        .select($"k", $"sa", $"sb")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val exc = IdOps.prefixSums(d, Seq("a"), Seq("xa"),
          inclusive = false, "k")
        .select($"k", $"xa").as[(Long, Long)].collect().toMap
      val mx = IdOps.prefixMaxes(d, Seq("a"), Seq("ma"),
          inclusive = false, "k")
        .select($"k", $"ma").as[(Long, Option[Long])].collect().toMap
      val got = inc.keySet.map(k =>
        (k, inc(k)._1, inc(k)._2, exc(k), mx(k)))
      assert(got === ref, s"partitions=$p")
    }
    // inclusive prefix max referee too
    val wInc = Window.orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val refM = df.withColumn("m", max($"a").over(wInc))
      .select($"k", $"m").as[(Long, Long)].collect().toMap
    val gotM = IdOps.prefixMaxes(df, Seq("a"), Seq("m"),
        inclusive = true, "k")
      .select($"k", $"m").as[(Long, Long)].collect().toMap
    assert(gotM === refM)
    // empty input
    assert(IdOps.prefixSums(df.filter($"k" < 0), Seq("a"), Seq("s"),
      inclusive = true, "k").count() === 0L)
  }
  test("temperatureMixtureSample: EXACT kept set equals a driver-side " +
       "replica of the rate formula + portable hash") {
    def polyHash(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
    val rows = (1 to 900).map(i => (i.toLong, "big")) ++
      (901 to 1000).map(i => (i.toLong, "small"))
    val got = CurationOps.temperatureMixtureSample(
        rows.toDF("id", "cls"), "id", "cls", nTarget = 200L, salt = "s2")
      .select($"id").as[Long].collect().toSet
    // referee: sqrt shares -> per-class ppm rates -> hash keep
    val counts = rows.groupBy(_._2).map { case (c, v) => c -> v.size }
    val sq = counts.map { case (c, n) =>
      c -> math.floor(math.sqrt(n.toDouble)).toLong }
    val ts = sq.values.sum
    val rate = counts.map { case (c, n) =>
      c -> math.min(1000000L, 200L * sq(c) * 1000000L / (ts * n)) }
    val expected = rows.filter { case (id, c) =>
      polyHash(s"$id:s2") % 1000000L < rate(c)
    }.map(_._1).toSet
    assert(got === expected)
  }
}
