package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Checkpointer._
import graft.ops.{CurationOps, IdOps, TextOps}

/** Corpus-curation conformance suite over `documents`: repetition
  * scoring, benchmark decontamination, deterministic stratified
  * sampling, and scale-safe contiguous id assignment — the steps
  * between dedup and training-set assembly.
  */
object CurationQueries {

  private val ShingleN = 3

  // q150 profiles the engine-portable-rendering columns of `documents`
  // (integers/strings — float formatting differs across engines).
  private val ProfileCols = Seq("doc_id", "lang", "n_chars", "source")

  // Non-distinct / distinct shingle-hash fragments, kept in lockstep
  // with TextOps.shingleHashes (same arithmetic as DedupQueries).
  private val DuckShingleList =
    """list_transform(
      |    list_transform(generate_series(1, len(string_split_regex(text,'\s+'))-2),
      |      i -> array_to_string(string_split_regex(text,'\s+')[i:i+2], ' ')),
      |    s -> list_reduce(list_prepend(CAST(0 AS BIGINT),
      |          list_transform(string_split(s,''), c -> ascii(c))),
      |         (a,x) -> (a*31+x)%1000000007))""".stripMargin

  // polyHash of an ASCII string — DuckDB replica of the native fold.
  private def duckPolyHash(expr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split($expr, ''), c -> ascii(c))),
       |   (a,x) -> (a*31+x)%1000000007)""".stripMargin

  // polyHash of an ASCII string, mod 1000 — the stratified-sample dial.
  private def duckHashMod1000(expr: String): String =
    duckPolyHash(expr) + " % 1000"

  val all: Seq[GraftQuery] = Seq(

    // Within-document repetition (Gopher-family boilerplate signal):
    // fraction of shingle occurrences that repeat an earlier shingle.
    GraftQuery(
      "q61_repetition",
      s"""WITH sh AS (
         |  SELECT doc_id, $DuckShingleList AS hashes FROM documents)
         |SELECT doc_id,
         |  CAST(len(hashes) AS BIGINT) AS total_shingles,
         |  CAST(len(list_distinct(hashes)) AS BIGINT) AS distinct_shingles,
         |  CASE WHEN len(hashes) = 0 THEN 0
         |    ELSE ((len(hashes) - len(list_distinct(hashes))) * 1000)
         |         // len(hashes) END AS repetition_pm
         |FROM sh ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val all = graft.functions.GraftColumns.shingleHash($"text", ShingleN)
      Tables.load(s, dir, "documents")
        .select($"doc_id",
          size(all).cast("long").as("total_shingles"),
          size(array_distinct(all)).cast("long").as("distinct_shingles"),
          TextOps.repetitionScoreMilli($"text", ShingleN)
            .as("repetition_pm"))
        .orderBy($"doc_id")
    },

    // Benchmark decontamination: distinct-shingle overlap between each
    // training doc and a (broadcast) eval corpus — docs with shared
    // n-grams leak test data. Eval set here: doc_id < 10.
    GraftQuery(
      "q62_decontaminate",
      s"""WITH sh AS (
         |  SELECT doc_id, list_distinct($DuckShingleList) AS hashes
         |  FROM documents),
         |ev AS (SELECT DISTINCT unnest(hashes) AS h FROM sh WHERE doc_id < 10),
         |tr AS (SELECT doc_id, unnest(hashes) AS h FROM sh WHERE doc_id >= 10)
         |SELECT doc_id, COUNT(*) AS n_shared
         |FROM tr JOIN ev USING (h)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      CurationOps.evalOverlap(
          docs.filter($"doc_id" >= 10), "doc_id", "text",
          docs.filter($"doc_id" < 10), "text", ShingleN)
        .orderBy($"doc_id")
    },

    // Deterministic stratified sampling (data mixing): per-language
    // keep rates, survival a pure function of (doc_id, salt, lang).
    GraftQuery(
      "q63_stratified_sample",
      s"""WITH kept AS (
         |  SELECT lang, doc_id FROM documents
         |  WHERE ${duckHashMod1000("CAST(doc_id AS VARCHAR) || ':mix1'")}
         |    < CASE lang WHEN 'de' THEN 1000 WHEN 'en' THEN 300
         |                WHEN 'es' THEN 500 WHEN 'fr' THEN 750
         |                WHEN 'zh' THEN 100 ELSE 0 END)
         |SELECT lang, COUNT(*) AS n,
         |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
         |FROM kept GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      import s.implicits._
      CurationOps.stratifiedSample(
          Tables.load(s, dir, "documents"), "doc_id", "lang", "mix1",
          Map("de" -> 1000, "en" -> 300, "es" -> 500, "fr" -> 750,
            "zh" -> 100))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n"), sum($"doc_id").as("sum_ids"))
        .orderBy($"lang")
    },

    // PII scrubbing: inject deterministic emails/URLs (the synthetic
    // corpus has none), redact, and hash the redacted text — both
    // engines construct, match, and replace with the same RE2-safe
    // patterns, so the scrubber itself is what the hash checks.
    GraftQuery(
      "q65_redact_pii",
      """WITH seeded AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id ||
        |    '@example.com or https://site' || doc_id || '.org/x now' AS t
        |  FROM documents),
        |red AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(t,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |        '<EMAIL>', 'g'),
        |      'https?://[^ \t\n]+', '<URL>', 'g') AS rt,
        |    len(regexp_extract_all(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |    len(regexp_extract_all(t, 'https?://[^ \t\n]+')) AS n_urls
        |  FROM seeded)
        |SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
        |  CAST(n_urls AS BIGINT) AS n_urls,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(rt, ''), c -> ascii(c))),
        |    (a,x) -> (a*31+x)%1000000007) AS redacted_hash
        |FROM red ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val seeded = Tables.load(s, dir, "documents")
        .select($"doc_id",
          concat($"text", lit(" contact user"), $"doc_id".cast("string"),
            lit("@example.com or https://site"), $"doc_id".cast("string"),
            lit(".org/x now")).as("t"))
      seeded.select($"doc_id",
          TextOps.emailCount($"t").cast("long").as("n_emails"),
          TextOps.urlCount($"t").cast("long").as("n_urls"),
          TextOps.polyHash(TextOps.redactPii($"t")).as("redacted_hash"))
        .orderBy($"doc_id")
    },

    // Within-document line dedup (C4-style boilerplate collapse): the
    // corpus has no newlines, so both engines construct the same 5-line
    // page — repeated CTA boilerplate around two unique content slices —
    // then keep only first occurrences. The hash checks the kept text.
    GraftQuery(
      "q68_line_dedup",
      """WITH seeded AS (
        |  SELECT doc_id,
        |    ['Subscribe to our newsletter', substr(text, 1, 40),
        |     'Subscribe to our newsletter', substr(text, 41, 40),
        |     'Subscribe to our newsletter'] AS ls
        |  FROM documents),
        |ded AS (
        |  SELECT doc_id, ls,
        |    list_filter(ls, (x, i) -> list_position(ls, x) = i) AS kept
        |  FROM seeded)
        |SELECT doc_id,
        |  CAST(len(ls) AS BIGINT) AS n_before,
        |  CAST(len(kept) AS BIGINT) AS n_after,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(array_to_string(kept, chr(10)), ''),
        |      c -> ascii(c))),
        |    (a,x) -> (a*31+x)%1000000007) AS dedup_hash
        |FROM ded ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val B = "Subscribe to our newsletter"
      val t = concat_ws("\n", lit(B), substring($"text", 1, 40), lit(B),
        substring($"text", 41, 40), lit(B))
      Tables.load(s, dir, "documents")
        .select($"doc_id",
          size(split(t, "\n")).cast("long").as("n_before"),
          size(split(TextOps.dedupLines(t), "\n")).cast("long")
            .as("n_after"),
          TextOps.polyHash(TextOps.dedupLines(t)).as("dedup_hash"))
        .orderBy($"doc_id")
    },

    // Cross-corpus paragraph dedup (the C4 rule: a repeated line
    // anywhere in the corpus survives only at its globally-first
    // (doc_id, position)). Spark side is the algebraic-min formulation
    // (map-side combine absorbs the boilerplate hot key); the oracle
    // spells the same semantics with a row_number window — fine for
    // DuckDB at check scale, skew-unsafe at corpus scale.
    GraftQuery(
      "q69_paragraph_dedup",
      """WITH seeded AS (
        |  SELECT doc_id,
        |    ['Subscribe to our newsletter', substr(text, 1, 40),
        |     'Subscribe to our newsletter', substr(text, 41, 40),
        |     'Subscribe to our newsletter'] AS ls
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, unnest(generate_series(1, len(ls))) AS idx,
        |    unnest(ls) AS line
        |  FROM seeded),
        |ranked AS (
        |  SELECT doc_id, idx, line, row_number() OVER (
        |    PARTITION BY line ORDER BY doc_id, idx) AS rn
        |  FROM lines),
        |kept AS (
        |  SELECT doc_id, COUNT(*) AS n_kept,
        |    string_agg(line, chr(10) ORDER BY idx) AS t
        |  FROM ranked WHERE rn = 1 GROUP BY doc_id)
        |SELECT doc_id, CAST(n_kept AS BIGINT) AS n_kept,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(t, ''), c -> ascii(c))),
        |    (a,x) -> (a*31+x)%1000000007) AS text_hash
        |FROM kept ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val B = "Subscribe to our newsletter"
      val seeded = Tables.load(s, dir, "documents")
        .select($"doc_id",
          concat_ws("\n", lit(B), substring($"text", 1, 40), lit(B),
            substring($"text", 41, 40), lit(B)).as("t"))
      CurationOps.dedupParagraphsGlobal(seeded, "doc_id", "t")
        .select($"doc_id", $"n_kept",
          TextOps.polyHash($"t").as("text_hash"))
        .orderBy($"doc_id")
    },

    // Unicode NFC normalization: the ASCII corpus gets a decomposed-
    // unicode suffix (e + combining acute, i + combining diaeresis)
    // appended identically by both engines; NFC must compose them to
    // the same codepoints (len shrinks by 2; the hash pins the exact
    // output). NFC is Unicode-standard-defined, so the native
    // expression and DuckDB's nfc_normalize agree codepoint-for-
    // codepoint — which is exactly the property dedup keys need.
    GraftQuery(
      "q78_nfc_normalize",
      """WITH seeded AS (
        |  SELECT doc_id,
        |    text || ' Caf' || chr(101) || chr(769) ||
        |    ' na' || chr(105) || chr(776) || 've' AS t
        |  FROM documents),
        |n AS (SELECT doc_id, t, nfc_normalize(t) AS nt FROM seeded)
        |SELECT doc_id,
        |  CAST(len(t) AS BIGINT) AS len_raw,
        |  CAST(len(nt) AS BIGINT) AS len_nfc,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(nt, ''), c -> ascii(c))),
        |    (a,x) -> (a*31+x)%1000000007) AS nfc_hash
        |FROM n ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val suffix = " Caf" + "e" + 0x0301.toChar +
        " na" + "i" + 0x0308.toChar + "ve"
      val seeded = Tables.load(s, dir, "documents")
        .select($"doc_id", concat($"text", lit(suffix)).as("t"))
      seeded.select($"doc_id",
          length($"t").cast("long").as("len_raw"),
          length(TextOps.nfcNormalize($"t")).cast("long").as("len_nfc"),
          TextOps.polyHash(TextOps.nfcNormalize($"t")).as("nfc_hash"))
        .orderBy($"doc_id")
    },

    // Vocabulary construction: exact corpus-wide token top-k (the input
    // to BPE/tokenizer training). Explode → count (map-side combine
    // collapses the token stream to |vocab| rows) → TakeOrdered top-50
    // with a total order.
    GraftQuery(
      "q76_vocab_topk",
      """WITH tok AS (
        |  SELECT unnest(string_split_regex(text, '\s+')) AS token
        |  FROM documents)
        |SELECT token, COUNT(*) AS n FROM tok GROUP BY token
        |ORDER BY n DESC, token LIMIT 50""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select(explode(TextOps.tokenize($"text")).as("token"))
        .groupBy($"token")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"token".asc)
        .limit(50)
    },

    // Corpus-relative quality filter: keep the top ~40% of documents by
    // integer quality score, ties at the threshold included. The
    // threshold comes from a bounded score HISTOGRAM (domain 0-100) —
    // never a row_number over the whole corpus; the oracle computes the
    // same descending nearest-rank threshold with a window over the
    // 101-row histogram.
    GraftQuery(
      "q77_quality_filter",
      """WITH scored AS (
        |  SELECT doc_id,
        |    len(string_split_regex(text, '\s+')) AS n_tok,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |        t -> t IN ('a','the'))) AS n_stop,
        |    list_sum(list_transform(string_split_regex(text, '\s+'),
        |        t -> len(t))) AS sum_len
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    (CASE WHEN n_tok BETWEEN 50 AND 1000 THEN 40
        |          WHEN n_tok >= 10 THEN 20 ELSE 0 END)
        |  + (CASE WHEN (n_stop*1000)//n_tok BETWEEN 10 AND 400 THEN 30
        |          WHEN (n_stop*1000)//n_tok > 0 THEN 15 ELSE 0 END)
        |  + (CASE WHEN (sum_len*1000)//n_tok BETWEEN 3000 AND 8000 THEN 30
        |          WHEN (sum_len*1000)//n_tok BETWEEN 2000 AND 10000 THEN 15
        |          ELSE 0 END) AS score
        |  FROM scored),
        |h AS (SELECT score, COUNT(*) AS n FROM s GROUP BY score),
        |c AS (SELECT score, SUM(n) OVER (ORDER BY score DESC) AS cum FROM h),
        |tot AS (SELECT SUM(n) AS total FROM h),
        |thr AS (
        |  SELECT MAX(score) AS t FROM c, tot
        |  WHERE cum >= GREATEST(1, (total*400 + 999)//1000))
        |SELECT doc_id, CAST(score AS BIGINT) AS score
        |FROM s, thr WHERE score >= t
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val scored = Tables.load(s, dir, "documents")
        .select($"doc_id",
          TextOps.qualityScore($"text", Seq("a", "the")).as("score"))
      CurationOps.qualityPercentileFilter(scored, "score", 400)
        .select($"doc_id", $"score")
        .orderBy($"doc_id")
    },

    // URL canonicalization: the corpus has no URLs, so both engines
    // construct the same messy URL (uppercase scheme/host, utm_*
    // tracking params, fragment) and must normalize it to the same
    // canonical string — the web-corpus dedup/join key. Per-host
    // rollup of distinct canonical URLs rides along.
    GraftQuery(
      "q72_url_canonicalize",
      """WITH u AS (
        |  SELECT doc_id,
        |    'HTTPS://WWW.Site' || CAST(doc_id % 7 AS VARCHAR) ||
        |    '.COM/Article' || CAST(doc_id AS VARCHAR) ||
        |    '?utm_source=feed&ref=' || CAST(doc_id % 3 AS VARCHAR) ||
        |    '&utm_campaign=x#sec' AS url
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(url, '^[A-Za-z]+://[^/?#]*', 0)) ||
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(
        |      substr(url,
        |        len(regexp_extract(url, '^[A-Za-z]+://[^/?#]*', 0)) + 1),
        |      '#.*', ''),
        |      '&utm_[A-Za-z_]+=[^&#]*', '', 'g'),
        |      '\?utm_[A-Za-z_]+=[^&#]*&', '?', 'g'),
        |      '\?utm_[A-Za-z_]+=[^&#]*$', '', 'g'),
        |      '[?&]+$', '') AS canonical_url,
        |    lower(regexp_extract(url, '^[A-Za-z]+://[^/?#]*', 0))
        |      AS scheme_host
        |  FROM u)
        |SELECT doc_id, canonical_url, scheme_host
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val u = Tables.load(s, dir, "documents")
        .select($"doc_id",
          concat(lit("HTTPS://WWW.Site"), ($"doc_id" % 7).cast("string"),
            lit(".COM/Article"), $"doc_id".cast("string"),
            lit("?utm_source=feed&ref="), ($"doc_id" % 3).cast("string"),
            lit("&utm_campaign=x#sec")).as("url"))
      u.select($"doc_id",
          TextOps.canonicalizeUrl($"url").as("canonical_url"),
          lower(regexp_extract($"url", "^[A-Za-z]+://[^/?#]*", 0))
            .as("scheme_host"))
        .orderBy($"doc_id")
    },

    // Sequence packing: concatenate the corpus in doc_id order, split
    // every 2048 tokens — each doc gets its global token offset and the
    // id of the training sequence its first token lands in. The oracle
    // is the single-reducer running-sum window the op replaces with
    // range-partitioned per-partition prefix sums.
    GraftQuery(
      "q71_sequence_packing",
      """WITH t AS (
        |  SELECT doc_id,
        |    len(string_split_regex(text, '\s+')) AS n_tok
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tok,
        |    COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS token_start
        |  FROM t)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
        |  CAST(token_start AS BIGINT) AS token_start,
        |  CAST(token_start // 2048 AS BIGINT) AS seq_id
        |FROM o ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val t = Tables.load(s, dir, "documents")
        .select($"doc_id",
          TextOps.tokenCount($"text").cast("long").as("n_tok"))
      IdOps.packIntoSequences(
          t, "n_tok", 2048L, "token_start", "seq_id", "doc_id")
        .select($"doc_id", $"n_tok", $"token_start", $"seq_id")
        .orderBy($"doc_id")
    },

    // Contiguous 0-based global ids without a single-reducer window:
    // range-partition + sort + per-partition offsets (IdOps). The
    // oracle is the single-reducer row_number the op replaces.
    GraftQuery(
      "q64_contiguous_ids",
      """SELECT row_number() OVER (ORDER BY doc_id) - 1 AS new_id, doc_id
        |FROM documents ORDER BY new_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      IdOps.contiguousIds(
          Tables.load(s, dir, "documents").select($"doc_id"),
          "new_id", "doc_id")
        .orderBy($"new_id")
    },

    // Deterministic global shuffle (training-data order randomization):
    // rank rows by a Knuth multiplicative hash of the id — the same
    // seed always yields the same permutation on any cluster layout,
    // and changing the salt reshuffles. Distributed via q64's
    // range-partition contiguousIds (no single-reducer window); the
    // oracle is the one-window formulation over the same hash.
    GraftQuery(
      "q123_deterministic_shuffle",
      """WITH h AS (
        |  SELECT doc_id,
        |    (doc_id * 2654435761 + 12345) % 4294967296 AS hk
        |  FROM documents)
        |SELECT CAST(row_number() OVER (ORDER BY hk, doc_id) - 1 AS BIGINT)
        |    AS shuffle_rank,
        |  doc_id
        |FROM h ORDER BY shuffle_rank""".stripMargin) { (s, dir) =>
      import s.implicits._
      val h = Tables.load(s, dir, "documents")
        .select($"doc_id",
          (($"doc_id" * 2654435761L + 12345L) % 4294967296L).as("hk"))
      IdOps.contiguousIds(h, "shuffle_rank", "hk", "doc_id")
        .select($"shuffle_rank", $"doc_id")
        .orderBy($"shuffle_rank")
    },

    // Per-key cap / hot-domain downsampling (CurationOps.capPerKey):
    // at most 10 docs per source, picked as the 10 smallest portable
    // id hashes — a stable uniform sample per key. The op runs the
    // skew-proof two-level top-N (rank within hash buckets first, then
    // over the ≤ buckets×N survivors); the oracle is the one-window
    // formulation the two-phase plan must equal exactly.
    GraftQuery(
      "q91_domain_cap",
      s"""WITH h AS (
         |  SELECT source, doc_id,
         |    ${duckPolyHash("CAST(doc_id AS VARCHAR) || ':cap1'")} AS h
         |  FROM documents),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY h, doc_id) AS rk
         |  FROM h)
         |SELECT source, COUNT(*) AS n_kept,
         |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
         |FROM r WHERE rk <= 10 GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      CurationOps.capPerKey(
          Tables.load(s, dir, "documents"),
          "source", "doc_id", maxN = 10, salt = "cap1", nBuckets = 8)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_kept"), sum($"doc_id").as("sum_ids"))
        .orderBy($"source")
    },

    // Declarative data-quality suite (Deequ-style): four constraint
    // checks over `orders` evaluated in ONE aggregation pass (null,
    // uniqueness, range, domain) plus a referential-integrity check of
    // lineitem→orders as a single left-outer pass. The report itself
    // (violations, totals, pass flags) is the hashed artifact.
    GraftQuery(
      "q99_validation",
      """WITH checks AS (
        |  SELECT 'o_orderkey_not_null' AS check_name,
        |    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS violations,
        |    COUNT(*) AS total FROM orders
        |  UNION ALL
        |  SELECT 'o_orderkey_unique',
        |    COUNT(*) - COUNT(DISTINCT o_orderkey), COUNT(*) FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice_positive',
        |    CAST(SUM(CASE WHEN COALESCE(o_totalprice > 0, FALSE) THEN 0
        |             ELSE 1 END) AS BIGINT),
        |    COUNT(*) FROM orders
        |  UNION ALL
        |  SELECT 'o_status_domain',
        |    CAST(SUM(CASE WHEN COALESCE(o_orderstatus IN ('O','F','P'), FALSE)
        |             THEN 0 ELSE 1 END) AS BIGINT),
        |    COUNT(*) FROM orders
        |  UNION ALL
        |  SELECT 'l_orderkey_ri',
        |    CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    COUNT(*)
        |  FROM lineitem l
        |  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON l.l_orderkey = o.o_orderkey)
        |SELECT check_name, violations, total, violations = 0 AS passed
        |FROM checks ORDER BY check_name""".stripMargin) { (s, dir) =>
      runValidation(s, dir)
    },

    // Deterministic data-mixture sampling toward target source shares
    // (Pile-style weighting): 15 weighted sources (two weight tiers),
    // 5 unweighted sources dropped; exact-integer rates; pure-hash keep
    // decision. The kept doc_id sum per source travels in the hash, so
    // the exact kept SET (not just counts) is gate-checked.
    GraftQuery(
      "q102_data_mixture",
      s"""WITH w(source, w_ppm) AS (VALUES
         |  ${(0 until 10).map(i => s"('src$i', 60000)").mkString(", ")},
         |  ${(10 until 15).map(i => s"('src$i', 80000)").mkString(", ")}),
         |cnt AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY source),
         |r AS (
         |  SELECT w.source, LEAST(1000000, (300 * w_ppm) // c) AS rate_ppm
         |  FROM w JOIN cnt ON w.source = cnt.source),
         |kept AS (
         |  SELECT d.source, d.doc_id
         |  FROM documents d JOIN r ON d.source = r.source
         |  WHERE ${duckPolyHash("CAST(doc_id AS VARCHAR) || ':mix1'")}
         |        % 1000000 < r.rate_ppm)
         |SELECT source, COUNT(*) AS n_kept,
         |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
         |FROM kept GROUP BY source ORDER BY source""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val weights: Map[String, Long] =
        ((0 until 10).map(i => s"src$i" -> 60000L) ++
          (10 until 15).map(i => s"src$i" -> 80000L)).toMap
      CurationOps.mixtureSample(
          Tables.load(s, dir, "documents"),
          "doc_id", "source", weights, nTarget = 300L, salt = "mix1")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_kept"), sum($"doc_id").as("sum_ids"))
        .orderBy($"source")
    },

    // Corpus-rarity scoring (integer perplexity-filter analogue): mean
    // inverse corpus token frequency per doc, ppm. Both tails filter:
    // high = gibberish/OCR noise, low = templated boilerplate.
    GraftQuery(
      "q105_rarity_score",
      """WITH dt AS (
        |  SELECT doc_id, u.term AS term
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'),
        |            x -> x <> '') AS tk
        |        FROM documents) t, UNNEST(tk) AS u(term)),
        |f AS (SELECT term, COUNT(*) AS cnt FROM dt GROUP BY term)
        |SELECT dt.doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(1000000 // f.cnt) AS BIGINT) // COUNT(*) AS rarity_ppm
        |FROM dt JOIN f USING (term)
        |GROUP BY dt.doc_id
        |ORDER BY dt.doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      CurationOps.rarityScorePpm(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    },

    // CCNet-style perplexity-bucket mixture readout (Wenzek et al.
    // 2020: bucket the corpus into head/middle/tail terciles by LM
    // score and report each bucket's mass — the mixture dial CCNet
    // tunes): q105's integer rarity score stands in for the LM, and
    // the tercile boundary comes from the score VALUE HISTOGRAM via a
    // range-partitioned prefix sum (bucket(v) = cumb·3 div n — every
    // doc with the same score lands in the same bucket, exact on both
    // engines; no global ordered window, the r7-#2 contract).
    GraftQuery(
      "q262_ccnet_buckets",
      """WITH dt AS (
        |  SELECT doc_id, u.term AS term
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'),
        |            x -> x <> '') AS tk
        |        FROM documents) t, UNNEST(tk) AS u(term)),
        |f AS (SELECT term, COUNT(*) AS cnt FROM dt GROUP BY term),
        |scored AS (
        |  SELECT dt.doc_id, COUNT(*) AS n_tokens,
        |    CAST(SUM(1000000 // f.cnt) AS BIGINT) // COUNT(*)
        |      AS rarity_ppm
        |  FROM dt JOIN f USING (term)
        |  GROUP BY dt.doc_id),
        |h AS (SELECT rarity_ppm AS v, COUNT(*) AS c
        |      FROM scored GROUP BY 1),
        |w AS (
        |  SELECT v, c,
        |    COALESCE(SUM(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cumb,
        |    SUM(c) OVER () AS n
        |  FROM h),
        |b AS (SELECT v,
        |  CAST(LEAST(2, cumb * 3 // n) AS BIGINT) AS bucket FROM w)
        |SELECT b.bucket, COUNT(*) AS n_docs,
        |  CAST(SUM(s.n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(MIN(s.rarity_ppm) AS BIGINT) AS min_score,
        |  CAST(MAX(s.rarity_ppm) AS BIGINT) AS max_score
        |FROM scored s JOIN b ON b.v = s.rarity_ppm
        |GROUP BY b.bucket ORDER BY b.bucket""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val scored = CurationOps.rarityScorePpm(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        .graftCheckpoint() // histogram + readout consumers
      val h = scored.groupBy($"rarity_ppm".as("v"))
        .agg(count(lit(1)).as("c"))
      val tot = h.agg(sum($"c").as("n"))
      val b = IdOps
        .prefixSums(h, Seq("c"), Seq("cumb"), inclusive = false, "v")
        .crossJoin(broadcast(tot))
        .select($"v", least(lit(2L), div($"cumb" * 3L, $"n"))
          .as("bucket"))
      scored.join(b, scored("rarity_ppm") === b("v"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("total_tokens"),
          min($"rarity_ppm").as("min_score"),
          max($"rarity_ppm").as("max_score"))
        .orderBy($"bucket")
    },

    // Training-data pipeline v2 — the round-4 ops COMPOSED end to end:
    // rarity filter (keep below-median boilerplate+common half) →
    // 32-token chunking (no overlap) → pack chunks into 256-token
    // training sequences via range-partitioned prefix sums. Per-seq
    // chunk counts and token sums travel in the hash, so the whole
    // chained dataflow (filter set, chunk boundaries, global offsets,
    // sequence assignment) is checked as one artifact.
    GraftQuery(
      "q107_pipeline_v2",
      """WITH dt AS (
        |  SELECT doc_id, u.term AS term
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'),
        |            x -> x <> '') AS tk
        |        FROM documents) t, UNNEST(tk) AS u(term)),
        |f AS (SELECT term, COUNT(*) AS cnt FROM dt GROUP BY term),
        |rar AS (
        |  SELECT dt.doc_id,
        |    CAST(SUM(1000000 // f.cnt) AS BIGINT) // COUNT(*) AS rarity_ppm
        |  FROM dt JOIN f USING (term) GROUP BY dt.doc_id),
        |kept AS (
        |  SELECT d.doc_id,
        |    list_filter(string_split_regex(d.text, '\s+'),
        |      x -> x <> '') AS tk
        |  FROM documents d JOIN rar ON d.doc_id = rar.doc_id
        |  WHERE rar.rarity_ppm < 1105),
        |c AS (
        |  SELECT doc_id, tk,
        |    CASE WHEN len(tk) <= 32 THEN 1
        |         ELSE 1 + (len(tk) - 32 + 31) // 32 END AS nchunks
        |  FROM kept),
        |e AS (
        |  SELECT doc_id, tk, CAST(u.k AS INTEGER) AS chunk_id
        |  FROM c, UNNEST(generate_series(0, nchunks - 1)) AS u(k)),
        |ch AS (
        |  SELECT doc_id, chunk_id,
        |    CAST(len(tk[chunk_id*32 + 1 : chunk_id*32 + 32]) AS BIGINT)
        |      AS n_tok
        |  FROM e),
        |o AS (
        |  SELECT doc_id, chunk_id, n_tok,
        |    COALESCE(SUM(n_tok) OVER (ORDER BY doc_id, chunk_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS token_start
        |  FROM ch)
        |SELECT CAST(token_start // 256 AS BIGINT) AS seq_id,
        |  COUNT(*) AS n_chunks, CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val keptIds = CurationOps.rarityScorePpm(docs, "doc_id", "text")
        .filter($"rarity_ppm" < 1105).select("doc_id")
      val chunks = TextOps.chunkDocs(
          docs.join(keptIds, "doc_id"), "doc_id", "text",
          maxTokens = 32, overlap = 0)
        .select($"doc_id", $"chunk_id", $"n_tokens".cast("long").as("n_tok"))
      IdOps.packIntoSequences(
          chunks, "n_tok", 256L, "token_start", "seq_id",
          "doc_id", "chunk_id")
        .groupBy($"seq_id")
        .agg(count(lit(1)).as("n_chunks"), sum($"n_tok").as("sum_tokens"))
        .orderBy($"seq_id")
    },

    // Corpus snapshot diff (data versioning): classify every doc key
    // across two snapshots as added/removed/changed/unchanged so an
    // incremental pipeline re-processes only the delta. Both sides
    // reduce to (key, md5) before the full-outer shuffle — document
    // bodies never travel (SnapshotOps scaladoc). The oracle replays
    // the same classification by direct text comparison: hash-compare
    // and content-compare must agree.
    GraftQuery(
      "q127_snapshot_diff",
      """WITH snap_a AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 13 <> 0),
        |snap_b AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END
        |      AS text
        |  FROM documents WHERE doc_id % 11 <> 0)
        |SELECT COALESCE(snap_a.doc_id, snap_b.doc_id) AS doc_id,
        |  CASE WHEN snap_a.doc_id IS NULL THEN 'added'
        |       WHEN snap_b.doc_id IS NULL THEN 'removed'
        |       WHEN snap_a.text = snap_b.text THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM snap_a FULL OUTER JOIN snap_b
        |  ON snap_a.doc_id = snap_b.doc_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ops.SnapshotOps
      val docs = Tables.load(s, dir, "documents")
      val oldSnap = docs.filter($"doc_id" % 13 =!= 0)
        .select($"doc_id", $"text")
      val newSnap = docs.filter($"doc_id" % 11 =!= 0)
        .select($"doc_id",
          when($"doc_id" % 7 === 0, concat($"text", lit(" rev2")))
            .otherwise($"text").as("text"))
      SnapshotOps.diffStatus(oldSnap, newSnap, Seq("doc_id"), Seq("text"))
        .orderBy($"doc_id")
    },

    // Priority sampling (Duffield-Lund-Thorup): deterministic weighted
    // top-k without replacement — u from the portable hash, priority =
    // w*1e6 div u, plans as TakeOrderedAndProject (no global sort).
    GraftQuery(
      "q128_priority_sample",
      s"""WITH pri AS (
         |  SELECT doc_id,
         |    (n_chars * 1000000) //
         |      ((${duckPolyHash("CAST(doc_id AS VARCHAR) || ':ps1'")}
         |        % 1000000) + 1) AS priority
         |  FROM documents)
         |SELECT doc_id, priority FROM pri
         |ORDER BY priority DESC, doc_id LIMIT 20""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      CurationOps.prioritySample(
          Tables.load(s, dir, "documents"), "doc_id", "n_chars", "ps1", 20)
        .select($"doc_id", $"priority")
        .orderBy($"priority".desc, $"doc_id")
    },

    // A-ES weighted sampling WITHOUT replacement (Efraimidis-Spirakis):
    // exponential-jitter keys -log2(u)/w, smallest-k — true sequential
    // weighted draws, the WOR companion to q128's DLT priorities. The
    // binary log is Q20 FIXED POINT (normalize by bit length, then 20
    // integer square-steps) — no transcendentals anywhere, so the
    // oracle replays every key bit-for-bit with the same integer
    // recurrence in SQL.
    GraftQuery(
      "q142_weighted_sample",
      s"""WITH base AS (
         |  SELECT doc_id, n_chars + 1 AS w,
         |    ((h * h) % 1000000007) % 1048576 + 1 AS v
         |  FROM (
         |    SELECT doc_id, n_chars,
         |      ${duckPolyHash("CAST(doc_id AS VARCHAR) || ':aes1'")} AS h
         |    FROM documents)),
         |norm AS (
         |  SELECT doc_id, w, v,
         |    length(printf('%b', v)) - 1 AS p
         |  FROM base),
         |logs AS (
         |  SELECT doc_id, w, p,
         |    list_reduce(
         |      list_prepend(
         |        {'y': v * CAST(pow(2, 30 - p) AS BIGINT),
         |         'acc': CAST(0 AS BIGINT)},
         |        list_transform(generate_series(1, 20), i ->
         |          {'y': CAST(0 AS BIGINT), 'acc': CAST(0 AS BIGINT)})),
         |      (s, t) -> CASE
         |        WHEN ((s.y * s.y) // 1073741824) >= 2147483648
         |        THEN {'y': ((s.y * s.y) // 1073741824) // 2,
         |              'acc': s.acc * 2 + 1}
         |        ELSE {'y': (s.y * s.y) // 1073741824,
         |              'acc': s.acc * 2} END) AS st
         |  FROM norm)
         |SELECT doc_id, CAST(w AS BIGINT) AS w,
         |  CAST((((20 - p) * 1048576 - st.acc) * 1000000) // w AS BIGINT)
         |    AS aes_key
         |FROM logs
         |ORDER BY aes_key, doc_id LIMIT 25""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", ($"n_chars" + 1L).cast("long").as("w"))
      CurationOps.weightedSampleAes(docs, "doc_id", "w", "aes1", 25)
        .select($"doc_id", $"w", $"aes_key")
        .orderBy($"aes_key", $"doc_id")
    },

    // DSIR-style importance weighting (hashed-bucket target/source
    // frequency ratios, integer log-free variant): score every doc by
    // how target-like (here: lang='en') its token distribution is.
    // Ratio table <= dim rows by construction => broadcast join.
    GraftQuery(
      "q129_dsir_score",
      s"""WITH toks AS (
         |  SELECT doc_id, lang,
         |    list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, lang,
         |    ${duckPolyHash("u.t || ':ds1'")} % 4096 AS b
         |  FROM toks, UNNEST(tk) AS u(t)),
         |tf AS (SELECT b, COUNT(*) AS ct_t FROM f WHERE lang = 'en' GROUP BY b),
         |sf AS (SELECT b, COUNT(*) AS ct_s FROM f GROUP BY b),
         |tn AS (SELECT CAST(SUM(ct_t) AS BIGINT) AS nt FROM tf),
         |sn AS (SELECT CAST(SUM(ct_s) AS BIGINT) AS ns FROM sf),
         |r AS (
         |  SELECT sf.b,
         |    (1000000 * ((1000000 * (COALESCE(tf.ct_t, 0) + 1))
         |        // (tn.nt + 4096)))
         |      // GREATEST((1000000 * (sf.ct_s + 1)) // (sn.ns + 4096), 1)
         |      AS ratio_micro
         |  FROM sf LEFT JOIN tf USING (b) CROSS JOIN tn CROSS JOIN sn),
         |s AS (
         |  SELECT f.doc_id, COUNT(*) AS n_feats,
         |    CAST(SUM(r.ratio_micro) AS BIGINT) AS sr
         |  FROM f JOIN r ON f.b = r.b GROUP BY f.doc_id)
         |SELECT d.doc_id, COALESCE(s.n_feats, 0) AS n_feats,
         |  COALESCE(CAST(s.sr // s.n_feats AS BIGINT), 0) AS score_micro
         |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val ratios = CurationOps.importanceRatios(
        docs.filter($"lang" === "en"), docs, "text", 4096, "ds1")
      CurationOps.dsirScore(docs, "doc_id", "text", ratios, 4096, "ds1")
        .orderBy($"doc_id")
    },

    // Deterministic epoch upsampling (the "2.5 epochs of English" data
    // recipe step): full copies from the integer part of the per-class
    // factor, one extra hash-gated copy from the fractional part; zh
    // factor 0 drops the class, fr 0.5 exercises the pure-fractional
    // path. Checksum over (doc_id, copy_id) pins the exact replica set.
    GraftQuery(
      "q133_epoch_upsample",
      s"""WITH c AS (
         |  SELECT doc_id, lang,
         |    CASE lang WHEN 'en' THEN 2500000 WHEN 'de' THEN 1000000
         |              WHEN 'es' THEN 1700000 WHEN 'fr' THEN 500000
         |              WHEN 'zh' THEN 0 ELSE 0 END AS fppm,
         |    ${duckPolyHash("CAST(doc_id AS VARCHAR) || ':up1'")}
         |      % 1000000 AS h
         |  FROM documents),
         |n AS (
         |  SELECT doc_id, lang,
         |    fppm // 1000000
         |      + CASE WHEN h < fppm % 1000000 THEN 1 ELSE 0 END AS copies
         |  FROM c),
         |e AS (
         |  SELECT doc_id, lang, u.copy_id
         |  FROM n, UNNEST(generate_series(1, copies)) AS u(copy_id)
         |  WHERE copies > 0)
         |SELECT lang, COUNT(*) AS n_rows,
         |  COUNT(DISTINCT doc_id) AS n_docs,
         |  CAST(SUM(doc_id * copy_id) AS BIGINT) AS checksum
         |FROM e GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      import s.implicits._
      CurationOps.upsampleMixture(
          Tables.load(s, dir, "documents"), "doc_id", "lang",
          Map("en" -> 2500000L, "de" -> 1000000L, "es" -> 1700000L,
            "fr" -> 500000L, "zh" -> 0L), "up1")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct($"doc_id").as("n_docs"),
          sum($"doc_id" * $"copy_id").as("checksum"))
        .orderBy($"lang")
    },

    // Token-budget selection: keep the highest-quality documents whose
    // tokens fit a global budget — greedy by (quality desc, id) with
    // exact global token offsets. The one-reducer SUM OVER window is
    // replaced by IdOps' range-partitioned prefix sums; the oracle
    // replays the window formulation.
    GraftQuery(
      "q131_token_budget",
      """WITH t AS (
        |  SELECT doc_id,
        |    len(string_split_regex(text, '\s+')) AS n_tok,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |        x -> x IN ('a','the'))) AS n_stop,
        |    list_sum(list_transform(string_split_regex(text, '\s+'),
        |        x -> len(x))) AS sum_len
        |  FROM documents),
        |pts AS (
        |  SELECT doc_id, n_tok,
        |    (CASE WHEN n_tok BETWEEN 50 AND 1000 THEN 40
        |          WHEN n_tok >= 10 THEN 20 ELSE 0 END)
        |  + (CASE WHEN (n_stop*1000)//n_tok BETWEEN 10 AND 400 THEN 30
        |          WHEN (n_stop*1000)//n_tok > 0 THEN 15 ELSE 0 END)
        |  + (CASE WHEN (sum_len*1000)//n_tok BETWEEN 3000 AND 8000 THEN 30
        |          WHEN (sum_len*1000)//n_tok BETWEEN 2000 AND 10000 THEN 15
        |          ELSE 0 END) AS q
        |  FROM t),
        |o AS (
        |  SELECT doc_id, n_tok, q,
        |    COALESCE(CAST(SUM(n_tok) OVER (ORDER BY q DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |      0) AS token_start
        |  FROM pts)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
        |  token_start,
        |  CASE WHEN token_start + n_tok <= 20000
        |       THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS kept
        |FROM o ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val scored = Tables.load(s, dir, "documents")
        .select($"doc_id",
          TextOps.tokenCount($"text").cast("long").as("n_tok"),
          TextOps.qualityScore($"text", Seq("a", "the")).as("q"))
        .withColumn("__negq", -$"q")
      IdOps.packIntoSequences(scored, "n_tok", 20000L,
          "token_start", "__seq", "__negq", "doc_id")
        .select($"doc_id", $"n_tok", $"token_start",
          when($"token_start" + $"n_tok" <= 20000L, lit(1L))
            .otherwise(lit(0L)).as("kept"))
        .orderBy($"doc_id")
    },

    // Length-bucketed batch assembly (padding-minimizing batching):
    // batches of 8 similar-length docs per 32-token length bucket,
    // assigned WITHOUT a per-bucket row_number window (IdOps scaladoc —
    // global contiguous rank minus broadcast bucket starts). The oracle
    // replays the window formulation the op provably equals.
    GraftQuery(
      "q132_length_batching",
      """WITH t AS (
        |  SELECT doc_id,
        |    len(string_split_regex(text, '\s+')) AS n_tok
        |  FROM documents),
        |b AS (SELECT doc_id, n_tok, n_tok // 32 AS bucket FROM t),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY bucket ORDER BY n_tok, doc_id) - 1 AS rn
        |  FROM b),
        |g AS (
        |  SELECT bucket, rn // 8 AS batch_id, COUNT(*) AS n_docs,
        |    MIN(n_tok) AS min_tok, MAX(n_tok) AS max_tok,
        |    CAST(SUM(n_tok) AS BIGINT) AS sum_tok
        |  FROM r GROUP BY 1, 2)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(batch_id AS BIGINT) AS batch_id, n_docs,
        |  CAST(min_tok AS BIGINT) AS min_tok,
        |  CAST(max_tok AS BIGINT) AS max_tok,
        |  CAST(n_docs * max_tok - sum_tok AS BIGINT) AS waste
        |FROM g ORDER BY bucket, batch_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val t = Tables.load(s, dir, "documents")
        .select($"doc_id", TextOps.tokenCount($"text").cast("long").as("n_tok"))
      IdOps.bucketedBatches(t, "n_tok", "doc_id", 32L, 8L, "bucket", "batch_id")
        .groupBy($"bucket", $"batch_id")
        .agg(count(lit(1)).as("n_docs"),
          min($"n_tok").as("min_tok"),
          max($"n_tok").as("max_tok"),
          sum($"n_tok").as("sum_tok"))
        .select($"bucket", $"batch_id", $"n_docs", $"min_tok", $"max_tok",
          ($"n_docs" * $"max_tok" - $"sum_tok").as("waste"))
        .orderBy($"bucket", $"batch_id")
    },

    // Table profiler (ProfileOps.profile): per-column row/null/distinct
    // counts, min/max, top-3 values — ALL columns in ONE corpus pass
    // (each row explodes to c (column, value) structs, map-side
    // combined; the only fine-keyed shuffle is the distinct-value
    // stream; top-k via the two-level window so no task sorts a hot
    // column's full distinct set). The oracle profiles the same columns
    // with per-column scalar subqueries — same stats, engine-portable
    // string renderings (integer/string columns only by design).
    GraftQuery(
      "q150_table_profile",
      ProfileCols.map { c =>
        s"""SELECT '$c' AS "column",
           |  (SELECT COUNT(*) FROM documents) AS n_rows,
           |  (SELECT COUNT(*) FROM documents WHERE $c IS NULL) AS n_nulls,
           |  (SELECT COUNT(DISTINCT CAST($c AS VARCHAR)) FROM documents
           |     WHERE $c IS NOT NULL) AS n_distinct,
           |  (SELECT MIN(CAST($c AS VARCHAR)) FROM documents) AS min_val,
           |  (SELECT MAX(CAST($c AS VARCHAR)) FROM documents) AS max_val,
           |  (SELECT string_agg(val || ':' || cnt, '|' ORDER BY rk)
           |   FROM (SELECT CAST($c AS VARCHAR) AS val, COUNT(*) AS cnt,
           |           row_number() OVER (ORDER BY COUNT(*) DESC,
           |             CAST($c AS VARCHAR)) AS rk
           |         FROM documents WHERE $c IS NOT NULL
           |         GROUP BY 1) WHERE rk <= 3) AS top3""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")) { (s, dir) =>
      graft.ops.ProfileOps.profile(
        Tables.load(s, dir, "documents"), ProfileCols)
    },

    // Blocklist filtering (CurationOps.blocklistFilter): per-doc hit
    // counts against a blocklist TABLE (equi-join — a million-entry
    // list stays a join, where a regex alternation degrades linearly
    // per row), keep docs at ≤ 60‰ hit ratio. Exact-token semantics;
    // the kept flag stays in the output so the reject stream is the
    // auditable complement.
    GraftQuery(
      "q161_blocklist",
      """WITH t AS (
        |  SELECT doc_id, u.tok AS tok
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'),
        |            x -> x <> '') AS tk
        |        FROM documents) s, UNNEST(tk) AS u(tok)),
        |bl AS (SELECT * FROM (VALUES ('error'), ('slow')) AS b(term)),
        |h AS (
        |  SELECT doc_id, COUNT(*) AS n_tokens, COUNT(bl.term) AS hits
        |  FROM t LEFT JOIN bl ON t.tok = bl.term GROUP BY 1)
        |SELECT doc_id, n_tokens, hits,
        |  (hits*1000)//n_tokens AS hit_ratio_milli,
        |  (hits*1000)//n_tokens <= 60 AS kept
        |FROM h ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val blocklist = Seq("error", "slow").toDF("term")
      CurationOps.blocklistFilter(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          blocklist, "term", maxRatioMilli = 60L)
        .orderBy($"doc_id")
    },

    // Percentile-rank normalization (CurationOps.percentileNormalize):
    // per-language percentile of doc length — the calibration that
    // makes one quality threshold mean the same thing in every
    // language. Exact integer rank transform over the per-group VALUE
    // HISTOGRAM (the q163 shape): the window walks distinct values,
    // never raw rows; ties share a pct_ppm by construction.
    GraftQuery(
      "q168_percentile_norm",
      """WITH h AS (
        |  SELECT lang, n_chars, COUNT(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |p AS (
        |  SELECT lang, n_chars,
        |    SUM(c) OVER (PARTITION BY lang ORDER BY n_chars) - c AS below,
        |    SUM(c) OVER (PARTITION BY lang) AS n
        |  FROM h)
        |SELECT d.doc_id, d.lang, d.n_chars,
        |  CAST((below*1000000)//n AS BIGINT) AS pct_ppm
        |FROM documents d
        |JOIN p ON p.lang = d.lang AND p.n_chars = d.n_chars
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      CurationOps.percentileNormalize(
          Tables.load(s, dir, "documents")
            .select($"doc_id", $"lang", $"n_chars"),
          "lang", "n_chars")
        .select($"doc_id", $"lang", $"n_chars", $"pct_ppm")
        .orderBy($"doc_id")
    },

    // KL(P‖Q) domain-shift score (CurationOps.klDivergenceQ20) between
    // the English and non-English document slices over the dim-64 DSIR
    // hashed-token feature space — the ingestion-drift / data-recipe
    // divergence monitor. Add-one smoothing over ALL dim buckets
    // (unseen ones included), four separate Q20 integer logs per bucket
    // (q153 rule: no product near Long range at any corpus size), the
    // division deferred to the corpus-level total, which rides every
    // row as an in-plan 1-row scalar. The oracle replays the identical
    // recurrence via the unrolled chained-CTE log.
    GraftQuery(
      "q178_kl_divergence",
      s"""WITH bp AS (
         |  SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split(u.t || ':kl1', ''),
         |        c -> ascii(c))),
         |      (a, x) -> (a*31+x)%1000000007) % 64 AS bucket,
         |    COUNT(*) AS cp
         |  FROM (SELECT list_filter(string_split_regex(text, '\\s+'),
         |          t -> t <> '') AS tk
         |        FROM documents WHERE lang = 'en') s,
         |    UNNEST(tk) AS u(t)
         |  GROUP BY 1),
         |bq AS (
         |  SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split(u.t || ':kl1', ''),
         |        c -> ascii(c))),
         |      (a, x) -> (a*31+x)%1000000007) % 64 AS bucket,
         |    COUNT(*) AS cq
         |  FROM (SELECT list_filter(string_split_regex(text, '\\s+'),
         |          t -> t <> '') AS tk
         |        FROM documents WHERE lang <> 'en') s,
         |    UNNEST(tk) AS u(t)
         |  GROUP BY 1),
         |np AS (SELECT COALESCE(CAST(SUM(cp) AS BIGINT), 0) AS np FROM bp),
         |nq AS (SELECT COALESCE(CAST(SUM(cq) AS BIGINT), 0) AS nq FROM bq),
         |spine AS (
         |  SELECT CAST(unnest(generate_series(0, 63)) AS BIGINT) AS bucket),
         |j AS (
         |  SELECT spine.bucket, COALESCE(bp.cp, 0) AS cp,
         |    COALESCE(bq.cq, 0) AS cq
         |  FROM spine LEFT JOIN bp USING (bucket)
         |  LEFT JOIN bq USING (bucket)),
         |args AS (
         |  SELECT bucket, 'ap' AS which, cp + 1 AS v FROM j
         |  UNION ALL SELECT bucket, 'aq', cq + 1 FROM j
         |  UNION ALL SELECT -1, 'np', np + 64 FROM np
         |  UNION ALL SELECT -1, 'nq', nq + 64 FROM nq),
         |${DuckLog2Q20.ctes("bucket", "which")},
         |lg AS (SELECT bucket, which, p * 1048576 + acc AS l FROM l20),
         |gl AS (SELECT
         |    MAX(CASE WHEN which = 'np' THEN l END) AS l_np,
         |    MAX(CASE WHEN which = 'nq' THEN l END) AS l_nq
         |  FROM lg WHERE bucket = -1),
         |piv AS (SELECT bucket,
         |    MAX(CASE WHEN which = 'ap' THEN l END) AS l_ap,
         |    MAX(CASE WHEN which = 'aq' THEN l END) AS l_aq
         |  FROM lg WHERE bucket >= 0 GROUP BY 1),
         |terms AS (
         |  SELECT j.bucket, j.cp, j.cq,
         |    piv.l_ap + gl.l_nq - piv.l_aq - gl.l_np AS l_q20
         |  FROM j JOIN piv USING (bucket) CROSS JOIN gl),
         |tot AS (
         |  SELECT CAST(SUM((cp + 1) * l_q20) AS BIGINT)
         |    // (MIN(np.np) + 64) AS kl_q20
         |  FROM terms CROSS JOIN np)
         |SELECT CAST(terms.bucket AS BIGINT) AS bucket, terms.cp,
         |  terms.cq, CAST(terms.l_q20 AS BIGINT) AS l_q20,
         |  CAST(tot.kl_q20 AS BIGINT) AS kl_q20
         |FROM terms CROSS JOIN tot ORDER BY bucket""".stripMargin) {
        (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      CurationOps.klDivergenceQ20(
          docs.filter($"lang" === "en"), docs.filter($"lang" =!= "en"),
          "text", dim = 64, salt = "kl1")
        .orderBy($"bucket")
    },

    // Population stability index (CurationOps.psiQ20) — the symmetric
    // industry drift monitor next to q178's directional KL, same
    // hashed-bucket feature space and Q20 log machinery; per-bucket
    // contribution (ap·denQ − aq·denP)·l is always ≥ 0 and exact, the
    // denP·denQ division deferred to the 1-row total.
    GraftQuery(
      "q219_psi",
      s"""WITH bp AS (
         |  SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split(u.t || ':psi1', ''),
         |        c -> ascii(c))),
         |      (a, x) -> (a*31+x)%1000000007) % 64 AS bucket,
         |    COUNT(*) AS cp
         |  FROM (SELECT list_filter(string_split_regex(text, '\\s+'),
         |          t -> t <> '') AS tk
         |        FROM documents WHERE lang = 'en') s,
         |    UNNEST(tk) AS u(t)
         |  GROUP BY 1),
         |bq AS (
         |  SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split(u.t || ':psi1', ''),
         |        c -> ascii(c))),
         |      (a, x) -> (a*31+x)%1000000007) % 64 AS bucket,
         |    COUNT(*) AS cq
         |  FROM (SELECT list_filter(string_split_regex(text, '\\s+'),
         |          t -> t <> '') AS tk
         |        FROM documents WHERE lang <> 'en') s,
         |    UNNEST(tk) AS u(t)
         |  GROUP BY 1),
         |np AS (SELECT COALESCE(CAST(SUM(cp) AS BIGINT), 0) AS np FROM bp),
         |nq AS (SELECT COALESCE(CAST(SUM(cq) AS BIGINT), 0) AS nq FROM bq),
         |spine AS (
         |  SELECT CAST(unnest(generate_series(0, 63)) AS BIGINT) AS bucket),
         |j AS (
         |  SELECT spine.bucket, COALESCE(bp.cp, 0) AS cp,
         |    COALESCE(bq.cq, 0) AS cq
         |  FROM spine LEFT JOIN bp USING (bucket)
         |  LEFT JOIN bq USING (bucket)),
         |args AS (
         |  SELECT bucket, 'ap' AS which, cp + 1 AS v FROM j
         |  UNION ALL SELECT bucket, 'aq', cq + 1 FROM j
         |  UNION ALL SELECT -1, 'np', np + 64 FROM np
         |  UNION ALL SELECT -1, 'nq', nq + 64 FROM nq),
         |${DuckLog2Q20.ctes("bucket", "which")},
         |lg AS (SELECT bucket, which, p * 1048576 + acc AS l FROM l20),
         |gl AS (SELECT
         |    MAX(CASE WHEN which = 'np' THEN l END) AS l_np,
         |    MAX(CASE WHEN which = 'nq' THEN l END) AS l_nq
         |  FROM lg WHERE bucket = -1),
         |piv AS (SELECT bucket,
         |    MAX(CASE WHEN which = 'ap' THEN l END) AS l_ap,
         |    MAX(CASE WHEN which = 'aq' THEN l END) AS l_aq
         |  FROM lg WHERE bucket >= 0 GROUP BY 1),
         |terms AS (
         |  SELECT j.bucket, j.cp, j.cq,
         |    piv.l_ap + gl.l_nq - piv.l_aq - gl.l_np AS l_q20,
         |    ((j.cp + 1) * (nq.nq + 64) - (j.cq + 1) * (np.np + 64))
         |      * (piv.l_ap + gl.l_nq - piv.l_aq - gl.l_np) AS contrib
         |  FROM j JOIN piv USING (bucket) CROSS JOIN gl
         |  CROSS JOIN np CROSS JOIN nq),
         |tot AS (
         |  SELECT CAST(SUM(contrib)
         |      // ((MIN(np.np) + 64) * (MIN(nq.nq) + 64)) AS BIGINT)
         |    AS psi_q20
         |  FROM terms CROSS JOIN np CROSS JOIN nq)
         |SELECT CAST(terms.bucket AS BIGINT) AS bucket, terms.cp,
         |  terms.cq, CAST(terms.l_q20 AS BIGINT) AS l_q20,
         |  CAST(terms.contrib AS BIGINT) AS contrib, tot.psi_q20
         |FROM terms CROSS JOIN tot ORDER BY bucket""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      CurationOps.psiQ20(
          docs.filter($"lang" === "en"), docs.filter($"lang" =!= "en"),
          "text", dim = 64, salt = "psi1")
        .orderBy($"bucket")
    },

    // Poisson bootstrap (EvalOps.poissonBootstrapMeans): 32 derandomized
    // Poisson(1) resamples of the corpus in ONE pass — replica
    // multiplicities from the literal inverse-CDF of a portable hash of
    // (doc_id, replica, salt), so any engine/run/partitioning draws the
    // identical resample; the replica-mean spread is the sampling
    // uncertainty of the corpus mean-doc-length. A naive bootstrap
    // rescans the corpus B times and needs a global index for
    // with-replacement draws.
    GraftQuery(
      "q185_poisson_bootstrap",
      """WITH r AS (
        |  SELECT CAST(unnest(generate_series(0, 31)) AS BIGINT)
        |    AS replica),
        |w AS (
        |  SELECT r.replica, d.n_chars,
        |    CAST(len(list_filter([367879, 735758, 919698, 981011,
        |        996340, 999405, 999916, 999989, 999998],
        |      c -> c <= list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(string_split(
        |            CAST(d.doc_id AS VARCHAR) || ':'
        |              || CAST(r.replica AS VARCHAR) || ':bs1', ''),
        |            x -> ascii(x))),
        |          (a, x) -> (a*31+x) % 1000000007) % 1000000))
        |      AS BIGINT) AS wgt
        |  FROM documents d CROSS JOIN r)
        |SELECT replica, CAST(SUM(wgt) AS BIGINT) AS n_eff,
        |  CAST(SUM(wgt * n_chars) AS BIGINT) AS value_sum,
        |  CASE WHEN SUM(wgt) > 0 THEN
        |    CAST(SUM(wgt * n_chars) * 1000 // SUM(wgt) AS BIGINT)
        |  END AS mean_milli
        |FROM w GROUP BY replica ORDER BY replica""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      graft.ops.EvalOps.poissonBootstrapMeans(
          Tables.load(s, dir, "documents").select($"doc_id", $"n_chars"),
          "doc_id", "n_chars", replicas = 32, salt = "bs1")
        .orderBy($"replica")
    },

    // Bootstrap confidence interval for the corpus mean — q185's
    // derandomized Poisson bootstrap COMPOSED with exact nearest-rank
    // quantiles over the 64-row replica-mean table (2.5% / 50% /
    // 97.5%): the full uncertainty-quantification readout in one gate.
    // The quantile window runs over B rows — constant-size whatever
    // the corpus.
    GraftQuery(
      "q206_bootstrap_ci",
      """WITH r AS (
        |  SELECT CAST(unnest(generate_series(0, 63)) AS BIGINT)
        |    AS replica),
        |w AS (
        |  SELECT r.replica, d.n_chars,
        |    CAST(len(list_filter([367879, 735758, 919698, 981011,
        |        996340, 999405, 999916, 999989, 999998],
        |      c -> c <= list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(string_split(
        |            CAST(d.doc_id AS VARCHAR) || ':'
        |              || CAST(r.replica AS VARCHAR) || ':ci1', ''),
        |            x -> ascii(x))),
        |          (a, x) -> (a*31+x) % 1000000007) % 1000000))
        |      AS BIGINT) AS wgt
        |  FROM documents d CROSS JOIN r),
        |m AS (
        |  SELECT replica,
        |    CASE WHEN SUM(wgt) > 0 THEN
        |      CAST(SUM(wgt * n_chars) * 1000 // SUM(wgt) AS BIGINT)
        |    END AS mean_milli
        |  FROM w GROUP BY replica),
        |q AS (
        |  SELECT mean_milli,
        |    row_number() OVER (ORDER BY mean_milli, replica) AS rn
        |  FROM m)
        |SELECT CAST(64 AS BIGINT) AS n_replicas,
        |  MAX(CASE WHEN rn = 2 THEN mean_milli END) AS lo_milli,
        |  MAX(CASE WHEN rn = 32 THEN mean_milli END) AS med_milli,
        |  MAX(CASE WHEN rn = 63 THEN mean_milli END) AS hi_milli
        |FROM q""".stripMargin) { (s, dir) =>
      import s.implicits._
      val means = graft.ops.EvalOps.poissonBootstrapMeans(
        Tables.load(s, dir, "documents").select($"doc_id", $"n_chars"),
        "doc_id", "n_chars", replicas = 64, salt = "ci1")
      // (global form — the grouped variant is q232's gate)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy($"mean_milli", $"replica")
      means
        .withColumn("rn", row_number().over(w))
        .agg(count(lit(1)).as("n_replicas"),
          max(when($"rn" === 2, $"mean_milli")).as("lo_milli"),
          max(when($"rn" === 32, $"mean_milli")).as("med_milli"),
          max(when($"rn" === 63, $"mean_milli")).as("hi_milli"))
    },

    // Per-group Poisson bootstrap (EvalOps.poissonBootstrapMeansGrouped)
    // — per-slice uncertainty from the SAME single corpus pass: the
    // replica draw keys on (id, replica, salt) alone, so each group's
    // replicas are slices of one bootstrap (comparable across groups),
    // not independent resamples.
    GraftQuery(
      "q232_grouped_bootstrap",
      """WITH r AS (
        |  SELECT CAST(unnest(generate_series(0, 15)) AS BIGINT)
        |    AS replica),
        |w AS (
        |  SELECT d.lang, r.replica, d.n_chars,
        |    CAST(len(list_filter([367879, 735758, 919698, 981011,
        |        996340, 999405, 999916, 999989, 999998],
        |      c -> c <= list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(string_split(
        |            CAST(d.doc_id AS VARCHAR) || ':'
        |              || CAST(r.replica AS VARCHAR) || ':gb1', ''),
        |            x -> ascii(x))),
        |          (a, x) -> (a*31+x) % 1000000007) % 1000000))
        |      AS BIGINT) AS wgt
        |  FROM documents d CROSS JOIN r)
        |SELECT lang, replica, CAST(SUM(wgt) AS BIGINT) AS n_eff,
        |  CAST(SUM(wgt * n_chars) AS BIGINT) AS value_sum,
        |  CASE WHEN SUM(wgt) > 0 THEN
        |    CAST(SUM(wgt * n_chars) * 1000 // SUM(wgt) AS BIGINT)
        |  END AS mean_milli
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      graft.ops.EvalOps.poissonBootstrapMeansGrouped(
          Tables.load(s, dir, "documents")
            .select($"lang", $"doc_id", $"n_chars"),
          "lang", "doc_id", "n_chars", replicas = 16, salt = "gb1")
        .orderBy($"lang", $"replica")
    },

    // Per-user behavioral entropy (q177's information signal lifted
    // from a per-row array to GROUPED counts): H_u = lg N_u −
    // (Σ c·lg c) div N_u in Q20 bits over each user's event-type
    // distribution — low entropy = a bot hammering one action, high =
    // diverse engagement. One count reduction + per-row Q20 logs; the
    // oracle runs one tagged-union log chain (q208 pattern).
    GraftQuery(
      "q244_user_entropy",
      s"""WITH c AS (
         |  SELECT user_id AS u, event_type AS t, COUNT(*) AS v
         |  FROM events GROUP BY 1, 2),
         |nu AS (SELECT u, CAST(SUM(v) AS BIGINT) AS n
         |       FROM c GROUP BY 1),
         |args AS (
         |  SELECT 'c' AS which, u, t, v FROM c
         |  UNION ALL SELECT 'n', u, '', n FROM nu),
         |${DuckLog2Q20.ctes("which", "u", "t")},
         |lg AS (SELECT which, u, t, p * 1048576 + acc AS l FROM l20),
         |s AS (
         |  SELECT c.u, SUM(c.v * lc.l) AS cs
         |  FROM c JOIN lg lc ON lc.which = 'c' AND lc.u = c.u
         |    AND lc.t = c.t
         |  GROUP BY 1)
         |SELECT nu.u AS user_id, nu.n AS n_events,
         |  CAST(ln.l - (s.cs // nu.n) AS BIGINT) AS entropy_q20
         |FROM nu JOIN s ON s.u = nu.u
         |JOIN lg ln ON ln.which = 'n' AND ln.u = nu.u
         |ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val lg = graft.functions.GraftColumns.binLog2Q20 _
      val c = Tables.load(s, dir, "events")
        .groupBy($"user_id", $"event_type")
        .agg(count(lit(1)).as("v"))
      c.withColumn("cl", $"v" * lg($"v"))
        .groupBy($"user_id")
        .agg(sum($"v").as("n_events"), sum($"cl").as("cs"))
        .select($"user_id", $"n_events",
          (lg($"n_events") - div($"cs", $"n_events")).as("entropy_q20"))
        .orderBy($"user_id")
    },

    // Mutual information MI(event_type; day-of-week) in Q20 bits — the
    // feature-relevance screen next to q178's KL and q193's χ²:
    // contribution c_ij·(lg c_ij + lg N − lg r_i − lg c_j), each lg the
    // Q20 integer recurrence (four separate logs, q153 rule: nothing
    // nears Long range); the corpus reduces to the |types|×7 cell
    // table in one pass, margins ride as domain-sized windows,
    // mi_microbits attaches as an in-plan 1-row scalar. The oracle
    // runs ONE unrolled log chain over a tagged union of every value
    // needing a log (the q178 pattern).
    GraftQuery(
      "q208_mutual_info",
      s"""WITH base AS (
         |  SELECT event_type AS i,
         |    (epoch_us(ts) // 86400000000) % 7 AS j
         |  FROM events),
         |cells AS (SELECT i, j, COUNT(*) AS c FROM base GROUP BY 1, 2),
         |rs AS (SELECT i, CAST(SUM(c) AS BIGINT) AS v
         |       FROM cells GROUP BY 1),
         |cs AS (SELECT j, CAST(SUM(c) AS BIGINT) AS v
         |       FROM cells GROUP BY 1),
         |nt AS (SELECT CAST(SUM(c) AS BIGINT) AS v FROM cells),
         |args AS (
         |  SELECT 'c' AS which, i, j, c AS v FROM cells
         |  UNION ALL SELECT 'r', i, -1, v FROM rs
         |  UNION ALL SELECT 'l', '', j, v FROM cs
         |  UNION ALL SELECT 'n', '', -1, v FROM nt),
         |${DuckLog2Q20.ctes("which", "i", "j")},
         |lg AS (SELECT which, i, j, p * 1048576 + acc AS l FROM l20),
         |gl AS (SELECT l AS l_n FROM lg WHERE which = 'n'),
         |terms AS (
         |  SELECT cells.i, cells.j, cells.c,
         |    cells.c * (lc.l + gl.l_n - lr.l - ll.l) AS contrib_q20
         |  FROM cells
         |  JOIN lg lc ON lc.which = 'c' AND lc.i = cells.i
         |    AND lc.j = cells.j
         |  JOIN lg lr ON lr.which = 'r' AND lr.i = cells.i
         |  JOIN lg ll ON ll.which = 'l' AND ll.j = cells.j
         |  CROSS JOIN gl),
         |tot AS (
         |  SELECT CAST(SUM(contrib_q20) * 1000000
         |      // (MIN(nt.v) * 1048576) AS BIGINT) AS mi_microbits
         |  FROM terms CROSS JOIN nt)
         |SELECT i AS event_type, CAST(j AS BIGINT) AS dow,
         |  CAST(c AS BIGINT) AS c,
         |  CAST(contrib_q20 AS BIGINT) AS contrib_q20,
         |  tot.mi_microbits
         |FROM terms CROSS JOIN tot
         |ORDER BY event_type, dow""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val div = graft.functions.GraftColumns.longDiv _
      val lg = graft.functions.GraftColumns.binLog2Q20 _
      val cells = Tables.load(s, dir, "events")
        .select($"event_type".as("i"),
          pmod(div(unix_micros($"ts"), lit(86400000000L)), lit(7L))
            .as("j"))
        .groupBy($"i", $"j").agg(count(lit(1)).as("c"))
      // bounded-domain contract: windows run over the contingency CELLS
      // (|event_type| × 7 weekday rows), never the corpus
      val wi = Window.partitionBy($"i")
      val wj = Window.partitionBy($"j")
      val wAll = Window.partitionBy()
      val terms = cells
        .withColumn("__r", sum($"c").over(wi))
        .withColumn("__cj", sum($"c").over(wj))
        .withColumn("__n", sum($"c").over(wAll))
        .withColumn("contrib_q20",
          $"c" * (lg($"c") + lg($"__n") - lg($"__r") - lg($"__cj")))
      val tot = terms.agg(
        div(sum($"contrib_q20") * 1000000L, min($"__n") * 1048576L)
          .as("mi_microbits"))
      terms.crossJoin(broadcast(tot))
        .select($"i".as("event_type"), $"j".as("dow"), $"c",
          $"contrib_q20", $"mi_microbits")
        .orderBy($"event_type", $"dow")
    },

    // Gopher-family composite quality rules (Rae et al. 2021 — the
    // third published rule set next to C4 q68/q69 and RefinedWeb q110):
    // seven per-doc boolean filters + keep, all integer/string-exact
    // (CurationOps.gopherQualityFlags). The line rules are exercised
    // for real by deterministic seeding: every 5th doc gets a bullet
    // line prepended, every 7th an ellipsis line appended — both
    // engines build the same text.
    GraftQuery(
      "q250_gopher_rules",
      """WITH seeded AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 5 = 0 THEN '- promo bullet' || chr(10)
        |      ELSE '' END) || text ||
        |    (CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'to be continued...'
        |      ELSE '' END) AS t
        |  FROM documents),
        |feat AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(t, '\s+'), w -> w <> '') AS w,
        |    list_filter(string_split(t, chr(10)), l -> trim(l) <> '') AS l
        |  FROM seeded),
        |m AS (
        |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
        |    CASE WHEN len(w) > 0 THEN
        |      CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT)
        |        * 1000 // len(w)
        |    ELSE 0 END AS mean_wlen_milli,
        |    len(list_filter(w, x -> contains(x, '#')
        |      OR contains(x, '...'))) AS sym,
        |    len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
        |      AS alpha,
        |    len(l) AS nl,
        |    len(list_filter(l, x -> starts_with(ltrim(x), '-')
        |      OR starts_with(ltrim(x), '*')
        |      OR starts_with(ltrim(x), '•'))) AS bul,
        |    len(list_filter(l, x -> ends_with(rtrim(x), '...'))) AS ell,
        |    len(list_filter(['the','be','to','of','and','that','have',
        |      'with'], s -> list_contains(
        |        list_transform(w, x -> lower(x)), s))) AS stp
        |  FROM feat)
        |SELECT doc_id, n_words,
        |  CAST(mean_wlen_milli AS BIGINT) AS mean_wlen_milli,
        |  n_words BETWEEN 50 AND 100000 AS ok_words,
        |  mean_wlen_milli BETWEEN 3000 AND 10000 AS ok_mean_wlen,
        |  sym * 10 <= n_words AS ok_symbol,
        |  bul * 10 <= nl AS ok_bullet,
        |  ell * 10 <= nl * 3 AS ok_ellipsis,
        |  alpha * 10 >= n_words * 8 AS ok_alpha,
        |  stp >= 2 AS ok_stop,
        |  (n_words BETWEEN 50 AND 100000)
        |    AND (mean_wlen_milli BETWEEN 3000 AND 10000)
        |    AND sym * 10 <= n_words AND bul * 10 <= nl
        |    AND ell * 10 <= nl * 3 AND alpha * 10 >= n_words * 8
        |    AND stp >= 2 AS keep
        |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val seeded = Tables.load(s, dir, "documents")
        .select($"doc_id", concat(
          when($"doc_id" % 5 === 0, lit("- promo bullet\n"))
            .otherwise(lit("")),
          $"text",
          when($"doc_id" % 7 === 0, lit("\nto be continued..."))
            .otherwise(lit(""))).as("t"))
      CurationOps.gopherQualityFlags(seeded, "doc_id", "t")
        .orderBy($"doc_id")
    },

    // Gopher repetition filters (CurationOps.repetitionStats): top
    // 2-gram and duplicate-3-gram character fractions per doc, exact
    // integer milli. Every 4th doc gets a repeated phrase appended so
    // both filters fire for real on this corpus; argmax ties resolve
    // by the q246 struct idiom on both engines.
    GraftQuery(
      "q251_repetition_filter",
      """WITH seeded AS (
        |  SELECT doc_id, text || CASE WHEN doc_id % 4 = 0
        |    THEN repeat(' click here to win', 8) ELSE '' END AS t
        |  FROM documents),
        |wl AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(t, '\s+'), x -> x <> '') AS w
        |  FROM seeded),
        |chars AS (
        |  SELECT doc_id, w,
        |    COALESCE(CAST(list_sum(list_transform(w, x -> len(x)))
        |      AS BIGINT), 0) AS wc
        |  FROM wl),
        |g2 AS (
        |  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
        |  FROM chars, unnest(generate_series(1, len(w) - 1)) AS u(i)
        |  WHERE len(w) >= 2),
        |c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
        |t2 AS (
        |  SELECT doc_id, c * len(g) AS t2chars FROM (
        |    SELECT doc_id, g, c, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY c DESC, g DESC) AS rk
        |    FROM c2) WHERE rk = 1),
        |g3 AS (
        |  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
        |  FROM chars, unnest(generate_series(1, len(w) - 2)) AS u(i)
        |  WHERE len(w) >= 3),
        |c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2),
        |d3 AS (
        |  SELECT doc_id, CAST(SUM(c * len(g)) AS BIGINT) AS d3chars
        |  FROM c3 WHERE c >= 2 GROUP BY 1)
        |SELECT chars.doc_id, wc AS word_chars,
        |  CASE WHEN wc > 0 THEN COALESCE(t2chars, 0) * 1000 // wc
        |    ELSE 0 END AS top2_frac_milli,
        |  CASE WHEN wc > 0 THEN COALESCE(d3chars, 0) * 1000 // wc
        |    ELSE 0 END AS dup3_frac_milli,
        |  (CASE WHEN wc > 0 THEN COALESCE(t2chars, 0) * 1000 // wc
        |     ELSE 0 END) <= 200
        |  AND (CASE WHEN wc > 0 THEN COALESCE(d3chars, 0) * 1000 // wc
        |     ELSE 0 END) <= 100 AS keep
        |FROM chars
        |LEFT JOIN t2 ON t2.doc_id = chars.doc_id
        |LEFT JOIN d3 ON d3.doc_id = chars.doc_id
        |ORDER BY chars.doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val seeded = Tables.load(s, dir, "documents")
        .select($"doc_id", concat($"text",
          when($"doc_id" % 4 === 0,
            concat_ws("", (1 to 8).map(_ =>
              lit(" click here to win")): _*)).otherwise(lit("")))
          .as("t"))
      CurationOps.repetitionStats(seeded, "doc_id", "t")
        .orderBy($"doc_id")
    },

    // Temperature-smoothed mixture at α = 0.5
    // (CurationOps.temperatureMixtureSample): per-lang keep-rates
    // ∝ √count — the multilingual head-flattening recipe — realized
    // with the q102 pure-hash keep. Exact kept SET per lang travels in
    // the hash (n + id-sum).
    GraftQuery(
      "q252_temperature_mix",
      s"""WITH cnt AS (
         |  SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
         |sq AS (
         |  SELECT lang, c,
         |    CAST(floor(sqrt(CAST(c AS DOUBLE))) AS BIGINT) AS s
         |  FROM cnt),
         |tot AS (SELECT CAST(SUM(s) AS BIGINT) AS ts FROM sq),
         |r AS (
         |  SELECT lang,
         |    LEAST(1000000, (400 * s * 1000000) // (ts * c)) AS rate_ppm
         |  FROM sq CROSS JOIN tot),
         |kept AS (
         |  SELECT d.lang, d.doc_id
         |  FROM documents d JOIN r ON d.lang = r.lang
         |  WHERE ${duckPolyHash("CAST(doc_id AS VARCHAR) || ':temp1'")}
         |        % 1000000 < r.rate_ppm)
         |SELECT lang, COUNT(*) AS n_kept,
         |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
         |FROM kept GROUP BY lang ORDER BY lang""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      CurationOps.temperatureMixtureSample(
          Tables.load(s, dir, "documents"),
          "doc_id", "lang", nTarget = 400L, salt = "temp1")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_kept"), sum($"doc_id").as("sum_ids"))
        .orderBy($"lang")
    },

    // Packing MANIFEST (q71's downstream artifact: what a training
    // loader actually consumes): per 2048-token sequence, the docs
    // whose first token lands in it, their count/id range/token mass,
    // and the sorted local boundary offsets — the attention-mask
    // reset points — as a comma-joined string (engine-portable array
    // rendering). Offsets come from the same range-partitioned prefix
    // sums as q71; the oracle replays the one-reducer window.
    GraftQuery(
      "q255_packing_manifest",
      """WITH t AS (
        |  SELECT doc_id,
        |    len(string_split_regex(text, '\s+')) AS n_tok
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tok,
        |    COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS ts
        |  FROM t)
        |SELECT CAST(ts // 2048 AS BIGINT) AS seq_id,
        |  COUNT(*) AS n_docs,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
        |  CAST(MAX(doc_id) AS BIGINT) AS last_doc,
        |  CAST(SUM(n_tok) AS BIGINT) AS tokens_started,
        |  array_to_string(list(ts % 2048 ORDER BY ts % 2048), ',')
        |    AS boundaries
        |FROM o GROUP BY 1 ORDER BY seq_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val t = Tables.load(s, dir, "documents")
        .select($"doc_id",
          TextOps.tokenCount($"text").cast("long").as("n_tok"))
      IdOps.packIntoSequences(
          t, "n_tok", 2048L, "token_start", "seq_id", "doc_id")
        .withColumn("local", $"token_start" % 2048L)
        .groupBy($"seq_id")
        .agg(count(lit(1)).as("n_docs"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"),
          sum($"n_tok").as("tokens_started"),
          array_join(array_sort(collect_list($"local")), ",")
            .as("boundaries"))
        .orderBy($"seq_id")
    },

    // CURATION → PACKING end-to-end (the composition finisher for the
    // round-8 filter family, like q107/q149/q155 for their pipelines):
    // Gopher quality rules AND repetition filters over the RAW corpus
    // select the kept set, which packs into 2048-token sequences with
    // the q255 manifest readout. Token counts are the filtered word
    // counts (gopher's n_words) on both engines.
    GraftQuery(
      "q256_curation_pipeline",
      """WITH feat AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), w -> w <> '')
        |      AS w,
        |    list_filter(string_split(text, chr(10)), l -> trim(l) <> '')
        |      AS l
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
        |    COALESCE(CAST(list_sum(list_transform(w, x -> len(x)))
        |      AS BIGINT), 0) AS wc,
        |    CASE WHEN len(w) > 0 THEN
        |      CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT)
        |        * 1000 // len(w)
        |    ELSE 0 END AS mwl,
        |    len(list_filter(w, x -> contains(x, '#')
        |      OR contains(x, '...'))) AS sym,
        |    len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
        |      AS alpha,
        |    len(l) AS nl,
        |    len(list_filter(l, x -> starts_with(ltrim(x), '-')
        |      OR starts_with(ltrim(x), '*')
        |      OR starts_with(ltrim(x), '•'))) AS bul,
        |    len(list_filter(l, x -> ends_with(rtrim(x), '...'))) AS ell,
        |    len(list_filter(['join','hash','row','scan','data','filter',
        |      'batch','merge'], s -> list_contains(
        |        list_transform(w, x -> lower(x)), s))) AS stp,
        |    w
        |  FROM feat),
        |g2 AS (
        |  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
        |  FROM m, unnest(generate_series(1, len(w) - 1)) AS u(i)
        |  WHERE len(w) >= 2),
        |c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
        |t2 AS (
        |  SELECT doc_id, c * len(g) AS t2chars FROM (
        |    SELECT doc_id, g, c, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY c DESC, g DESC) AS rk
        |    FROM c2) WHERE rk = 1),
        |g3 AS (
        |  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
        |  FROM m, unnest(generate_series(1, len(w) - 2)) AS u(i)
        |  WHERE len(w) >= 3),
        |c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2),
        |d3 AS (
        |  SELECT doc_id, CAST(SUM(c * len(g)) AS BIGINT) AS d3chars
        |  FROM c3 WHERE c >= 2 GROUP BY 1),
        |kept AS (
        |  SELECT m.doc_id, m.n_words
        |  FROM m
        |  LEFT JOIN t2 ON t2.doc_id = m.doc_id
        |  LEFT JOIN d3 ON d3.doc_id = m.doc_id
        |  WHERE m.n_words BETWEEN 50 AND 100000
        |    AND m.mwl BETWEEN 3000 AND 10000
        |    AND m.sym * 10 <= m.n_words
        |    AND m.bul * 10 <= m.nl
        |    AND m.ell * 10 <= m.nl * 3
        |    AND m.alpha * 10 >= m.n_words * 8
        |    AND m.stp >= 2
        |    AND (CASE WHEN wc > 0 THEN COALESCE(t2chars, 0) * 1000 // wc
        |      ELSE 0 END) <= 200
        |    AND (CASE WHEN wc > 0 THEN COALESCE(d3chars, 0) * 1000 // wc
        |      ELSE 0 END) <= 100),
        |o AS (
        |  SELECT doc_id, n_words,
        |    COALESCE(SUM(n_words) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS ts
        |  FROM kept)
        |SELECT CAST(ts // 2048 AS BIGINT) AS seq_id,
        |  COUNT(*) AS n_docs,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
        |  CAST(MAX(doc_id) AS BIGINT) AS last_doc,
        |  CAST(SUM(n_words) AS BIGINT) AS tokens_started,
        |  array_to_string(list(ts % 2048 ORDER BY ts % 2048), ',')
        |    AS boundaries
        |FROM o GROUP BY 1 ORDER BY seq_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      // corpus-appropriate stop list (the conformance corpus is DB
      // prose — English function words never appear; passing the
      // domain's own high-frequency terms is exactly how the rule is
      // deployed on a specialized corpus)
      val g = CurationOps.gopherQualityFlags(docs, "doc_id", "text",
          stopwords = Seq("join", "hash", "row", "scan",
            "data", "filter", "batch", "merge"))
        .select($"doc_id", $"n_words", $"keep".as("gk"))
      val r = CurationOps.repetitionStats(docs, "doc_id", "text")
        .select($"doc_id", $"keep".as("rk"))
      val kept = g.join(r, Seq("doc_id"))
        .filter($"gk" && $"rk")
        .select($"doc_id", $"n_words".as("n_tok"))
      IdOps.packIntoSequences(
          kept, "n_tok", 2048L, "token_start", "seq_id", "doc_id")
        .withColumn("local", $"token_start" % 2048L)
        .groupBy($"seq_id")
        .agg(count(lit(1)).as("n_docs"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"),
          sum($"n_tok").as("tokens_started"),
          array_join(array_sort(collect_list($"local")), ",")
            .as("boundaries"))
        .orderBy($"seq_id")
    },

    // Dataset card (the publishable release summary): per-lang doc
    // counts, token mass, exact-dup counts (q30's normalized key) and
    // mean length, as tagged-union (section, lang, value) rows — the
    // corpus reduces to |langs|·4 rows in ONE map-side-combined pass
    // per statistic. The shape a dataset release pipeline emits next
    // to the artifact.
    GraftQuery(
      "q283_dataset_card",
      """WITH base AS (
        |  SELECT lang,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'),
        |      t -> t <> '')) AS BIGINT) AS ntok,
        |    n_chars,
        |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
        |      AS key
        |  FROM documents),
        |agg AS (
        |  SELECT lang, COUNT(*) AS docs,
        |    CAST(SUM(ntok) AS BIGINT) AS tokens,
        |    CAST(COUNT(*) - COUNT(DISTINCT key) AS BIGINT) AS dup_docs,
        |    CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS avg_chars
        |  FROM base GROUP BY 1)
        |SELECT section, lang, value FROM (
        |  SELECT 'docs' AS section, lang, CAST(docs AS BIGINT) AS value
        |  FROM agg
        |  UNION ALL SELECT 'tokens', lang, tokens FROM agg
        |  UNION ALL SELECT 'dup_docs', lang, dup_docs FROM agg
        |  UNION ALL SELECT 'avg_chars', lang, avg_chars FROM agg)
        |ORDER BY section, lang""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val agg = Tables.load(s, dir, "documents")
        .select($"lang",
          size(filter(split($"text", "\\s+"), t => t =!= ""))
            .cast("long").as("ntok"),
          $"n_chars",
          md5(regexp_replace(trim(lower($"text")), "\\s+", " "))
            .as("key"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("docs"),
          sum($"ntok").as("tokens"),
          (count(lit(1)) - countDistinct($"key")).as("dup_docs"),
          div(sum($"n_chars"), count(lit(1))).as("avg_chars"))
        .graftCheckpoint() // four tagged-union consumers of 5 rows
      Seq("docs" -> $"docs", "tokens" -> $"tokens",
          "dup_docs" -> $"dup_docs", "avg_chars" -> $"avg_chars")
        .map { case (nm, c) =>
          agg.select(lit(nm).as("section"), $"lang", c.as("value")) }
        .reduce(_ unionByName _)
        .orderBy($"section", $"lang")
    })

  private def runValidation(
      s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    import graft.ops.ValidationOps
    val orders = Tables.load(s, dir, "orders")
    val lineitem = Tables.load(s, dir, "lineitem")
    ValidationOps.runChecks(orders, Seq(
        "o_orderkey_not_null" -> ValidationOps.notNull($"o_orderkey"),
        "o_orderkey_unique" -> ValidationOps.unique($"o_orderkey"),
        "o_totalprice_positive" ->
          ValidationOps.satisfies($"o_totalprice" > 0),
        "o_status_domain" ->
          ValidationOps.satisfies($"o_orderstatus".isin("O", "F", "P"))))
      .unionByName(ValidationOps.riViolations(
        lineitem, "l_orderkey", orders, "o_orderkey", "l_orderkey_ri"))
      .orderBy($"check_name")
  }
}
