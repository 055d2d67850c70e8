package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Checkpointer._
import graft.ops.{DedupOps, TextOps}

/** Deduplication conformance suite over `documents`: exact dedup,
  * n-gram Jaccard, MinHash+LSH, SimHash — each hash-checked against a
  * DuckDB re-implementation of the same portable arithmetic.
  *
  * Scale notes: no query here cross-joins the corpus. Candidate pairs
  * come from equi-joins on shingle/band/bucket keys (inverted-index
  * pattern), so the shuffles stay proportional to corpus size; the
  * per-row signature math is codegen'd higher-order functions.
  */
object DedupQueries {

  private val ShingleN = 3

  // DuckDB fragments for the shared portable hashes (kept in lockstep with
  // TextOps.polyHash / TextOps.shingleHashes — see those scaladocs).
  private val DuckShingleHashes =
    """list_distinct(list_transform(
      |    list_transform(generate_series(1, len(string_split_regex(text,'\s+'))-2),
      |      i -> array_to_string(string_split_regex(text,'\s+')[i:i+2], ' ')),
      |    s -> list_reduce(list_prepend(CAST(0 AS BIGINT),
      |          list_transform(string_split(s,''), c -> ascii(c))),
      |         (a,x) -> (a*31+x)%1000000007)))""".stripMargin

  // Multiset variant (no list_distinct): term frequency is the weight
  // for the histogram measures (q157/q158).
  private val DuckShingleHashesMulti =
    """list_transform(
      |    list_transform(generate_series(1, len(string_split_regex(text,'\s+'))-2),
      |      i -> array_to_string(string_split_regex(text,'\s+')[i:i+2], ' ')),
      |    s -> list_reduce(list_prepend(CAST(0 AS BIGINT),
      |          list_transform(string_split(s,''), c -> ascii(c))),
      |         (a,x) -> (a*31+x)%1000000007))""".stripMargin

  private val DuckTokenHashes =
    """list_distinct(list_transform(string_split_regex(text,'\s+'),
      |    s -> list_reduce(list_prepend(CAST(0 AS BIGINT),
      |          list_transform(string_split(s,''), c -> ascii(c))),
      |         (a,x) -> (a*31+x)%1000000007)))""".stripMargin

  val all: Seq[GraftQuery] = Seq(

    // Exact dedup: inject duplicate rows (same text, new ids), dedup by
    // md5(normalized text) keeping the smallest id, count survivors.
    GraftQuery(
      "q30_exact_dedup",
      s"""WITH all_docs AS (
         |  SELECT doc_id, text, source FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000, text, source FROM documents WHERE doc_id < 50),
         |keyed AS (
         |  SELECT *, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS key
         |  FROM all_docs),
         |keep AS (SELECT key, min(doc_id) AS keep_id FROM keyed GROUP BY key)
         |SELECT source, COUNT(*) AS n_docs
         |FROM keyed k JOIN keep ON k.key = keep.key AND k.doc_id = keep.keep_id
         |GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", $"text", $"source")
      val withDups = docs.union(
        docs.filter($"doc_id" < 50)
          .select(($"doc_id" + 100000).as("doc_id"), $"text", $"source"))
      DedupOps.dropExactDuplicates(withDups, "doc_id", "text")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy($"source")
    },

    // N-gram Jaccard near-dup pairs via inverted-index join on shingle
    // hashes (no cross join); per-mille similarity, integer-exact.
    GraftQuery(
      "q31_ngram_jaccard",
      s"""WITH sh AS (
         |  SELECT doc_id, $DuckShingleHashes AS hashes FROM documents),
         |inv AS (SELECT doc_id, unnest(hashes) AS h FROM sh),
         |shared AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
         |  FROM inv a JOIN inv b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, len(hashes) AS n FROM sh)
         |SELECT id_a, id_b,
         |  (shared*1000)//(sa.n + sb.n - shared) AS jaccard_milli
         |FROM shared
         |JOIN sizes sa ON sa.doc_id = id_a
         |JOIN sizes sb ON sb.doc_id = id_b
         |WHERE (shared*1000)//(sa.n + sb.n - shared) >= 500
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      // Inverted index + length-ratio bound beats the prefix-filtered
      // variant on THIS corpus (31-word vocabulary → no rare shingles
      // to prefix on; prefixing only adds shuffles). On Zipfian
      // real-text corpora use DedupOps.jaccardSimilarPairs — identical
      // output, bounded fan-out (equivalence spec-checked in
      // TextDedupSimSpec).
      val sh = Tables.spread(Tables.load(s, dir, "documents"))
        .select($"doc_id",
          TextOps.shingleHashes($"text", ShingleN).as("hashes"))
        .graftCheckpoint() // shingle once, on every core (3 consumers)
      DedupOps.sharedShingleCountsBounded(sh, "doc_id", "hashes", 500)
        .select($"id_a", $"id_b",
          floor($"shared".cast("double") * 1000.0 /
            ($"n_a" + $"n_b" - $"shared").cast("double")).cast("long")
            .as("jaccard_milli"))
        .filter($"jaccard_milli" >= 500)
        .orderBy($"id_a", $"id_b")
    },

    // MinHash (k=16) + LSH (4 bands × 4 rows) candidate pairs.
    GraftQuery(
      "q32_minhash_lsh",
      s"""WITH sh AS (
         |  SELECT doc_id, $DuckShingleHashes AS hashes FROM documents),
         |sigs AS (
         |  SELECT doc_id, list_transform(generate_series(0, 15), j ->
         |    coalesce(list_min(list_transform(hashes,
         |      h -> ((2*j+1)*h + j*j+7) % 4294967311)), 4294967311)) AS sig
         |  FROM sh),
         |bands AS (
         |  SELECT doc_id, b,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*4+1:b*4+4]),
         |      (a,x) -> (a*31 + x%1000000007) % 1000000007) AS bh
         |  FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS b))
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM bands a JOIN bands b
         |  ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val sh = Tables.spread(Tables.load(s, dir, "documents"))
        .select($"doc_id",
          TextOps.shingleHashes($"text", ShingleN).as("hashes"))
        .graftCheckpoint() // shingle once, on every core (2 consumers)
      val sig = DedupOps.minhashSignatures(sh, "doc_id", "hashes", 16)
      DedupOps.lshCandidatePairs(sig, "doc_id", "sig", bands = 4, rows = 4)
        .orderBy($"id_a", $"id_b")
    },

    // Incremental dedup: candidate pairs touching a NEW batch
    // (doc_id >= 400) against the accumulated corpus (< 400) — the
    // corpus never self-joins. Same MinHash/banding arithmetic as q32;
    // the oracle is q32's pair set restricted to pairs with a delta
    // side, which is exactly what the incremental operator must emit.
    GraftQuery(
      "q70_incremental_dedup",
      s"""WITH sh AS (
         |  SELECT doc_id, $DuckShingleHashes AS hashes FROM documents),
         |sigs AS (
         |  SELECT doc_id, list_transform(generate_series(0, 15), j ->
         |    coalesce(list_min(list_transform(hashes,
         |      h -> ((2*j+1)*h + j*j+7) % 4294967311)), 4294967311)) AS sig
         |  FROM sh),
         |bands AS (
         |  SELECT doc_id, b,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*4+1:b*4+4]),
         |      (a,x) -> (a*31 + x%1000000007) % 1000000007) AS bh
         |  FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS b))
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM bands a JOIN bands b
         |  ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
         |WHERE a.doc_id >= 400 OR b.doc_id >= 400
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      // No Tables.spread here (r16 VERDICT #1): this gate already pins
      // the signature table once via the checkpoint below, and the
      // downstream consumers are a SMALL bucketed index write + an
      // incremental probe — a 32-partition signature table inflates the
      // 8-bucket write and the probe plan for nothing (measured ~3×
      // wall regression when spread was added in r16).
      val sh = Tables.load(s, dir, "documents")
        .select($"doc_id",
          TextOps.shingleHashes($"text", ShingleN).as("hashes"))
      // Materialize the signatures once, then demonstrate the REAL
      // incremental shape end to end: the corpus's (band, bh, id) key
      // table is a STORED parquet table, bucketed+sorted on (band, bh)
      // — the daily batch probes it without the corpus being
      // re-shingled, re-hashed, or re-shuffled (the bucketed layout IS
      // the join partitioning; PlansSpec asserts the corpus subtree
      // has no exchange). Index build cost is one corpus pass, paid at
      // index-refresh time, not per batch.
      val sig = DedupOps.minhashSignatures(sh, "doc_id", "hashes", 16)
        .graftCheckpoint()
      graft.ops.BucketingOps.writeBucketed(
        DedupOps.lshBandKeyTable(
          sig.filter($"doc_id" < 400), "doc_id", "sig",
          bands = 4, rows = 4),
        "graft_q70_lsh_idx", Seq("band", "bh"), nBuckets = 8)
      DedupOps.lshCandidatePairsIncrementalIndexed(
          s.table("graft_q70_lsh_idx"), sig.filter($"doc_id" >= 400),
          "doc_id", "sig", bands = 4, rows = 4)
        .orderBy($"id_a", $"id_b")
    },

    // ASYMMETRIC containment dedup: C(A→B) = |A∩B| div |A| per mille,
    // pairs kept when either direction ≥ 600 — the subset/excerpt
    // relation Jaccard structurally misses (a short doc quoted inside
    // a long one has jaccard ≈ |A|/|B| → 0 but containment 1000). The
    // pair stream is q31's exact posting-list shape WITHOUT the
    // length-ratio bound (asymmetric pairs are exactly what that bound
    // drops); hot postings still route skew-safe. Integer-exact, so
    // the oracle replays the same arithmetic.
    GraftQuery(
      "q151_containment_dedup",
      s"""WITH sh AS (
         |  SELECT doc_id, $DuckShingleHashes AS s FROM documents),
         |inv AS (SELECT doc_id, unnest(s) AS h FROM sh),
         |shared AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
         |  FROM inv a JOIN inv b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, len(s) AS n FROM sh)
         |SELECT id_a, id_b, shared,
         |  CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
         |  (shared*1000)//sa.n AS cont_a_milli,
         |  (shared*1000)//sb.n AS cont_b_milli
         |FROM shared
         |JOIN sizes sa ON sa.doc_id = id_a
         |JOIN sizes sb ON sb.doc_id = id_b
         |WHERE (shared*1000)//sa.n >= 600 OR (shared*1000)//sb.n >= 600
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val sh = Tables.spread(Tables.load(s, dir, "documents"))
        .select($"doc_id",
          TextOps.shingleHashes($"text", ShingleN).as("hashes"))
        .graftCheckpoint() // shingle once, on every core (3 consumers)
      DedupOps.containmentPairs(sh, "doc_id", "hashes",
          thresholdMilli = 600)
        .select($"id_a", $"id_b", $"shared",
          $"n_a".cast("long").as("n_a"), $"n_b".cast("long").as("n_b"),
          $"cont_a_milli", $"cont_b_milli")
        .orderBy($"id_a", $"id_b")
    },

    // Quality-aware dedup survivor (GraphOps.dropNearDuplicatesByScore):
    // q60's clusters, but each cluster keeps its HIGHEST-n_chars member
    // (ties to the lower id) instead of the arbitrary min id — the
    // production curation policy: a cluster of an original and its
    // truncated copies must keep the original, which min-id cannot
    // guarantee. Unpaired docs survive untouched. The oracle replays
    // closure + per-component window pick.
    GraftQuery(
      "q156_dedup_keep_best",
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, $DuckShingleHashes AS hashes FROM documents),
         |inv AS (SELECT doc_id, unnest(hashes) AS h FROM sh),
         |shared AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
         |  FROM inv a JOIN inv b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, len(hashes) AS n FROM sh),
         |pairs AS (
         |  SELECT id_a, id_b FROM shared
         |  JOIN sizes sa ON sa.doc_id = id_a
         |  JOIN sizes sb ON sb.doc_id = id_b
         |  WHERE (shared*1000)//(sa.n + sb.n - shared) >= 500),
         |edges AS (
         |  SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(src, node) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node),
         |comp AS (SELECT src AS doc_id, MIN(node) AS component
         |  FROM reach GROUP BY src),
         |ranked AS (
         |  SELECT c.doc_id,
         |    row_number() OVER (PARTITION BY c.component
         |      ORDER BY d.n_chars DESC, c.doc_id) AS rk
         |  FROM comp c JOIN documents d USING (doc_id)),
         |losers AS (SELECT doc_id FROM ranked WHERE rk > 1)
         |SELECT d.doc_id, d.n_chars FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val sh = Tables.spread(docs)
        .select($"doc_id",
          TextOps.shingleHashes($"text", ShingleN).as("hashes"))
        .graftCheckpoint() // shingle once, on every core (3 consumers)
      val pairs = DedupOps
        .sharedShingleCountsBounded(sh, "doc_id", "hashes", 500)
        .select($"id_a", $"id_b",
          floor($"shared".cast("double") * 1000.0 /
            ($"n_a" + $"n_b" - $"shared").cast("double")).cast("long")
            .as("jm"))
        .filter($"jm" >= 500).select($"id_a", $"id_b")
      graft.ops.GraphOps.dropNearDuplicatesByScore(
          docs.select($"doc_id", $"n_chars"), "doc_id", "n_chars", pairs)
        .orderBy($"doc_id")
    },

    // Weighted (multiset) Jaccard pairs (DedupOps.weightedJaccardPairs):
    // shingle HISTOGRAMS instead of sets — Σmin(tf)/Σmax(tf), with the
    // denominator folded to two ride-along totals. Catches repeated-
    // boilerplate structure the set-based q31 flattens. Posting-list
    // join on the shingle hash; Σtf ratio bound prunes pre-aggregation.
    GraftQuery(
      "q157_weighted_jaccard",
      s"""WITH sh AS (
         |  SELECT doc_id, $DuckShingleHashesMulti AS s FROM documents),
         |hist AS (
         |  SELECT doc_id, u.h AS h, COUNT(*) AS tf
         |  FROM sh, UNNEST(s) AS u(h) GROUP BY 1, 2),
         |stats AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS tot FROM hist GROUP BY 1),
         |pair AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(SUM(LEAST(a.tf, b.tf)) AS BIGINT) AS min_sum
         |  FROM hist a JOIN hist b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, min_sum, sa.tot AS tot_a, sb.tot AS tot_b,
         |  (min_sum*1000)//(sa.tot + sb.tot - min_sum) AS wj_milli
         |FROM pair
         |JOIN stats sa ON sa.doc_id = id_a
         |JOIN stats sb ON sb.doc_id = id_b
         |WHERE (min_sum*1000)//(sa.tot + sb.tot - min_sum) >= 500
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val sh = Tables.spread(Tables.load(s, dir, "documents"))
        .select($"doc_id",
          graft.functions.GraftColumns.shingleHash($"text", ShingleN)
            .as("feats"))
        .graftCheckpoint() // shingle once, on every core
      DedupOps.weightedJaccardPairs(sh, "doc_id", "feats",
          thresholdMilli = 500)
        .orderBy($"id_a", $"id_b")
    },

    // Sparse cosine pairs via the inverted index
    // (DedupOps.sparseCosinePairs): feature-hashed tf vectors (shingle
    // hash mod 65536 — the hashing-trick CountVectorizer; dim sized so collisions stay rare and posting lists match the raw-vocabulary density (4096 measured 1.7x slower from collision-fattened postings)), cosine
    // compared SQUARED in integer ppm so no sqrt/floating point enters
    // the plan. The sparse scale path next to q34's dense-vector BNLJ:
    // compute is Σdf² over the feature vocabulary, never corpus n².
    GraftQuery(
      "q158_sparse_cosine",
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    list_transform($DuckShingleHashesMulti, h -> h % 65536) AS s
         |  FROM documents),
         |hist AS (
         |  SELECT doc_id, u.h AS h, COUNT(*) AS tf
         |  FROM sh, UNNEST(s) AS u(h) GROUP BY 1, 2),
         |stats AS (
         |  SELECT doc_id, CAST(SUM(tf*tf) AS BIGINT) AS n2 FROM hist GROUP BY 1),
         |pair AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
         |  FROM hist a JOIN hist b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, dot, sa.n2 AS n2_a, sb.n2 AS n2_b,
         |  (dot*dot*1000000)//(sa.n2 * sb.n2) AS cos2_ppm
         |FROM pair
         |JOIN stats sa ON sa.doc_id = id_a
         |JOIN stats sb ON sb.doc_id = id_b
         |WHERE (dot*dot*1000000)//(sa.n2 * sb.n2) >= 490000
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val sh = Tables.spread(Tables.load(s, dir, "documents"))
        .select($"doc_id",
          transform(
            graft.functions.GraftColumns.shingleHash($"text", ShingleN),
            h => pmod(h, lit(65536L))).as("feats"))
        .graftCheckpoint() // shingle once, on every core
      DedupOps.sparseCosinePairs(sh, "doc_id", "feats",
          thresholdPpm = 490000)
        .orderBy($"id_a", $"id_b")
    },

    // Near-dup CLUSTERS: the q31 pair stage feeds connected components
    // (iterated min-label propagation — the map-reduce CC algorithm),
    // rolled up per cluster. The oracle computes the same transitive
    // closure with a recursive CTE, so the clustering — not just the
    // pairs — is hash-checked. This is the corpus-dedup finisher: keep
    // one doc per cluster (GraphOps.dropNearDuplicates, spec-checked).
    GraftQuery(
      "q60_neardup_clusters",
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, $DuckShingleHashes AS hashes FROM documents),
         |inv AS (SELECT doc_id, unnest(hashes) AS h FROM sh),
         |shared AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
         |  FROM inv a JOIN inv b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, len(hashes) AS n FROM sh),
         |pairs AS (
         |  SELECT id_a, id_b FROM shared
         |  JOIN sizes sa ON sa.doc_id = id_a
         |  JOIN sizes sb ON sb.doc_id = id_b
         |  WHERE (shared*1000)//(sa.n + sb.n - shared) >= 500),
         |edges AS (
         |  SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(src, node) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node),
         |comp AS (SELECT src AS doc_id, MIN(node) AS component
         |  FROM reach GROUP BY src)
         |SELECT component, COUNT(*) AS n_members,
         |  MAX(doc_id) AS max_member
         |FROM comp GROUP BY component
         |ORDER BY component""".stripMargin) { (s, dir) =>
      import s.implicits._
      val sh = Tables.spread(Tables.load(s, dir, "documents"))
        .select($"doc_id",
          TextOps.shingleHashes($"text", ShingleN).as("hashes"))
        .graftCheckpoint() // shingle once, on every core (3 consumers)
      val pairs = DedupOps
        .sharedShingleCountsBounded(sh, "doc_id", "hashes", 500)
        .select($"id_a", $"id_b",
          floor($"shared".cast("double") * 1000.0 /
            ($"n_a" + $"n_b" - $"shared").cast("double")).cast("long")
            .as("jaccard_milli"))
        .filter($"jaccard_milli" >= 500)
        .select($"id_a", $"id_b")
      graft.ops.GraphOps.connectedComponents(pairs, "id_a", "id_b")
        .groupBy($"component")
        .agg(count(lit(1)).as("n_members"),
          max($"id").as("max_member"))
        .orderBy($"component")
    },

    // SimHash: 32-bit signature per document from distinct token hashes.
    GraftQuery(
      "q33_simhash",
      s"""WITH th AS (
         |  SELECT doc_id, $DuckTokenHashes AS hashes FROM documents)
         |SELECT doc_id,
         |  CAST(list_sum(list_transform(generate_series(0, 31), i ->
         |    CASE WHEN list_sum(list_transform(hashes,
         |        h -> ((h // CAST(pow(2,i) AS BIGINT)) % 2) * 2 - 1)) > 0
         |      THEN CAST(pow(2,i) AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
         |FROM th ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        // pre-bind the token-hash array: simhash32's 32 bit-loops each
        // re-evaluate their input, so an embedded expression would
        // re-tokenize the text 32x per row
        .select($"doc_id",
          array_distinct(
            transform(TextOps.tokenize($"text"), TextOps.polyHash(_)))
            .as("__th"))
        .select($"doc_id", DedupOps.simhash32($"__th").as("simhash"))
        .orderBy($"doc_id")
    },

    // INCREMENTAL cluster maintenance: q60's pair graph split into an
    // "old" batch (both endpoints < 350 — labeled first) and a "delta"
    // batch (the rest) merged in via the component-contraction graph
    // (GraphOps.mergeComponents — the iterative part runs on touched
    // COMPONENTS, not corpus rows). The oracle is the full-recompute
    // closure over ALL pairs, so merge ≡ recompute is what's gated.
    GraftQuery(
      "q115_incremental_cc",
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, $DuckShingleHashes AS hashes FROM documents),
         |inv AS (SELECT doc_id, unnest(hashes) AS h FROM sh),
         |shared AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
         |  FROM inv a JOIN inv b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, len(hashes) AS n FROM sh),
         |pairs AS (
         |  SELECT id_a, id_b FROM shared
         |  JOIN sizes sa ON sa.doc_id = id_a
         |  JOIN sizes sb ON sb.doc_id = id_b
         |  WHERE (shared*1000)//(sa.n + sb.n - shared) >= 500),
         |edges AS (
         |  SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(src, node) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node),
         |comp AS (SELECT src AS doc_id, MIN(node) AS component
         |  FROM reach GROUP BY src)
         |SELECT component, COUNT(*) AS n_members,
         |  MAX(doc_id) AS max_member
         |FROM comp GROUP BY component
         |ORDER BY component""".stripMargin) { (s, dir) =>
      import s.implicits._
      val sh = Tables.spread(Tables.load(s, dir, "documents"))
        .select($"doc_id",
          TextOps.shingleHashes($"text", ShingleN).as("hashes"))
        .graftCheckpoint() // shingle once, on every core (3 consumers)
      val pairs = DedupOps
        .sharedShingleCountsBounded(sh, "doc_id", "hashes", 500)
        .select($"id_a", $"id_b",
          floor($"shared".cast("double") * 1000.0 /
            ($"n_a" + $"n_b" - $"shared").cast("double")).cast("long")
            .as("jaccard_milli"))
        .filter($"jaccard_milli" >= 500)
        .select($"id_a", $"id_b")
        .graftCheckpoint()
      val old = pairs.filter($"id_a" < 350 && $"id_b" < 350)
      val delta = pairs.filter(!($"id_a" < 350 && $"id_b" < 350))
      val prev = graft.ops.GraphOps.connectedComponents(old, "id_a", "id_b")
      graft.ops.GraphOps.mergeComponents(prev, delta, "id_a", "id_b")
        .groupBy($"component")
        .agg(count(lit(1)).as("n_members"),
          max($"id").as("max_member"))
        .orderBy($"component")
    },

    // Exact-substring span removal (RefinedWeb rule): any 5-token span
    // occurring more than once corpus-wide is cut from every document
    // holding it. The full cleaned text travels in the hash. NB DuckDB
    // list lambdas with an index arg are 1-based (Spark's 0-based) —
    // the oracle offsets with j-1.
    GraftQuery(
      "q110_span_dedup",
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, u.i - 1 AS start,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(
        |        string_split(array_to_string(tk[u.i:u.i+4], ' '), ''),
        |        c -> ascii(c))),
        |      (a, x) -> (a*31 + x) % 1000000007) AS h
        |  FROM t, UNNEST(generate_series(1, len(tk) - 4)) AS u(i)),
        |dup AS (SELECT h FROM sh GROUP BY h HAVING COUNT(*) > 1),
        |d AS (
        |  SELECT doc_id, list(start) AS dups
        |  FROM sh WHERE h IN (SELECT h FROM dup)
        |  GROUP BY doc_id),
        |cleaned AS (
        |  SELECT t.doc_id, t.tk,
        |    list_filter(t.tk, (tok, j) ->
        |      len(list_filter(COALESCE(d.dups, CAST([] AS BIGINT[])),
        |        s -> s <= j - 1 AND j - 1 < s + 5)) = 0) AS kept
        |  FROM t LEFT JOIN d ON t.doc_id = d.doc_id)
        |SELECT doc_id, CAST(len(tk) AS INTEGER) AS n_tokens,
        |  CAST(len(kept) AS INTEGER) AS n_kept,
        |  -- array_to_string([]) is NULL in DuckDB, '' in Spark
        |  COALESCE(array_to_string(kept, ' '), '') AS cleaned_text
        |FROM cleaned ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      DedupOps.dropDuplicatedSpans(
          Tables.load(s, dir, "documents"), "doc_id", "text", k = 5)
        .orderBy($"doc_id")
    },

    // DEEP-component connected components via large-star/small-star
    // contraction (GraphOps.connectedComponentsStar, O(log n) rounds):
    // per-user event chains — each event linked to the user's next —
    // have diameter = events-per-user, the regime where q60's min-label
    // propagation would pay one round per hop. The oracle needs no
    // recursive closure at all: a chain's component is exactly its
    // user's MIN event id (single-event users have no edges and drop),
    // which is what makes the deep case cheaply and exactly gateable.
    GraftQuery(
      "q116_chain_components",
      """SELECT MIN(event_id) AS component,
        |  COUNT(*) AS n_members, MAX(event_id) AS max_member
        |FROM events GROUP BY user_id HAVING COUNT(*) > 1
        |ORDER BY component""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      val edges = Tables.load(s, dir, "events")
        .select($"user_id", $"event_id",
          lead($"event_id", 1).over(w).as("next_id"))
        .filter($"next_id".isNotNull)
        .select($"event_id".as("id_a"), $"next_id".as("id_b"))
      graft.ops.GraphOps.connectedComponentsStar(edges, "id_a", "id_b")
        .groupBy($"component")
        .agg(count(lit(1)).as("n_members"), max($"id").as("max_member"))
        .orderBy($"component")
    },

    // Triangle counting over the part co-occurrence graph (parts
    // appearing in the same high-quantity order) via degree-ordered
    // orientation — wedge generation is bounded by out-degree O(sqrt m),
    // so hub nodes cannot explode the self-join (GraphOps scaladoc).
    // The oracle counts the same triangles with a canonical a<b<c
    // triple join; every triangle credits its three corners.
    GraftQuery(
      "q136_triangle_counts",
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 45),
        |pp AS (
        |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
        |    greatest(a.l_partkey, b.l_partkey) AS b
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM pp e1 JOIN pp e2 ON e2.a = e1.b
        |  JOIN pp e3 ON e3.a = e1.a AND e3.b = e2.b),
        |nodes AS (SELECT u.n AS node FROM tri, UNNEST([x, y, z]) AS u(n)),
        |cnt AS (SELECT node, COUNT(*) AS tri_count FROM nodes GROUP BY node)
        |SELECT node, tri_count FROM cnt
        |ORDER BY tri_count DESC, node LIMIT 20""".stripMargin) { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
        .filter($"l_quantity" >= 45)
        .select($"l_orderkey", $"l_partkey")
      val pairs = li.as("x").join(li.as("y"),
          $"x.l_orderkey" === $"y.l_orderkey" &&
            $"x.l_partkey" =!= $"y.l_partkey")
        .select($"x.l_partkey".as("pa"), $"y.l_partkey".as("pb"))
      graft.ops.GraphOps.triangleCounts(pairs, "pa", "pb")
        .orderBy($"tri_count".desc, $"node")
        .limit(20)
    },

    // K-core decomposition of the same co-occurrence graph: peel
    // degree-<3 shells until fixpoint, report the per-degree histogram
    // of the surviving 3-core (the graph-density filter that strips
    // weakly-attached tail nodes). The Spark side probes convergence;
    // the oracle unrolls 10 peel rounds — peeling is idempotent at the
    // fixpoint (measured 5 rounds at sf0.01), so any unroll depth past
    // convergence replays the identical survivor set.
    GraftQuery("q137_kcore", DedupSql.KCore10) { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
        .filter($"l_quantity" >= 45)
        .select($"l_orderkey", $"l_partkey")
      val pairs = li.as("x").join(li.as("y"),
          $"x.l_orderkey" === $"y.l_orderkey" &&
            $"x.l_partkey" =!= $"y.l_partkey")
        .select($"x.l_partkey".as("pa"), $"y.l_partkey".as("pb"))
      val (core, rounds) =
        graft.ops.GraphOps.kCoreWithRounds(pairs, "pa", "pb", k = 3)
      // The oracle unrolls exactly 10 peel rounds; a gate scale that
      // needed more would replay a pre-fixpoint survivor set — fail
      // loudly here instead of hash-diverging silently.
      require(rounds <= 10,
        s"kCore took $rounds rounds but the q137 oracle unrolls 10")
      core
        .groupBy($"deg")
        .agg(count(lit(1)).as("n_nodes"), sum($"node").as("node_sum"))
        .orderBy($"deg")
    },

    // Multi-source BFS over the customer–supplier bipartite graph
    // (who-traded-with-whom): hop distance from a trusted seed set
    // (nation-3 customers), capped at 4 — the seed-based quality
    // propagation signal (documents/domains within small graph
    // distance of curated seeds). Node ids disambiguate the two
    // partitions arithmetically (2·cust vs 2·supp+1) so the oracle
    // replays the exact same id space; fixed rounds make every
    // reported distance exact (q106 fixed-round contract).
    GraftQuery("q138_seed_bfs", DedupSql.SeedBfs4) { (s, dir) =>
      import s.implicits._
      val edges = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem"),
          $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).cast("long").as("a"),
          ($"l_suppkey" * 2 + 1).cast("long").as("b"))
        .distinct()
      val seeds = Tables.load(s, dir, "customer")
        .filter($"c_nationkey" === 3)
        .select(($"c_custkey" * 2).cast("long").as("s"))
      graft.ops.GraphOps.seedDistances(edges, "a", "b", seeds, "s", 4)
        .groupBy($"dist")
        .agg(count(lit(1)).as("n_nodes"), sum($"id").as("id_sum"))
        .orderBy($"dist")
    },

    // Weighted seed distances — Bellman–Ford min-plus relaxation over
    // the same bipartite trade graph, weights = the cheapest observed
    // quantity on each (customer, supplier) edge. 4 fixed relaxation
    // rounds from the nation-3 seed set (cheapest ≤4-hop reach); per
    // round ONE key-partitioned join + min-combine, shuffles scale
    // with |E| (q138's unweighted walk generalized; q106 fixed-round
    // contract keeps every cost exact and engine-replayable).
    GraftQuery("q196_bellman_ford", DedupSql.BellmanFord4) { (s, dir) =>
      import s.implicits._
      val edges = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem"),
          $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).cast("long").as("a"),
          ($"l_suppkey" * 2 + 1).cast("long").as("b"),
          $"l_quantity".cast("long").as("w"))
      val seeds = Tables.load(s, dir, "customer")
        .filter($"c_nationkey" === 3)
        .select(($"c_custkey" * 2).cast("long").as("s"))
      graft.ops.GraphOps.weightedSeedDistances(
          edges, "a", "b", "w", seeds, "s", 4)
        .groupBy($"cost")
        .agg(count(lit(1)).as("n_nodes"), sum($"id").as("id_sum"))
        .orderBy($"cost")
    },

    // Threshold cascade (GraphOps.thresholdCascade, Watts 2002):
    // complex contagion — a node activates only when ≥ 2 DISTINCT
    // neighbors are active (q138's BFS is the k = 1 simple case); 3
    // synchronous rounds from the nation-3 seeds, first-activation
    // round per node, rollup by round.
    GraftQuery("q242_cascade", DedupSql.Cascade3) { (s, dir) =>
      import s.implicits._
      val edges = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem"),
          $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).cast("long").as("a"),
          ($"l_suppkey" * 2 + 1).cast("long").as("b"))
        .distinct()
      val seeds = Tables.load(s, dir, "customer")
        .filter($"c_nationkey" === 3)
        .select(($"c_custkey" * 2).cast("long").as("s"))
      graft.ops.GraphOps.thresholdCascade(
          edges, "a", "b", seeds, "s", k = 2, rounds = 3)
        .groupBy($"rnd")
        .agg(count(lit(1)).as("n_nodes"), sum($"id").as("id_sum"))
        .orderBy($"rnd")
    },

    // Degree assortativity (does the trade graph wire hubs to hubs?):
    // Pearson correlation of endpoint degrees over the DIRECTED stub
    // list — one degree fold + one edge equi-join + the q204
    // sufficient-stats reduction (cov exact integer milli, r² via the
    // scaled division with sign). One row.
    GraftQuery(
      "q243_assortativity",
      """WITH e0 AS (
        |  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS a,
        |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS b
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
        |deg AS (SELECT a AS id, COUNT(*) AS d FROM e GROUP BY 1),
        |p AS (
        |  SELECT da.d AS x, db.d AS y
        |  FROM e JOIN deg da ON da.id = e.a
        |  JOIN deg db ON db.id = e.b),
        |s AS (
        |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x*y) AS sxy, SUM(x*x) AS sxx, SUM(y*y) AS syy
        |  FROM p)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST((n*sxy - sx*sy) * 1000 // (n*n) AS BIGINT) AS cov_milli,
        |  CASE WHEN ((n*sxx - sx*sx) // 100000000)
        |        * ((n*syy - sy*sy) // 100000000) // 1000000 > 0 THEN
        |    CAST(CASE WHEN n*sxy - sx*sy < 0 THEN -1 ELSE 1 END
        |      * (((n*sxy - sx*sy) // 100000000)
        |         * ((n*sxy - sx*sy) // 100000000))
        |      // (((n*sxx - sx*sx) // 100000000)
        |         * ((n*syy - sy*sy) // 100000000) // 1000000)
        |      AS BIGINT)
        |  END AS r2_signed_ppm
        |FROM s""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val e0 = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem"),
          $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).cast("long").as("a"),
          ($"l_suppkey" * 2 + 1).cast("long").as("b"))
        .distinct()
      val e = e0.union(e0.select($"b".as("a"), $"a".as("b")))
        .graftCheckpoint() // degree fold + stub probe
      val deg = e.groupBy($"a".as("id")).agg(count(lit(1)).as("d"))
      val st = e
        .join(deg.select($"id".as("a"), $"d".as("x")), Seq("a"))
        .join(deg.select($"id".as("b"), $"d".as("y")), Seq("b"))
        .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
          sum($"y").as("sy"), sum($"x" * $"y").as("sxy"),
          sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"))
      val num = $"n" * $"sxy" - $"sx" * $"sy"
      val vx = $"n" * $"sxx" - $"sx" * $"sx"
      val vy = $"n" * $"syy" - $"sy" * $"sy"
      // degree sums dwarf q204's daily counts: scale by 1e8 so the
      // squared numerator stays inside Long (identical truncation on
      // both engines; r2 = num^2*1e6/(vx*vy) up to the scaling)
      val denScaled = div(
        div(vx, lit(100000000L)) * div(vy, lit(100000000L)),
        lit(1000000L))
      st.select($"n",
        div(num * 1000L, $"n" * $"n").as("cov_milli"),
        when(denScaled > 0L,
          (when(num < 0L, -1L).otherwise(1L)) *
            div(div(num, lit(100000000L)) * div(num, lit(100000000L)),
              denScaled))
          .as("r2_signed_ppm"))
    },

    // Time-respecting reachability (GraphOps.temporalReach): contagion
    // through the trade graph — each hop's order date must be ≥ the
    // time the previous node was reached (Holme & Saramäki temporal
    // paths; a static BFS overcounts by ignoring edge ordering). 3
    // fixed relaxation rounds carrying each node's EARLIEST arrival
    // day from the nation-3 seed set; arrival-day rollup.
    GraftQuery("q241_temporal_reach", DedupSql.TemporalReach3) {
      (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val edges = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem"),
          $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).cast("long").as("a"),
          ($"l_suppkey" * 2 + 1).cast("long").as("b"),
          div(unix_micros($"o_orderdate".cast("timestamp")),
            lit(86400000000L)).as("t"))
      val seeds = Tables.load(s, dir, "customer")
        .filter($"c_nationkey" === 3)
        .select(($"c_custkey" * 2).cast("long").as("s"))
      graft.ops.GraphOps.temporalReach(
          edges, "a", "b", "t", seeds, "s", rounds = 3)
        .groupBy($"arr")
        .agg(count(lit(1)).as("n_nodes"), sum($"id").as("id_sum"))
        .orderBy($"arr")
    },

    // WEIGHTED PageRank (GraphOps.weightedPageRank): rank flows in
    // proportion to each edge's share of its source's outgoing weight
    // (total traded quantity on the cust→supp edge) — q106's audited
    // integer loop with (r·w) div wsum transfer; 2 fixed rounds so the
    // oracle unrolls it bit-for-bit; top-25 by rank with a total order.
    GraftQuery("q239_weighted_pagerank", DedupSql.WeightedPr2) {
      (s, dir) =>
      import s.implicits._
      val edges = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem"),
          $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).cast("long").as("a"),
          ($"l_suppkey" * 2 + 1).cast("long").as("b"),
          $"l_quantity".cast("long").as("w"))
      graft.ops.GraphOps.weightedPageRank(edges, "a", "b", "w",
          iters = 2)
        .orderBy($"r".desc, $"id")
        .limit(25)
    },

    // Graph neighborhood features (GNN/quality-propagation feature
    // prep): per node — degree, neighbor-degree sum/max, and mean
    // neighbor degree in milli. Degrees fold from the distinct edge
    // table in one pass; the neighbor aggregate is ONE equi-join of
    // the edge table against the degree table (|E| rows) — never an
    // adjacency-list build, never a 2-hop materialization.
    GraftQuery(
      "q210_graph_features",
      """WITH e0 AS (
        |  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS a,
        |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS b
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
        |deg AS (SELECT a AS id, COUNT(*) AS deg FROM e GROUP BY 1)
        |SELECT e.a AS id, CAST(MIN(da.deg) AS BIGINT) AS deg,
        |  CAST(SUM(db.deg) AS BIGINT) AS nbr_deg_sum,
        |  CAST(MAX(db.deg) AS BIGINT) AS nbr_deg_max,
        |  CAST(SUM(db.deg) * 1000 // MIN(da.deg) AS BIGINT)
        |    AS nbr_deg_mean_milli
        |FROM e JOIN deg da ON da.id = e.a
        |  JOIN deg db ON db.id = e.b
        |GROUP BY e.a ORDER BY id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val e0 = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem"),
          $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).cast("long").as("a"),
          ($"l_suppkey" * 2 + 1).cast("long").as("b"))
        .distinct()
      val e = e0.union(e0.select($"b".as("a"), $"a".as("b")))
        .graftCheckpoint() // feeds the degree fold and the join probe
      val deg = e.groupBy($"a".as("id")).agg(count(lit(1)).as("deg"))
      e.join(deg.select($"id".as("a"), $"deg".as("da")), Seq("a"))
        .join(deg.select($"id".as("b"), $"deg".as("db")), Seq("b"))
        .groupBy($"a".as("id"))
        .agg(min($"da").as("deg"), sum($"db").as("nbr_deg_sum"),
          max($"db").as("nbr_deg_max"))
        .withColumn("nbr_deg_mean_milli",
          div($"nbr_deg_sum" * 1000L, $"deg"))
        .orderBy($"id")
    },

    // Winnowing fingerprints (Schleimer et al. 2003, MOSS): min shingle
    // hash per sliding window of 4, deduplicated — any shared run of
    // >= w+n-1 = 6 tokens shares a fingerprint, at ~2/(w+1) the storage
    // of the full shingle set. Order-free scalars (count/sum/min/max of
    // the fingerprint set) make the set gate-checkable without pinning
    // either engine's distinct ordering.
    GraftQuery(
      "q130_winnowing",
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_transform(
        |      list_transform(
        |        generate_series(1, len(string_split_regex(text,'\s+'))-2),
        |        i -> array_to_string(
        |          string_split_regex(text,'\s+')[i:i+2], ' ')),
        |      s -> list_reduce(list_prepend(CAST(0 AS BIGINT),
        |            list_transform(string_split(s,''), c -> ascii(c))),
        |           (a,x) -> (a*31+x)%1000000007)) AS hs
        |  FROM documents),
        |fp AS (
        |  SELECT doc_id,
        |    CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
        |         ELSE list_distinct(list_transform(
        |           generate_series(1, greatest(len(hs) - 3, 1)),
        |           i -> list_min(hs[i:i+3]))) END AS f
        |  FROM sh)
        |SELECT doc_id, CAST(len(f) AS BIGINT) AS n_fp,
        |  COALESCE(CAST(list_sum(f) AS BIGINT), 0) AS fp_sum,
        |  COALESCE(list_min(f), -1) AS fp_min,
        |  COALESCE(list_max(f), -1) AS fp_max
        |FROM fp ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val fp = TextOps.winnowingFingerprints($"text", ShingleN, 4)
      Tables.load(s, dir, "documents")
        .select($"doc_id", fp.as("f"))
        .select($"doc_id",
          size($"f").cast("long").as("n_fp"),
          aggregate($"f", lit(0L), (a, x) => a + x).as("fp_sum"),
          coalesce(array_min($"f"), lit(-1L)).as("fp_min"),
          coalesce(array_max($"f"), lit(-1L)).as("fp_max"))
        .orderBy($"doc_id")
    },

    // Exact Hamming-ball pairs over the q33 SimHash signatures via
    // multi-index pigeonhole banding (DedupOps.hammingNeighborPairs):
    // candidates from (band, bandValue) equi-joins — maxDist+1 bands
    // means any pair within distance maxDist agrees exactly on one — with
    // hot band buckets refined by a second exact pigeonhole level over
    // the compacted remaining bits (this corpus's clustered signatures
    // exercise the hot path for real at hotCap=64). The oracle is the
    // brute-force O(n²) bit_count(xor) scan — identical pair set because
    // banding is EXACT (no recall loss), unlike probabilistic MinHash.
    GraftQuery(
      "q176_hamming_pairs",
      s"""WITH th AS (
         |  SELECT doc_id, $DuckTokenHashes AS hashes FROM documents),
         |sh AS (
         |  SELECT doc_id,
         |    CAST(list_sum(list_transform(generate_series(0, 31), i ->
         |      CASE WHEN list_sum(list_transform(hashes,
         |          h -> ((h // CAST(pow(2,i) AS BIGINT)) % 2) * 2 - 1)) > 0
         |        THEN CAST(pow(2,i) AS BIGINT) ELSE 0 END)) AS BIGINT)
         |      AS simhash
         |  FROM th)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS dist
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val sigs = Tables.load(s, dir, "documents")
        // pre-bind the token-hash array (q33 note: simhash32's bit loops
        // re-evaluate their input)
        .select($"doc_id",
          array_distinct(
            transform(TextOps.tokenize($"text"), TextOps.polyHash(_)))
            .as("__th"))
        .select($"doc_id", DedupOps.simhash32($"__th").as("simhash"))
      DedupOps.hammingNeighborPairs(sigs, "doc_id", "simhash",
          maxDist = 1, totalBits = 32, hotCap = 64)
        .select($"id_a", $"id_b", $"dist".cast("long").as("dist"))
        .orderBy($"id_a", $"id_b")
    },

    // Link prediction over the order→part basket graph
    // (GraphOps.bipartiteLinkScores): common-neighbor count, integer
    // Adamic–Adar (Σ 1e6 div log2(basket) — literal Q20-log weight
    // table, the q191 idiom), and posting-Jaccard per co-purchased part
    // pair. Candidate generation is the wedge equi-join on the order id
    // with oversized baskets dropped whole (hot-center cap — never
    // fires on ≤7-line TPC-H orders, spec-covered separately); top-100
    // by (aa, ids) travels in the hash.
    GraftQuery(
      "q248_link_prediction",
      s"""WITH e AS (
         |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |bs AS (SELECT o, COUNT(*) AS bsz FROM e GROUP BY o),
         |kept AS (
         |  SELECT e.o, e.p, bs.bsz FROM e JOIN bs USING (o)
         |  WHERE bsz BETWEEN 2 AND 64),
         |wt(bsz, w) AS (VALUES ${DedupQueries.AaWeightValues}),
         |pairs AS (
         |  SELECT a.p AS id_a, b.p AS id_b, COUNT(*) AS cn,
         |    CAST(SUM(wt.w) AS BIGINT) AS aa_micro
         |  FROM kept a JOIN kept b ON a.o = b.o AND a.p < b.p
         |  JOIN wt ON wt.bsz = a.bsz
         |  GROUP BY 1, 2),
         |deg AS (SELECT p, COUNT(*) AS d FROM kept GROUP BY p)
         |SELECT id_a, id_b, CAST(cn AS BIGINT) AS cn, aa_micro,
         |  CAST(cn * 1000000 // (da.d + db.d - cn) AS BIGINT)
         |    AS jaccard_ppm
         |FROM pairs JOIN deg da ON da.p = id_a JOIN deg db ON db.p = id_b
         |ORDER BY aa_micro DESC, id_a, id_b LIMIT 100""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      graft.ops.GraphOps.bipartiteLinkScores(
          Tables.load(s, dir, "lineitem")
            .select($"l_orderkey", $"l_partkey"),
          "l_orderkey", "l_partkey", maxBasket = 64)
        .orderBy($"aa_micro".desc, $"id_a", $"id_b")
        .limit(100)
    },

    // Deterministic random-walk corpus (GraphOps.randomWalks — the
    // DeepWalk prep whose output sequences train graph embeddings):
    // 1 walk × 3 hops from every node of the high-quantity order→part
    // graph, every hop a pure hash over (walk identity, position,
    // current node); whole paths travel in the hash. The oracle
    // replays the three hops with the identical sorted-adjacency +
    // polyHash arithmetic.
    GraftQuery("q261_random_walks", DedupSql.RandomWalk3) { (s, dir) =>
      import s.implicits._
      val edges = Tables.load(s, dir, "lineitem")
        .filter($"l_quantity" >= 45)
        .select(
          concat(lit("o"), $"l_orderkey".cast("string")).as("a"),
          concat(lit("p"), $"l_partkey".cast("string")).as("b"))
      graft.ops.GraphOps.randomWalks(
          edges, "a", "b", walksPerNode = 1, steps = 3, salt = "rw1")
        .orderBy($"start", $"walk")
    }) :+ DedupReportGate

  /** (bsz, weight) literal rows shared verbatim by the Spark op (via
    * `EvalOps.aaWeightsMicro`) and the q248 oracle SQL.
    */
  private[queries] lazy val AaWeightValues: String = {
    val w = graft.ops.EvalOps.aaWeightsMicro(64)
    (2 to 64).map(s => s"($s, ${w(s - 1)})").mkString(", ")
  }

  /** q257's gate body appended via [[DedupReport]] below. */
  private[queries] lazy val DedupReportGate: GraftQuery = {
    // Corpus dedup-rate REPORT (pipeline observability: what a curation
    // run logs after its dedup stage): q60's pair→component machinery
    // reduced to corpus metrics — total docs, docs in ≥2-member
    // clusters, cluster count, removable duplicates, dup rate ppm, and
    // the cluster-SIZE histogram (bounded domain: sizes). Tagged-union
    // rows (metric, k, v), the q217 readout shape; the rate row's
    // 1-row×1-row cross is the q96 scalar pattern.
    GraftQuery(
      "q257_dedup_report",
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, $DuckShingleHashes AS hashes FROM documents),
         |inv AS (SELECT doc_id, unnest(hashes) AS h FROM sh),
         |shared AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
         |  FROM inv a JOIN inv b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, len(hashes) AS n FROM sh),
         |pairs AS (
         |  SELECT id_a, id_b FROM shared
         |  JOIN sizes sa ON sa.doc_id = id_a
         |  JOIN sizes sb ON sb.doc_id = id_b
         |  WHERE (shared*1000)//(sa.n + sb.n - shared) >= 500),
         |edges AS (
         |  SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(src, node) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node),
         |comp AS (SELECT src AS doc_id, MIN(node) AS component
         |  FROM reach GROUP BY src),
         |cs AS (SELECT component, COUNT(*) AS sz FROM comp GROUP BY 1),
         |tot AS (SELECT COUNT(*) AS n_docs FROM documents),
         |agg AS (
         |  SELECT COALESCE(CAST(SUM(sz) AS BIGINT), 0) AS n_clustered,
         |    COUNT(*) AS n_clusters
         |  FROM cs),
         |rows_ AS (
         |  SELECT 'size_hist' AS metric, sz AS k, COUNT(*) AS v
         |  FROM cs GROUP BY sz
         |  UNION ALL SELECT 'n_docs', -1, n_docs FROM tot
         |  UNION ALL SELECT 'n_clustered', -1, n_clustered FROM agg
         |  UNION ALL SELECT 'n_clusters', -1, n_clusters FROM agg
         |  UNION ALL SELECT 'dup_removable', -1,
         |    n_clustered - n_clusters FROM agg
         |  UNION ALL SELECT 'dup_rate_ppm', -1,
         |    (agg.n_clustered - agg.n_clusters) * 1000000 // tot.n_docs
         |  FROM agg CROSS JOIN tot)
         |SELECT metric, CAST(k AS BIGINT) AS k, CAST(v AS BIGINT) AS v
         |FROM rows_ ORDER BY metric, k""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.functions._
      val div = graft.functions.GraftColumns.longDiv _
      val docs = Tables.load(s, dir, "documents")
      val sh = Tables.spread(docs)
        .select($"doc_id",
          TextOps.shingleHashes($"text", ShingleN).as("hashes"))
        .graftCheckpoint() // shingle once, on every core (3 consumers)
      val pairs = DedupOps
        .sharedShingleCountsBounded(sh, "doc_id", "hashes", 500)
        .select($"id_a", $"id_b",
          floor($"shared".cast("double") * 1000.0 /
            ($"n_a" + $"n_b" - $"shared").cast("double")).cast("long")
            .as("jm"))
        .filter($"jm" >= 500)
        .select($"id_a", $"id_b")
      val cs = graft.ops.GraphOps.connectedComponents(pairs, "id_a", "id_b")
        .groupBy($"component").agg(count(lit(1)).as("sz"))
        .graftCheckpoint() // histogram + scalar consumers
      val hist = cs.groupBy($"sz")
        .agg(count(lit(1)).as("v"))
        .select(lit("size_hist").as("metric"), $"sz".as("k"), $"v")
      val tot = docs.agg(count(lit(1)).as("n_docs"))
      val agg = cs.agg(
        coalesce(sum($"sz"), lit(0L)).as("n_clustered"),
        count(lit(1)).as("n_clusters"))
      val scalars = agg.crossJoin(broadcast(tot)).select(
        $"n_docs", $"n_clustered", $"n_clusters",
        ($"n_clustered" - $"n_clusters").as("dup_removable"),
        div(($"n_clustered" - $"n_clusters") * 1000000L, $"n_docs")
          .as("dup_rate_ppm"))
      val srows = scalars.select(explode(array(
          struct(lit("n_docs").as("metric"), lit(-1L).as("k"),
            $"n_docs".as("v")),
          struct(lit("n_clustered").as("metric"), lit(-1L).as("k"),
            $"n_clustered".as("v")),
          struct(lit("n_clusters").as("metric"), lit(-1L).as("k"),
            $"n_clusters".as("v")),
          struct(lit("dup_removable").as("metric"), lit(-1L).as("k"),
            $"dup_removable".as("v")),
          struct(lit("dup_rate_ppm").as("metric"), lit(-1L).as("k"),
            $"dup_rate_ppm".as("v")))).as("r"))
        .select($"r.metric", $"r.k", $"r.v")
      hist.unionByName(srows).orderBy($"metric", $"k")
    }
  }
}

/** Unrolled-iteration DuckDB replays for the graph gates — same
  * pattern as AnalyticsSql.PageRank3: the oracle executes a fixed
  * number of rounds of the identical integer relaxation.
  */
private object DedupSql {

  // polyHash replica (same fold as the other oracles in this file)
  private def ph(expr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split($expr, ''), c -> ascii(c))),
       |   (a,x) -> (a*31+x)%1000000007)""".stripMargin

  /** 3 unrolled hops of the deterministic random walk over the
    * high-quantity order→part bipartite graph — replays
    * GraphOps.randomWalks hop arithmetic exactly (sorted neighbor
    * list, polyHash(start:walk:step:cur:salt) mod degree).
    */
  val RandomWalk3: String = {
    def hop(i: Int) = {
      val prev = s"w${i - 1}"
      val h = ph(s"w.start || ':' || CAST(w.walk AS VARCHAR) || ':' || " +
        s"'$i' || ':' || w.cur || ':rw1'")
      s"""w$i AS (
         |  SELECT w.start, w.walk,
         |    adj.nbrs[CAST(($h) % len(adj.nbrs) AS INT) + 1] AS cur,
         |    w.path || ' ' ||
         |      adj.nbrs[CAST(($h) % len(adj.nbrs) AS INT) + 1] AS path
         |  FROM $prev w JOIN adj ON adj.cur = w.cur)""".stripMargin
    }
    s"""WITH li AS (
       |  SELECT DISTINCT 'o' || CAST(l_orderkey AS VARCHAR) AS a,
       |    'p' || CAST(l_partkey AS VARCHAR) AS b
       |  FROM lineitem WHERE l_quantity >= 45),
       |e AS (SELECT a, b FROM li UNION SELECT b, a FROM li),
       |adj AS (
       |  SELECT a AS cur, list(b ORDER BY b) AS nbrs
       |  FROM (SELECT DISTINCT a, b FROM e) GROUP BY 1),
       |w0 AS (
       |  SELECT cur AS start, 0 AS walk, cur, cur AS path FROM adj),
       |${hop(1)},
       |${hop(2)},
       |${hop(3)}
       |SELECT start, CAST(walk AS BIGINT) AS walk, path
       |FROM w3 ORDER BY start, walk""".stripMargin
  }

  /** 10 unrolled peel rounds of the 3-core over the q136 part
    * co-occurrence graph. Peeling is idempotent once stable (measured
    * 5 rounds at sf0.01), so 10 rounds replay the convergence-probed
    * GraphOps.kCore survivor set exactly.
    */
  val KCore10: String = {
    val rounds = (1 to 10).map { r =>
      val prev = s"e${r - 1}"
      // MATERIALIZED: DuckDB inlines plain CTEs, and each round
      // references the previous one 3× — inlining would compound to
      // 3^10 scans of the base table (observed as fd exhaustion)
      s"""d$r AS MATERIALIZED (
         |  SELECT n, COUNT(*) AS c FROM (
         |    SELECT a AS n FROM $prev UNION ALL SELECT b FROM $prev)
         |  GROUP BY n),
         |k$r AS MATERIALIZED (SELECT n FROM d$r WHERE c >= 3),
         |e$r AS MATERIALIZED (
         |  SELECT e.a, e.b FROM $prev e
         |  JOIN k$r x ON e.a = x.n JOIN k$r y ON e.b = y.n)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (
       |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 45),
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
       |    greatest(a.l_partkey, b.l_partkey) AS b
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
       |$rounds,
       |core AS (
       |  SELECT n AS node, COUNT(*) AS deg FROM (
       |    SELECT a AS n FROM e10 UNION ALL SELECT b FROM e10)
       |  GROUP BY n)
       |SELECT deg, COUNT(*) AS n_nodes,
       |  CAST(SUM(node) AS BIGINT) AS node_sum
       |FROM core GROUP BY deg ORDER BY deg""".stripMargin
  }

  /** 4 unrolled min-relaxation rounds of multi-source BFS from
    * nation-3 customers over the customer–supplier bipartite graph
    * (ids 2·cust / 2·supp+1) — replays GraphOps.seedDistances at
    * rounds = 4 exactly.
    */
  val SeedBfs4: String = {
    val rounds = (1 to 4).map { r =>
      val prev = s"d${r - 1}"
      s"""d$r AS (
         |  SELECT id, MIN(dist) AS dist FROM (
         |    SELECT id, dist FROM $prev
         |    UNION ALL
         |    SELECT e.b AS id, p.dist + 1 AS dist
         |    FROM e JOIN $prev p ON e.a = p.id)
         |  GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS a,
       |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS b
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |e AS (
       |  SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
       |d0 AS (
       |  SELECT DISTINCT CAST(c_custkey * 2 AS BIGINT) AS id,
       |    CAST(0 AS BIGINT) AS dist
       |  FROM customer WHERE c_nationkey = 3),
       |$rounds
       |SELECT dist, COUNT(*) AS n_nodes,
       |  CAST(SUM(id) AS BIGINT) AS id_sum
       |FROM d4 GROUP BY dist ORDER BY dist""".stripMargin
  }

  /** q196: 4 unrolled Bellman–Ford relaxation rounds (min-plus form of
    * [[SeedBfs4]]); parallel edges min-combine before the loop, exactly
    * as `GraphOps.weightedSeedDistances` does.
    */
  val BellmanFord4: String = {
    val rounds = (1 to 4).map { r =>
      val prev = s"d${r - 1}"
      s"""d$r AS (
         |  SELECT id, MIN(cost) AS cost FROM (
         |    SELECT id, cost FROM $prev
         |    UNION ALL
         |    SELECT e.b AS id, p.cost + e.w AS cost
         |    FROM e JOIN $prev p ON e.a = p.id)
         |  GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT CAST(o_custkey * 2 AS BIGINT) AS a,
       |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS b,
       |    CAST(l_quantity AS BIGINT) AS w
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |e AS (
       |  SELECT a, b, MIN(w) AS w FROM (
       |    SELECT a, b, w FROM e0
       |    UNION ALL SELECT b AS a, a AS b, w FROM e0)
       |  GROUP BY 1, 2),
       |d0 AS (
       |  SELECT DISTINCT CAST(c_custkey * 2 AS BIGINT) AS id,
       |    CAST(0 AS BIGINT) AS cost
       |  FROM customer WHERE c_nationkey = 3),
       |$rounds
       |SELECT cost, COUNT(*) AS n_nodes,
       |  CAST(SUM(id) AS BIGINT) AS id_sum
       |FROM d4 GROUP BY cost ORDER BY cost""".stripMargin
  }

  /** q239: 2 unrolled weighted-PageRank rounds — (r·w) div wsum
    * transfer, dangling mass back uniformly, the exact integer steps
    * of `GraphOps.weightedPageRank` (base term computed from the
    * runtime node count with the same division order).
    */
  val WeightedPr2: String = {
    val mass = 1000000000000L
    val rounds = (1 to 2).map { k =>
      val p = s"r${k - 1}"
      s"""dg${k - 1} AS (
         |  SELECT COALESCE(SUM(r), 0) AS dang FROM $p WHERE dg),
         |i${k - 1} AS (
         |  SELECT e0.b AS id, SUM((r.r * e0.w) // ow.wsum) AS s
         |  FROM e0 JOIN ow USING (a) JOIN $p r ON r.id = e0.a
         |  GROUP BY 1),
         |r$k AS (
         |  SELECT r.id,
         |    CAST((150000 * ($mass // nn.n)) // 1000000
         |      + (850000 * (COALESCE(i.s, 0) + d.dang // nn.n))
         |        // 1000000 AS BIGINT) AS r,
         |    r.dg
         |  FROM $p r LEFT JOIN i${k - 1} i USING (id)
         |  CROSS JOIN dg${k - 1} d CROSS JOIN nn)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT CAST(o_custkey * 2 AS BIGINT) AS a,
       |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS b,
       |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2),
       |ow AS (SELECT a, CAST(SUM(w) AS BIGINT) AS wsum
       |       FROM e0 GROUP BY 1),
       |nodes AS (SELECT a AS id FROM e0 UNION SELECT b FROM e0),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |r0 AS (
       |  SELECT id, CAST($mass // nn.n AS BIGINT) AS r,
       |    id NOT IN (SELECT a FROM ow) AS dg
       |  FROM nodes CROSS JOIN nn),
       |$rounds
       |SELECT id, r FROM r2 ORDER BY r DESC, id LIMIT 25""".stripMargin
  }

  /** q242: 3 unrolled threshold-cascade rounds — a node joins when ≥ 2
    * DISTINCT neighbors are already active, tagged with its first
    * activation round (`GraphOps.thresholdCascade`'s exact steps).
    */
  val Cascade3: String = {
    val rounds = (1 to 3).map { k =>
      val p = s"a${k - 1}"
      s"""a$k AS (
         |  SELECT id, rnd FROM $p
         |  UNION ALL
         |  SELECT t.id, CAST($k AS BIGINT) AS rnd FROM (
         |    SELECT e.b AS id, COUNT(DISTINCT e.a) AS na
         |    FROM e JOIN $p p ON e.a = p.id
         |    GROUP BY e.b) t
         |  WHERE t.na >= 2
         |    AND t.id NOT IN (SELECT id FROM $p))""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS a,
       |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS b
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |e AS (SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
       |a0 AS (
       |  SELECT DISTINCT CAST(c_custkey * 2 AS BIGINT) AS id,
       |    CAST(0 AS BIGINT) AS rnd
       |  FROM customer WHERE c_nationkey = 3),
       |$rounds
       |SELECT CAST(rnd AS BIGINT) AS rnd, COUNT(*) AS n_nodes,
       |  CAST(SUM(id) AS BIGINT) AS id_sum
       |FROM a3 GROUP BY rnd ORDER BY rnd""".stripMargin
  }

  /** q241: 3 unrolled time-respecting relaxation rounds — each hop's
    * edge time must be ≥ the arrival time of its source; min-arrival
    * combine per node (`GraphOps.temporalReach`'s exact steps).
    */
  val TemporalReach3: String = {
    val rounds = (1 to 3).map { k =>
      val p = s"r${k - 1}"
      s"""r$k AS (
         |  SELECT id, MIN(arr) AS arr FROM (
         |    SELECT id, arr FROM $p
         |    UNION ALL
         |    SELECT e.b AS id, e.t AS arr
         |    FROM e JOIN $p p ON e.a = p.id AND e.t >= p.arr)
         |  GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS a,
       |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS b,
       |    epoch_us(o_orderdate) // 86400000000 AS t
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |e AS (
       |  SELECT DISTINCT a, b, t FROM (
       |    SELECT a, b, t FROM e0
       |    UNION ALL SELECT b AS a, a AS b, t FROM e0)),
       |r0 AS (
       |  SELECT DISTINCT CAST(c_custkey * 2 AS BIGINT) AS id,
       |    CAST(0 AS BIGINT) AS arr
       |  FROM customer WHERE c_nationkey = 3),
       |$rounds
       |SELECT CAST(arr AS BIGINT) AS arr, COUNT(*) AS n_nodes,
       |  CAST(SUM(id) AS BIGINT) AS id_sum
       |FROM r3 GROUP BY arr ORDER BY arr""".stripMargin
  }
}
