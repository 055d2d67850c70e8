package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Checkpointer._
import graft.ops.SimilarityOps

/** Similarity-search conformance suite over `embeddings`
  * (500 × 64-dim float vectors at sf0.01).
  *
  * Cosine values are computed as a left fold in index order with double
  * casts on both engines → bit-identical IEEE results → integer
  * micro-cosines hash-match exactly (see SimilarityOps.cosineMicro).
  */
object SimilarityQueries {

  // duckCosMicro over an arbitrary array column name (q263 slices
  // prefixes into fresh columns).
  private def duckCosMicroCol(a: String, b: String, c: String): String =
    s"""round(1000000.0 * (
       |  list_reduce(list_prepend(0.0, list_transform(generate_series(1, len($a.$c)),
       |    i -> CAST($a.$c[i] AS DOUBLE)*CAST($b.$c[i] AS DOUBLE))), (x,y)->x+y)
       |  / (sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len($a.$c)),
       |      i -> CAST($a.$c[i] AS DOUBLE)*CAST($a.$c[i] AS DOUBLE))), (x,y)->x+y))
       |   * sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len($b.$c)),
       |      i -> CAST($b.$c[i] AS DOUBLE)*CAST($b.$c[i] AS DOUBLE))), (x,y)->x+y)))))""".stripMargin

  // DuckDB fold-order cosine, kept in lockstep with SimilarityOps.cosine.
  // Bounds derive from len(embedding) — never hardcode the dim, or a
  // generator change silently turns out-of-range subscripts into NULL
  // sums and the hash check desyncs non-obviously.
  private def duckCosMicro(a: String, b: String): String =
    s"""round(1000000.0 * (
       |  list_reduce(list_prepend(0.0, list_transform(generate_series(1, len($a.embedding)),
       |    i -> CAST($a.embedding[i] AS DOUBLE)*CAST($b.embedding[i] AS DOUBLE))), (x,y)->x+y)
       |  / (sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len($a.embedding)),
       |      i -> CAST($a.embedding[i] AS DOUBLE)*CAST($a.embedding[i] AS DOUBLE))), (x,y)->x+y))
       |   * sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len($b.embedding)),
       |      i -> CAST($b.embedding[i] AS DOUBLE)*CAST($b.embedding[i] AS DOUBLE))), (x,y)->x+y)))))""".stripMargin

  val all: Seq[GraftQuery] = Seq(

    // Embedding-cosine near-dup pairs above a threshold via SRP-LSH
    // (32 tables × 6 sign bits: 64 buckets/table keeps per-bucket
    // occupancy — and the verify stream, which grows as
    // n²·tables/2^bits — small, while the OR construction holds
    // at-threshold recall ≈ 1-(1-p^6)^32 ≈ 0.88) + exact cosine
    // verification — the
    // 100 TB path IS the graded path: candidates come from an equi-join
    // on (table, bucket), never a corpus cross join. The oracle
    // replicates the deterministic hyperplanes ((j,i)→±1 portable
    // hash), the banding, and the verification, so the LSH machinery
    // itself is hash-checked. Recall vs brute-force ground truth is
    // spec-tested in TextDedupSimSpec.
    GraftQuery(
      "q34_cosine_pairs",
      s"""WITH sig AS (
         |  SELECT vec_id,
         |    list_transform(generate_series(0, 31), t -> {'t': t, 'bh':
         |      list_sum(list_transform(generate_series(0, 5), jj ->
         |        CASE WHEN list_reduce(list_prepend(0.0,
         |            list_transform(generate_series(0, len(embedding) - 1), i ->
         |              CAST(embedding[i+1] AS DOUBLE) *
         |              (CASE WHEN ((((t*6+jj)*65537 + i) * 2654435761)
         |                    % 4294967296) // 65536 % 2 = 0
         |                 THEN 1.0 ELSE -1.0 END))),
         |            (x,y) -> x+y) > 0
         |          THEN CAST(pow(2, jj) AS BIGINT) ELSE 0 END))})
         |      AS bks
         |  FROM embeddings),
         |flat AS (
         |  SELECT vec_id, unnest(bks) AS bk FROM sig),
         |keys AS (
         |  SELECT vec_id, bk.t AS t, bk.bh AS bh FROM flat),
         |cand AS (
         |  SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
         |  FROM keys l JOIN keys r
         |    ON l.t = r.t AND l.bh = r.bh AND l.vec_id < r.vec_id)
         |SELECT c.id_a, c.id_b,
         |  CAST(${duckCosMicro("a", "b")} AS BIGINT) AS cos_micro
         |FROM cand c
         |JOIN embeddings a ON a.vec_id = c.id_a
         |JOIN embeddings b ON b.vec_id = c.id_b
         |WHERE ${duckCosMicro("a", "b")} >= 400000
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "embeddings")
      SimilarityOps.lshNeighborPairs(
          e.select($"vec_id", $"embedding"), "vec_id", "embedding",
          nBits = 6, minCosMicro = 400000, nTables = 32)
        .orderBy($"id_a", $"id_b")
    },

    // Brute-force cosine top-k: 5 nearest corpus vectors for each of the
    // first 10 vectors. Queries broadcast; corpus streams; final rank is
    // a window over query_id.
    GraftQuery(
      "q35_ann_topk",
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    CAST(${duckCosMicro("q", "c")} AS BIGINT) AS cos_micro
         |  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
         |  WHERE q.vec_id < 10),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos_micro DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cos_micro, rank FROM ranked
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "embeddings")
      val queries = e.filter($"vec_id" < 10)
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      SimilarityOps.bruteForceTopK(
          e.select($"vec_id", $"embedding"), "vec_id", "embedding",
          queries, "query_id", "qvec", k = 5)
        .select($"query_id", $"vec_id".as("neighbor_id"),
          $"cos_micro", $"rank".cast("long").as("rank"))
        .orderBy($"query_id", $"rank")
    },

    // IVF ANN at full probe: with nProbe = nList every query probes all
    // cells, so the result is exactly brute-force top-k no matter what
    // centroids k-means produced — which makes the whole IVF machinery
    // (train, assign, probe-join, per-cell exact rank) oracle-checkable
    // with the same SQL as q35. Partial-probe recall is spec-tested in
    // TextDedupSimSpec.
    GraftQuery(
      "q37_ivf_topk",
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    CAST(${duckCosMicro("q", "c")} AS BIGINT) AS cos_micro
         |  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
         |  WHERE q.vec_id < 10),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos_micro DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cos_micro, rank FROM ranked
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "embeddings")
      val queries = e.filter($"vec_id" < 10)
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      // maxIter 2: full probe is exact for any centroids, so training
      // only needs to produce a balanced-ish partition, not converge.
      SimilarityOps.ivfTopK(
          e.select($"vec_id", $"embedding"), "vec_id", "embedding",
          queries, "query_id", "qvec", k = 5, nList = 8, nProbe = 8,
          maxIter = 2)
        .select($"query_id", $"vec_id".as("neighbor_id"),
          $"cos_micro", $"rank".cast("long").as("rank"))
        .orderBy($"query_id", $"rank")
    },

    // Symmetric int8 quantization of the embedding column — the 4×
    // compression step for billion-vector ANN serving. The FULL code
    // array travels in the hash (CSV-joined), so every per-dimension
    // floor(v·127/max|v| + 0.5) is checked bit-for-bit against DuckDB
    // evaluating the identical IEEE expression tree.
    GraftQuery(
      "q97_int8_quantize",
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, v -> abs(v))) AS maxabs
        |  FROM embeddings),
        |coded AS (
        |  SELECT vec_id,
        |    CASE WHEN maxabs = 0 OR maxabs IS NULL
        |         THEN list_transform(embedding, v -> 0)
        |         ELSE list_transform(embedding, v ->
        |           CAST(floor(CAST(v AS DOUBLE) * 127.0
        |                      / CAST(maxabs AS DOUBLE) + 0.5) AS INTEGER))
        |    END AS codes
        |  FROM q)
        |SELECT vec_id, CAST(len(codes) AS INTEGER) AS n_dims,
        |  CAST(list_sum(codes) AS BIGINT) AS sum_q,
        |  array_to_string(codes, ',') AS codes_csv
        |FROM coded ORDER BY vec_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "embeddings")
        .select($"vec_id",
          SimilarityOps.quantizeInt8($"embedding").as("codes"))
        .select($"vec_id",
          size($"codes").as("n_dims"),
          expr("aggregate(codes, CAST(0 AS BIGINT), (a, x) -> a + x)")
            .as("sum_q"),
          array_join(transform($"codes", _.cast("string")), ",")
            .as("codes_csv"))
        .orderBy($"vec_id")
    },

    // Quantized ANN serving path: top-k by exact INTEGER dot product
    // over the int8 codes from q97 — scores are integers, so the whole
    // ranking (not just a rounded projection of it) is engine-portable
    // and hash-checked. Plan shape = bruteForceTopK: queries broadcast,
    // corpus streams, per-query window top-k.
    GraftQuery(
      "q98_quantized_topk",
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, v -> abs(v))) AS maxabs
        |  FROM embeddings),
        |coded AS (
        |  SELECT vec_id,
        |    CASE WHEN maxabs = 0 OR maxabs IS NULL
        |         THEN list_transform(embedding, v -> 0)
        |         ELSE list_transform(embedding, v ->
        |           CAST(floor(CAST(v AS DOUBLE) * 127.0
        |                      / CAST(maxabs AS DOUBLE) + 0.5) AS INTEGER))
        |    END AS codes
        |  FROM q),
        |scored AS (
        |  SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(c.codes)),
        |      i -> CAST(c.codes[i] AS BIGINT) * qq.codes[i])) AS BIGINT)
        |      AS score_q
        |  FROM coded c JOIN coded qq ON c.vec_id != qq.vec_id
        |  WHERE qq.vec_id < 8),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score_q DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, score_q, CAST(rank AS INTEGER) AS rank
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "embeddings")
      val queries = e.filter($"vec_id" < 8)
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      SimilarityOps.quantizedTopK(
          e.select($"vec_id", $"embedding"), "vec_id", "embedding",
          queries, "query_id", "qvec", k = 5)
        .select($"query_id", $"vec_id".as("neighbor_id"),
          $"score_q", $"rank")
        .orderBy($"query_id", $"rank")
    },

    // SemDeDup-style semantic dedup (SimilarityOps.semanticDedup):
    // FIXED 8 one-hot-ish centroids (8.0 at dim c*8) make the
    // clustering oracle-replayable — every row's nearest-centroid cell
    // (ArgMinCell: sequential squared-diff fold, ties to lowest index)
    // travels in the hash along with its kept/dropped flag after
    // within-cell cosine linking + min-id component selection. The
    // oracle replays assignment via the same index-order fold, the
    // pair threshold via the exact cosMicro tree, and the component
    // closure via a recursive CTE.
    GraftQuery(
      "q118_semantic_dedup",
      s"""WITH RECURSIVE assign AS (
         |  SELECT vec_id, embedding,
         |    (SELECT c FROM (
         |       SELECT c, list_reduce(list_prepend(0.0,
         |         list_transform(generate_series(1, len(embedding)), i ->
         |           (CAST(embedding[i] AS DOUBLE) -
         |              CASE WHEN i = c*8+1 THEN 8.0 ELSE 0.0 END)
         |           * (CAST(embedding[i] AS DOUBLE) -
         |              CASE WHEN i = c*8+1 THEN 8.0 ELSE 0.0 END))),
         |         (x,y)->x+y) AS dist
         |       FROM (SELECT unnest(generate_series(0, 7)) AS c))
         |     ORDER BY dist, c LIMIT 1) AS cell
         |  FROM embeddings),
         |pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM assign a JOIN assign b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${duckCosMicro("a", "b")} >= 500000),
         |edges AS (
         |  SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(src, node) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node),
         |comp AS (SELECT src AS vid, MIN(node) AS component
         |  FROM reach GROUP BY src)
         |SELECT s.vec_id, CAST(s.cell AS BIGINT) AS cell,
         |  COALESCE(s.vec_id = c.component, TRUE) AS kept
         |FROM assign s LEFT JOIN comp c ON c.vid = s.vec_id
         |ORDER BY s.vec_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val centers = Array.tabulate(8)(c =>
        Array.tabulate(64)(i => if (i == c * 8) 8.0 else 0.0))
      val e = Tables.load(s, dir, "embeddings")
      val assigned = e.select($"vec_id",
        graft.functions.GraftColumns.argMinCell($"embedding", centers)
          .cast("long").as("cell"))
      val kept = SimilarityOps.semanticDedup(
          e.select($"vec_id", $"embedding"), "vec_id", "embedding",
          centers, 500000L)
        .select($"vec_id", lit(true).as("kept"))
      assigned.join(kept, Seq("vec_id"), "left_outer")
        .select($"vec_id", $"cell",
          coalesce($"kept", lit(false)).as("kept"))
        .orderBy($"vec_id")
    },

    // Hybrid retrieval fusion via Reciprocal Rank Fusion (Cormack et
    // al. 2009 — public): a lexical signal (term-count over tokens) and
    // a semantic signal (cosine to an in-data query vector) each
    // produce a TOP-100 ranked list; fusion scores are
    // Σ floor(1e6/(60+rank)) over the lists a doc appears in — integer
    // division end to end, so both engines agree bit-for-bit. The
    // top-k-then-fuse shape IS the scale path: each signal's candidate
    // set is bounded (TakeOrdered, no global materialized rank of the
    // corpus), and the fuse joins two 100-row lists regardless of
    // corpus size.
    GraftQuery(
      "q121_hybrid_rrf",
      s"""WITH lex AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split_regex(text, '\\s+'),
         |        x -> x = 'spark')) +
         |      len(list_filter(string_split_regex(text, '\\s+'),
         |        x -> x = 'query')) +
         |      len(list_filter(string_split_regex(text, '\\s+'),
         |        x -> x = 'join')) AS BIGINT) AS lex
         |  FROM documents),
         |lr AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY lex DESC, doc_id)
         |    AS r_lex
         |  FROM lex ORDER BY lex DESC, doc_id LIMIT 100),
         |sem AS (
         |  SELECT a.vec_id AS doc_id,
         |    CAST(${duckCosMicro("a", "b")} AS BIGINT) AS cm
         |  FROM embeddings a, embeddings b WHERE b.vec_id = 0),
         |sr AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY cm DESC, doc_id)
         |    AS r_sem
         |  FROM sem ORDER BY cm DESC, doc_id LIMIT 100),
         |fused AS (
         |  SELECT COALESCE(lr.doc_id, sr.doc_id) AS doc_id,
         |    CAST(lr.r_lex AS BIGINT) AS r_lex,
         |    CAST(sr.r_sem AS BIGINT) AS r_sem,
         |    COALESCE(1000000 // (60 + lr.r_lex), 0) +
         |      COALESCE(1000000 // (60 + sr.r_sem), 0) AS rrf
         |  FROM lr FULL OUTER JOIN sr ON lr.doc_id = sr.doc_id)
         |SELECT doc_id, r_lex, r_sem, CAST(rrf AS BIGINT) AS rrf
         |FROM fused ORDER BY rrf DESC, doc_id LIMIT 50""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      import graft.ops.{SimilarityOps, TextOps}
      val terms = Seq("spark", "query", "join")
      val lexScore = terms.map(t =>
        size(filter(TextOps.tokenize($"text"), x => x === lit(t)))
          .cast("long")).reduce(_ + _)
      // bounded-domain contract: both rank windows run AFTER limit(100)
      // (TakeOrdered cuts in parallel; each window sees ≤100 rows)
      val lr = Tables.load(s, dir, "documents")
        .select($"doc_id", lexScore.as("lex"))
        .orderBy($"lex".desc, $"doc_id").limit(100)
        .withColumn("r_lex",
          row_number().over(Window.orderBy($"lex".desc, $"doc_id"))
            .cast("long"))
        .select($"doc_id", $"r_lex")
      val e = Tables.load(s, dir, "embeddings")
      val qvec = e.filter($"vec_id" === 0L).select($"embedding".as("qvec"))
      val sr = e.crossJoin(broadcast(qvec))
        .select($"vec_id".as("doc_id"),
          SimilarityOps.cosineMicro($"embedding", $"qvec").as("cm"))
        .orderBy($"cm".desc, $"doc_id").limit(100)
        .withColumn("r_sem",
          row_number().over(Window.orderBy($"cm".desc, $"doc_id"))
            .cast("long"))
        .select($"doc_id", $"r_sem")
      lr.join(sr, Seq("doc_id"), "full_outer")
        .select($"doc_id", $"r_lex", $"r_sem",
          (coalesce(expr("1000000 div (60 + r_lex)"), lit(0L)) +
            coalesce(expr("1000000 div (60 + r_sem)"), lit(0L))).as("rrf"))
        .orderBy($"rrf".desc, $"doc_id").limit(50)
    },

    // Product quantization (PQ) ADC serving: corpus stored as m=2
    // nearest-codeword codes per vector, query reduced to a driver-side
    // integer LUT, score = pure integer adds over the code column.
    // Gate uses FIXED integer-valued codebooks and query (the q118
    // pattern) so DuckDB replays encode (argmin, first-min tie-break)
    // and scoring exactly; production codebooks come from
    // trainPqCodebooks (per-subspace driver Lloyd).
    GraftQuery(
      "q134_pq_adc",
      """WITH cw AS (SELECT unnest(generate_series(0, 3)) AS c),
        |code AS (
        |  SELECT vec_id,
        |    (SELECT c FROM (
        |       SELECT c, list_reduce(list_prepend(0.0,
        |         list_transform(embedding[1:32], (v, i) ->
        |           (CAST(v AS DOUBLE) - (((c*7 + (i-1)) % 5) - 2))
        |           * (CAST(v AS DOUBLE) - (((c*7 + (i-1)) % 5) - 2)))),
        |         (x,y)->x+y) AS dist
        |       FROM (SELECT unnest(generate_series(0, 3)) AS c))
        |     ORDER BY dist, c LIMIT 1) AS code0,
        |    (SELECT c FROM (
        |       SELECT c, list_reduce(list_prepend(0.0,
        |         list_transform(embedding[33:64], (v, i) ->
        |           (CAST(v AS DOUBLE) - (((31 + c*7 + (i-1)) % 5) - 2))
        |           * (CAST(v AS DOUBLE) - (((31 + c*7 + (i-1)) % 5) - 2)))),
        |         (x,y)->x+y) AS dist
        |       FROM (SELECT unnest(generate_series(0, 3)) AS c))
        |     ORDER BY dist, c LIMIT 1) AS code1
        |  FROM embeddings),
        |l0 AS (
        |  SELECT c, CAST(1000000 * list_sum(
        |    list_transform(generate_series(1, 32), i ->
        |      ((((i-1)*3) % 7) - 3) * (((c*7 + (i-1)) % 5) - 2)))
        |    AS BIGINT) AS v
        |  FROM cw),
        |l1 AS (
        |  SELECT c, CAST(1000000 * list_sum(
        |    list_transform(generate_series(1, 32), i ->
        |      ((((32 + i - 1)*3) % 7) - 3) * (((31 + c*7 + (i-1)) % 5) - 2)))
        |    AS BIGINT) AS v
        |  FROM cw)
        |SELECT vec_id, CAST(code0 AS BIGINT) AS code0,
        |  CAST(code1 AS BIGINT) AS code1,
        |  l0.v + l1.v AS adc_score
        |FROM code JOIN l0 ON l0.c = code.code0 JOIN l1 ON l1.c = code.code1
        |ORDER BY adc_score DESC, vec_id LIMIT 50""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      // fixed codebooks: cb(s)(c)(i) = ((s*31 + c*7 + i) mod 5) - 2;
      // fixed query: q(g) = ((g*3) mod 7) - 3 over the 64 global dims
      val codebooks = Array.tabulate(2)(sp => Array.tabulate(4)(c =>
        Array.tabulate(32)(i => ((sp * 31 + c * 7 + i) % 5 - 2).toDouble)))
      val query = Array.tabulate(64)(g => ((g * 3) % 7 - 3).toDouble)
      val lut = SimilarityOps.pqLut(query, codebooks)
      val codes = Tables.load(s, dir, "embeddings")
        .select($"vec_id",
          SimilarityOps.pqEncode($"embedding", codebooks).as("codes"))
      SimilarityOps.pqAdcTopK(codes, "vec_id", "codes", lut, 50)
        .select($"vec_id",
          element_at($"codes", 1).cast("long").as("code0"),
          element_at($"codes", 2).cast("long").as("code1"),
          $"adc_score")
        .orderBy($"adc_score".desc, $"vec_id")
    },

    // The full PQ serving read path: ADC shortlist of 50 over the coded
    // corpus (integer adds only), then EXACT cosine re-rank of the
    // survivors against the real query vector (corpus vec 0; its LUT is
    // built from a 1-row driver collect — the per-query serving cost).
    // Compression answers the scan, exactness answers the final
    // ranking; the oracle replays shortlist + re-rank end to end.
    GraftQuery(
      "q135_pq_rerank",
      """WITH code AS (
        |  SELECT vec_id,
        |    (SELECT c FROM (
        |       SELECT c, list_reduce(list_prepend(0.0,
        |         list_transform(embedding[1:32], (v, i) ->
        |           (CAST(v AS DOUBLE) - (((c*7 + (i-1)) % 5) - 2))
        |           * (CAST(v AS DOUBLE) - (((c*7 + (i-1)) % 5) - 2)))),
        |         (x,y)->x+y) AS dist
        |       FROM (SELECT unnest(generate_series(0, 3)) AS c))
        |     ORDER BY dist, c LIMIT 1) AS code0,
        |    (SELECT c FROM (
        |       SELECT c, list_reduce(list_prepend(0.0,
        |         list_transform(embedding[33:64], (v, i) ->
        |           (CAST(v AS DOUBLE) - (((31 + c*7 + (i-1)) % 5) - 2))
        |           * (CAST(v AS DOUBLE) - (((31 + c*7 + (i-1)) % 5) - 2)))),
        |         (x,y)->x+y) AS dist
        |       FROM (SELECT unnest(generate_series(0, 3)) AS c))
        |     ORDER BY dist, c LIMIT 1) AS code1
        |  FROM embeddings),
        |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |l0 AS (
        |  SELECT c, CAST(floor(1000000 * list_reduce(list_prepend(0.0,
        |    list_transform(qe[1:32], (v, i) ->
        |      CAST(v AS DOUBLE) * (((c*7 + (i-1)) % 5) - 2))),
        |    (x,y)->x+y)) AS BIGINT) AS v
        |  FROM (SELECT unnest(generate_series(0, 3)) AS c), qv),
        |l1 AS (
        |  SELECT c, CAST(floor(1000000 * list_reduce(list_prepend(0.0,
        |    list_transform(qe[33:64], (v, i) ->
        |      CAST(v AS DOUBLE) * (((31 + c*7 + (i-1)) % 5) - 2))),
        |    (x,y)->x+y)) AS BIGINT) AS v
        |  FROM (SELECT unnest(generate_series(0, 3)) AS c), qv),
        |short AS (
        |  SELECT vec_id, l0.v + l1.v AS adc_score
        |  FROM code JOIN l0 ON l0.c = code.code0 JOIN l1 ON l1.c = code.code1
        |  ORDER BY adc_score DESC, vec_id LIMIT 50)
        |SELECT s.vec_id,
        |  CAST(round(1000000.0 * (
        |    list_reduce(list_prepend(0.0,
        |      list_transform(generate_series(1, len(a.embedding)),
        |        i -> CAST(a.embedding[i] AS DOUBLE)*CAST(q.embedding[i] AS DOUBLE))),
        |      (x,y)->x+y)
        |    / (sqrt(list_reduce(list_prepend(0.0,
        |        list_transform(generate_series(1, len(a.embedding)),
        |          i -> CAST(a.embedding[i] AS DOUBLE)*CAST(a.embedding[i] AS DOUBLE))),
        |        (x,y)->x+y))
        |     * sqrt(list_reduce(list_prepend(0.0,
        |        list_transform(generate_series(1, len(q.embedding)),
        |          i -> CAST(q.embedding[i] AS DOUBLE)*CAST(q.embedding[i] AS DOUBLE))),
        |        (x,y)->x+y))))) AS BIGINT) AS cos_micro
        |FROM short s
        |JOIN embeddings a ON a.vec_id = s.vec_id
        |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |ORDER BY cos_micro DESC, s.vec_id LIMIT 10""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val codebooks = Array.tabulate(2)(sp => Array.tabulate(4)(c =>
        Array.tabulate(32)(i => ((sp * 31 + c * 7 + i) % 5 - 2).toDouble)))
      val e = Tables.load(s, dir, "embeddings")
      // per-query serving cost: ONE 1-row collect to build the LUT
      val qvec = e.filter($"vec_id" === 0L).select($"embedding")
        .head().getSeq[Float](0).map(_.toDouble).toArray
      val lut = SimilarityOps.pqLut(qvec, codebooks)
      val codes = e.select($"vec_id",
        SimilarityOps.pqEncode($"embedding", codebooks).as("codes"))
      val short = SimilarityOps.pqAdcTopK(codes, "vec_id", "codes", lut, 50)
        .select($"vec_id")
      val qdf = broadcast(e.filter($"vec_id" === 0L)
        .select($"embedding".as("__qe")))
      short.join(e, Seq("vec_id"))
        .crossJoin(qdf)
        .select($"vec_id",
          SimilarityOps.cosineMicro($"embedding", $"__qe").as("cos_micro"))
        .orderBy($"cos_micro".desc, $"vec_id")
        .limit(10)
    },

    // The COMPOSED IVF×PQ read path — what a billion-vector store
    // actually serves (neither q37's IVF-with-exact-scan nor q134's
    // whole-corpus ADC alone): route the query to nProbe=2 of 8 cells
    // (driver-side squared-L2 to the fixed q118 centroids), ADC-score
    // ONLY rows in probed cells (the stored (id, cell, codes) index is
    // pruned by a plain cell predicate BEFORE any scoring — PlansSpec
    // asserts the parquet pushdown), shortlist 50, then exact-cosine
    // re-rank against the real query vector (corpus vec 0; LUT+route
    // from its 1-row collect). Fixed centroids + q134 codebooks keep
    // every stage — route, assign, encode, LUT, ADC, re-rank —
    // bit-replayable in DuckDB.
    GraftQuery(
      "q139_ivfpq_serve",
      """WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |assign AS (
        |  SELECT vec_id, embedding,
        |    (SELECT c FROM (
        |       SELECT c, list_reduce(list_prepend(0.0,
        |         list_transform(generate_series(1, len(embedding)), i ->
        |           (CAST(embedding[i] AS DOUBLE) -
        |              CASE WHEN i = c*8+1 THEN 8.0 ELSE 0.0 END)
        |           * (CAST(embedding[i] AS DOUBLE) -
        |              CASE WHEN i = c*8+1 THEN 8.0 ELSE 0.0 END))),
        |         (x,y)->x+y) AS dist
        |       FROM (SELECT unnest(generate_series(0, 7)) AS c))
        |     ORDER BY dist, c LIMIT 1) AS cell
        |  FROM embeddings),
        |route AS (
        |  SELECT c AS cell FROM (
        |    SELECT c, list_reduce(list_prepend(0.0,
        |      list_transform(generate_series(1, len(qe)), i ->
        |        (CAST(qe[i] AS DOUBLE) -
        |           CASE WHEN i = c*8+1 THEN 8.0 ELSE 0.0 END)
        |        * (CAST(qe[i] AS DOUBLE) -
        |           CASE WHEN i = c*8+1 THEN 8.0 ELSE 0.0 END))),
        |      (x,y)->x+y) AS dist
        |    FROM (SELECT unnest(generate_series(0, 7)) AS c), qv)
        |  ORDER BY dist, c LIMIT 2),
        |probed AS (
        |  SELECT a.vec_id, a.embedding, a.cell
        |  FROM assign a JOIN route r ON a.cell = r.cell),
        |code AS (
        |  SELECT vec_id, cell,
        |    (SELECT c FROM (
        |       SELECT c, list_reduce(list_prepend(0.0,
        |         list_transform(embedding[1:32], (v, i) ->
        |           (CAST(v AS DOUBLE) - (((c*7 + (i-1)) % 5) - 2))
        |           * (CAST(v AS DOUBLE) - (((c*7 + (i-1)) % 5) - 2)))),
        |         (x,y)->x+y) AS dist
        |       FROM (SELECT unnest(generate_series(0, 3)) AS c))
        |     ORDER BY dist, c LIMIT 1) AS code0,
        |    (SELECT c FROM (
        |       SELECT c, list_reduce(list_prepend(0.0,
        |         list_transform(embedding[33:64], (v, i) ->
        |           (CAST(v AS DOUBLE) - (((31 + c*7 + (i-1)) % 5) - 2))
        |           * (CAST(v AS DOUBLE) - (((31 + c*7 + (i-1)) % 5) - 2)))),
        |         (x,y)->x+y) AS dist
        |       FROM (SELECT unnest(generate_series(0, 3)) AS c))
        |     ORDER BY dist, c LIMIT 1) AS code1
        |  FROM probed),
        |l0 AS (
        |  SELECT c, CAST(floor(1000000 * list_reduce(list_prepend(0.0,
        |    list_transform(qe[1:32], (v, i) ->
        |      CAST(v AS DOUBLE) * (((c*7 + (i-1)) % 5) - 2))),
        |    (x,y)->x+y)) AS BIGINT) AS v
        |  FROM (SELECT unnest(generate_series(0, 3)) AS c), qv),
        |l1 AS (
        |  SELECT c, CAST(floor(1000000 * list_reduce(list_prepend(0.0,
        |    list_transform(qe[33:64], (v, i) ->
        |      CAST(v AS DOUBLE) * (((31 + c*7 + (i-1)) % 5) - 2))),
        |    (x,y)->x+y)) AS BIGINT) AS v
        |  FROM (SELECT unnest(generate_series(0, 3)) AS c), qv),
        |short AS (
        |  SELECT vec_id, CAST(cell AS INTEGER) AS cell,
        |    l0.v + l1.v AS adc_score
        |  FROM code JOIN l0 ON l0.c = code.code0 JOIN l1 ON l1.c = code.code1
        |  ORDER BY adc_score DESC, vec_id LIMIT 50)
        |SELECT s.vec_id, s.cell, s.adc_score,
        |  CAST(round(1000000.0 * (
        |    list_reduce(list_prepend(0.0,
        |      list_transform(generate_series(1, len(a.embedding)),
        |        i -> CAST(a.embedding[i] AS DOUBLE)*CAST(q.qe[i] AS DOUBLE))),
        |      (x,y)->x+y)
        |    / (sqrt(list_reduce(list_prepend(0.0,
        |        list_transform(generate_series(1, len(a.embedding)),
        |          i -> CAST(a.embedding[i] AS DOUBLE)*CAST(a.embedding[i] AS DOUBLE))),
        |        (x,y)->x+y))
        |     * sqrt(list_reduce(list_prepend(0.0,
        |        list_transform(generate_series(1, len(q.qe)),
        |          i -> CAST(q.qe[i] AS DOUBLE)*CAST(q.qe[i] AS DOUBLE))),
        |        (x,y)->x+y))))) AS BIGINT) AS cos_micro
        |FROM short s
        |JOIN embeddings a ON a.vec_id = s.vec_id
        |CROSS JOIN qv q
        |ORDER BY cos_micro DESC, s.vec_id LIMIT 10""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val centers = Array.tabulate(8)(c =>
        Array.tabulate(64)(i => if (i == c * 8) 8.0 else 0.0))
      val codebooks = Array.tabulate(2)(sp => Array.tabulate(4)(c =>
        Array.tabulate(32)(i => ((sp * 31 + c * 7 + i) % 5 - 2).toDouble)))
      val e = Tables.load(s, dir, "embeddings")
      // per-query serving cost: ONE 1-row collect drives route + LUT
      val qvec = e.filter($"vec_id" === 0L).select($"embedding")
        .head().getSeq[Float](0).map(_.toDouble).toArray
      val index = SimilarityOps.ivfPqIndex(
        e.select($"vec_id", $"embedding"), "vec_id", "embedding",
        centers, codebooks)
      SimilarityOps.ivfPqTopK(
          index, "vec_id", e, "vec_id", "embedding",
          qvec, centers, codebooks, nProbe = 2, shortlist = 50, k = 10)
        .orderBy($"cos_micro".desc, $"vec_id")
    },

    // Per-label embedding centroids + pairwise class separability —
    // the "are my classes actually separated in embedding space"
    // audit before training a classifier on them. Components quantize
    // to integer MILLI first (floor(v·1000 + 0.5), the q97 rule) so
    // every per-(label, dim) sum is order-independent integer math —
    // no float accumulation anywhere; the corpus reduces to
    // |labels|·dim rows in one map-side-combined pass; centroid pairs
    // and norms are domain-sized equi-joins. cos² in ppm with the
    // sign carried separately (the q158 no-sqrt form).
    GraftQuery(
      "q205_label_centroids",
      """WITH comp AS (
        |  SELECT label, u.i AS dim,
        |    CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000 + 0.5)
        |      AS BIGINT) AS c
        |  FROM embeddings,
        |    UNNEST(generate_series(1, len(embedding))) AS u(i)),
        |cent AS (
        |  SELECT label, dim, SUM(c) // COUNT(*) AS m
        |  FROM comp GROUP BY 1, 2),
        |norms AS (
        |  SELECT label, SUM(m*m) AS nn FROM cent GROUP BY 1),
        |dots AS (
        |  SELECT a.label AS la, b.label AS lb, SUM(a.m * b.m) AS dot
        |  FROM cent a JOIN cent b ON a.dim = b.dim
        |  WHERE a.label < b.label GROUP BY 1, 2)
        |SELECT CAST(la AS BIGINT) AS la, CAST(lb AS BIGINT) AS lb,
        |  CAST(CASE WHEN dot < 0 THEN -1 ELSE 1 END AS BIGINT)
        |    AS dot_sign,
        |  CASE WHEN na.nn * nb.nn // 1000000 > 0 THEN
        |    CAST(dot * dot // (na.nn * nb.nn // 1000000) AS BIGINT)
        |  END AS cos2_ppm
        |FROM dots JOIN norms na ON na.label = dots.la
        |  JOIN norms nb ON nb.label = dots.lb
        |ORDER BY la, lb""".stripMargin) { (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val cent = Tables.load(s, dir, "embeddings")
        .select($"label".cast("long").as("label"),
          posexplode($"embedding"))
        .select($"label", ($"pos" + 1).as("dim"),
          floor($"col".cast("double") * 1000 + 0.5).cast("long").as("c"))
        .groupBy($"label", $"dim")
        .agg(div(sum($"c"), count(lit(1))).as("m"))
        .graftCheckpoint() // feeds norms + both pair sides
      val norms = cent.groupBy($"label").agg(sum($"m" * $"m").as("nn"))
      val dots = cent.select($"label".as("la"), $"dim", $"m".as("ma"))
        .join(cent.select($"label".as("lb"), $"dim", $"m".as("mb")),
          Seq("dim"))
        .where($"la" < $"lb")
        .groupBy($"la", $"lb").agg(sum($"ma" * $"mb").as("dot"))
      dots
        .join(norms.select($"label".as("la"), $"nn".as("na")), Seq("la"))
        .join(norms.select($"label".as("lb"), $"nn".as("nb")), Seq("lb"))
        .select($"la", $"lb",
          when($"dot" < 0L, -1L).otherwise(1L).as("dot_sign"),
          // dot²·1e6 would overflow BIGINT at plausible norms — divide
          // the norm product down by 1e6 instead (identical truncation
          // on both engines; ppm-scale result, q204's scaled form)
          when(div($"na" * $"nb", lit(1000000L)) > 0L,
            div($"dot" * $"dot", div($"na" * $"nb", lit(1000000L))))
            .as("cos2_ppm"))
        .orderBy($"la", $"lb")
    },

    // Random-projection dimensionality reduction (Achlioptas 2003 ±1
    // JL transform): 64-dim float embeddings → 16 integer components
    // via a HASH-DERIVED sign matrix R[i][j] = ±1 from the parity of
    // the portable polyhash of "rp1:i:j" — no materialized matrix, no
    // randomness to ship; any engine (and any executor) regenerates
    // the identical projection. Components quantize to integer milli
    // first (q205 rule) so the contraction is exact integer sums. The
    // whole transform is one explode(dims)×explode(16) + groupBy —
    // embarrassingly parallel, and the 16× blowup is the OUTPUT
    // dimensionality, not a shuffle amplification.
    GraftQuery(
      "q215_random_projection",
      """WITH comp AS (
        |  SELECT vec_id, u.i AS j,
        |    CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000 + 0.5)
        |      AS BIGINT) AS c
        |  FROM embeddings,
        |    UNNEST(generate_series(1, len(embedding))) AS u(i)
        |  WHERE vec_id < 100),
        |proj AS (
        |  SELECT vec_id, o.i AS i,
        |    CAST(SUM((
        |      (list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(
        |          'rp1:' || CAST(o.i AS VARCHAR) || ':'
        |            || CAST(j AS VARCHAR), ''),
        |          ch -> ascii(ch))),
        |        (a, x) -> (a*31+x) % 1000000007) % 2) * 2 - 1) * c)
        |      AS BIGINT) AS v
        |  FROM comp, UNNEST(generate_series(0, 15)) AS o(i)
        |  GROUP BY 1, 2)
        |SELECT vec_id, CAST(i AS BIGINT) AS i, v
        |FROM proj ORDER BY vec_id, i""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ph = graft.functions.GraftColumns.polyHash _
      val comp = Tables.load(s, dir, "embeddings")
        .where($"vec_id" < 100L)
        .select($"vec_id", posexplode($"embedding"))
        .select($"vec_id", ($"pos" + 1).as("j"),
          floor($"col".cast("double") * 1000 + 0.5).cast("long").as("c"))
      comp
        .select($"vec_id", $"j", $"c",
          explode(sequence(lit(0L), lit(15L))).as("i"))
        .withColumn("sign",
          pmod(ph(concat(lit("rp1:"), $"i".cast("string"), lit(":"),
            $"j".cast("string"))), lit(2L)) * 2L - 1L)
        .groupBy($"vec_id", $"i")
        .agg(sum($"sign" * $"c").as("v"))
        .orderBy($"vec_id", $"i")
    },

    // Distributed matrix multiply as a JOIN — Y = X·W with the weight
    // matrix a TABLE (j, i, w), not a literal: the canonical
    // linear-algebra-on-relational-ops shape (X exploded to (id, j,
    // x_j), equi-join on j, map-side-combined Σ per (id, i)). At scale
    // W broadcasts (model-as-table, the q125 pattern) and the corpus
    // streams; shuffle is one (id, i) combine. Weights here come from
    // a deterministic integer formula materialized through a spine so
    // the join is real.
    GraftQuery(
      "q223_matmul",
      """WITH x AS (
        |  SELECT vec_id, u.i AS j,
        |    CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000 + 0.5)
        |      AS BIGINT) AS c
        |  FROM embeddings,
        |    UNNEST(generate_series(1, len(embedding))) AS u(i)
        |  WHERE vec_id < 100),
        |wm AS (
        |  SELECT j.j, o.i,
        |    CAST((o.i * 13 + j.j * 7) % 11 - 5 AS BIGINT) AS w
        |  FROM UNNEST(generate_series(1, 64)) AS j(j),
        |    UNNEST(generate_series(0, 7)) AS o(i))
        |SELECT x.vec_id, CAST(wm.i AS BIGINT) AS i,
        |  CAST(SUM(x.c * wm.w) AS BIGINT) AS y
        |FROM x JOIN wm ON wm.j = x.j
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      val x = Tables.load(s, dir, "embeddings")
        .where($"vec_id" < 100L)
        .select($"vec_id", posexplode($"embedding"))
        .select($"vec_id", ($"pos" + 1).as("j"),
          floor($"col".cast("double") * 1000 + 0.5).cast("long").as("c"))
      val wm = s.range(1, 65).select($"id".as("j"))
        .crossJoin(broadcast(s.range(0, 8).select($"id".as("i"))))
        .select($"j", $"i",
          (pmod($"i" * 13L + $"j" * 7L, lit(11L)) - 5L).as("w"))
      x.join(broadcast(wm), Seq("j"))
        .groupBy($"vec_id", $"i")
        .agg(sum($"c" * $"w").as("y"))
        .orderBy($"vec_id", $"i")
    },

    // Hard-negative mining for contrastive training: per anchor, the
    // top-3 HIGHEST-cosine candidates with a DIFFERENT label from a
    // bounded broadcast candidate pool — the negatives that actually
    // teach a bi-encoder. The pool-bounded broadcast NLJ is the
    // operator's definition (q35's sanction argument); per-anchor rank
    // windows are pool-sized. Exact integer cosines (cosineMicro).
    GraftQuery(
      "q225_hard_negatives",
      s"""WITH a AS (
         |  SELECT vec_id, embedding, label FROM embeddings
         |  WHERE vec_id < 50),
         |p AS (
         |  SELECT vec_id, embedding, label FROM embeddings
         |  WHERE vec_id >= 100 AND vec_id < 164),
         |scored AS (
         |  SELECT a.vec_id AS anchor_id, p.vec_id AS neg_id,
         |    CAST(${duckCosMicro("a", "p")} AS BIGINT) AS cos_micro
         |  FROM a JOIN p ON a.label <> p.label),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY anchor_id
         |    ORDER BY cos_micro DESC, neg_id) AS rank
         |  FROM scored)
         |SELECT anchor_id, neg_id, cos_micro,
         |  CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= 3
         |ORDER BY anchor_id, rank""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val e = Tables.load(s, dir, "embeddings")
      val anchors = e.where($"vec_id" < 50L)
        .select($"vec_id".as("anchor_id"), $"embedding".as("ae"),
          $"label".as("al"))
      val pool = e.where($"vec_id" >= 100L && $"vec_id" < 164L)
        .select($"vec_id".as("neg_id"), $"embedding".as("pe"),
          $"label".as("pl"))
      val w = Window.partitionBy($"anchor_id")
        .orderBy($"cos_micro".desc, $"neg_id")
      anchors.join(broadcast(pool), $"al" =!= $"pl")
        .select($"anchor_id", $"neg_id",
          SimilarityOps.cosineMicro($"ae", $"pe").as("cos_micro"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .where($"rank" <= 3L)
        .orderBy($"anchor_id", $"rank")
    },

    // MMR diversity re-ranking (SimilarityOps.mmrTopK): greedy
    // λ·rel − (1−λ)·maxSimToSelected over a top-20 relevance shortlist,
    // Matryoshka truncation eval (MRL embeddings: how much ANN quality
    // survives serving from a PREFIX of each vector — the
    // dimension-vs-cost dial of matryoshka-trained embedders): top-5
    // neighbors for 10 queries at prefix dims 16 and 32 vs the full
    // vectors; per (dim, query) the overlap with the full-dim top-5.
    // Both rankings are exact integer-micro cosines with pinned ties,
    // so the overlap counts are engine-reproducible.
    GraftQuery(
      "q263_matryoshka_eval",
      s"""WITH base AS (
         |  SELECT vec_id, embedding,
         |    embedding[1:16] AS e16, embedding[1:32] AS e32
         |  FROM embeddings),
         |full5 AS (
         |  SELECT * FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        CAST(${duckCosMicroCol("q", "c", "embedding")} AS BIGINT)
         |          DESC, c.vec_id) AS rk
         |    FROM base q JOIN base c ON q.vec_id != c.vec_id
         |    WHERE q.vec_id < 10)
         |  WHERE rk <= 5),
         |p16 AS (
         |  SELECT * FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        CAST(${duckCosMicroCol("q", "c", "e16")} AS BIGINT)
         |          DESC, c.vec_id) AS rk
         |    FROM base q JOIN base c ON q.vec_id != c.vec_id
         |    WHERE q.vec_id < 10)
         |  WHERE rk <= 5),
         |p32 AS (
         |  SELECT * FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        CAST(${duckCosMicroCol("q", "c", "e32")} AS BIGINT)
         |          DESC, c.vec_id) AS rk
         |    FROM base q JOIN base c ON q.vec_id != c.vec_id
         |    WHERE q.vec_id < 10)
         |  WHERE rk <= 5)
         |SELECT dim, query_id, COUNT(*) AS n_overlap FROM (
         |  SELECT CAST(16 AS BIGINT) AS dim, f.query_id
         |  FROM full5 f JOIN p16 p
         |    ON p.query_id = f.query_id AND p.neighbor_id = f.neighbor_id
         |  UNION ALL
         |  SELECT CAST(32 AS BIGINT), f.query_id
         |  FROM full5 f JOIN p32 p
         |    ON p.query_id = f.query_id AND p.neighbor_id = f.neighbor_id)
         |GROUP BY dim, query_id ORDER BY dim, query_id""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "embeddings")
        .select($"vec_id", $"embedding")
      def top5(dim: Option[Int]) = {
        val emb = (c: org.apache.spark.sql.Column) =>
          dim.fold(c)(d => slice(c, 1, d))
        SimilarityOps.bruteForceTopK(
            e.select($"vec_id", emb($"embedding").as("emb")),
            "vec_id", "emb",
            e.filter($"vec_id" < 10)
              .select($"vec_id".as("query_id"),
                emb($"embedding").as("qvec")),
            "query_id", "qvec", k = 5)
          .select($"query_id", $"vec_id".as("neighbor_id"))
      }
      val full = top5(None)
      Seq(16, 32).map { d =>
        full.join(top5(Some(d)), Seq("query_id", "neighbor_id"))
          .groupBy($"query_id")
          .agg(count(lit(1)).as("n_overlap"))
          .select(lit(d.toLong).as("dim"), $"query_id", $"n_overlap")
      }.reduce(_ unionByName _)
        .orderBy($"dim", $"query_id")
    },

    // k = 5, λ = 0.7 — exact integer micro scores, ties to the lower
    // id. The oracle unrolls the five greedy rounds as chained CTEs
    // (argmax → pool minus pick → running GREATEST max-sim), the same
    // fixed-round replay idiom as PageRank3. The 1-row pick cross joins
    // are the q96 scalar pattern (PlansSpec sanction). This gates the
    // SEQUENTIAL referee face (one ad-hoc query, rounds visible as
    // plans); the serving shape — queries as a table, zero per-query
    // driver actions — is mmrTopKGrouped, gated by q288 and composed
    // into q266.
    GraftQuery(
      "q249_mmr_rerank",
      s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
         |cand AS (
         |  SELECT c.vec_id AS id, c.embedding,
         |    CAST(${duckCosMicro("c", "q")} AS BIGINT) AS rel
         |  FROM embeddings c CROSS JOIN q WHERE c.vec_id != 0
         |  ORDER BY rel DESC, id LIMIT 20),
         |p0 AS (SELECT id, embedding, rel, CAST(0 AS BIGINT) AS ms
         |       FROM cand),
         |${SimilarityQueries.mmrRoundsSql(5, 700000L)}
         |SELECT * FROM (
         |  ${(1 to 5).map(i =>
             s"SELECT CAST($i AS BIGINT) AS rank, id, rel, " +
               s"ms AS max_sim_micro, score FROM s$i")
             .mkString(" UNION ALL ")})
         |ORDER BY rank""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "embeddings")
      val qv = e.filter($"vec_id" === 0L).select($"embedding".as("qvec"))
      val cand = e.filter($"vec_id" =!= 0L)
        .crossJoin(broadcast(qv))
        .select($"vec_id", $"embedding",
          SimilarityOps.cosineMicro($"embedding", $"qvec").as("rel"))
        .orderBy($"rel".desc, $"vec_id").limit(20)
      SimilarityOps.mmrTopK(cand, "vec_id", "embedding", "rel",
          k = 5, lambdaPpm = 700000L)
        .select($"rank", $"id".cast("long").as("id"), $"rel",
          $"max_sim_micro", $"score")
        .orderBy($"rank")
    },

    // Hybrid retrieval: reciprocal-rank fusion of a LEXICAL ranker
    // (distinct-token overlap via the inverted-index posting join —
    // the q31 shape) and a SEMANTIC ranker (embedding cosine; the
    // brute-force conformance face of the q266 ANN serving path), each
    // contributing its top-20 per query, fused as Σ⌊1e6/(60+rank)⌋
    // (Cormack et al. 2009). Items on one list only score one term —
    // the published semantics. Both input rankings and the fused order
    // carry pinned ties, so the whole hybrid stack hash-replays.
    GraftQuery(
      "q269_rrf_fusion",
      s"""WITH toks AS (
         |  SELECT doc_id, list_distinct(
         |    list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
         |      AS tk
         |  FROM documents),
         |qt AS (
         |  SELECT doc_id AS query_id, u.t AS t
         |  FROM toks, unnest(tk) AS u(t) WHERE doc_id % 100 = 7),
         |dt AS (SELECT doc_id, u.t AS t FROM toks, unnest(tk) AS u(t)),
         |ov AS (
         |  SELECT qt.query_id, dt.doc_id, COUNT(*) AS ov
         |  FROM qt JOIN dt ON dt.t = qt.t
         |  WHERE dt.doc_id <> qt.query_id GROUP BY 1, 2),
         |lex AS (SELECT * FROM (
         |  SELECT query_id, doc_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY ov DESC, doc_id) AS r
         |  FROM ov) WHERE r <= 20),
         |sem AS (SELECT * FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |      CAST(${duckCosMicro("q", "c")} AS BIGINT) DESC, c.vec_id)
         |      AS r
         |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id % 100 = 7) WHERE r <= 20),
         |fused AS (
         |  SELECT query_id, doc_id, SUM(1000000 // (60 + r)) AS rrf
         |  FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem)
         |  GROUP BY 1, 2),
         |top AS (
         |  SELECT query_id, doc_id, rrf, row_number() OVER (
         |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank
         |  FROM fused)
         |SELECT query_id, doc_id, CAST(rrf AS BIGINT) AS rrf,
         |  CAST(rank AS BIGINT) AS rank
         |FROM top WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      import s.implicits._
      val toksD = Tables.load(s, dir, "documents")
        .select($"doc_id", array_distinct(
          filter(split($"text", "\\s+"), t => t =!= "")).as("tk"))
      val qtok = toksD.filter($"doc_id" % 100 === 7)
        .select($"doc_id".as("query_id"), explode($"tk").as("t"))
      val dtok = toksD.select($"doc_id", explode($"tk").as("t"))
      val wl = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"ov".desc, $"doc_id".asc)
      val lex = qtok.join(dtok, Seq("t"))
        .filter($"doc_id" =!= $"query_id")
        .groupBy($"query_id", $"doc_id").agg(count(lit(1)).as("ov"))
        .withColumn("r", row_number().over(wl)).filter($"r" <= 20)
        .select($"query_id", $"doc_id", $"r")
      val e = Tables.load(s, dir, "embeddings")
      val sem = SimilarityOps.bruteForceTopK(e, "vec_id", "embedding",
          e.filter($"vec_id" % 100 === 7)
            .select($"vec_id".as("query_id"), $"embedding".as("qvec")),
          "query_id", "qvec", k = 20)
        .select($"query_id", $"vec_id".as("doc_id"), $"rank".as("r"))
      graft.ops.SearchOps.rrfFuse(Seq(lex, sem),
          "query_id", "doc_id", "r", kRrf = 60L, topK = 10)
        .select($"query_id", $"doc_id", $"rrf",
          $"rank".cast("long").as("rank"))
        .orderBy($"query_id", $"rank")
    },

    // Clustering QA: simplified (centroid-based) silhouette over the
    // labeled embeddings — cohesion/separation per cluster at n·k·dim
    // cost (the all-pairs classic is unaffordable at corpus scale).
    // Integer-milli quantization + floor-div centroids + squared
    // distances keep every value exactly replayable; see
    // SimilarityOps.simplifiedSilhouette.
    GraftQuery(
      "q270_silhouette",
      """WITH m AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))
        |      AS mv
        |  FROM embeddings),
        |comp AS (
        |  SELECT vec_id, label, g.j AS j, mv[g.j] AS v
        |  FROM m, unnest(generate_series(1, len(mv))) AS g(j)),
        |cent AS (
        |  SELECT label AS cc, j, SUM(v) // COUNT(*) AS c
        |  FROM comp GROUP BY 1, 2),
        |sq AS (
        |  SELECT p.vec_id, p.label, c.cc,
        |    SUM((p.v - c.c) * (p.v - c.c)) AS d2
        |  FROM comp p JOIN cent c ON c.j = p.j GROUP BY 1, 2, 3),
        |ab AS (
        |  SELECT vec_id, label,
        |    MIN(CASE WHEN cc = label THEN d2 END) AS a,
        |    MIN(CASE WHEN cc <> label THEN d2 END) AS b
        |  FROM sq GROUP BY 1, 2),
        |sil AS (
        |  SELECT vec_id, label, a, b,
        |    (b - a) * 1000000 // greatest(a, b, 1) AS s FROM ab)
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |  CAST(SUM(s) // COUNT(*) AS BIGINT) AS mean_sil_ppm,
        |  CAST(SUM(a) // COUNT(*) AS BIGINT) AS mean_a_sq,
        |  CAST(SUM(b) // COUNT(*) AS BIGINT) AS mean_b_sq
        |FROM sil GROUP BY label ORDER BY label""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val div = graft.functions.GraftColumns.longDiv _
      val e = Tables.load(s, dir, "embeddings")
        .select($"vec_id", $"embedding", $"label".cast("long").as("label"))
      SimilarityOps.simplifiedSilhouette(e, "vec_id", "embedding", "label")
        .groupBy($"label")
        .agg(count(lit(1)).as("n_vecs"),
          div(sum($"sil_ppm"), count(lit(1))).as("mean_sil_ppm"),
          div(sum($"a_sq"), count(lit(1))).as("mean_a_sq"),
          div(sum($"b_sq"), count(lit(1))).as("mean_b_sq"))
        .orderBy($"label")
    },

    // Contrastive-training data prep: for each anchor, the top-3
    // same-label neighbors (positives) and top-3 different-label
    // neighbors (HARD negatives — the highest-cosine wrong-label
    // items, exactly what contrastive losses want mined). Conformance
    // face is brute force over the broadcast anchor set; the corpus
    // path swaps stage 1 for the q266 ANN shortlist and keeps the
    // label split + per-(anchor, kind) top-k unchanged.
    GraftQuery(
      "q271_hard_negatives",
      s"""WITH a AS (
         |  SELECT vec_id AS anchor_id, embedding, label
         |  FROM embeddings WHERE vec_id < 20),
         |sc AS (
         |  SELECT a.anchor_id,
         |    CASE WHEN c.label = a.label THEN 'pos' ELSE 'neg' END
         |      AS kind,
         |    c.vec_id AS cand_id,
         |    CAST(${duckCosMicro("a", "c")} AS BIGINT) AS cos_micro
         |  FROM embeddings c JOIN a ON c.vec_id <> a.anchor_id),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY anchor_id, kind
         |    ORDER BY cos_micro DESC, cand_id) AS rank
         |  FROM sc)
         |SELECT anchor_id, kind, CAST(rank AS BIGINT) AS rank,
         |  cand_id, cos_micro
         |FROM r WHERE rank <= 3
         |ORDER BY anchor_id, kind, rank""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "embeddings")
      val anchors = e.filter($"vec_id" < 20)
        .select($"vec_id".as("anchor_id"), $"embedding".as("avec"),
          $"label".as("albl"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"anchor_id", $"kind")
        .orderBy($"cos_micro".desc, $"cand_id".asc)
      e.join(broadcast(anchors))
        .filter($"vec_id" =!= $"anchor_id")
        .select($"anchor_id",
          when($"label" === $"albl", lit("pos")).otherwise(lit("neg"))
            .as("kind"),
          $"vec_id".as("cand_id"),
          SimilarityOps.cosineMicro($"avec", $"embedding").as("cos_micro"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 3)
        .select($"anchor_id", $"kind", $"rank".cast("long").as("rank"),
          $"cand_id", $"cos_micro")
        .orderBy($"anchor_id", $"kind", $"rank")
    },

    // Bitext mining (SimilarityOps.bitextMutualPairs): mutual
    // cosine-best en↔fr pairs scored by the Artetxe–Schwenk margin
    // (cos·2e6 / (avg_k(x)+avg_k(y)), k=4) — the CCMatrix
    // parallel-corpus recipe over the id-aligned embeddings. Brute
    // force is the conformance face; the ANN shortlist (q266) is the
    // stage-1 swap at corpus scale.
    GraftQuery(
      "q278_bitext_mining",
      s"""WITH l AS (
         |  SELECT d.doc_id AS lid, e.embedding
         |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
         |  WHERE d.lang = 'en'),
         |r AS (
         |  SELECT d.doc_id AS rid, e.embedding
         |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
         |  WHERE d.lang = 'fr'),
         |sc AS (
         |  SELECT l.lid, r.rid,
         |    CAST(${duckCosMicro("l", "r")} AS BIGINT) AS cos_micro
         |  FROM l CROSS JOIN r),
         |rk AS (
         |  SELECT *,
         |    row_number() OVER (PARTITION BY lid
         |      ORDER BY cos_micro DESC, rid) AS rl,
         |    row_number() OVER (PARTITION BY rid
         |      ORDER BY cos_micro DESC, lid) AS rr
         |  FROM sc),
         |al AS (SELECT lid, CAST(SUM(cos_micro) // COUNT(*) AS BIGINT)
         |         AS avg_l
         |       FROM rk WHERE rl <= 4 GROUP BY 1),
         |ar AS (SELECT rid, CAST(SUM(cos_micro) // COUNT(*) AS BIGINT)
         |         AS avg_r
         |       FROM rk WHERE rr <= 4 GROUP BY 1)
         |SELECT rk.lid AS en_id, rk.rid AS fr_id, rk.cos_micro,
         |  CAST(rk.cos_micro * 2000000
         |    // greatest(al.avg_l + ar.avg_r, 1) AS BIGINT)
         |    AS margin_ppm
         |FROM rk JOIN al ON al.lid = rk.lid
         |  JOIN ar ON ar.rid = rk.rid
         |WHERE rk.rl = 1 AND rk.rr = 1
         |ORDER BY en_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val e = Tables.load(s, dir, "embeddings")
      def side(lang: String, idName: String) =
        docs.filter($"lang" === lang)
          .join(e, $"vec_id" === $"doc_id")
          .select($"doc_id".as(idName), $"embedding")
      SimilarityOps.bitextMutualPairs(
          side("en", "en_id"), "en_id", "embedding",
          side("fr", "fr_id"), "fr_id", "embedding", k = 4)
        .orderBy($"en_id")
    },

    // One-pass embedding mean/covariance sufficient statistics
    // (SimilarityOps.embeddingCovariance) — the Gram readout feeding
    // whitening/PCA/drift checks. Each row explodes to its
    // dim(dim+1)/2 upper-triangle products which partial-aggregate
    // map-side; the only shuffle carries dim²-bounded combined
    // partials. Integer millis + explicit floor divs make the floored
    // covariance estimator hash-replayable.
    GraftQuery(
      "q274_embedding_covariance",
      """WITH m AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))
        |      AS mv
        |  FROM embeddings),
        |comp AS (
        |  SELECT vec_id, g.j AS j, mv[g.j] AS v
        |  FROM m, unnest(generate_series(1, len(mv))) AS g(j)),
        |nn AS (SELECT COUNT(*) AS n FROM m),
        |cs AS (SELECT j, CAST(SUM(v) AS BIGINT) AS sj
        |       FROM comp GROUP BY 1),
        |pr AS (
        |  SELECT a.j AS j, b.j AS k, CAST(SUM(a.v * b.v) AS BIGINT)
        |    AS s
        |  FROM comp a JOIN comp b
        |    ON b.vec_id = a.vec_id AND b.j >= a.j
        |  GROUP BY 1, 2)
        |SELECT pr.j AS j, pr.k AS k, CAST(nn.n AS BIGINT) AS n,
        |  CAST(pr.s // nn.n - (ca.sj // nn.n) * (cb.sj // nn.n)
        |    AS BIGINT) AS cov_milli2
        |FROM pr JOIN cs ca ON ca.j = pr.j
        |  JOIN cs cb ON cb.j = pr.k CROSS JOIN nn
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      SimilarityOps.embeddingCovariance(
          Tables.load(s, dir, "embeddings"), "embedding")
        .orderBy($"j", $"k")
    },

    // GROUPED MMR serving (SimilarityOps.mmrTopKGrouped — the
    // queries-as-a-table shape of q249): 5 queries, each with its own
    // brute-force top-20 shortlist, diversified k=5 λ=0.7 in ONE
    // data-parallel job — zero per-query driver actions; the greedy
    // fold runs locally inside each query's group. Oracle: the q249
    // chained-CTE replay generalized per query (argmax → per-qid
    // row_number()=1, pick-fold join on qid).
    GraftQuery(
      "q288_mmr_serve_grouped",
      s"""WITH cand AS (
         |  SELECT qid, id, embedding, rel FROM (
         |    SELECT q.vec_id AS qid, c.vec_id AS id, c.embedding,
         |      CAST(${duckCosMicro("c", "q")} AS BIGINT) AS rel,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        CAST(${duckCosMicro("c", "q")} AS BIGINT) DESC,
         |        c.vec_id) AS rn
         |    FROM embeddings q JOIN embeddings c
         |      ON c.vec_id != q.vec_id
         |    WHERE q.vec_id < 5)
         |  WHERE rn <= 20),
         |p0 AS (SELECT qid, id, embedding, rel, CAST(0 AS BIGINT) AS ms
         |       FROM cand),
         |${SimilarityQueries.mmrGroupedRoundsSql(5, 700000L)}
         |SELECT * FROM (
         |  ${(1 to 5).map(i =>
             s"SELECT qid AS query_id, CAST($i AS BIGINT) AS rank, " +
               s"id, rel, ms AS max_sim_micro, score FROM s$i")
             .mkString(" UNION ALL ")})
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "embeddings")
      val queries = e.filter($"vec_id" < 5L)
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      val short = SimilarityOps.bruteForceTopK(
          e, "vec_id", "embedding", queries, "query_id", "qvec", k = 20)
        .select($"query_id", $"vec_id", $"cos_micro".as("rel"))
      val cand = short.join(e.select($"vec_id", $"embedding"),
        Seq("vec_id"))
      SimilarityOps.mmrTopKGrouped(cand, "query_id", "vec_id",
          "embedding", "rel", k = 5, lambdaPpm = 700000L)
        .orderBy($"query_id", $"rank")
    },

    // BATCHED PQ serving (SimilarityOps.pqAdcTopKMulti — the
    // queries-as-a-table shape of q135): 5 queries, each LUT built
    // IN-PLAN on the broadcast queries side (floor(1e6·subspace dot)
    // replaying pqLut's fold), ADC shortlist 50 per query over the
    // coded corpus, exact cosine re-rank to top-10 per query — no
    // per-query collect, no per-query job; the corpus streams through
    // one scan for all queries. Same fixed q134 codebooks keep every
    // stage bit-replayable in DuckDB.
    GraftQuery(
      "q289_pq_serve_batch",
      s"""WITH code AS (
         |  SELECT vec_id,
         |    (SELECT c FROM (
         |       SELECT c, list_reduce(list_prepend(0.0,
         |         list_transform(embedding[1:32], (v, i) ->
         |           (CAST(v AS DOUBLE) - (((c*7 + (i-1)) % 5) - 2))
         |           * (CAST(v AS DOUBLE) - (((c*7 + (i-1)) % 5) - 2)))),
         |         (x,y)->x+y) AS dist
         |       FROM (SELECT unnest(generate_series(0, 3)) AS c))
         |     ORDER BY dist, c LIMIT 1) AS code0,
         |    (SELECT c FROM (
         |       SELECT c, list_reduce(list_prepend(0.0,
         |         list_transform(embedding[33:64], (v, i) ->
         |           (CAST(v AS DOUBLE) - (((31 + c*7 + (i-1)) % 5) - 2))
         |           * (CAST(v AS DOUBLE) - (((31 + c*7 + (i-1)) % 5) - 2)))),
         |         (x,y)->x+y) AS dist
         |       FROM (SELECT unnest(generate_series(0, 3)) AS c))
         |     ORDER BY dist, c LIMIT 1) AS code1
         |  FROM embeddings),
         |qv AS (SELECT vec_id AS query_id, embedding AS qe
         |       FROM embeddings WHERE vec_id < 5),
         |l0 AS (
         |  SELECT query_id, c, CAST(floor(1000000 * list_reduce(
         |    list_prepend(0.0, list_transform(qe[1:32], (v, i) ->
         |      CAST(v AS DOUBLE) * (((c*7 + (i-1)) % 5) - 2))),
         |    (x,y)->x+y)) AS BIGINT) AS v
         |  FROM qv, (SELECT unnest(generate_series(0, 3)) AS c)),
         |l1 AS (
         |  SELECT query_id, c, CAST(floor(1000000 * list_reduce(
         |    list_prepend(0.0, list_transform(qe[33:64], (v, i) ->
         |      CAST(v AS DOUBLE) * (((31 + c*7 + (i-1)) % 5) - 2))),
         |    (x,y)->x+y)) AS BIGINT) AS v
         |  FROM qv, (SELECT unnest(generate_series(0, 3)) AS c)),
         |short AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT l0.query_id, code.vec_id,
         |      row_number() OVER (PARTITION BY l0.query_id
         |        ORDER BY l0.v + l1.v DESC, code.vec_id) AS rn
         |    FROM code
         |    JOIN l0 ON l0.c = code.code0
         |    JOIN l1 ON l1.query_id = l0.query_id
         |      AND l1.c = code.code1)
         |  WHERE rn <= 50),
         |rr AS (
         |  SELECT s.query_id, s.vec_id,
         |    CAST(${duckCosMicro("a", "q")} AS BIGINT) AS cos_micro
         |  FROM short s
         |  JOIN embeddings a ON a.vec_id = s.vec_id
         |  JOIN (SELECT vec_id AS query_id, embedding
         |        FROM embeddings WHERE vec_id < 5) q
         |    ON q.query_id = s.query_id)
         |SELECT query_id, vec_id, cos_micro, rank FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos_micro DESC, vec_id) AS BIGINT) AS rank
         |  FROM rr)
         |WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val codebooks = Array.tabulate(2)(sp => Array.tabulate(4)(c =>
        Array.tabulate(32)(i => ((sp * 31 + c * 7 + i) % 5 - 2).toDouble)))
      val e = Tables.load(s, dir, "embeddings")
      val codes = e.select($"vec_id",
        SimilarityOps.pqEncode($"embedding", codebooks).as("codes"))
      val queries = e.filter($"vec_id" < 5L)
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      val short = SimilarityOps.pqAdcTopKMulti(codes, "vec_id", "codes",
          queries, "query_id", "qvec", codebooks, k = 50)
        .select($"query_id", $"vec_id")
      val w = Window.partitionBy($"query_id")
        .orderBy($"cos_micro".desc, $"vec_id".asc)
      short.join(e.select($"vec_id", $"embedding"), Seq("vec_id"))
        .join(broadcast(queries), Seq("query_id"))
        .select($"query_id", $"vec_id",
          SimilarityOps.cosineMicro($"embedding", $"qvec").as("cos_micro"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= 10L)
        .orderBy($"query_id", $"rank")
    },

    // BATCHED IVF×PQ serving (SimilarityOps.ivfPqTopKMulti — the
    // composed billion-vector read path at the query dimension,
    // VERDICT r9 task #2): 5 queries route to nProbe=2 of the 8 fixed
    // q118 centroids IN-PLAN (broadcast centroid table + per-query
    // row_number, no driver routing), ADC-score only rows in each
    // query's probed cells off the stored (id, cell, codes) index,
    // shortlist 50 per query, exact-cosine re-rank to top-10. Zero
    // per-query driver actions or jobs. Oracle: q139's end-to-end
    // replay (assign, route, encode, LUT, ADC, re-rank) generalized
    // per query via the q289 chained-CTE pattern.
    GraftQuery(
      "q292_ivfpq_serve_batch",
      s"""WITH qv AS (SELECT vec_id AS query_id, embedding AS qe
         |       FROM embeddings WHERE vec_id < 5),
         |assign AS (
         |  SELECT vec_id, embedding,
         |    (SELECT c FROM (
         |       SELECT c, list_reduce(list_prepend(0.0,
         |         list_transform(generate_series(1, len(embedding)), i ->
         |           (CAST(embedding[i] AS DOUBLE) -
         |              CASE WHEN i = c*8+1 THEN 8.0 ELSE 0.0 END)
         |           * (CAST(embedding[i] AS DOUBLE) -
         |              CASE WHEN i = c*8+1 THEN 8.0 ELSE 0.0 END))),
         |         (x,y)->x+y) AS dist
         |       FROM (SELECT unnest(generate_series(0, 7)) AS c))
         |     ORDER BY dist, c LIMIT 1) AS cell
         |  FROM embeddings),
         |route AS (
         |  SELECT query_id, cell FROM (
         |    SELECT query_id, c AS cell,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY dist, c) AS rn
         |    FROM (
         |      SELECT query_id, c, list_reduce(list_prepend(0.0,
         |        list_transform(generate_series(1, len(qe)), i ->
         |          (CAST(qe[i] AS DOUBLE) -
         |             CASE WHEN i = c*8+1 THEN 8.0 ELSE 0.0 END)
         |          * (CAST(qe[i] AS DOUBLE) -
         |             CASE WHEN i = c*8+1 THEN 8.0 ELSE 0.0 END))),
         |        (x,y)->x+y) AS dist
         |      FROM qv, (SELECT unnest(generate_series(0, 7)) AS c)))
         |  WHERE rn <= 2),
         |probed AS (
         |  SELECT r.query_id, a.vec_id, a.embedding, a.cell
         |  FROM assign a JOIN route r ON a.cell = r.cell),
         |code AS (
         |  SELECT query_id, vec_id, cell,
         |    (SELECT c FROM (
         |       SELECT c, list_reduce(list_prepend(0.0,
         |         list_transform(embedding[1:32], (v, i) ->
         |           (CAST(v AS DOUBLE) - (((c*7 + (i-1)) % 5) - 2))
         |           * (CAST(v AS DOUBLE) - (((c*7 + (i-1)) % 5) - 2)))),
         |         (x,y)->x+y) AS dist
         |       FROM (SELECT unnest(generate_series(0, 3)) AS c))
         |     ORDER BY dist, c LIMIT 1) AS code0,
         |    (SELECT c FROM (
         |       SELECT c, list_reduce(list_prepend(0.0,
         |         list_transform(embedding[33:64], (v, i) ->
         |           (CAST(v AS DOUBLE) - (((31 + c*7 + (i-1)) % 5) - 2))
         |           * (CAST(v AS DOUBLE) - (((31 + c*7 + (i-1)) % 5) - 2)))),
         |         (x,y)->x+y) AS dist
         |       FROM (SELECT unnest(generate_series(0, 3)) AS c))
         |     ORDER BY dist, c LIMIT 1) AS code1
         |  FROM probed),
         |l0 AS (
         |  SELECT query_id, c, CAST(floor(1000000 * list_reduce(
         |    list_prepend(0.0, list_transform(qe[1:32], (v, i) ->
         |      CAST(v AS DOUBLE) * (((c*7 + (i-1)) % 5) - 2))),
         |    (x,y)->x+y)) AS BIGINT) AS v
         |  FROM qv, (SELECT unnest(generate_series(0, 3)) AS c)),
         |l1 AS (
         |  SELECT query_id, c, CAST(floor(1000000 * list_reduce(
         |    list_prepend(0.0, list_transform(qe[33:64], (v, i) ->
         |      CAST(v AS DOUBLE) * (((31 + c*7 + (i-1)) % 5) - 2))),
         |    (x,y)->x+y)) AS BIGINT) AS v
         |  FROM qv, (SELECT unnest(generate_series(0, 3)) AS c)),
         |short AS (
         |  SELECT query_id, vec_id, cell, adc_score FROM (
         |    SELECT c.query_id, c.vec_id, CAST(c.cell AS INTEGER) AS cell,
         |      l0.v + l1.v AS adc_score,
         |      row_number() OVER (PARTITION BY c.query_id
         |        ORDER BY l0.v + l1.v DESC, c.vec_id) AS rn
         |    FROM code c
         |    JOIN l0 ON l0.query_id = c.query_id AND l0.c = c.code0
         |    JOIN l1 ON l1.query_id = c.query_id AND l1.c = c.code1)
         |  WHERE rn <= 50),
         |rr AS (
         |  SELECT s.query_id, s.vec_id, s.cell, s.adc_score,
         |    CAST(${duckCosMicro("a", "q")} AS BIGINT) AS cos_micro
         |  FROM short s
         |  JOIN embeddings a ON a.vec_id = s.vec_id
         |  JOIN (SELECT query_id, qe AS embedding FROM qv) q
         |    ON q.query_id = s.query_id)
         |SELECT query_id, vec_id, cell, adc_score, cos_micro, rank
         |FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos_micro DESC, vec_id) AS BIGINT) AS rank
         |  FROM rr)
         |WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      import s.implicits._
      val centers = Array.tabulate(8)(c =>
        Array.tabulate(64)(i => if (i == c * 8) 8.0 else 0.0))
      val codebooks = Array.tabulate(2)(sp => Array.tabulate(4)(c =>
        Array.tabulate(32)(i => ((sp * 31 + c * 7 + i) % 5 - 2).toDouble)))
      val e = Tables.load(s, dir, "embeddings")
      val index = SimilarityOps.ivfPqIndex(
        e.select($"vec_id", $"embedding"), "vec_id", "embedding",
        centers, codebooks)
      val queries = e.filter($"vec_id" < 5L)
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      SimilarityOps.ivfPqTopKMulti(
          index, "vec_id", e, "vec_id", "embedding",
          queries, "query_id", "qvec", centers, codebooks,
          nProbe = 2, shortlist = 50, k = 10)
        .orderBy($"query_id", $"rank")
    },

    // CDC → ANN END-TO-END (VERDICT r11 #1 — q293's analogue for the
    // VECTOR index, proving the reference's index-AGNOSTIC bulk
    // replace, daemon.py:358-381 `_id=doc.id`, now holds for IVF×PQ
    // too): three keyset ticks drain events through a LogUpsertSink
    // doc store AND a stored IVF×PQ layout — each tick's latest-per-
    // user doc re-EMBEDS (a deterministic 8-dim integer-valued vector
    // of the doc's current content) and UPSERTS BY ID into both, so
    // users active across ticks genuinely REPLACE their vectors (the
    // r12 seq-ordered tombstones make that well-defined pre-compact);
    // tick 2 is replayed (absorbed at a higher seq), the index is
    // COMPACTED mid-pipeline (tick 3 then lands fresh segments on the
    // folded layout), and a retention pass deletes signup-final users
    // from both stores. Final serve: the stored probe at FULL depth
    // (nProbe = nList, shortlist ≥ store — provably exact, so the
    // brute-force DuckDB replay IS the referee; q139/q292 gate the
    // pruning depth) joined FULL OUTER against a fresh-rebuild probe
    // over the doc store, plus ghost/lost row counters (maintained
    // index ids must equal the store's ids EXACTLY) — maintained ≡
    // rebuild ≡ oracle in one hash.
    GraftQuery(
      "q294_cdc_ann_end_to_end",
      s"""WITH ordered AS (
         |  SELECT *, lpad(CAST(event_id AS VARCHAR), 12, '0') AS did,
         |    row_number() OVER (
         |      ORDER BY epoch_us(ts), lpad(CAST(event_id AS VARCHAR), 12, '0'))
         |      AS rn
         |  FROM events),
         |prefix AS (SELECT * FROM ordered WHERE rn <= 360),
         |latest AS (
         |  SELECT user_id, event_type,
         |    CAST(round(value*100) AS BIGINT) AS value_c,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY epoch_us(ts) DESC, did DESC) AS rk
         |  FROM prefix),
         |store AS (
         |  SELECT user_id, event_type, value_c
         |  FROM latest WHERE rk = 1 AND event_type <> 'signup'),
         |e AS (
         |  SELECT user_id, list_transform(generate_series(1, 8), i ->
         |    CAST(((value_c + i*37 + 13*length(event_type)) % 97 + 97) % 97
         |         - 48 AS DOUBLE)) AS embedding
         |  FROM store),
         |q AS (SELECT list_transform(generate_series(1, 8), i ->
         |    CAST((i*19) % 23 - 11 AS DOUBLE)) AS embedding),
         |scored AS (
         |  SELECT e.user_id,
         |    CAST(${duckCosMicro("e", "q")} AS BIGINT) AS cm
         |  FROM e CROSS JOIN q),
         |top AS (SELECT user_id, cm,
         |  row_number() OVER (ORDER BY cm DESC, user_id) AS rk
         |  FROM scored)
         |SELECT user_id, cm AS cos_micro_idx, cm AS cos_micro_store,
         |  CAST(0 AS BIGINT) AS ghost_rows, CAST(0 AS BIGINT) AS lost_rows
         |FROM top WHERE rk <= 10 ORDER BY user_id""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      import graft.cdc.{Keyset, LogUpsertSink}
      val centers = Array.tabulate(4)(c =>
        Array.tabulate(8)(i => if (i == 2 * c) 6.0 else 0.0))
      val codebooks = Array.tabulate(2)(sp => Array.tabulate(4)(cd =>
        Array.tabulate(4)(j => ((sp * 5 + cd * 3 + j) % 7 - 3).toDouble)))
      val qvec = Array.tabulate(8)(i => ((i + 1) * 19 % 23 - 11).toDouble)
      val e = Tables.load(s, dir, "events")
        .withColumn("did", lpad($"event_id".cast("string"), 12, "0"))
      val tmp = GraftQuery.scratchDir("graft_q294_cdc_ann")
      val sink = new LogUpsertSink(s, s"$tmp/store", "user_id", nBuckets = 8)
      val cursors = new Keyset.CursorStore(s"$tmp/cursors")
      val idxDir = s"$tmp/ivfpq"
      // the ANN store driven through its DocSink face (VERDICT r12 #3
      // — the reference's bulk replace is index-agnostic, so the CDC
      // loop uses ONE sink contract for the doc store and the vector
      // index); same underlying seq-tombstone ops, same files, same
      // oracle hash
      val annSink = new graft.ops.IvfPqIndexSink(s, idxDir,
        "user_id", "embedding", centers, codebooks)
      // the re-embedding: 8 small-INTEGER float components derived
      // from the doc's CURRENT content — float-exact, so the DuckDB
      // double replay is bit-identical; a replaced doc's vector
      // genuinely moves (value_c/event_type feed every component)
      val docShape = Seq($"user_id", $"event_type",
        round($"value" * 100).cast("long").as("value_c"))
      def embed(df: org.apache.spark.sql.DataFrame) = df.withColumn(
        "embedding",
        transform(sequence(lit(0), lit(7)), i =>
          (pmod($"value_c" + (i + 1) * 37 + length($"event_type") * 13,
            lit(97L)) - 48).cast("float")))
      val latestInBatch = Window.partitionBy($"user_id")
        .orderBy(unix_micros($"ts").desc, $"did".desc)
      def tick(): org.apache.spark.sql.DataFrame = {
        val cur = cursors.load("events") // file round-trip = restart-safe
        val (batch, next) = Keyset.nextBatch(e, "ts", "did", cur, 120)
        val vecs = embed(batch
          .withColumn("rk", row_number().over(latestInBatch))
          .filter($"rk" === 1)
          .select(docShape: _*))
          .graftCheckpoint() // pin: both stores consume the same batch
        sink.upsert(vecs)
        annSink.upsert(vecs)
        cursors.save("events", next)
        vecs
      }
      tick()
      val t2 = tick()
      // duplicate delivery of tick 2: both stores must absorb it (the
      // index replay lands at a higher seq with equal content)
      sink.upsert(t2)
      annSink.upsert(t2)
      // mid-pipeline compaction: fold tombstones into the affected
      // cells, reset seqs — the gate then proves compact changes
      // NOTHING about serving (tick 3 upserts on the folded layout)
      annSink.compact()
      tick()
      // retention: users whose CURRENT doc is a signup leave BOTH
      def storeDocs = sink.read().getOrElse(
        embed(e.limit(0).select(docShape: _*)))
      val victims = storeDocs
        .filter($"event_type" === "signup").select($"user_id")
        .graftCheckpoint()
      sink.delete(victims)
      annSink.delete(victims)
      val finalStore = storeDocs.graftCheckpoint()
      // ghost/lost counters: the maintained index's live id set must
      // equal the store's exactly (a full-outer on the top-k alone
      // could not see a ghost — it drops at the re-rank vector fetch)
      val activeIds = SimilarityOps.activeIvfPqIndex(s, idxDir, "user_id")
        .select($"user_id")
      val storeIds = finalStore.select($"user_id")
      // ONE full-outer aggregate job instead of two anti-join count()
      // actions (guide §2.4 — fewer driver-sequenced actions): a ghost
      // is an index id with no store match (null store flag), a lost
      // row the reverse; both ids are unique per side (latest-per-key
      // store, one active row per id), so the null-flag sums equal the
      // anti-join counts exactly.
      val glRow = activeIds.withColumn("__i", lit(1))
        .join(storeIds.withColumn("__s", lit(1)), Seq("user_id"),
          "full_outer")
        .agg(
          coalesce(sum(when($"__s".isNull, 1L).otherwise(0L)), lit(0L)),
          coalesce(sum(when($"__i".isNull, 1L).otherwise(0L)), lit(0L)))
        .head()
      val ghosts = glRow.getLong(0)
      val lost = glRow.getLong(1)
      // maintained serve at full depth ≡ exact top-10 by cosine
      val served = SimilarityOps.ivfPqTopKStored(s, idxDir, "user_id",
          finalStore, "user_id", "embedding", qvec, centers, codebooks,
          nProbe = 4, shortlist = 100000, k = 10)
        .select($"user_id", $"cos_micro".as("cos_micro_idx"))
      // referee leg: a fresh index over the final doc store must serve
      // the identical ranking — the hash equality enforces it
      val rebuilt = SimilarityOps.ivfPqIndex(
        finalStore.select($"user_id", $"embedding"), "user_id",
        "embedding", centers, codebooks)
      val refereed = SimilarityOps.ivfPqTopK(rebuilt, "user_id",
          finalStore, "user_id", "embedding", qvec, centers, codebooks,
          nProbe = 4, shortlist = 100000, k = 10)
        .select($"user_id", $"cos_micro".as("cos_micro_store"))
      // FULL OUTER (the q293 rule): a divergence surfaces as nulls and
      // breaks the oracle hash instead of silently dropping
      served.join(refereed, Seq("user_id"), "full_outer")
        .withColumn("ghost_rows", lit(ghosts))
        .withColumn("lost_rows", lit(lost))
        .orderBy($"user_id")
    }) :+ RetrievalPipelineGate

  /** RETRIEVAL SERVING end-to-end (the composition finisher for the
    * similarity family, like q149 for CDC: a user of the engine runs
    * exactly this chain): IVF index at FULL probe (≡ brute force — the
    * q37 oracle trick, so the composed result stays SQL-checkable) →
    * top-20 relevance shortlist → MMR diversification → final 5. The
    * oracle is the brute-force shortlist feeding the q249 unrolled
    * greedy rounds.
    */
  private[queries] lazy val RetrievalPipelineGate: GraftQuery =
    GraftQuery(
      "q266_retrieval_pipeline",
      s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 7),
         |cand AS (
         |  SELECT c.vec_id AS id, c.embedding,
         |    CAST(${duckCosMicro("c", "q")} AS BIGINT) AS rel
         |  FROM embeddings c CROSS JOIN q WHERE c.vec_id != 7
         |  ORDER BY rel DESC, id LIMIT 20),
         |p0 AS (SELECT id, embedding, rel, CAST(0 AS BIGINT) AS ms
         |       FROM cand),
         |${SimilarityQueries.mmrRoundsSql(5, 700000L)}
         |SELECT * FROM (
         |  ${(1 to 5).map(i =>
             s"SELECT CAST($i AS BIGINT) AS rank, id, rel, " +
               s"ms AS max_sim_micro, score FROM s$i")
             .mkString(" UNION ALL ")})
         |ORDER BY rank""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.functions._
      val e = Tables.load(s, dir, "embeddings")
        .select($"vec_id", $"embedding")
      // stage 1: IVF at full probe — centroids from the deterministic
      // sampled Lloyd, nProbe = nList makes the shortlist exactly the
      // brute-force top-20 (oracle-checkable composition)
      val queries = e.filter($"vec_id" === 7L)
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      val shortlist = SimilarityOps.ivfTopK(
          e.filter($"vec_id" =!= 7L), "vec_id", "embedding",
          queries, "query_id", "qvec", k = 20, nList = 8, nProbe = 8)
        .select($"query_id", $"vec_id", $"cos_micro".as("rel"))
      // stage 2: re-attach vectors, diversify with MMR — through the
      // GROUPED serving form (queries-as-a-table, zero per-query
      // driver actions); with one query the result is the sequential
      // form's, which q249 still gates as the referee face
      val cand = shortlist.join(e, Seq("vec_id"))
      SimilarityOps.mmrTopKGrouped(cand, "query_id", "vec_id",
          "embedding", "rel", k = 5, lambdaPpm = 700000L)
        .select($"rank", $"id", $"rel", $"max_sim_micro", $"score")
        .orderBy($"rank")
    }

  /** Unrolled MMR rounds for the q249 oracle: round i picks the
    * (score, id)-argmax from pool i−1, then folds the pick's cosine
    * into every survivor's running max.
    */
  private[queries] def mmrRoundsSql(k: Int, lambdaPpm: Long): String =
    (1 to k).map { i =>
      val prev = s"p${i - 1}"
      s"""s$i AS (
         |  SELECT id, embedding, rel, ms,
         |    $lambdaPpm * rel - ${1000000L - lambdaPpm} * ms AS score
         |  FROM $prev ORDER BY score DESC, id LIMIT 1),
         |p$i AS (
         |  SELECT p.id, p.embedding, p.rel,
         |    GREATEST(p.ms, CAST(${duckCosMicro("p", "s")} AS BIGINT))
         |      AS ms
         |  FROM $prev p CROSS JOIN s$i s WHERE p.id != s.id)""".stripMargin
    }.mkString(",\n")

  /** [[mmrRoundsSql]] generalized over a `qid` query column for the
    * grouped serving gate (q288): round i's argmax becomes a per-query
    * `row_number() = 1` pick, and the max-sim fold joins pick to pool
    * on qid — the same chained-CTE replay, one greedy instance per
    * query.
    */
  private[queries] def mmrGroupedRoundsSql(k: Int, lambdaPpm: Long): String =
    (1 to k).map { i =>
      val prev = s"p${i - 1}"
      s"""s$i AS (
         |  SELECT qid, id, embedding, rel, ms, score FROM (
         |    SELECT qid, id, embedding, rel, ms,
         |      $lambdaPpm * rel - ${1000000L - lambdaPpm} * ms AS score,
         |      row_number() OVER (PARTITION BY qid ORDER BY
         |        $lambdaPpm * rel - ${1000000L - lambdaPpm} * ms DESC,
         |        id) AS rn
         |    FROM $prev) WHERE rn = 1),
         |p$i AS (
         |  SELECT p.qid, p.id, p.embedding, p.rel,
         |    GREATEST(p.ms, CAST(${duckCosMicro("p", "s")} AS BIGINT))
         |      AS ms
         |  FROM $prev p JOIN s$i s
         |    ON s.qid = p.qid AND p.id != s.id)""".stripMargin
    }.mkString(",\n")
}
