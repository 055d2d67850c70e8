package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Checkpointer._
import graft.ops.TextOps

/** Search + remaining scalar-function conformance queries.
  *
  * q36 is the engine's weighted multi-field relevance op (SURVEY §2.9 X1,
  * the ES multi_match re-expression) in oracle-checkable form: the doc is
  * split into a "title" (first 5 tokens, weight 4) and "body" (rest,
  * weight 1) and scored by weighted term-frequency sum over the query
  * terms — integer math end to end. The analyzer (stemming) variant of
  * the same scoring lives in movies.Search and is intent-tested in
  * MoviesSpec (DuckDB has no Porter stemmer to oracle it against).
  */
object SearchQueries {

  private val QueryTerms = Seq("spark", "query", "window")

  val all: Seq[GraftQuery] = Seq(

    // X1 serving shape (VERDICT r9 task #1): posting-pruned BM25F — the
    // inverted-index candidate semi-join before scoring, the plan ES
    // runs for the reference's whole search surface. Same fielding as
    // q36 (title = first 5 whitespace tokens ^4, body = rest ^1) but
    // the full BM25F arithmetic (document-level idf, field-weighted
    // saturated tf, k1=1.2 b=0.75) served off the stored PostingIndex;
    // the oracle recomputes it corpus-wide — equality proves pruning
    // loses no match and alters no score. Milli-rounded scores so the
    // engines' double fold orders can't desync the hash (q40 pattern).
    GraftQuery(
      "q291_pruned_search",
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t
        |  FROM documents),
        |fld AS (
        |  SELECT doc_id, 'title' AS field, t[1:5] AS tokens FROM tk
        |  UNION ALL
        |  SELECT doc_id, 'body' AS field, t[6:] AS tokens FROM tk),
        |wts(field, w) AS (VALUES ('title', 4.0), ('body', 1.0)),
        |terms(term) AS (VALUES ('spark'), ('query'), ('window')),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM tk),
        |stats AS (
        |  SELECT field, AVG(CAST(len(tokens) AS DOUBLE)) AS avgdl
        |  FROM fld GROUP BY field),
        |dfs AS (
        |  SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
        |  FROM terms JOIN fld ON list_contains(tokens, term)
        |  GROUP BY term),
        |contrib AS (
        |  SELECT f.doc_id, tr.term,
        |    SUM(w.w * CAST(len(list_filter(f.tokens, x -> x = tr.term))
        |              AS DOUBLE)
        |        / (0.25 + 0.75 * CAST(len(f.tokens) AS DOUBLE)
        |                 / GREATEST(s.avgdl, 1e-9))) AS tft
        |  FROM fld f JOIN wts w USING (field) JOIN stats s USING (field)
        |  CROSS JOIN terms tr
        |  GROUP BY f.doc_id, tr.term),
        |score AS (
        |  SELECT c.doc_id,
        |    SUM(ln(1.0 + (n.n_docs - d.df + 0.5) / (d.df + 0.5))
        |        * c.tft / (1.2 + c.tft)) AS score
        |  FROM contrib c JOIN dfs d USING (term) CROSS JOIN n
        |  GROUP BY c.doc_id)
        |SELECT doc_id, CAST(round(score * 1000) AS BIGINT) AS score_milli
        |FROM score WHERE score > 0 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val toks = TextOps.tokenize($"text")
      // spread: the build's tokenize otherwise runs on the single scan
      // task (§2.5; no-op when the scan has >= cores splits)
      val idx = graft.movies.PostingIndex.buildTokenized(
        Tables.spread(Tables.load(s, dir, "documents"))
          .select($"doc_id", $"text"),
        GraftQuery.scratchDir("graft_q291_pidx"),
        tokens = Map(
          "title" -> slice(toks, 1, 5),
          "body" -> slice(toks, lit(6), size(toks))),
        weights = Map("title" -> 4, "body" -> 1),
        idCol = "doc_id", nTermBuckets = 8, nDocBuckets = 8)
      idx.scoreTerms(QueryTerms)
        .select($"doc_id",
          round($"score" * 1000).cast("long").as("score_milli"))
        .orderBy($"doc_id")
    },

    // CDC → SEARCH END-TO-END (S3+S5+S7+T2+X1 composed — the FULL
    // reference pipeline, daemon.py:90-129 keyset source → :358-381
    // upsert sink → ES serving the UPDATED document, in ONE
    // oracle-checked dataflow): three keyset ticks drain events
    // through a LogUpsertSink doc store AND the updatable
    // PostingIndex — each tick's latest-per-user docs UPSERT BY ID,
    // so users active across ticks genuinely REPLACE their search
    // documents (tick 2 is replayed to prove both stores absorb a
    // duplicate delivery); a retention pass then DELETES every user
    // whose final doc is a signup event from both. The gate's output
    // carries TWO score columns: the maintained index's serve and a
    // fresh REBUILD over the final sink store — the oracle computes
    // one BM25F replay (fields: title=[event_type]^4,
    // body=[event_type, value bucket]^1) over latest-per-user of the
    // 360-event prefix minus the deleted users, so the hash equality
    // proves maintained-index ≡ rebuild-over-store ≡ DuckDB at once.
    // Milli-rounded scores (q291 fold-order guard).
    GraftQuery(
      "q293_cdc_search_end_to_end",
      """WITH ordered AS (
        |  SELECT *, lpad(CAST(event_id AS VARCHAR), 12, '0') AS did,
        |    row_number() OVER (
        |      ORDER BY epoch_us(ts), lpad(CAST(event_id AS VARCHAR), 12, '0'))
        |      AS rn
        |  FROM events),
        |prefix AS (SELECT * FROM ordered WHERE rn <= 360),
        |latest AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(round(value*100) AS BIGINT) AS value_c,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, did DESC) AS rk
        |  FROM prefix),
        |store AS (
        |  SELECT user_id, event_id, event_type, value_c,
        |    CASE WHEN value_c >= 5000 THEN 'high' ELSE 'low' END AS bucket
        |  FROM latest WHERE rk = 1 AND event_type <> 'signup'),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM store),
        |terms(term) AS (VALUES ('click'), ('purchase'), ('high')),
        |dfs AS (
        |  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df
        |  FROM terms JOIN store ON (event_type = term OR bucket = term)
        |  GROUP BY term),
        |contrib AS (
        |  SELECT s0.user_id, s0.event_id, s0.event_type, s0.value_c,
        |    t.term,
        |    4.0 * (CASE WHEN s0.event_type = t.term THEN 1.0 ELSE 0.0 END)
        |    + ((CASE WHEN s0.event_type = t.term THEN 1.0 ELSE 0.0 END)
        |     + (CASE WHEN s0.bucket = t.term THEN 1.0 ELSE 0.0 END)) AS tft
        |  FROM store s0 CROSS JOIN terms t),
        |scored AS (
        |  SELECT c.user_id, c.event_id, c.event_type, c.value_c,
        |    SUM(ln(1.0 + (n.n_docs - d.df + 0.5) / (d.df + 0.5))
        |        * c.tft / (1.2 + c.tft)) AS score
        |  FROM contrib c JOIN dfs d USING (term) CROSS JOIN n
        |  GROUP BY c.user_id, c.event_id, c.event_type, c.value_c)
        |SELECT user_id, event_id, event_type, value_c,
        |  CAST(round(score * 1000) AS BIGINT) AS score_milli_idx,
        |  CAST(round(score * 1000) AS BIGINT) AS score_milli_store
        |FROM scored WHERE score > 0 ORDER BY user_id""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      import graft.cdc.{Keyset, LogUpsertSink}
      import graft.movies.PostingIndex
      val e = Tables.load(s, dir, "events")
        .withColumn("did", lpad($"event_id".cast("string"), 12, "0"))
      val tmp = GraftQuery.scratchDir("graft_q293_cdc_search")
      val sink = new LogUpsertSink(s, s"$tmp/store", "user_id", nBuckets = 8)
      val cursors = new Keyset.CursorStore(s"$tmp/cursors")
      val weights = Map("title" -> 4, "body" -> 1)
      val tokens = Map(
        "title" -> array(col("event_type")),
        "body" -> array(col("event_type"),
          when(col("value_c") >= 5000L, "high").otherwise("low")))
      val docShape = Seq($"user_id", $"event_id", $"event_type",
        round($"value" * 100).cast("long").as("value_c"))
      // bootstrap the index empty: the first tick's upsert IS the build
      var idx = PostingIndex.buildTokenized(
        e.limit(0).select(docShape: _*), s"$tmp/index", tokens, weights,
        idCol = "user_id", nTermBuckets = 8, nDocBuckets = 8)
      val latestInBatch = Window.partitionBy($"user_id")
        .orderBy(unix_micros($"ts").desc, $"did".desc)
      def tick(): org.apache.spark.sql.DataFrame = {
        val cur = cursors.load("events") // file round-trip = restart-safe
        val (batch, next) = Keyset.nextBatch(e, "ts", "did", cur, 120)
        val docs = batch
          .withColumn("rk", row_number().over(latestInBatch))
          .filter($"rk" === 1)
          .select(docShape: _*)
          .graftCheckpoint() // pin: both stores consume the same batch
        sink.upsert(docs)
        idx = idx.upsert(docs, tokens)
        cursors.save("events", next)
        docs
      }
      tick()
      val t2 = tick()
      // duplicate delivery of tick 2: both stores must absorb it
      sink.upsert(t2)
      idx = idx.upsert(t2, tokens)
      // mid-pipeline compaction: fold the first ticks' segments into a
      // fresh versioned base — the gate then proves compact changes
      // NOTHING about serving (tick 3 lands as segments on the new
      // base, so the final serve crosses base + delta)
      idx = idx.compact()
      tick()
      // retention: users whose CURRENT doc is a signup leave BOTH.
      // getOrElse keeps the gate honest if a future fixture change
      // empties the store at tick 3 (read() → None) — VERDICT r11 nit
      def storeDocs = sink.read()
        .getOrElse(e.limit(0).select(docShape: _*))
      val victims = storeDocs
        .filter($"event_type" === "signup").select($"user_id")
        .graftCheckpoint()
      sink.delete(victims)
      idx = idx.delete(victims)
      val terms = Seq("click", "purchase", "high")
      val served = idx.scoreTerms(terms)
        .select($"user_id", $"event_id", $"event_type", $"value_c",
          round($"score" * 1000).cast("long").as("score_milli_idx"))
      // referee leg: a fresh index over the final doc store must serve
      // the identical scores — the hash equality enforces it
      val rebuilt = PostingIndex.buildTokenized(storeDocs,
        s"$tmp/rebuilt", tokens, weights,
        idCol = "user_id", nTermBuckets = 8, nDocBuckets = 8)
      val storeScores = rebuilt.scoreTerms(terms)
        .select($"user_id",
          round($"score" * 1000).cast("long").as("score_milli_store"))
      // FULL OUTER: a maintained-index ghost row (served-only) or a
      // lost row (store-only) surfaces as nulls in the other side's
      // columns and breaks the oracle hash — an inner join would
      // silently drop exactly the divergence this gate exists to catch
      served.join(storeScores, Seq("user_id"), "full_outer")
        .orderBy($"user_id")
    },

    // X1/O2/O4: weighted multi-field match + relevance ranking + top-k.
    GraftQuery(
      "q36_weighted_search",
      """WITH fielded AS (
        |  SELECT doc_id,
        |    string_split_regex(text, '\s+')[1:5] AS title_toks,
        |    string_split_regex(text, '\s+')[6:] AS body_toks
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id,
        |    4*(len(list_filter(title_toks, t -> t = 'spark'))
        |     + len(list_filter(title_toks, t -> t = 'query'))
        |     + len(list_filter(title_toks, t -> t = 'window')))
        |  + (len(list_filter(body_toks, t -> t = 'spark'))
        |     + len(list_filter(body_toks, t -> t = 'query'))
        |     + len(list_filter(body_toks, t -> t = 'window'))) AS score
        |  FROM fielded)
        |SELECT doc_id, score FROM scored WHERE score > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
      import s.implicits._
      def tf(toks: org.apache.spark.sql.Column) =
        QueryTerms.map(t => size(filter(toks, x => x === lit(t))).cast("long"))
          .reduce(_ + _)
      val toks = TextOps.tokenize($"text")
      Tables.spread(Tables.load(s, dir, "documents"))
        .select($"doc_id",
          (tf(slice(toks, 1, 5)) * 4 +
            tf(slice(toks, lit(6), size(toks)))).as("score"))
        .filter($"score" > 0)
        .orderBy($"score".desc, $"doc_id")
        .limit(20)
    },

    // F1: CSV/delimited-string split + explode (etl.py split(", ")).
    GraftQuery(
      "q16_split_explode",
      """SELECT w AS word, COUNT(*) AS n
        |FROM (SELECT unnest(string_split(p_name, ' ')) AS w FROM part)
        |GROUP BY w ORDER BY w""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "part")
        .select(explode(split($"p_name", " ")).as("word"))
        .groupBy($"word")
        .agg(count(lit(1)).as("n"))
        .orderBy($"word")
    },

    // F5/A6: deterministic surrogate-id minting for a dimension derived
    // from data (person-by-name minting pattern, etl.py:166-194).
    GraftQuery(
      "q17_surrogate_minting",
      """SELECT substr(md5('seg ' || c_mktsegment), 1, 16) AS seg_id,
        |  c_mktsegment AS seg_name, COUNT(*) AS n_members
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY seg_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "customer")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_members"))
        .select(
          substring(md5(concat(lit("seg "), $"c_mktsegment")), 1, 16)
            .as("seg_id"),
          $"c_mktsegment".as("seg_name"),
          $"n_members")
        .orderBy($"seg_id")
    },

    // T6 (batch face): tumbling time-window rollup over the event stream
    // table — window().start aligns with date_trunc for aligned windows.
    GraftQuery(
      "q18_time_window_rollup",
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(round($"value" * 100, 0).cast("long")).as("value_c"))
        .select($"window.start".as("window_start"), $"event_type",
          $"n", $"value_c")
        .orderBy($"window_start", $"event_type")
    },

    // F7: ISO timestamp/date formatting (utils.py:11-16) + month rollup.
    GraftQuery(
      "q19_date_format_rollup",
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders
        |WHERE o_orderdate >= DATE '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1998-01-01").cast("date"))
        .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(round($"o_totalprice" * 100, 0).cast("long")).as("total_c"))
        .orderBy($"month")
    },

    // KWIC snippet extraction (TextOps.kwicSnippet): ±3 tokens around
    // the first 'merge' hit — search-result highlighting as a pure
    // per-row expression in the scan stage (no shuffle, no UDF).
    GraftQuery(
      "q173_kwic_snippets",
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '')
        |      AS tk
        |  FROM documents),
        |p AS (SELECT doc_id, list_position(tk, 'merge') AS pos, tk
        |      FROM tk)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |  array_to_string(tk[GREATEST(pos - 3, 1):pos + 3], ' ')
        |    AS snippet
        |FROM p WHERE pos > 0 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id",
          TextOps.kwicSnippet($"text", lit("merge"), window = 3)
            .as("__s"))
        .select($"doc_id", $"__s.pos".as("pos"),
          $"__s.snippet".as("snippet"))
        .filter($"pos" > 0)
        .orderBy($"doc_id")
    },

    // Phrase / proximity search (SearchOps.phraseMatches): 'table'
    // followed by 'value' within slop 2 — ES match_phrase semantics
    // through EQUI-joins on (doc, pos+offset) with offsets exploded
    // (the q170 shape), never a per-document position cross join.
    GraftQuery(
      "q174_phrase_search",
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '')
        |      AS tk
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, u.i - 1 AS p, tk[u.i] AS t
        |  FROM tk, UNNEST(generate_series(1, len(tk))) AS u(i)),
        |a AS (SELECT doc_id, p FROM pos WHERE t = 'table'),
        |b AS (SELECT doc_id, p FROM pos WHERE t = 'value')
        |SELECT a.doc_id, COUNT(*) AS n_matches,
        |  CAST(MIN(a.p) AS BIGINT) AS first_pos
        |FROM a JOIN b
        |  ON b.doc_id = a.doc_id AND b.p BETWEEN a.p + 1 AND a.p + 2
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      graft.ops.SearchOps.phraseMatches(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          terms = Seq("table", "value"), slop = 2)
        .select($"doc_id", $"n_matches",
          $"first_pos".cast("long").as("first_pos"))
        .orderBy($"doc_id")
    },

    // SymSpell fuzzy term lookup (SearchOps.symspellMatches): typo'd
    // queries against the corpus vocabulary via the single-deletion-
    // neighborhood EQUI-join + Levenshtein verify — identical results
    // to q88's exhaustive distance filter at index cost ×(len+1) per
    // term, no |queries|×|dictionary| cross. 'hsah' exercises the
    // verify stage: neighborhoods intersect but distance is 2.
    GraftQuery(
      "q175_symspell",
      """WITH vocab AS (
        |  SELECT DISTINCT u.t AS term
        |  FROM (SELECT list_filter(string_split_regex(text, '\s+'),
        |          x -> x <> '') AS tk FROM documents) s,
        |    UNNEST(tk) AS u(t)),
        |q AS (SELECT unnest(['tble', 'vlue', 'scann', 'joinn', 'merge',
        |  'hsah', 'pat', 'xyz']) AS query),
        |dk AS (
        |  SELECT term, unnest(list_distinct(list_concat([term],
        |    list_transform(generate_series(1, len(term)),
        |      i -> substr(term, 1, i-1) || substr(term, i+1, len(term))))))
        |    AS k
        |  FROM vocab),
        |qk AS (
        |  SELECT query, unnest(list_distinct(list_concat([query],
        |    list_transform(generate_series(1, len(query)),
        |      i -> substr(query, 1, i-1) || substr(query, i+1, len(query))))))
        |    AS k
        |  FROM q),
        |cand AS (
        |  SELECT DISTINCT query, term FROM qk JOIN dk USING (k)
        |  WHERE ABS(len(query) - len(term)) <= 1)
        |SELECT query, term,
        |  CAST(levenshtein(query, term) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(query, term) <= 1
        |ORDER BY query, term""".stripMargin) { (s, dir) =>
      import s.implicits._
      val vocab = Tables.load(s, dir, "documents")
        .select(explode(filter(split($"text", "\\s+"), t => t =!= ""))
          .as("term"))
        .distinct()
      val queries = Seq("tble", "vlue", "scann", "joinn", "merge",
        "hsah", "pat", "xyz").toDF("query")
      graft.ops.SearchOps.symspellMatches(vocab, "term", queries, "query")
        .select($"query", $"term", $"dist".cast("long").as("dist"))
        .orderBy($"query", $"term")
    })
}
