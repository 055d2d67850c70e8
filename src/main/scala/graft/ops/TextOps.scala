package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale document pipelines.
  *
  * Design: every op here is a pure per-row Column expression built from
  * Catalyst built-ins and higher-order functions — fully codegen'd, no UDFs,
  * no shuffle, so they stream through a 100 TB scan at parquet-read speed
  * and survive whole-stage codegen fusion with up/downstream operators.
  *
  * Hashes are engine-portable polynomial hashes (deterministic arithmetic,
  * reproducible in any SQL engine) rather than murmur3, so results can be
  * oracle-checked and replayed across engines/versions.
  */
object TextOps {

  /** Mod-prime for all polynomial hashes: fits products in a Long. */
  val HashPrime: Long = 1000000007L

  /** Whitespace tokenizer. `split` is codegen'd; pattern is a regex. */
  def tokenize(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokenize(text))

  /** Portable polynomial rolling hash of a string:
    * fold(acc*31 + codepoint) mod p. Backed by the native codegen'd
    * Catalyst expression (graft.functions.PolyHash) — the HOF
    * composition below is semantically identical but CodegenFallback
    * (it interprets a lambda per character, ~100× slower on hash-heavy
    * scans; see PolyHashSpec).
    */
  def polyHash(s: Column): Column = graft.functions.GraftColumns.polyHash(s)

  /** Reference HOF implementation of [[polyHash]] — kept for the
    * cross-implementation equivalence spec and as the pattern for
    * engines without the native expression.
    */
  def polyHashHof(s: Column): Column =
    aggregate(
      transform(split(s, ""), c => ascii(c)),
      lit(0L),
      (acc, x) => (acc * lit(31L) + x.cast("long")) % lit(HashPrime))

  /** Document fingerprint = polynomial hash of the raw text (F-style
    * rolling-hash fingerprint; use `normalize` upstream as needed).
    */
  def fingerprint(text: Column): Column = polyHash(text)

  /** Stable train/val/test assignment by hashed key: a document's split
    * is a pure function of (key, salt), so it survives reshuffles,
    * re-partitioning, incremental corpus growth, and engine changes —
    * the property dataset splits at 100 TB must have (sampling by
    * rand() re-deals every run; row_number sampling re-deals on every
    * insert). Percents are cumulative cut points on hash mod 100.
    */
  def stableSplit(
      key: Column, salt: String,
      trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val h = pmod(polyHash(concat(key.cast("string"), lit(":" + salt))),
      lit(100L))
    when(h < trainPct, "train")
      .when(h < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** BPE-ish subword-piece counting: letter runs / digit runs /
    * punctuation runs with an optional leading space each — the
    * GPT-2-style pre-tokenizer reduced to an RE2-safe regex (no
    * lookahead, so the same pattern runs in any engine). A real BPE
    * merge table plugs in downstream; for pipeline budgeting (tokens
    * per doc / per corpus) the piece count is the quantity that matters.
    */
  val BpePiecePattern: String = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  def bpePieceCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePiecePattern), lit(0)))

  /** Canonical text for exact-dedup keys: lowercase, trim, collapse runs of
    * whitespace. Dedup key itself should be `md5(normalize(text))`.
    */
  def normalize(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Unicode NFC normalization (native codegen'd expression) — run it
    * BEFORE [[normalize]]/[[exactKey]] hashing on multilingual corpora:
    * composed (é) vs decomposed (e + combining acute) spellings of the
    * same text otherwise produce different dedup keys. Standard-defined,
    * so it matches any other engine's NFC codepoint-for-codepoint.
    */
  def nfcNormalize(text: Column): Column =
    graft.functions.GraftColumns.nfcNormalize(text)

  /** Count of tokens that are stopwords (membership against a small
    * broadcast-literal list; for big lists use a broadcast join instead).
    */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokenize(text), t => t.isin(stopwords.map(lit): _*)))

  /** Integer division (floor) — exact for non-negative longs up to 2^53
    * (double division of exactly-representable ints is correctly rounded;
    * the true quotient is ≥ 1/b away from the next integer, far outside
    * half-ulp, so floor is safe).
    */
  private def intDiv(a: Column, b: Column): Column =
    floor(a.cast("double") / b.cast("double")).cast("long")

  /** Average token length in milli-chars (integer — oracle-exact):
    * sum(len(token)) * 1000 div count(token).
    */
  def avgTokenLenMilli(text: Column): Column = {
    val toks = tokenize(text)
    val totalLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    intDiv(totalLen * lit(1000L), size(toks))
  }

  /** Heuristic quality score in [0,100] (integer), rewarding documents with
    * a healthy length, moderate stopword density and word length — the
    * shape of pre-training quality filters (length/stopword/char-class
    * ratios), kept integer-exact for cross-engine verification.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val nTok = tokenCount(text)
    val stopPm = intDiv(stopwordCount(text, stopwords) * lit(1000L), nTok)
    val lenPts = when(nTok >= 50 && nTok <= 1000, lit(40L))
      .when(nTok >= 10, lit(20L)).otherwise(lit(0L))
    val stopPts = when(stopPm.between(10, 400), lit(30L))
      .when(stopPm > 0, lit(15L)).otherwise(lit(0L))
    val awl = avgTokenLenMilli(text)
    val wordPts = when(awl.between(3000, 8000), lit(30L))
      .when(awl.between(2000, 10000), lit(15L)).otherwise(lit(0L))
    lenPts + stopPts + wordPts
  }

  /** N-gram (word-level) shingles: ["a","b","c","d"], n=3 →
    * ["a b c","b c d"]. Empty array when the doc has fewer than n tokens.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokenize(text)
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Shingle hash set: distinct portable hashes of the n-gram shingles —
    * the input unit for MinHash/Jaccard dedup. Backed by the native
    * one-pass expression (functions.ShingleHash); [[shingleHashesHof]]
    * is the equivalent HOF composition (CodegenFallback, interpreted
    * per window — kept for the equivalence spec).
    */
  def shingleHashes(text: Column, n: Int): Column =
    array_distinct(graft.functions.GraftColumns.shingleHash(text, n))

  /** Reference HOF implementation of [[shingleHashes]]. */
  def shingleHashesHof(text: Column, n: Int): Column =
    array_distinct(transform(wordShingles(text, n), polyHash(_)))

  /** Winnowing fingerprints (Schleimer–Wilkerson–Aiken, SIGMOD 2003 —
    * the MOSS algorithm): the minimum shingle hash of every sliding
    * window of `w` consecutive n-gram shingle hashes, deduplicated.
    * Guarantees any shared token run of length ≥ w+n−1 between two
    * documents shares at least one fingerprint while keeping only
    * ~2/(w+1) of the hashes — the robust middle ground between the full
    * shingle set (MinHash input) and a single whole-document hash.
    * Pure per-row expression over the native shingle hasher; empty
    * array for documents shorter than n tokens.
    */
  def winnowingFingerprints(text: Column, n: Int, w: Int): Column = {
    require(w >= 1, "window must be >= 1")
    // The hash array is BOUND as a lambda variable (transform over a
    // 1-element wrapper array) so the window loop reads a materialized
    // value — an expression referenced inside the inner lambda would be
    // re-hashed per window, making the per-document cost quadratic.
    val perDoc = transform(
      array(graft.functions.GraftColumns.shingleHash(text, n)),
      hs =>
        when(size(hs) <= 0, array().cast("array<bigint>"))
          .otherwise(array_distinct(transform(
            sequence(lit(1), greatest(size(hs) - lit(w - 1), lit(1))),
            i => array_min(slice(hs, i, lit(w)))))))
    element_at(perDoc, 1)
  }

  /** Within-document repetition in per-mille: the fraction of n-gram
    * shingle OCCURRENCES that are repeats of an earlier shingle —
    * (total - distinct) * 1000 div total, 0 for docs shorter than n
    * tokens. The standard boilerplate/spam signal (Gopher-family
    * repetition rules): high values mean the document repeats itself.
    * Pure per-row expression over the native shingle hasher.
    */
  def repetitionScoreMilli(text: Column, n: Int): Column = {
    val all = graft.functions.GraftColumns.shingleHash(text, n)
    val total = size(all).cast("long")
    when(total === 0L, lit(0L))
      .otherwise(intDiv(
        (total - size(array_distinct(all)).cast("long")) * lit(1000L),
        total))
  }

  /** Per-document Shannon entropy of the token-frequency distribution in
    * Q20 fixed point (bits × 2^20): H = log2(n) − (Σ c·log2(c)) div n
    * over per-token occurrence counts c — the algebraic rearrangement of
    * −Σ (c/n)·log2(c/n) that keeps every intermediate an integer. Each
    * log is [[graft.functions.GraftColumns.binLog2Q20]] (the q142/q153
    * normalize-then-square integer recurrence), so any engine replays
    * every bit. Low entropy = repetitive/boilerplate text (the
    * information-theoretic complement of [[repetitionScoreMilli]]'s
    * n-gram repeat fraction); the degenerate all-same-token document
    * scores exactly 0.
    *
    * Scale design: a PURE per-row expression — the whole signal runs
    * inside the scan stage, no shuffle, no (doc, token) exploded
    * aggregation. Per-row cost is O(distinct × tokens) for the counts
    * plus 20 integer steps per distinct token for the logs.
    */
  def tokenEntropyQ20(text: Column): Column = {
    val toks = tokenize(text)
    val counts = transform(array_distinct(toks), t =>
      size(filter(toks, x => x === t)).cast("long"))
    val sumCLogC = aggregate(counts, lit(0L), (acc, c) =>
      acc + when(c <= 1L, lit(0L))
        .otherwise(c * graft.functions.GraftColumns.binLog2Q20(c)))
    val n = size(toks).cast("long")
    when(n <= 0L, lit(0L))
      .otherwise(graft.functions.GraftColumns.binLog2Q20(n) -
        intDiv(sumCLogC, n))
  }

  /** PII scrubbing: replace emails and URLs with typed placeholder
    * tokens. Patterns are RE2-safe (character classes only — no
    * lookaround, no backreferences), so the same pattern text runs
    * identically under Java regex (Spark codegen) and RE2 (DuckDB
    * oracle, other engines). Order matters: emails first, or the URL
    * pattern would eat `user@host` tails inside mailto-style strings.
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern: String = "https?://[^ \\t\\n]+"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      UrlPattern, "<URL>")

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))

  def urlCount(text: Column): Column =
    size(regexp_extract_all(text, lit(UrlPattern), lit(0)))

  /** URL canonicalization (web-corpus dedup key): lowercase the
    * scheme://host prefix (path and query stay case-sensitive per RFC
    * 3986), strip the #fragment, drop utm_* tracking parameters, and
    * tidy dangling separators. All steps are RE2-safe regex rewrites
    * (character classes only), so the same pattern text runs
    * identically under Java regex and RE2 — canonical URLs are
    * engine-portable join/dedup keys.
    */
  def canonicalizeUrl(url: Column): Column = {
    val prefix = regexp_extract(url, "^[A-Za-z]+://[^/?#]*", 0)
    val rest = url.substr(length(prefix) + lit(1), lit(1 << 30))
    val noFrag = regexp_replace(rest, "#.*", "")
    // utm strip is ANCHORED to a query-param boundary in three steps —
    // an unanchored "utm_...=[^&#]*" would fire inside the PATH
    // ("/blog/utm_tips=a/x" → distinct pages collide on one key) and on
    // mid-token matches ("&xutm_b=2"). Step order handles runs:
    // 1) every non-first param "&utm_x=v"; 2) a first param followed by
    // more ("?utm_x=v&" → "?"); 3) a first-and-only param ("?utm_x=v").
    val noMid = regexp_replace(noFrag, "&utm_[A-Za-z_]+=[^&#]*", "")
    val noFirst = regexp_replace(noMid, "\\?utm_[A-Za-z_]+=[^&#]*&", "?")
    val noUtm = regexp_replace(noFirst, "\\?utm_[A-Za-z_]+=[^&#]*$", "")
    concat(lower(prefix), regexp_replace(noUtm, "[?&]+$", ""))
  }

  /** Within-document line deduplication (C4-style boilerplate removal):
    * keep only the FIRST occurrence of each line, preserving order —
    * repeated nav/footer/CTA lines inside one page collapse to one.
    * Pure per-row expression (no shuffle): a line survives iff its
    * index is the array's first occurrence of that value. Quadratic in
    * lines-per-doc, which is bounded; corpus size doesn't enter.
    * Cross-document boilerplate is [[CurationOps.dedupParagraphsGlobal]].
    */
  def dedupLines(text: Column, sep: String = "\n"): Column = {
    val ls = split(text, java.util.regex.Pattern.quote(sep))
    array_join(
      filter(ls, (x, i) => array_position(ls, x) === (i + lit(1)).cast("long")),
      sep)
  }

  /** Language-ID by marker-token voting: the language whose marker list
    * hits the document's token set most often wins; zero-hit docs resolve
    * to "und", ties to the lexicographically greatest language code
    * (struct max compares (hits, lang) field-by-field — deterministic and
    * replicable in any engine). Markers are tiny per-language stopword
    * lists — the classic stopword-profile heuristic reduced to its
    * deterministic core (real profiles plug in as bigger marker lists).
    */
  def langIdByMarkers(text: Column, markers: Map[String, Seq[String]]): Column = {
    val toks = array_distinct(tokenize(text))
    val scored = markers.toSeq.sortBy(_._1).map { case (langCode, ws) =>
      struct(
        // array_intersect over distinct tokens == count of distinct
        // marker hits, but codegen'd — the filter+isin HOF spelling is
        // CodegenFallback and interprets per token per language
        size(array_intersect(toks, array(ws.map(lit): _*))).as("hits"),
        lit(langCode).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Training-chunk decomposition: split a document into chunks of at
    * most `maxTokens` whitespace tokens, consecutive chunks sharing
    * `overlap` tokens (stride = maxTokens − overlap) — the standard
    * context-window packing prep for LLM pretraining.
    *
    * Chunk k covers token indices [k·stride, k·stride + maxTokens); the
    * last chunk may be short; every token of every document appears in
    * at least one chunk (ChunkSpec proves coverage + overlap).
    *
    * Scale: pure per-row explode over codegen'd built-ins (sequence/
    * slice/array_join) — no shuffle, no UDF; output grows by roughly
    * n_tokens/stride per doc, which is the payload a chunking pass is
    * supposed to emit. Returns (idCol, chunk_id, n_tokens, chunk_text).
    */
  def chunkDocs(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int): org.apache.spark.sql.DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      "need 0 <= overlap < maxTokens")
    val stride = maxTokens - overlap
    val toks = filter(tokenize(col(textCol)), t => t =!= "")
    df.select(col(idCol), toks.as("__toks"))
      .withColumn("__n", size(col("__toks")))
      // 1 chunk when n <= maxTokens, else 1 + ceil((n−maxTokens)/stride);
      // `div` keeps it in exact integer arithmetic end to end
      .withColumn("__nchunks",
        when(col("__n") <= maxTokens, lit(1L)).otherwise(
          lit(1L) + expr(s"(__n - $maxTokens + ${stride - 1}) div $stride")))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), col("__nchunks").cast("int") - lit(1)))
          .as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        slice(col("__toks"), col("chunk_id") * lit(stride) + lit(1),
          lit(maxTokens)).as("__chunk"))
      .select(col(idCol), col("chunk_id"),
        size(col("__chunk")).as("n_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  /** Per-document top-k TF-IDF terms with an integer, engine-portable
    * score: score_micro = (1,000,000 · tf · N) ∕ df (integer division) —
    * linear idf (N/df) instead of ln(N/df) so the gate hash can't drift
    * on transcendental-function ulps (see the determinism contract in
    * GraftQuery). Ranking is (score desc, term asc), deterministic under
    * ties; ln-idf orders terms identically whenever df differs.
    *
    * Scale: explode → (doc,term) count with map-side combine; df is a
    * vocabulary-sized aggregate of the (doc,term) set; N is a 1-row
    * broadcast; the final per-doc rank partitions by doc_id (no hot key
    * — every doc is its own partition key).
    */
  def tfIdfTopTerms(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = filter(tokenize(col(textCol)), t => t =!= "")
    val docTerm = df
      .select(col(idCol), explode(toks).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = docTerm.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val nDocs = df.select(countDistinct(col(idCol)).as("n_docs"))
    // `div` = exact BIGINT division (Spark's `/` on longs is DOUBLE true
    // division — floor(double) can cross an integer boundary on ulps)
    val scored = docTerm.join(docFreq, "term").crossJoin(broadcast(nDocs))
      .withColumn("score_micro", expr("(1000000 * tf * n_docs) div df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("score_micro"), col("rank"))
  }

  /** Keyword-in-context (KWIC) snippet: the ±`window` tokens around
    * the FIRST occurrence of `term`, joined with spaces — search-hit
    * highlighting as a pure per-row expression (no shuffle, stays in
    * the scan stage). Returns a struct (pos, snippet): pos is the
    * 1-based token position, 0 with a null snippet when the term is
    * absent. Slice bounds clamp at both ends.
    */
  def kwicSnippet(text: Column, term: Column, window: Int): Column = {
    require(window >= 0, "window must be >= 0")
    val tk = filter(tokenize(text), t => t =!= "")
    val pos = array_position(tk, term)
    val start = greatest(pos - window, lit(1L))
    val snippet = when(pos > 0,
      array_join(slice(tk, start, pos + window - start + 1), " "))
    struct(pos.as("pos"), snippet.as("snippet"))
  }
}
