package graft.ops

/** THE INDEX-MAINTENANCE CONTRACT — one invariant table for the three
  * stored serving-index families, so the semantics cannot drift per
  * family (IndexMaintenanceSpec drills all three against the same
  * seeded differential harness; the per-family specs drill depth):
  *
  *   - LSH dedup index        [[DedupOps]]    (band-key bucketed table)
  *   - BM25F search index     [[graft.movies.PostingIndex]]
  *   - IVF×PQ vector index    [[SimilarityOps]] (cell-partitioned dir)
  *
  * ==Invariants (every family, spec-checked)==
  *
  * 1. REFRESH-APPEND is one |delta| pass, never a corpus pass, and the
  *    refreshed index serves identically to a from-scratch rebuild
  *    over corpus ∪ delta. On LSH/IVF×PQ the appended rows land at the
  *    CURRENT seq high-water mark — they supersede nothing and die to
  *    every later op, but survive every EARLIER tombstone, so a
  *    deleted id re-submitted through the refresh path serves again
  *    (the contract there is "not currently LIVE", not "never seen").
  *    PostingIndex.refresh keeps the stricter never-seen-incl.-
  *    never-tombstoned contract (its base append sits under the delta
  *    fold's touched-id suppression) — re-adding there is `upsert`,
  *    its documented CDC path:
  *    `refreshLshIndex` / `PostingIndex.refresh`+`upsert` /
  *    `refreshIvfPqIndex`.
  * 2. REMOVE is an O(|request|) tombstone append — never an index
  *    rewrite. Deletion requests are rare and small next to the
  *    corpus, so the tombstone set stays BROADCAST-SIZED between
  *    compactions:
  *    `removeFromLshIndex` / `PostingIndex.delete` (a tombstone
  *    segment) / `removeFromIvfPqIndex`.
  * 3. UPSERT-BY-ID is well-defined on EVERY family without a compact
  *    in between — the reference's bulk replace is index-agnostic
  *    (daemon.py:358-381: `_id=doc.id` into every index it maintains),
  *    so ours is too. All three use the same SEQ discipline: each
  *    maintenance op gets a monotone seq; an upsert lands its rows at
  *    that seq AND tombstones its ids at that seq; a read keeps a row
  *    iff its seq is ≥ the id's newest tombstone seq (nothing
  *    tombstoned ⇒ kept). A later upsert therefore beats an earlier
  *    delete — re-adding a deleted id just works — and replaying a
  *    batch is absorbed (higher seq, equal content). Cost is
  *    O(|batch|), never O(corpus):
  *    `upsertIntoLshIndex` / `PostingIndex.upsert` (seq-ordered log
  *    segments) / `upsertIntoIvfPqIndex`.
  * 4. EVERY READ drops superseded versions via a broadcast max-seq
  *    filter on the index side's existing layout — zero added
  *    exchanges, partition filters intact; a removed id never
  *    surfaces at any probe depth:
  *    `activeLshIndex` / the PostingIndex serve fold /
  *    `activeIvfPqIndex` and the `ivfPqTopK*Stored` probes.
  * 5. COMPACT folds tombstones into the layout, resets surviving row
  *    seqs to the family's base seq, and clears the tombstones; the
  *    compacted index is equivalent to a fresh build over the live
  *    versions. Cost is bounded by what the layout localizes: LSH
  *    rewrites the bucketed table (band keys of one id scatter across
  *    ~bands buckets), IVF×PQ rewrites ONLY the affected cells — the
  *    cells holding a tombstoned id's rows UNION the cells holding any
  *    row above base seq (REFRESH rows land at the high-water seq with
  *    no tombstone of their own, so the union leg is what guarantees
  *    every seq > base row is either tombstoned or rewritten; dynamic
  *    partition overwrite), PostingIndex
  *    folds base + delta log into a fresh VERSIONED base:
  *    `compactLshIndex` / `PostingIndex.compact` / `compactIvfPqIndex`.
  * 6. An index emptied entirely collapses to the family's empty shape
  *    (absent dir / placeholder) — never an unreadable directory.
  *
  * ==Per-family differences (deliberate, also spec-checked)==
  *
  *   - Stats: only PostingIndex maintains corpus statistics (BM25F's
  *     N and per-field dl sums), updated by exact integer DELTAS so a
  *     maintained index serves bit-identically to a rebuild; the
  *     LSH/IVF×PQ rows are pure functions of (id, payload, seq) and
  *     carry no corpus-level state.
  *   - Seq storage: PostingIndex allocates seqs through stats.json's
  *     published window (which also powers its stale-WRITER tripwire);
  *     LSH/IVF×PQ allocate through the [[SeqSidecar]] — one tiny JSON
  *     read + reserve per op (compact clears it with the tombstones),
  *     with a one-time legacy derive from the tombstone table for
  *     stores written before the sidecar existed.
  *   - Durability: all three are single-writer. PostingIndex
  *     maintenance is fully crash-safe — upsert/delete publish their
  *     segment by advancing the seq window in stats.json, compact
  *     publishes a fresh versioned layout through the same one-file
  *     write (retaining the previous `retainVersions - 1` layouts for
  *     their readers), and a stale WRITER handle trips a loud require.
  *     LSH/IVF×PQ ops are not torn-write-safe: their upsert writes the
  *     superseding tombstone FIRST (a torn op can lose the new
  *     version, never serve two), and a torn compact means rebuild
  *     (their tables rewrite in place).
  *   - Preventive single-writer layer (VERDICT r14 #4): every mutating
  *     face on every family — the DocSink faces AND the direct APIs
  *     above — takes an optional [[graft.cdc.WriterLease]], checked
  *     BEFORE any op work, so a superseded writer aborts before paying
  *     a rewrite (a losing COMPACT used to pay the full fold before
  *     the seq tripwire fired). The compact faces RENEW the lease at
  *     their fold/rewrite boundary, so the TTL sizes against one phase
  *     (see [[graft.cdc.WriterLease.DefaultTtlMs]]). The detective
  *     tripwires remain the backstop for the acquire window the lease
  *     cannot close.
  */
object IndexMaintenance
