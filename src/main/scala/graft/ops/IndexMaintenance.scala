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
  *    over corpus ∪ delta:
  *    `refreshLshIndex` / `PostingIndex.refresh`+`upsert` /
  *    `refreshIvfPqIndex`.
  * 2. REMOVE is an O(|request|) tombstone append — never an index
  *    rewrite. Deletion requests are rare and small next to the
  *    corpus, so the tombstone set stays BROADCAST-SIZED between
  *    compactions:
  *    `removeFromLshIndex` / `PostingIndex.delete` (a tombstone
  *    segment) / `removeFromIvfPqIndex`.
  * 3. EVERY READ drops tombstones via a broadcast anti-join on the
  *    index side's existing layout — zero added exchanges, partition
  *    filters intact; a removed id never surfaces at any probe depth:
  *    `activeLshIndex` / the PostingIndex serve fold /
  *    `activeIvfPqIndex` and the `ivfPqTopKMultiStored` probe.
  * 4. COMPACT folds tombstones into the layout and clears them; the
  *    compacted index is equivalent to a fresh build over the
  *    surviving set. Cost is bounded by what the layout localizes:
  *    LSH rewrites the bucketed table (band keys of one id scatter
  *    across ~bands buckets), IVF×PQ rewrites ONLY the affected cells
  *    (a vector lives in exactly one cell; dynamic partition
  *    overwrite), PostingIndex folds base + delta log into a fresh
  *    staged base:
  *    `compactLshIndex` / `PostingIndex.compact` / `compactIvfPqIndex`.
  * 5. An index emptied entirely collapses to the family's empty shape
  *    (absent dir / placeholder) — never an unreadable directory.
  *
  * ==Per-family differences (deliberate, also spec-checked)==
  *
  *   - UPDATE-BY-ID exists only on [[graft.movies.PostingIndex]]
  *     (`upsert` — the CDC steady state; BM25F's corpus stats update
  *     by exact integer deltas). LSH/IVF×PQ rows are pure functions
  *     of an immutable (id, payload), so "update" there is
  *     remove + compact + append, or a rebuild.
  *   - RE-ADDING a tombstoned id before a compact is UNDEFINED for
  *     LSH/IVF×PQ: their tombstones are id-sets, so the anti-join
  *     would mask the re-added rows. PostingIndex has no such
  *     restriction — its delta fold is seq-ordered, so a later upsert
  *     beats an earlier tombstone (CdcSpec relies on this).
  *   - Durability: all three are single-writer. PostingIndex
  *     maintenance is fully crash-safe — upsert/delete publish their
  *     segment by advancing the seq window in stats.json, compact
  *     publishes a fresh versioned layout through the same one-file
  *     write, so a torn op leaves ignorable debris on one side of the
  *     publish (and a stale WRITER handle trips a loud require
  *     instead of silently sweeping newer state). LSH/IVF×PQ torn
  *     compacts mean rebuild (their tables rewrite in place).
  */
object IndexMaintenance
