"""Incremental cross-snapshot MinHash dedup — ingest-time near-dup
detection at O(new bands), not O(corpus).

Round-8 verdict, Next-round #6: the catalog's MinHash-LSH queries
(llm_ops.py) recompute every document's signature per run — right for a
one-shot census, wrong for a CONTINUOUSLY-LOADED corpus, where each
append should dedup against everything already ingested without
re-shingling 100 TB. This module composes three independently-green
primitives into that pipeline:

- the MinHash band keys (llm_ops.minhash_band_keys: char-8-gram
  shingles → 8 salted minhashes → 4 bands of 2),
- the snapshot log's CHANGE FEED (exactly-once consumption, stamped in
  the index's own commit — the MV doctrine, incremental.py),
- per-file BLOOM indexes on the band-value column (bloom.py) — band
  values are uniform md5 hex, so [min, max] stats can never prune a
  band lookup; the bloom probe is what makes "join the new batch
  against the full corpus index" read only the files that can match.

Lifecycle:

- :func:`build_minhash_index` commits the corpus's band postings
  (doc_id, band_idx, band_val) as a snapshot table with a bloom index
  on band_val.
- :func:`maintain_minhash_index` consumes the corpus table's change
  feed: the NEW documents' bands probe the EXISTING index through
  ``point_where`` (bloom file pruning), within-batch pairs come from a
  batch-local self-join, and the new postings append in ONE commit that
  stamps the consumed source version. Returns the candidate duplicate
  pairs — each new doc against the full corpus — at O(new bands) read
  cost plus the pruned probe.

Deletes and updates RETRACT (r10): a victim's band postings are
DV-masked out by doc_id before the probe (one O(changes) delete commit;
physically retired at the next OPTIMIZE), and an updated doc re-enters
as retract-then-reinsert — a skipped delete would keep reporting dups
against a ghost.

Reference basis: the reference has no dedup surface at all; the public
models are Lee et al.'s dedup pipeline (arXiv:2107.06499) for the
MinHash construction and Delta's CDF-fed incremental materialization
for the maintenance contract.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .llm_ops import _SQL_BANDS, _SQL_LONG_BANDS, _spread, minhash_band_keys
from .registry import Query, table

# the batch predicate the CATALOG queries use to split the fixture into
# an initial corpus (80%) and one incoming append (20%)
_BATCH_PRED = "doc_id % 5 = 0"


def build_minhash_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    consumed_version: int | None = None,
) -> None:
    """Commit ``docs``' (doc_id, text) band postings as the dedup index:
    one snapshot table of (doc_id, band_idx, band_val) rows with a
    bloom index on band_val (backfilled — the probe must cover the
    bootstrap files too). Docs too short to shingle produce null bands
    and are excluded (they can never LSH-match)."""
    from ..sources.snapshots import commit_append, set_bloom_filter

    bands = minhash_band_keys(docs).filter(F.col("band_val").isNotNull())
    extra = (
        None
        if consumed_version is None
        else {"mh_consumed_version": int(consumed_version)}
    )
    commit_append(
        spark,
        f"{index_dir}/bands",
        bands,
        stats_cols=["doc_id"],
        extra=extra,
    )
    set_bloom_filter(
        spark, f"{index_dir}/bands", ["band_val"], m_bits=2**17, k=5,
        backfill=True,
    )


def maintain_minhash_index(
    spark: SparkSession,
    index_dir: str,
    source_table_dir: str,
    pairs_dir: str | None = None,
) -> tuple[DataFrame | None, int | None]:
    """Fold the corpus change feed into the band index and return the
    batch's candidate duplicate pairs as ``(new_doc, dup_of)``:

    - ``dup_of`` in the EXISTING corpus: the new bands (broadcast —
      O(batch) rows) join the index through a bloom-pruned
      ``point_where`` read, so only index files that can contain one of
      the batch's band values are scanned;
    - ``dup_of`` earlier IN THE SAME BATCH (``dup_of < new_doc``): a
      batch-local self-join — an append must dedup against itself too.

    DELETE/UPDATE feeds RETRACT (r10, VERDICT r9 missing #2): victims'
    band postings are DV-masked out of the index by doc_id (one
    O(changes) delete commit — the cheap path this docstring always
    named; physical retirement happens at the next OPTIMIZE), and an
    updated doc re-enters as retract-then-reinsert. The retraction
    commit precedes the probe read, so a deleted doc stops being
    reported as ``dup_of`` immediately.

    The new postings land in ONE commit stamping the consumed source
    version — a keyed MERGE on (doc_id, band_idx), not an append (r10):
    double-application of the same feed (a stale stamp read, or a crash
    replay racing its own ghost) CONVERGES instead of duplicating
    postings, because the second application matches every key and
    rewrites identical rows. Exactly-once holds at every boundary: the
    retraction is idempotent (re-deleting absent doc_ids is a no-op), a
    truly CONCURRENT maintainer aborts loudly on the merge's
    rewrite-vs-rewrite conflict detection (retry re-reads the stamp and
    no-ops), and a retraction-only feed leaves the stamp alone (the next
    run re-walks the range — the empty-append precedent).

    ``pairs_dir`` (r10): persist the batch's pairs as a snapshot table
    too — the JOINT-STAMP design the composed streaming sink needs. The
    pairs land as a keyed MERGE on (new_doc, dup_of) BEFORE the stamping
    bands merge, so every crash boundary replays to convergence: a crash
    before the pairs merge is a plain replay; a crash between the two
    merges leaves the stamp stale, the rerun recomputes the IDENTICAL
    pairs (the bands merge hadn't landed, so the probe sees the same
    pre-batch index) and the keyed merge rewrites identical rows; after
    both, the stamp ends the replay. The returned pairs frame is the
    in-memory plan either way — callers wanting the committed table read
    ``pairs_dir`` themselves.
    Returns (pairs, consumed_version), or (None, None) when current."""
    from ..sources.incremental import dv_retract, net_change_feed, stamped_version
    from ..sources.snapshots import (
        _list_versions,
        merge_snapshot,
        read_snapshot,
        snapshot_change_feed,
    )

    bands_dir = f"{index_dir}/bands"
    versions = _list_versions(spark, bands_dir)
    if not versions:
        raise FileNotFoundError(f"no MinHash index at {index_dir} — build first")
    # the walk survives interleaved non-stamping commits (the build's own
    # set_bloom_filter commit is exactly one of those)
    consumed = stamped_version(spark, bands_dir, "mh_consumed_version")
    src_versions = _list_versions(spark, source_table_dir)
    if not src_versions:
        raise FileNotFoundError(f"no snapshots at {source_table_dir}")
    latest = src_versions[-1]
    if latest <= consumed:
        return None, None
    if consumed == 0:
        # never consumed (an index bootstrapped EMPTY, e.g. by the
        # streaming sink): the feed is the whole current snapshot as
        # inserts — the Delta CDF startingVersion=0 contract, same as
        # incremental.py's MV bootstrap branch
        victims: list[int] = []
        final_rows = read_snapshot(spark, source_table_dir)
    else:
        feed = snapshot_change_feed(spark, source_table_dir, consumed, latest)
        retract, final_rows = net_change_feed(feed, "doc_id")
        victims = [int(r["doc_id"]) for r in retract.collect()]  # O(changes)
    if victims:
        dv_retract(spark, bands_dir, "doc_id", victims)
    if not final_rows.select("doc_id").limit(1).collect():
        # nothing to (re)index: data_change=false commits, or a
        # retraction-only feed (already applied above); no stamp (an
        # empty append has no files) — the next run re-walks the range
        return None, None
    new_bands = (
        minhash_band_keys(final_rows.select("doc_id", "text"))
        .filter(F.col("band_val").isNotNull())
    )
    if not new_bands.limit(1).collect():
        # every new doc too short to shingle — nothing can ever LSH-match
        return None, None
    # O(batch) driver list: the probe values that drive bloom pruning
    vals = [
        r["band_val"]
        for r in new_bands.select("band_val").distinct().collect()
    ]
    # the PRE-APPEND index (read_snapshot pins the current file list at
    # plan time, so the append below cannot leak into this read)
    idx = (
        read_snapshot(spark, bands_dir, point_where={"band_val": vals})
        if vals
        else read_snapshot(spark, bands_dir).limit(0)
    )
    nb = new_bands.alias("n")
    # the corpus probe must see ONLY pre-batch postings: on a re-applied
    # feed (stale stamp read) the index already holds the batch's own
    # postings, and a mere self-match exclusion (o.doc_id != n.doc_id)
    # would still emit within-batch pairs in BOTH orientations — the
    # first application reported (b, a) with a < b from the batch-local
    # join, the replay would add (a, b) from the probe, and the keyed
    # pairs merge would insert it as a NEW row instead of converging.
    # Anti-joining the batch's doc_ids out (broadcast — O(batch) ids)
    # leaves within-batch pairs to pairs_within alone, which recomputes
    # identically from the feed on every application.
    idx_ex = idx.join(
        F.broadcast(new_bands.select("doc_id").distinct()),
        "doc_id",
        "left_anti",
    )
    pairs_corpus = (
        idx_ex.alias("o")
        .join(
            F.broadcast(nb),
            (F.col("o.band_idx") == F.col("n.band_idx"))
            & (F.col("o.band_val") == F.col("n.band_val")),
        )
        .select(
            F.col("n.doc_id").alias("new_doc"),
            F.col("o.doc_id").alias("dup_of"),
        )
    )
    pairs_within = (
        nb.join(
            new_bands.alias("m"),
            (F.col("n.band_idx") == F.col("m.band_idx"))
            & (F.col("n.band_val") == F.col("m.band_val"))
            & (F.col("m.doc_id") < F.col("n.doc_id")),
        )
        .select(
            F.col("n.doc_id").alias("new_doc"),
            F.col("m.doc_id").alias("dup_of"),
        )
    )
    pairs = pairs_corpus.unionByName(pairs_within).distinct()
    if pairs_dir is not None and pairs.limit(1).count():
        # BEFORE the stamping bands merge — see the docstring's crash
        # analysis; keyed on the pair itself so replays rewrite, never
        # duplicate. An empty batch persists nothing (a replay recomputes
        # the same nothing).
        merge_snapshot(spark, pairs_dir, pairs, keys=["new_doc", "dup_of"])
    merge_snapshot(
        spark,
        bands_dir,
        new_bands,
        keys=["doc_id", "band_idx"],
        stats_cols=["doc_id"],
        extra={"mh_consumed_version": latest},
    )
    return pairs, latest


def probe_minhash_index(
    spark: SparkSession, index_dir: str, docs: DataFrame
) -> DataFrame:
    """READ-ONLY dedup lookup (r10): which corpus documents are LSH
    candidates for these ad-hoc ``(doc_id, text)`` docs — the
    pre-ingest question ("is this a dup?") asked WITHOUT mutating the
    index or consuming any feed. Same bloom-pruned ``point_where`` probe
    as maintenance, same O(probe bands) cost; returns (query_doc,
    dup_of) pairs against the committed corpus postings only (the
    caller's batch is not self-joined — it isn't being ingested)."""
    from ..sources.snapshots import read_snapshot

    bands_dir = f"{index_dir}/bands"
    probe = minhash_band_keys(docs).filter(F.col("band_val").isNotNull())
    vals = [
        r["band_val"] for r in probe.select("band_val").distinct().collect()
    ]  # O(batch) driver list — the bloom pruning keys
    if not vals:
        return spark.createDataFrame([], "query_doc long, dup_of long")
    idx = read_snapshot(spark, bands_dir, point_where={"band_val": vals})
    return (
        idx.alias("o")
        .join(
            F.broadcast(probe.alias("n")),
            (F.col("o.band_idx") == F.col("n.band_idx"))
            & (F.col("o.band_val") == F.col("n.band_val")),
        )
        .select(
            F.col("n.doc_id").alias("query_doc"),
            F.col("o.doc_id").alias("dup_of"),
        )
        .distinct()
    )


# --------------------------------------------------------------- catalog

_SCRATCH: dict[str, str] = {}
_SCRATCH_LOCK = threading.Lock()


def _incremental_chain(spark: SparkSession, sf_dir: str) -> str:
    """Memoized per sf_dir: corpus table (80% of documents) → index →
    one batch append (20%) → maintain; the resulting pairs land in a
    snapshot table so repeated catalog runs read, never re-mutate."""
    with _SCRATCH_LOCK:
        if sf_dir in _SCRATCH:
            return _SCRATCH[sf_dir]
        from ..sources.snapshots import commit_append

        base = tempfile.mkdtemp(prefix="calh-mhidx-")
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        docs = _spread(spark, table(spark, sf_dir, "documents")).select(
            "doc_id", "text"
        )
        src = f"{base}/corpus"
        commit_append(spark, src, docs.filter(f"NOT ({_BATCH_PRED})"))
        build_minhash_index(
            spark, docs.filter(f"NOT ({_BATCH_PRED})"), base, consumed_version=1
        )
        commit_append(spark, src, docs.filter(_BATCH_PRED))
        pairs, _v = maintain_minhash_index(spark, base, src)
        commit_append(spark, f"{base}/pairs", pairs)
        _SCRATCH[sf_dir] = base
        return base


def q_dedup_incremental_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """The ingest-dedup lifecycle over the documents fixture: build the
    band index on 80% of the corpus, append the other 20%, and report
    every candidate duplicate the APPEND introduced — against the
    pre-existing corpus, and against earlier docs in the same batch —
    having read only bloom-pruned index files plus the batch itself."""
    from ..sources.snapshots import read_snapshot

    base = _incremental_chain(spark, sf)
    return read_snapshot(spark, f"{base}/pairs").orderBy("new_doc", "dup_of")


ORACLE_DEDUP_INCREMENTAL_MINHASH = f"""
WITH bands AS ({_SQL_BANDS}),
lb AS ({_SQL_LONG_BANDS}),
nn AS (SELECT * FROM lb WHERE band_val IS NOT NULL),
newb AS (SELECT * FROM nn WHERE {_BATCH_PRED}),
oldb AS (SELECT * FROM nn WHERE NOT ({_BATCH_PRED}))
SELECT DISTINCT n.doc_id AS new_doc, o.doc_id AS dup_of
FROM newb n
JOIN (SELECT * FROM oldb UNION ALL SELECT * FROM newb) o
  ON n.band_idx = o.band_idx AND n.band_val = o.band_val
WHERE NOT (o.{_BATCH_PRED}) OR o.doc_id < n.doc_id
ORDER BY new_doc, dup_of
"""


QUERIES: dict[str, Query] = {
    "dedup_incremental_minhash": Query(
        q_dedup_incremental_minhash,
        ORACLE_DEDUP_INCREMENTAL_MINHASH,
        ("dedup", "minhash", "incremental", "index"),
    ),
}
