"""Incremental corpus near-dup detection: a persistent MinHash-LSH index.

The batch dedup ladder (``dedup_docs.py``) answers "which documents in THIS
corpus are near-duplicates" — one self-join over everything. A growing
pretraining corpus asks a different question at every ingest: "which of the
NEW documents near-duplicate anything already accepted?" Re-running the
self-join over 10^10 accepted docs per increment is O(corpus) compute per
batch; this module makes it O(batch + matched-buckets):

* The index is a LakeTable of LSH band entries ``(doc_id, band_idx,
  band_key)`` — the same banding as ``minhash_lsh_candidates`` (k=12
  signatures, 6 bands of width 2), so incremental and batch flagging are
  EXACTLY equivalent (the oracle test asserts union-of-increments ==
  one-shot batch pairs, counts included).
* Per increment: (1) compute the batch's band entries (map-only — the
  signatures are array_min over hash transforms, zero shuffle); (2) flag
  candidates = batch bands ⋈ index bands on (band_idx, band_key) PLUS the
  intra-batch self-join; (3) append the batch's entries under a commit
  fence — at-least-once feeders can re-deliver an increment and neither
  double the index nor re-flag different pairs (the index side drops the
  batch's own doc_ids, so a replay after a committed append flags the
  identical pair set).
* Scale shape: the batch side is the small side — for micro-batch ingest
  the distinct band keys are collected (bounded by ``max_pushdown_keys``)
  into an IN-filter that reaches the index's parquet scan as a pushed
  predicate, so row groups whose band_key dictionary/stats miss the batch
  never decompress; the index table clusters by band_key at compaction
  (``sort_cols``) to make those stats tight. Past the threshold it falls
  back to a plain shuffle equi-join (the right plan when the increment is
  itself corpus-sized). Either way the index is never self-joined and the
  join fanout is bounded by bucket occupancy, not corpus size.

Reference frame: the reference dedups per-sync via the SCD window over
primary keys (stream_processor.py:876-891) — exact-key only. Content-level
incremental dedup is the training-data extension; the banding math follows
the standard MinHash-LSH construction (Broder 1997; Leskovec-Rajaraman-
Ullman ch.3), persisted the way a lakehouse would (fenced commits).
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import TableSchema
from ..lake.table import LakeTable
from .dedup_docs import MINHASH_BAND_WIDTH, MINHASH_K, minhash_band_table

INDEX_STRUCT = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("band_idx", T.IntegerType(), False),
        # nullable: a MUTABLE index stores retractions as tombstone rows
        # that carry only the (doc_id, band_idx) key
        T.StructField("band_key", T.StringType(), True),
    ]
)

#: batch band-key cardinality up to which the index scan gets an IN-filter
#: (collected on the driver — 8k 32-char keys ≈ 256 KB, bounded)
DEFAULT_MAX_PUSHDOWN_KEYS = 8192


def bootstrap_dedup_index(
    spark: SparkSession, path: str, n_buckets: int = 32, mutable: bool = False
) -> LakeTable:
    """Create (or open) the band-entry index table.

    ``mutable=False`` (append-only corpora — the common pretraining case):
    no primary key, blind fenced appends, bucketed AND compaction-sorted by
    band_key — bucketing bounds each append/compact task's working set and
    the sort makes per-file band_key stats tight so the pushed IN-filter
    skips row groups.

    ``mutable=True`` (re-crawled / edited corpora): primary key
    (doc_id, band_idx) with versioned MOR merges — a re-ingested doc's six
    band entries REPLACE the previous version's at scan time (O(batch)
    delta appends per increment, folded by ``compact_index``), and
    ``retract_docs`` tombstones a removed doc so it stops matching. Bucketed
    by doc_id (the merge's pruning key); band_key file stats stay useful
    after compaction re-sorts."""
    if LakeTable.exists(path):
        return LakeTable(spark, path)
    if mutable:
        return LakeTable.create(
            spark,
            path,
            TableSchema.from_struct(INDEX_STRUCT),
            primary_key=["doc_id", "band_idx"],
            bucket_cols=["doc_id"],
            n_buckets=n_buckets,
            sort_cols=["band_key"],
        )
    return LakeTable.create(
        spark,
        path,
        TableSchema.from_struct(INDEX_STRUCT),
        primary_key=[],
        bucket_cols=["band_key"],
        n_buckets=n_buckets,
        sort_cols=["band_key"],
    )


FLAGS_STRUCT = T.StructType(
    [
        T.StructField("doc_a", T.LongType(), False),
        T.StructField("doc_b", T.LongType(), False),
        T.StructField("shared_bands", T.LongType(), False),
    ]
)


def bootstrap_flags_table(
    spark: SparkSession, path: str, n_buckets: int = 8
) -> LakeTable:
    """Append-only sink for per-increment candidate pairs — the quarantine/
    review feed a curation pipeline consumes downstream."""
    if LakeTable.exists(path):
        return LakeTable(spark, path)
    return LakeTable.create(
        spark,
        path,
        TableSchema.from_struct(FLAGS_STRUCT),
        primary_key=[],
        bucket_cols=["doc_a"],
        n_buckets=n_buckets,
    )


def _pairs(a: DataFrame, b: DataFrame) -> DataFrame:
    """Band-bucket equi-join → (doc_a < doc_b, shared_bands)."""
    return (
        a.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("long").alias("shared_bands"))
    )


def flag_and_ingest(
    index: LakeTable,
    docs: DataFrame,
    *,
    app_id: str = "dedup-index",
    batch_id: int = 0,
    k: int = MINHASH_K,
    band_width: int = MINHASH_BAND_WIDTH,
    max_pushdown_keys: int = DEFAULT_MAX_PUSHDOWN_KEYS,
    version: Optional[int] = None,
    version_col: Optional[str] = None,
    deletes: Optional[DataFrame] = None,
    flags_table: Optional[LakeTable] = None,
) -> DataFrame:
    """One increment: flag near-dup candidates of ``docs`` (intra-batch ∪
    vs-the-accepted-corpus), then append the batch's band entries under a
    fence. Returns (doc_a, doc_b, shared_bands) with doc_a < doc_b — the
    same shape as ``minhash_lsh_candidates``, so running increments in any
    split reproduces the one-shot batch result exactly.

    The returned DataFrame is resolved EAGERLY (it is the side output the
    caller routes to a quarantine/review sink) — computing it lazily after
    the append would let the batch's own just-appended entries re-enter
    the index side of the join.

    PRECONDITION on an APPEND-ONLY index: ``doc_id`` is unique across the
    WHOLE corpus, not just the batch (same contract as
    ``minhash_signatures``, extended in time). A reused id would (a) be
    anti-joined out of the index side — its true near-dups silently
    unflagged — and (b) double its band entries on append. Mint ids with
    ``surrogate_hash_id`` over a natural key when the feed cannot
    guarantee this. On a MUTABLE index (``bootstrap_dedup_index(...,
    mutable=True)``) a reused id means a NEW VERSION of that document:
    the versioned MOR merge replaces its band entries at scan time
    (``version`` defaults to ``batch_id`` — pass the doc revision when
    increments can reorder)."""
    bt = minhash_band_table(docs, k, band_width).persist()
    try:
        # index side: the accepted corpus, minus this batch's own entries
        # (present only when a crashed caller re-delivers after the append
        # committed — without the anti-join a replay would flag every doc
        # as a duplicate of itself-in-the-index via sibling docs twice)
        batch_ids = docs.select("doc_id").distinct()
        idx = index.read().join(F.broadcast(batch_ids), "doc_id", "left_anti")

        keys = [
            r[0]
            for r in bt.select("band_key")
            .distinct()
            .limit(max_pushdown_keys + 1)
            .collect()
        ]
        if len(keys) <= max_pushdown_keys:
            # micro-batch regime: the IN-predicate reaches the parquet scan
            # (PushedFilters: In(band_key, ...)) — row groups that dictionary/
            # stats-miss every batch key never decompress. On a MUTABLE index
            # holding MOR deltas the filter correctly stays ABOVE the version
            # resolution (band_key is payload, not key — filtering pre-
            # resolution could resurrect a stale version's matching entry),
            # so scan pushdown only re-engages once compact_index folds the
            # deltas: compact on the ingest cadence.
            idx = idx.filter(F.col("band_key").isin(keys))

        # bt is persisted, so both self-join sides (and the cross join's
        # probe side) read the materialized band entries — signatures
        # compute once (the repartition-pinning trick in
        # minhash_lsh_candidates serves the same purpose without a persist)
        intra = _pairs(bt, bt)
        # one join, then order the pair — the anti-joined index side can
        # hold ids on either side of the batch's
        cross = (
            bt.alias("a")
            .join(
                idx.alias("b"),
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key")),
            )
            .select(
                F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").cast("long").alias("shared_bands"))
        )
        flags = (
            intra.unionByName(cross)
            .groupBy("doc_a", "doc_b")
            .agg(F.sum("shared_bands").cast("long").alias("shared_bands"))
        )
        out = flags.localCheckpoint(eager=True)  # resolve BEFORE the append
        if flags_table is not None:
            # flags commit BEFORE the index merge: a crash in between
            # replays the trigger against an UNCHANGED index, so the
            # recomputed flags are identical and this fence skips. The
            # reverse order has an unrecoverable window on mutable
            # indexes — a replay after the merge recomputes flags against
            # an index where this trigger's retractions already landed,
            # silently dropping pairs between batch docs and
            # same-trigger-retracted docs.
            flags_table.append(out, fence=(app_id, batch_id))
        if index.snapshot().primary_key:
            # mutable index: versioned MOR upsert — O(batch) delta append,
            # a re-ingested doc's entries replace the old version's at scan.
            # version_col names a per-doc cursor on ``docs`` (the CDC LSN):
            # a late stale re-ingest then LOSES the resolution, keeping the
            # index in lockstep with an LSN-merged main table; the scalar
            # version (default batch_id) suits ordered append-only feeds.
            _mutable_merge(
                index, bt, docs,
                id_col="doc_id",
                n_bands=k // band_width,
                null_cols=(("band_key", "string"),),
                app_id=app_id, batch_id=batch_id,
                version=version, version_col=version_col, deletes=deletes,
            )
        else:
            if version_col is not None or deletes is not None:
                raise ValueError(
                    "per-doc versions / deletes need a mutable index "
                    "(bootstrap_dedup_index(..., mutable=True))"
                )
            index.append(bt, fence=(app_id, batch_id))
        return out
    finally:
        bt.unpersist()


def _versioned(df: DataFrame, version: int) -> DataFrame:
    return df.withColumn(
        "_ab_cdc_lsn", F.lit(version).cast("long")
    ).withColumn("_ab_cdc_deleted_at", F.lit(None).cast("timestamp"))


def _mutable_merge(
    index: LakeTable,
    bt: DataFrame,
    docs: DataFrame,
    *,
    id_col: str,
    n_bands: Optional[int],
    null_cols: tuple,
    app_id: str,
    batch_id: int,
    version: Optional[int],
    version_col: Optional[str],
    deletes: Optional[DataFrame],
) -> None:
    """The versioned MOR upsert shared by all three mutable index
    families: stamp each entry with its doc's version (per-doc cursor via
    ``version_col``, else the scalar), union the retraction tombstones,
    one fenced merge for the whole increment."""
    from ..lake.merge import merge_batch

    if version_col is not None:
        vmap = docs.select(
            F.col(id_col).cast("long").alias(id_col),
            F.col(version_col).cast("long").alias("_v"),
        )
        rows = (
            bt.join(F.broadcast(vmap), id_col)
            .withColumn("_ab_cdc_lsn", F.col("_v"))
            .drop("_v")
            .withColumn("_ab_cdc_deleted_at", F.lit(None).cast("timestamp"))
        )
    else:
        rows = _versioned(bt, batch_id if version is None else version)
    if deletes is not None:
        rows = rows.unionByName(
            _tombstone_rows(
                deletes,
                n_bands,
                version_col=version_col,
                version=batch_id if version is None else version,
                id_col=id_col,
                null_cols=null_cols,
            )
        )
    merge_batch(
        index,
        rows,
        ["_ab_cdc_lsn"],
        app_id=app_id,
        batch_id=batch_id,
        strategy="mor",
    )


def _tombstone_rows(
    doc_ids: DataFrame,
    n_bands: Optional[int],
    version_col: Optional[str] = None,
    version: int = 0,
    id_col: str = "doc_id",
    null_cols: tuple = (("band_key", "string"),),
) -> DataFrame:
    """One tombstone change row per (doc, band slot) — the fixed-fanout
    retraction unit of a mutable index. Generic over the three signature
    families: ``n_bands`` explodes a band_idx key part (None for indexes
    keyed on the id alone), ``null_cols`` null-pads the family's payload
    columns so tombstones union with live entry rows."""
    v = (
        F.col(version_col).cast("long")
        if version_col is not None and version_col in doc_ids.columns
        else F.lit(version).cast("long")
    )
    out = doc_ids.select(
        F.col(id_col).cast("long").alias(id_col), v.alias("_v")
    )
    if n_bands is not None:
        out = out.select(
            id_col,
            F.explode(
                F.array(*[F.lit(i) for i in range(n_bands)])
            ).alias("band_idx"),
            "_v",
        )
    for c, t in null_cols:
        out = out.withColumn(c, F.lit(None).cast(t))
    return (
        out.withColumn("_ab_cdc_lsn", F.col("_v"))
        .drop("_v")
        .withColumn(
            "_ab_cdc_deleted_at", F.lit("1970-01-01 00:00:00").cast("timestamp")
        )
    )


def retract_docs(
    index: LakeTable,
    doc_ids: DataFrame,
    *,
    version: int,
    app_id: str = "dedup-index",
    batch_id: int = 0,
    k: int = MINHASH_K,
    band_width: int = MINHASH_BAND_WIDTH,
) -> None:
    """Remove documents from a MUTABLE index: tombstone every band slot of
    each doc (fixed fan-out k/band_width rows per doc), fenced like any
    merge. ``version`` must exceed the doc's last ingest version to win
    the LSN resolution. Retractions make the doc stop matching future
    increments; history stays time-travelable until vacuum. (The CDC
    wiring retracts through ``flag_and_ingest(deletes=...)`` instead —
    one merge for the whole trigger, per-event versions.)"""
    if not index.snapshot().primary_key:
        raise ValueError(
            "retract_docs needs a mutable index "
            "(bootstrap_dedup_index(..., mutable=True)); an append-only "
            "index has no per-doc key to tombstone"
        )
    from ..lake.merge import merge_batch

    merge_batch(
        index,
        _tombstone_rows(doc_ids, k // band_width, version=version),
        ["_ab_cdc_lsn"],
        app_id=app_id,
        batch_id=batch_id,
        strategy="mor",
    )


SIMHASH_INDEX_STRUCT = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("simhash", T.LongType(), False),
        T.StructField("band_idx", T.IntegerType(), False),
        T.StructField("band_val", T.LongType(), False),
    ]
)


#: persisted construction parameters — (band_idx, band_val) keys are only
#: meaningful under ONE block-permutation layout, so it is pinned at
#: bootstrap exactly like the embedding index's lsh_meta.json: an
#: increment under a different construction would silently match nothing
#: against the accepted corpus (recall -> ~0 with no error)
SIMHASH_META_FILE = "simhash_meta.json"
#: the construction id bumps whenever the band layout changes shape
#: (v2 = C(n_blocks, max_hamming) block-permutation tables over 30-bit
#: concatenated keys; v1 was the retired 4x15-bit plain slicing)
SIMHASH_CONSTRUCTION = "block-permutation-v2"


def _load_simhash_meta(path: str) -> dict:
    """Pinned construction; the default covers indexes created before the
    meta file existed (all of which are v2 — v1 never shipped an index)."""
    p = os.path.join(path, SIMHASH_META_FILE)
    if not os.path.exists(p):
        return {"construction": SIMHASH_CONSTRUCTION, "max_hamming": 3}
    with open(p) as f:
        return json.load(f)


def bootstrap_simhash_index(
    spark: SparkSession,
    path: str,
    n_buckets: int = 32,
    mutable: bool = False,
    max_hamming: int = 3,
) -> LakeTable:
    """SimHash block-permutation index: same incremental contract as the
    MinHash index, different signature family — hamming radius on one
    60-bit fingerprint instead of Jaccard bands. band_val is a 30-bit
    concatenated-block key (C(6,3) = 20 tables — see
    ``dedup_docs.simhash_bands_from_sigs``), so bucket occupancy is
    bounded by ~corpus/2^30 random collisions per table, not the
    saturating 2^15 of plain slices.

    ``mutable=False`` (append-only corpora): bucketed + compaction-sorted
    by band_val so the pushed numeric IN-filter prunes files and row
    groups. ``mutable=True`` (re-crawled / CDC-fed corpora): primary key
    (doc_id, band_idx) with versioned MOR merges — a re-ingested doc's
    band entries replace the previous version's at scan, deletes
    tombstone every band slot — the exact contract of the mutable MinHash
    index, bucketed by doc_id (the merge's pruning key)."""
    if LakeTable.exists(path):
        return LakeTable(spark, path)
    # meta FIRST, table-create second — the create commit is the "index
    # exists" signal, so a crash between the two just re-bootstraps
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".{SIMHASH_META_FILE}.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {"construction": SIMHASH_CONSTRUCTION, "max_hamming": max_hamming}, f
        )
    os.replace(tmp, os.path.join(path, SIMHASH_META_FILE))
    if mutable:
        # payload columns nullable: tombstones carry only the key
        struct = T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("simhash", T.LongType(), True),
                T.StructField("band_idx", T.IntegerType(), False),
                T.StructField("band_val", T.LongType(), True),
            ]
        )
        return LakeTable.create(
            spark,
            path,
            TableSchema.from_struct(struct),
            primary_key=["doc_id", "band_idx"],
            bucket_cols=["doc_id"],
            n_buckets=n_buckets,
            sort_cols=["band_val"],
        )
    return LakeTable.create(
        spark,
        path,
        TableSchema.from_struct(SIMHASH_INDEX_STRUCT),
        primary_key=[],
        bucket_cols=["band_val"],
        n_buckets=n_buckets,
        sort_cols=["band_val"],
    )


def simhash_flag_and_ingest(
    index: LakeTable,
    docs: DataFrame,
    *,
    app_id: str = "simhash-index",
    batch_id: int = 0,
    max_hamming: Optional[int] = None,
    max_pushdown_keys: int = DEFAULT_MAX_PUSHDOWN_KEYS,
    version: Optional[int] = None,
    version_col: Optional[str] = None,
    deletes: Optional[DataFrame] = None,
    flags_table: Optional[LakeTable] = None,
) -> DataFrame:
    """One increment against the SimHash index: flag (doc_a, doc_b,
    hamming) pairs with hamming ≤ max_hamming — intra-batch ∪ vs the
    accepted corpus — then fence-append the batch's band entries. Same
    exactness contract as ``flag_and_ingest``: union-of-increments ==
    one-shot ``simhash_banded_pairs`` (block-permutation recall is exact
    for max_hamming < n_blocks), and redelivery after a committed append
    reflags the identical set (batch-id anti-join). On a MUTABLE index
    (``bootstrap_simhash_index(..., mutable=True)``) version/version_col/
    deletes carry the same re-ingest/retract semantics as
    ``flag_and_ingest``; ``flags_table`` commits its fenced append BEFORE
    the index write (same crash-window ordering)."""
    from .dedup_docs import simhash_band_table

    # validation (0 < max_hamming < n_blocks) lives in the band
    # construction; every increment must use the same max_hamming — the
    # block combinations ARE the band_idx key space, so the pinned value
    # comes from the index's own meta and a conflicting override is an
    # error, not a silent recall collapse
    meta = _load_simhash_meta(index.path)
    if meta.get("construction", SIMHASH_CONSTRUCTION) != SIMHASH_CONSTRUCTION:
        raise ValueError(
            f"index at {index.path} was built with construction "
            f"{meta.get('construction')!r}; this code generates "
            f"{SIMHASH_CONSTRUCTION!r} keys — rebuild the index to re-band"
        )
    pinned = int(meta.get("max_hamming", 3))
    if max_hamming is None:
        max_hamming = pinned
    elif max_hamming != pinned:
        raise ValueError(
            f"max_hamming={max_hamming} conflicts with the index's pinned "
            f"value {pinned} (set at bootstrap; rebuild to change it)"
        )
    bt = simhash_band_table(docs, max_hamming=max_hamming).persist()
    try:
        batch_ids = docs.select("doc_id").distinct()
        idx = index.read().join(F.broadcast(batch_ids), "doc_id", "left_anti")
        keys = [
            r[0]
            for r in bt.select("band_val")
            .distinct()
            .limit(max_pushdown_keys + 1)
            .collect()
        ]
        if len(keys) <= max_pushdown_keys:
            idx = idx.filter(F.col("band_val").isin(keys))

        ham = F.expr("bit_count(a.simhash ^ b.simhash)").cast("long")
        on = (F.col("a.band_idx") == F.col("b.band_idx")) & (
            F.col("a.band_val") == F.col("b.band_val")
        )
        intra = (
            bt.alias("a")
            .join(bt.alias("b"), on & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                ham.alias("hamming"),
            )
        )
        cross = (
            bt.alias("a")
            .join(idx.alias("b"), on)
            .select(
                F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
                ham.alias("hamming"),
            )
        )
        flags = (
            intra.unionByName(cross)
            .distinct()  # a pair can share several bands
            .filter(F.col("hamming") <= max_hamming)
        )
        out = flags.localCheckpoint(eager=True)  # resolve BEFORE the append
        if flags_table is not None:
            # flags land before the index write — see flag_and_ingest's
            # crash-window argument
            flags_table.append(out, fence=(app_id, batch_id))
        if index.snapshot().primary_key:
            from .dedup_docs import simhash_n_bands

            _mutable_merge(
                index, bt, docs,
                id_col="doc_id",
                n_bands=simhash_n_bands(max_hamming),
                null_cols=(("simhash", "long"), ("band_val", "long")),
                app_id=app_id, batch_id=batch_id,
                version=version, version_col=version_col, deletes=deletes,
            )
        else:
            if version_col is not None or deletes is not None:
                raise ValueError(
                    "per-doc versions / deletes need a mutable index "
                    "(bootstrap_simhash_index(..., mutable=True))"
                )
            index.append(bt, fence=(app_id, batch_id))
        return out
    finally:
        bt.unpersist()


def compact_index(index: LakeTable, grace_commits: int = 2) -> None:
    """Fold the per-increment appends into band_key-sorted files (the
    ``sort_cols`` spec applies at compaction) and reclaim old files —
    run on the ingest cadence, same contract as the main-table compact."""
    index.compact()
    index.vacuum(grace_commits=grace_commits)
