"""Incremental MinHash-LSH dedup index (ops/dedup_index.py).

The load-bearing claim: flagging per increment against the persistent index
is EXACTLY equivalent to the one-shot batch self-join — same pairs, same
shared_bands counts — regardless of how the corpus is split, and replays
are idempotent (fenced append + batch-id anti-join on the index side).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbyte_spark.ops import dedup_docs
from airbyte_spark.ops.dedup_index import (
    bootstrap_dedup_index,
    compact_index,
    flag_and_ingest,
    retract_docs,
)

BASES = [
    "the cat sat on the mat near the door",
    "a quick brown fox jumps over the lazy dog today",
    "der hund und die katze spielen in dem garten zusammen",
    "completely different words entirely here now for this one",
    "data pipelines shuffle partitions across executors at scale",
    "short doc",  # < 3 tokens after split: degenerate-shingle path
]


def _corpus():
    rows = []
    for i in range(1, 46):
        base = BASES[i % len(BASES)]
        # every third doc mutates one word — near-dup of its base family
        text = base + (" extra" if i % 3 == 0 else "")
        rows.append((i, text))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(_corpus(), ["doc_id", "text"])


def _flags_set(df):
    return {
        (r.doc_a, r.doc_b): r.shared_bands
        for r in df.collect()
    }


def test_incremental_equals_batch(spark, tmp_path, corpus):
    batch = _flags_set(dedup_docs.minhash_lsh_candidates(corpus))
    assert batch, "fixture must produce near-dup candidates"

    index = bootstrap_dedup_index(spark, str(tmp_path / "idx"), n_buckets=4)
    got = {}
    for i in range(3):
        inc = corpus.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i)
        flags = _flags_set(
            flag_and_ingest(index, inc, app_id="t-idx", batch_id=i)
        )
        # each pair is flagged by exactly ONE increment (intra-batch, or
        # the increment that ingested the pair's later-arriving member)
        assert not set(flags) & set(got)
        got.update(flags)
    assert got == batch


def test_redelivery_is_idempotent(spark, tmp_path, corpus):
    index = bootstrap_dedup_index(spark, str(tmp_path / "idx"), n_buckets=4)
    first = corpus.filter(F.col("doc_id") <= 20)
    flags0 = _flags_set(flag_and_ingest(index, first, app_id="t", batch_id=0))
    rows0 = index.read().count()
    v0 = index.snapshot().version
    # at-least-once feeder re-delivers the same increment after the commit
    flags_replay = _flags_set(
        flag_and_ingest(index, first, app_id="t", batch_id=0)
    )
    assert flags_replay == flags0
    assert index.read().count() == rows0  # fenced: no doubled entries
    assert index.snapshot().version == v0
    # next increment still sees the corpus exactly once
    second = corpus.filter(F.col("doc_id") > 20)
    flags1 = _flags_set(flag_and_ingest(index, second, app_id="t", batch_id=1))
    batch = _flags_set(dedup_docs.minhash_lsh_candidates(corpus))
    merged = dict(flags0)
    merged.update(flags1)
    assert merged == batch


def test_compact_preserves_flags(spark, tmp_path, corpus):
    index = bootstrap_dedup_index(spark, str(tmp_path / "idx"), n_buckets=4)
    for i in range(4):
        inc = corpus.filter(F.pmod(F.col("doc_id"), F.lit(4)) == i)
        flag_and_ingest(index, inc, app_id="t", batch_id=i)
    before = index.read().count()
    compact_index(index)
    assert index.read().count() == before
    # a post-compaction increment (re-using unseen ids) still matches the
    # batch answer over the widened corpus
    extra = spark.createDataFrame(
        [(100, BASES[0]), (101, "nothing like anything else whatsoever")],
        ["doc_id", "text"],
    )
    flags = _flags_set(flag_and_ingest(index, extra, app_id="t", batch_id=4))
    widened = corpus.unionByName(extra)
    batch = _flags_set(dedup_docs.minhash_lsh_candidates(widened))
    want = {k: v for k, v in batch.items() if 100 in k or 101 in k}
    assert flags == want


def test_mutable_update_replaces_entries(spark, tmp_path, corpus):
    """Re-ingesting a doc_id on a mutable index REPLACES its band entries:
    probes match the new text, not the old."""
    index = bootstrap_dedup_index(
        spark, str(tmp_path / "idx"), n_buckets=4, mutable=True
    )
    # v1: doc 1 is the cat sentence
    v1 = spark.createDataFrame([(1, BASES[0]), (2, BASES[3])], ["doc_id", "text"])
    flag_and_ingest(index, v1, app_id="m", batch_id=0)
    # v2: doc 1 becomes the fox sentence
    v2 = spark.createDataFrame([(1, BASES[1])], ["doc_id", "text"])
    flag_and_ingest(index, v2, app_id="m", batch_id=1)

    cat_probe = spark.createDataFrame([(50, BASES[0])], ["doc_id", "text"])
    fox_probe = spark.createDataFrame([(51, BASES[1])], ["doc_id", "text"])
    cat = _flags_set(flag_and_ingest(index, cat_probe, app_id="m", batch_id=2))
    fox = _flags_set(flag_and_ingest(index, fox_probe, app_id="m", batch_id=3))
    assert (1, 50) not in cat  # stale v1 entries resolved away
    assert (1, 51) in fox  # current v2 entries match
    # compaction folds the version deltas without changing semantics
    compact_index(index)
    fox2_probe = spark.createDataFrame([(52, BASES[1])], ["doc_id", "text"])
    fox2 = _flags_set(flag_and_ingest(index, fox2_probe, app_id="m", batch_id=4))
    assert (1, 52) in fox2 and (51, 52) in fox2


def test_mutable_retract_stops_matching(spark, tmp_path):
    index = bootstrap_dedup_index(
        spark, str(tmp_path / "idx"), n_buckets=4, mutable=True
    )
    docs = spark.createDataFrame(
        [(1, BASES[0]), (2, BASES[0] + " extra")], ["doc_id", "text"]
    )
    flag_and_ingest(index, docs, app_id="m", batch_id=0)
    retract_docs(
        index,
        spark.createDataFrame([(1,)], ["doc_id"]),
        version=1,
        app_id="m",
        batch_id=1,
    )
    probe = spark.createDataFrame([(60, BASES[0])], ["doc_id", "text"])
    flags = _flags_set(flag_and_ingest(index, probe, app_id="m", batch_id=2))
    assert (2, 60) in flags  # surviving near-dup still matches
    assert (1, 60) not in flags  # retracted doc is gone
    # retracting on an append-only index is a contract error, not a no-op
    ro = bootstrap_dedup_index(spark, str(tmp_path / "idx_ro"), n_buckets=4)
    with pytest.raises(ValueError):
        retract_docs(
            ro, spark.createDataFrame([(1,)], ["doc_id"]), version=1, batch_id=0
        )


def test_simhash_incremental_equals_batch(spark, tmp_path, corpus):
    from airbyte_spark.ops.dedup_index import (
        bootstrap_simhash_index,
        simhash_flag_and_ingest,
    )

    batch = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup_docs.simhash_banded_pairs(corpus, max_hamming=3).collect()
    }
    assert batch, "fixture must produce simhash near-dups"
    index = bootstrap_simhash_index(spark, str(tmp_path / "sidx"), n_buckets=4)
    got, last = {}, {}
    for i in range(3):
        inc = corpus.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i)
        last = {
            (r.doc_a, r.doc_b): r.hamming
            for r in simhash_flag_and_ingest(
                index, inc, app_id="t-sim", batch_id=i
            ).collect()
        }
        assert not set(last) & set(got)  # each pair flagged exactly once
        got.update(last)
    assert got == batch
    # redelivery of the last increment: fenced append (no growth) and the
    # batch-id anti-join reproduces the increment's own flag set exactly
    rows = index.read().count()
    replay = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_flag_and_ingest(
            index,
            corpus.filter(F.pmod(F.col("doc_id"), F.lit(3)) == 2),
            app_id="t-sim",
            batch_id=2,
        ).collect()
    }
    assert index.read().count() == rows
    assert replay == last


def test_simhash_index_pins_construction(spark, tmp_path, corpus):
    """The (band_idx, band_val) key space is only meaningful under ONE
    construction: the meta file pins it at bootstrap and conflicting
    increments must fail loudly instead of silently matching nothing."""
    import json
    import os

    from airbyte_spark.ops.dedup_index import (
        SIMHASH_META_FILE,
        bootstrap_simhash_index,
        simhash_flag_and_ingest,
    )

    path = str(tmp_path / "sidx_meta")
    index = bootstrap_simhash_index(spark, path, n_buckets=4, max_hamming=3)
    meta = json.load(open(os.path.join(path, SIMHASH_META_FILE)))
    assert meta["max_hamming"] == 3 and "construction" in meta
    # omitted max_hamming inherits the pinned value
    simhash_flag_and_ingest(index, corpus.limit(3), app_id="t-pin", batch_id=0)
    # a conflicting radius is rejected (different C(n, h) band tables)
    with pytest.raises(ValueError, match="pinned"):
        simhash_flag_and_ingest(
            index, corpus.limit(3), app_id="t-pin", batch_id=1, max_hamming=2
        )
    # a foreign construction id is rejected outright
    meta["construction"] = "plain-slices-v1"
    with open(os.path.join(path, SIMHASH_META_FILE), "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="rebuild"):
        simhash_flag_and_ingest(index, corpus.limit(3), app_id="t-pin", batch_id=2)


def test_pushed_in_filter_reaches_scan(spark, tmp_path, corpus):
    index = bootstrap_dedup_index(spark, str(tmp_path / "idx"), n_buckets=4)
    flag_and_ingest(
        index, corpus.filter(F.col("doc_id") <= 30), app_id="t", batch_id=0
    )
    probe = corpus.filter(F.col("doc_id") > 30)
    keys = [
        r[0]
        for r in dedup_docs.minhash_band_table(probe)
        .select("band_key")
        .distinct()
        .collect()
    ]
    plan = (
        index.read()
        .filter(F.col("band_key").isin(keys))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "band_key" in plan

def test_flags_commit_before_index_merge(spark, tmp_path, monkeypatch):
    """The fenced flags append lands BEFORE the index merge. With the
    reverse order, a crash between the two replays the trigger against an
    index where this trigger's retractions already landed — pairs between
    batch docs and same-trigger-retracted docs silently vanish. Reproduced
    by making the index merge raise: the (retracted, new) pair must
    already be committed, and the replay fence-skips it."""
    import airbyte_spark.lake.merge as lake_merge
    from airbyte_spark.ops.dedup_index import bootstrap_flags_table

    index = bootstrap_dedup_index(
        spark, str(tmp_path / "idx"), n_buckets=4, mutable=True
    )
    flags_t = bootstrap_flags_table(spark, str(tmp_path / "flags"))
    d0 = spark.createDataFrame(
        [(1, BASES[0]), (2, BASES[3])], ["doc_id", "text"]
    )
    flag_and_ingest(index, d0, app_id="w", batch_id=0, flags_table=flags_t)
    assert _flags_set(flags_t.read()) == {}

    # trigger 1: retract doc 1, ingest doc 3 with doc 1's exact text — the
    # (1, 3) pair is only computable against the PRE-merge index
    dels = spark.createDataFrame([(1,)], ["doc_id"])
    d1 = spark.createDataFrame([(3, BASES[0])], ["doc_id", "text"])
    real_merge = lake_merge.merge_batch

    def boom(*a, **kw):
        raise RuntimeError("crash before the index merge")

    monkeypatch.setattr(lake_merge, "merge_batch", boom)
    with pytest.raises(RuntimeError):
        flag_and_ingest(
            index, d1, app_id="w", batch_id=1, deletes=dels,
            flags_table=flags_t,
        )
    committed = _flags_set(flags_t.read())
    assert (1, 3) in committed  # flags landed before the crash

    # replay: the index merge applies, the flags append fence-skips —
    # final state identical to a crash-free run
    monkeypatch.setattr(lake_merge, "merge_batch", real_merge)
    v = flags_t.snapshot().version
    flag_and_ingest(
        index, d1, app_id="w", batch_id=1, deletes=dels, flags_table=flags_t
    )
    assert _flags_set(flags_t.read()) == committed
    assert flags_t.snapshot().version == v
    # doc 1 really is retracted now: a fresh probe with the same text
    # matches only the live doc 3
    probe = spark.createDataFrame([(9, BASES[0])], ["doc_id", "text"])
    got = _flags_set(
        flag_and_ingest(
            index, probe, app_id="w", batch_id=2, flags_table=flags_t
        )
    )
    assert set(got) == {(3, 9)}


def test_mutable_simhash_update_and_retract(spark, tmp_path):
    """Mutable SimHash index lifecycle (mirrors the MinHash mutable tests):
    a re-ingested doc_id's band entries REPLACE the old version's — probes
    match the new fingerprint, never the stale one — and a retraction
    tombstones every band slot so the doc stops matching."""
    from airbyte_spark.ops.dedup_index import (
        bootstrap_simhash_index,
        simhash_flag_and_ingest,
    )

    index = bootstrap_simhash_index(
        spark, str(tmp_path / "sidx"), n_buckets=4, mutable=True
    )
    v1 = spark.createDataFrame(
        [(1, BASES[0]), (2, BASES[1])], ["doc_id", "text"]
    )
    simhash_flag_and_ingest(index, v1, app_id="m", batch_id=0)
    # doc 1's text changes entirely
    v2 = spark.createDataFrame([(1, BASES[3])], ["doc_id", "text"])
    simhash_flag_and_ingest(index, v2, app_id="m", batch_id=1)

    cat_probe = spark.createDataFrame([(50, BASES[0])], ["doc_id", "text"])
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_flag_and_ingest(
            index, cat_probe, app_id="m", batch_id=2
        ).collect()
    }
    assert (1, 50) not in got  # stale fingerprint never matches
    new_probe = spark.createDataFrame([(51, BASES[3])], ["doc_id", "text"])
    got2 = {
        (r.doc_a, r.doc_b)
        for r in simhash_flag_and_ingest(
            index, new_probe, app_id="m", batch_id=3
        ).collect()
    }
    assert (1, 51) in got2  # the NEW fingerprint matches

    # retract doc 2 (no new docs in the increment)
    dels = spark.createDataFrame([(2,)], ["doc_id"])
    empty = spark.createDataFrame([], "doc_id long, text string")
    simhash_flag_and_ingest(
        index, empty, app_id="m", batch_id=4, deletes=dels, version=10
    )
    probe2 = spark.createDataFrame([(52, BASES[1])], ["doc_id", "text"])
    got3 = {
        (r.doc_a, r.doc_b)
        for r in simhash_flag_and_ingest(
            index, probe2, app_id="m", batch_id=5
        ).collect()
    }
    assert got3 == set()  # retracted doc is gone


def test_mutable_embedding_update_and_retract(spark, tmp_path):
    """Mutable embedding index lifecycle: re-ingest re-points the vector's
    bucket row; retraction tombstones it."""
    from airbyte_spark.ops.ann_index import (
        bootstrap_embedding_dedup_index,
        embedding_flag_and_ingest,
    )

    index = bootstrap_embedding_dedup_index(
        spark, str(tmp_path / "eidx"), n_buckets=4, n_bits=3, mutable=True
    )
    A, B = [1.0, 1.0, 1.0], [-1.0, -1.0, 1.0]  # buckets 7 and 4
    schema = "vec_id long, embedding array<float>"
    embedding_flag_and_ingest(
        index, spark.createDataFrame([(1, A), (2, B)], schema), batch_id=0
    )
    # vec 1 moves to B's bucket
    embedding_flag_and_ingest(
        index, spark.createDataFrame([(1, B)], schema), batch_id=1
    )
    got = {
        (r.vec_a, r.vec_b)
        for r in embedding_flag_and_ingest(
            index, spark.createDataFrame([(50, A)], schema), batch_id=2
        ).collect()
    }
    assert got == set()  # nothing lives in A's bucket anymore
    got2 = {
        (r.vec_a, r.vec_b)
        for r in embedding_flag_and_ingest(
            index, spark.createDataFrame([(51, B)], schema), batch_id=3
        ).collect()
    }
    assert got2 == {(1, 51), (2, 51)}
    # retract vec 2
    embedding_flag_and_ingest(
        index,
        spark.createDataFrame([], schema),
        batch_id=4,
        deletes=spark.createDataFrame([(2,)], ["vec_id"]),
        version=10,
    )
    got3 = {
        (r.vec_a, r.vec_b)
        for r in embedding_flag_and_ingest(
            index, spark.createDataFrame([(52, B)], schema), batch_id=5
        ).collect()
    }
    assert got3 == {(1, 52), (51, 52)}  # 2 is gone; 1 and probe-51 remain
