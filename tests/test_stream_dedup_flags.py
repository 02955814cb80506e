"""Ingest-time near-dup flagging in the replay stream
(ReplayConfig.dedup_index_path → ops/dedup_index.py).

A hand-built 3-trigger WAL exercises the full lifecycle: intra-batch dup,
cross-trigger dup vs the accepted corpus, an UPDATE that must re-point the
doc's index entries at its new text (old text stops matching), and a
DELETE that retracts the doc. Identical texts are used for the pairs under
assertion so band agreement is exact (shared_bands == n_bands), never
probabilistic."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from airbyte_spark.feedgen import _write_segments
from airbyte_spark.lake import LakeTable
from airbyte_spark.streaming import ReplayConfig, run_replay_stream

T1 = "the cat sat on the mat near the old door"
T2 = "a completely different conversation about spark shuffles"
TC = "unique text for the doomed document c"
TF = "totally unrelated words appear in this one"


def _h60(conv: str, turn: int = 0) -> int:
    return int(hashlib.md5(f"{conv}\x1f{turn}".encode()).hexdigest()[:15], 16)


def _feed(tmpdir: str):
    base = np.datetime64("2025-01-01T00:00:00", "us")
    rows = [
        # (conv, text, lsn, deleted)
        ("a", T1, 1, False),
        ("b", T1, 2, False),
        ("c", TC, 3, False),
        ("d", T1, 4, False),   # trigger 2: near-dup of accepted a, b
        ("a", T2, 5, False),   # trigger 2: a's text CHANGES
        ("c", None, 6, True),  # trigger 2: c deleted
        ("e", T2, 7, False),   # trigger 3: matches a's NEW text only
        ("f", TF, 8, False),
        ("g", T1, 9, False),   # trigger 3: matches b, d — NOT a anymore
    ]
    ev = pd.DataFrame(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": np.zeros(len(rows), dtype="int32"),
            "role": ["user"] * len(rows),
            "text": [r[1] for r in rows],
            "tool": [None] * len(rows),
            "ts": [base] * len(rows),
            "_ab_cdc_lsn": np.array([r[2] for r in rows], dtype="int64"),
            "_ab_cdc_updated_at": [base + np.timedelta64(r[2], "s") for r in rows],
            "_ab_cdc_deleted_at": [
                base + np.timedelta64(r[2], "s") if r[3] else np.datetime64("NaT")
                for r in rows
            ],
            "_airbyte_emitted_at": [base + np.timedelta64(r[2], "s") for r in rows],
        }
    )
    _write_segments(ev, tmpdir, 3)


def test_stream_flags_lifecycle(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    _feed(str(feed))
    cfg = ReplayConfig(
        feed_dir=str(feed),
        table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"),
        max_files_per_trigger=1,  # one trigger per segment
        dedup_index_path=str(tmp_path / "didx"),
    )
    run_replay_stream(spark, cfg)

    ids = {c: _h60(c) for c in "abcdefg"}
    flags = {
        (r.doc_a, r.doc_b): r.shared_bands
        for r in LakeTable(spark, str(tmp_path / "didx") + "_flags")
        .read()
        .collect()
    }

    def pair(x, y):
        a, b = sorted((ids[x], ids[y]))
        return (a, b)

    # identical texts agree on every band
    n_bands = 6
    want = {
        pair("a", "b"): n_bands,  # trigger 1 intra
        pair("b", "d"): n_bands,  # trigger 2: d vs accepted b (a updated
        #                           away from T1 in the same trigger)
        pair("a", "e"): n_bands,  # trigger 3: e matches a's NEW text
        pair("b", "g"): n_bands,  # trigger 3: g matches the T1 holders...
        pair("d", "g"): n_bands,
    }
    assert flags == want  # no (a,d)/(a,g) — stale text never matches;
    #                       nothing pairs with deleted c or unique f

    # index state: 6 band entries per LIVE doc; c fully retracted
    idx = LakeTable(spark, str(tmp_path / "didx"))
    per_doc = {
        r.doc_id: r.n
        for r in idx.read().groupBy("doc_id").count().withColumnRenamed("count", "n").collect()
    }
    assert per_doc == {ids[c]: n_bands for c in "abdefg"}

    # resume with nothing new: no flag/index commits happen
    v_idx, v_flags = (
        idx.snapshot().version,
        LakeTable(spark, str(tmp_path / "didx") + "_flags").snapshot().version,
    )
    run_replay_stream(spark, cfg)
    assert idx.snapshot().version == v_idx
    assert (
        LakeTable(spark, str(tmp_path / "didx") + "_flags").snapshot().version
        == v_flags
    )


def test_job_cli_dedup_index(spark, tmp_path):
    """--dedup-index wires the ingest-time flagging through spark-submit."""
    from airbyte_spark import job

    feed = tmp_path / "feed"
    feed.mkdir()
    _feed(str(feed))
    job.main([
        "--feed-dir", str(feed),
        "--table", str(tmp_path / "tbl"),
        "--checkpoint", str(tmp_path / "ck"),
        "--n-buckets", "4",
        "--dedup-index", str(tmp_path / "didx"),
    ])
    flags = LakeTable(spark, str(tmp_path / "didx") + "_flags").read().count()
    assert flags > 0


def test_stream_flags_null_text_retracts(spark, tmp_path):
    """An update that NULLs the text retracts the doc from the index —
    its old text must stop matching, and null-text docs must never
    cross-flag each other through the degenerate empty-shingle band."""
    base = np.datetime64("2025-01-01T00:00:00", "us")
    rows = [
        ("a", T1, 1, False),
        ("b", T1, 2, False),   # trigger 1: (a, b) flagged
        ("b", None, 3, False), # trigger 2: b's text becomes NULL (live row)
        ("x", None, 4, False), # trigger 2: another null-text doc
        ("g", T1, 5, False),   # trigger 3: matches a only — b retracted
        ("y", None, 6, False), # trigger 3: must NOT pair with b or x
    ]
    ev = pd.DataFrame(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": np.zeros(len(rows), dtype="int32"),
            "role": ["user"] * len(rows),
            "text": [r[1] for r in rows],
            "tool": [None] * len(rows),
            "ts": [base] * len(rows),
            "_ab_cdc_lsn": np.array([r[2] for r in rows], dtype="int64"),
            "_ab_cdc_updated_at": [base + np.timedelta64(r[2], "s") for r in rows],
            "_ab_cdc_deleted_at": [np.datetime64("NaT")] * len(rows),
            "_airbyte_emitted_at": [base + np.timedelta64(r[2], "s") for r in rows],
        }
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    _write_segments(ev, str(feed), 3)
    cfg = ReplayConfig(
        feed_dir=str(feed),
        table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"),
        max_files_per_trigger=1,
        dedup_index_path=str(tmp_path / "didx"),
    )
    run_replay_stream(spark, cfg)
    ids = {c: _h60(c) for c in "abgxy"}
    flags = {
        (r.doc_a, r.doc_b)
        for r in LakeTable(spark, str(tmp_path / "didx") + "_flags")
        .read()
        .collect()
    }
    assert flags == {
        tuple(sorted((ids["a"], ids["b"]))),
        tuple(sorted((ids["a"], ids["g"]))),
    }
    # only a and g remain indexed
    idx = LakeTable(spark, str(tmp_path / "didx"))
    assert {r.doc_id for r in idx.read().select("doc_id").distinct().collect()} == {
        ids["a"], ids["g"]
    }

def test_backfill_with_dedup_index(spark, tmp_path):
    """--backfill --dedup-index runs the same ingest-time flagging as the
    streaming path over the one backfill batch (previously the flag was
    silently ignored outside streaming). The whole feed collapses to one
    batch, so the final per-key texts pair intra-batch; the deleted key
    never enters the index."""
    from airbyte_spark import job

    feed = tmp_path / "feed"
    feed.mkdir()
    _feed(str(feed))
    idx_path = str(tmp_path / "didx")
    job.main([
        "--feed-dir", str(feed),
        "--table", str(tmp_path / "tbl"),
        "--checkpoint", str(tmp_path / "ck"),
        "--n-buckets", "4",
        "--backfill",
        "--dedup-index", idx_path,
    ])
    ids = {c: _h60(c) for c in "abcdefg"}

    def pair(x, y):
        a, b = sorted((ids[x], ids[y]))
        return (a, b)

    flags = {
        (r.doc_a, r.doc_b): r.shared_bands
        for r in LakeTable(spark, idx_path + "_flags").read().collect()
    }
    n_bands = 6
    # final texts: a=T2, b=d=g=T1, c deleted, e=T2, f unique
    assert flags == {
        pair("b", "d"): n_bands,
        pair("b", "g"): n_bands,
        pair("d", "g"): n_bands,
        pair("a", "e"): n_bands,
    }
    per_doc = {
        r.doc_id: r.n
        for r in LakeTable(spark, idx_path).read()
        .groupBy("doc_id").count().withColumnRenamed("count", "n").collect()
    }
    assert per_doc == {ids[c]: n_bands for c in "abdefg"}


def test_stream_embedding_flags_lifecycle(spark, tmp_path):
    """Semantic sibling of the text lifecycle: a 3-trigger WAL with an
    embedding column drives the MUTABLE sign-LSH index end-to-end —
    intra-batch near-dup, cross-trigger match vs the accepted corpus, an
    UPDATE that re-points the key's vector (old bucket stops matching),
    and a DELETE that retracts it."""
    from pyspark.sql import types as T

    from airbyte_spark.schemas import CHANGE_STRUCT

    A = np.array([1.0, 1.0, 1.0], dtype=np.float32)     # bucket 0b111
    B = np.array([-1.0, -1.0, 1.0], dtype=np.float32)   # bucket 0b100
    C = np.array([1.0, -1.0, -1.0], dtype=np.float32)   # bucket 0b001
    base = np.datetime64("2025-01-01T00:00:00", "us")
    rows = [
        # (conv, vec, lsn, deleted)
        ("a", A, 1, False),
        ("b", A, 2, False),   # trigger 1 intra-batch pair with a
        ("c", C, 3, False),
        ("d", A, 4, False),   # trigger 2: matches accepted b (a updates away)
        ("a", B, 5, False),   # trigger 2: a's vector CHANGES
        ("c", None, 6, True), # trigger 2: c deleted
        ("e", B, 7, False),   # trigger 3: matches a's NEW vector only
        ("f", C, 8, False),   # trigger 3: c is retracted — no match
        ("g", A, 9, False),   # trigger 3: matches b, d — NOT a anymore
    ]
    ev = pd.DataFrame(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": np.zeros(len(rows), dtype="int32"),
            "role": ["user"] * len(rows),
            "text": ["t"] * len(rows),
            "tool": [None] * len(rows),
            "ts": [base] * len(rows),
            "_ab_cdc_lsn": np.array([r[2] for r in rows], dtype="int64"),
            "_ab_cdc_updated_at": [base + np.timedelta64(r[2], "s") for r in rows],
            "_ab_cdc_deleted_at": [
                base + np.timedelta64(r[2], "s") if r[3] else np.datetime64("NaT")
                for r in rows
            ],
            "_airbyte_emitted_at": [base + np.timedelta64(r[2], "s") for r in rows],
            "embedding": [r[1] for r in rows],
        }
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    _write_segments(ev, str(feed), 3)

    feed_struct = T.StructType(
        list(CHANGE_STRUCT.fields)
        + [T.StructField("embedding", T.ArrayType(T.FloatType()))]
    )
    cfg = ReplayConfig(
        feed_dir=str(feed),
        table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"),
        max_files_per_trigger=1,
        feed_struct=feed_struct,
        embedding_index_path=str(tmp_path / "eidx"),
    )
    run_replay_stream(spark, cfg)

    ids = {c: _h60(c) for c in "abcdefg"}

    def pair(x, y):
        a, b = sorted((ids[x], ids[y]))
        return (a, b)

    flags = {
        (r.vec_a, r.vec_b): r.cos
        for r in LakeTable(spark, str(tmp_path / "eidx") + "_flags")
        .read()
        .collect()
    }
    # identical vectors: cosine exactly 1.0
    assert flags == {
        pair("a", "b"): 1.0,
        pair("b", "d"): 1.0,
        pair("a", "e"): 1.0,
        pair("b", "g"): 1.0,
        pair("d", "g"): 1.0,
    }
    # index state: one live row per undeleted key; c fully retracted
    idx = LakeTable(spark, str(tmp_path / "eidx"))
    live = {r.vec_id for r in idx.read().collect()}
    assert live == {ids[c] for c in "abdefg"}

    # resume with nothing new: no index/flags commits
    v_idx = idx.snapshot().version
    v_flags = LakeTable(
        spark, str(tmp_path / "eidx") + "_flags"
    ).snapshot().version
    run_replay_stream(spark, cfg)
    assert idx.snapshot().version == v_idx
    assert (
        LakeTable(spark, str(tmp_path / "eidx") + "_flags").snapshot().version
        == v_flags
    )
