"""Write-audit-publish (WAP) staged commits — Iceberg's stage/audit/publish
contract re-expressed on the commit log.

The reference runs generated dbt schema tests AFTER the sync has written
the final tables (normalization then dbt test); WAP moves the same test
battery BEFORE visibility: the merge stages a fully-formed commit outside
the numbered log, the audit reads the staged view, and only a clean audit
publishes — readers can never observe a batch that fails its data-quality
gate (Iceberg `spark.wap.id` branch-then-cherry-pick analog).
"""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from airbyte_spark.catalog import TableSchema
from airbyte_spark.feedgen import FeedSpec, generate_feed, oracle_final_state
from airbyte_spark.lake import LakeTable, merge_batch
from airbyte_spark.lake.quality import AuditFailed, audited_merge_batch
from airbyte_spark.schemas import CHANGE_STRUCT, ORDER_COLS, PK, TRANSCRIPT_STRUCT
from tests.util import assert_same


def _mk_table(spark, path, n_buckets=8) -> LakeTable:
    return LakeTable.create(
        spark,
        str(path),
        TableSchema.from_struct(TRANSCRIPT_STRUCT),
        primary_key=list(PK),
        bucket_cols=["conv_id"],
        n_buckets=n_buckets,
    )


@pytest.fixture(scope="module")
def feed(tmp_path_factory):
    d = tmp_path_factory.mktemp("wapfeed")
    spec = FeedSpec(
        n_convs=25, turns_per_conv=4, n_updates=150, n_deletes=15,
        dup_rate=0.1, late_rate=0.1, seed=23,
    )
    return generate_feed(str(d), spec)


def _chunk(spark, ev, idx):
    pdf = ev.iloc[idx][[f.name for f in CHANGE_STRUCT.fields]]
    return spark.createDataFrame(pdf, schema=CHANGE_STRUCT)


def _halves(ev):
    return np.array_split(np.arange(len(ev)), 2)


def test_stage_is_invisible_until_publish(spark, tmp_path, feed):
    a, b = _halves(feed)
    table = _mk_table(spark, tmp_path / "t")
    merge_batch(table, _chunk(spark, feed, a), ORDER_COLS, batch_id=0)
    before = table.read().toPandas()

    stats = merge_batch(
        table, _chunk(spark, feed, b), ORDER_COLS, batch_id=1, stage=True
    )
    assert stats.staged_id is not None and stats.version is None
    assert table.list_staged() == [stats.staged_id]
    # readers see the pre-stage state; the staged view sees the merge
    assert_same(table.read(), before)
    staged = table.read(snap=table.staged_view(stats.staged_id))
    assert staged.count() == oracle_final_state(feed).shape[0]

    v = table.publish_staged(stats.staged_id)
    assert v == table.snapshot().version
    assert table.list_staged() == []
    assert_same(table.read(), oracle_final_state(feed))
    # the fence travelled with the staged commit: re-delivery is a no-op
    again = merge_batch(table, _chunk(spark, feed, b), ORDER_COLS, batch_id=1)
    assert again.skipped


def test_abort_staged_removes_files_and_state(spark, tmp_path, feed):
    a, b = _halves(feed)
    table = _mk_table(spark, tmp_path / "t")
    merge_batch(table, _chunk(spark, feed, a), ORDER_COLS, batch_id=0)
    before = table.read().toPandas()
    v_before = table.snapshot().version

    stats = merge_batch(
        table, _chunk(spark, feed, b), ORDER_COLS, batch_id=1, stage=True
    )
    staged_files = [
        os.path.join(table.path, ad["path"])
        for ad in table._load_staged(stats.staged_id).get("adds", [])
    ]
    assert staged_files and all(os.path.exists(p) for p in staged_files)
    table.abort_staged(stats.staged_id)
    assert not any(os.path.exists(p) for p in staged_files)
    assert table.list_staged() == []
    assert table.snapshot().version == v_before
    assert_same(table.read(), before)


def test_vacuum_deep_protects_staged_files(spark, tmp_path, feed):
    a, b = _halves(feed)
    table = _mk_table(spark, tmp_path / "t")
    merge_batch(table, _chunk(spark, feed, a), ORDER_COLS, batch_id=0)
    stats = merge_batch(
        table, _chunk(spark, feed, b), ORDER_COLS, batch_id=1, stage=True
    )
    staged_files = [
        os.path.join(table.path, ad["path"])
        for ad in table._load_staged(stats.staged_id).get("adds", [])
    ]
    table.vacuum(deep=True)
    assert all(os.path.exists(p) for p in staged_files)
    table.publish_staged(stats.staged_id)
    assert_same(table.read(), oracle_final_state(feed))


def test_publish_is_fenced_against_duplicates(spark, tmp_path, feed):
    a, b = _halves(feed)
    table = _mk_table(spark, tmp_path / "t")
    merge_batch(table, _chunk(spark, feed, a), ORDER_COLS, batch_id=0)
    s1 = merge_batch(table, _chunk(spark, feed, b), ORDER_COLS, batch_id=1, stage=True)
    s2 = merge_batch(table, _chunk(spark, feed, b), ORDER_COLS, batch_id=1, stage=True)
    assert table.publish_staged(s1.staged_id) is not None
    # the second staged copy of the same (app_id, batch_id) is a duplicate:
    # publish declines, cleans up its files, and the table is unchanged
    v = table.snapshot().version
    assert table.publish_staged(s2.staged_id) is None
    assert table.snapshot().version == v
    assert table.list_staged() == []
    assert_same(table.read(), oracle_final_state(feed))


def test_publish_conflicts_with_concurrent_rewrite(spark, tmp_path, feed):
    from airbyte_spark.lake.table import CommitConflict

    a, b = _halves(feed)
    table = _mk_table(spark, tmp_path / "t")
    merge_batch(table, _chunk(spark, feed, a), ORDER_COLS, batch_id=0)
    # stage a COW merge (carries removes of the touched buckets' files) ...
    s = merge_batch(table, _chunk(spark, feed, b), ORDER_COLS, batch_id=1, stage=True)
    # ... then a concurrent writer rewrites those same files (compaction)
    table.compact(min_files=1)
    with pytest.raises(CommitConflict):
        table.publish_staged(s.staged_id)
    # the staged commit is still there for the caller to abort
    table.abort_staged(s.staged_id)
    assert table.list_staged() == []


def test_audited_merge_publishes_clean_batches(spark, tmp_path, feed):
    a, b = _halves(feed)
    table = _mk_table(spark, tmp_path / "t")
    for i, idx in enumerate((a, b)):
        stats = audited_merge_batch(
            table,
            _chunk(spark, feed, idx),
            ORDER_COLS,
            not_null=["conv_id", "turn_idx"],
            unique=[list(PK)],
            batch_id=i,
        )
        assert stats.version is not None
    assert table.list_staged() == []
    assert_same(table.read(), oracle_final_state(feed))


def test_audited_merge_aborts_failing_batch(spark, tmp_path, feed):
    a, b = _halves(feed)
    table = _mk_table(spark, tmp_path / "t")
    audited_merge_batch(
        table, _chunk(spark, feed, a), ORDER_COLS,
        not_null=["conv_id"], batch_id=0,
    )
    before = table.read().toPandas()
    v_before = table.snapshot().version

    bad = _chunk(spark, feed, b).withColumn(
        "role", F.when(F.col("turn_idx") % 2 == 0, F.lit(None)).otherwise(F.col("role"))
    )
    with pytest.raises(AuditFailed) as ei:
        audited_merge_batch(
            table, bad, ORDER_COLS, not_null=["role"], batch_id=1
        )
    assert ei.value.failures.get("not_null_role", 0) > 0
    # nothing published, nothing staged left behind, no orphan files
    assert table.snapshot().version == v_before
    assert table.list_staged() == []
    assert_same(table.read(), before)


def test_streaming_audit_gate(spark, tmp_path, feed):
    """cfg.audit_tests wires WAP into the sync loop: a failing batch aborts
    its staged commit and fails the QUERY (the reference's dbt-test-failure
    fails the sync) — the table never exposes the bad batch."""
    from airbyte_spark.streaming import ReplayConfig, run_replay_stream

    feed_dir = str(tmp_path / "feed")
    spec = FeedSpec(
        n_convs=20, turns_per_conv=4, n_updates=80, n_deletes=8,
        dup_rate=0.05, late_rate=0.05, n_segments=4, seed=31,
    )
    ev = generate_feed(feed_dir, spec)

    cfg = ReplayConfig(
        feed_dir=feed_dir,
        table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"),
        max_files_per_trigger=2,
        audit_tests={"not_null": ["conv_id", "text"], "unique": [list(PK)]},
    )
    run_replay_stream(spark, cfg)
    table = LakeTable(spark, cfg.table_path)
    from airbyte_spark.functions.text import canonicalize_pandas

    assert_same(table.read(), oracle_final_state(ev, canonicalize=canonicalize_pandas))
    assert table.list_staged() == []

    # a gate that the data genuinely violates fails the sync before publish
    cfg_bad = ReplayConfig(
        feed_dir=feed_dir,
        table_path=str(tmp_path / "tbl_bad"),
        checkpoint_dir=str(tmp_path / "ck_bad"),
        scd_table_path=str(tmp_path / "scd_bad"),
        max_files_per_trigger=2,
        audit_tests={"expressions": {"short_text": "length(text) < 2"}},
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException):
        run_replay_stream(spark, cfg_bad)
    bad_table = LakeTable(spark, cfg_bad.table_path)
    assert bad_table.read().count() == 0  # first batch never published
    assert bad_table.list_staged() == []  # aborted, not leaked
    # the SCD history table must not have seen the failed batch either —
    # it merges AFTER the audit gate, so an aborted batch is visible in
    # NO table (and its fence hasn't advanced past the fixed re-delivery)
    bad_scd = LakeTable(spark, cfg_bad.scd_table_path)
    assert bad_scd.read(include_deleted=True).count() == 0


def test_audit_error_aborts_staged_commit(spark, tmp_path, feed):
    """If the AUDIT itself raises (bad expression, transient scan error)
    the staged commit must be aborted, not leaked — a parked staged commit
    would orphan its data files forever."""
    table = _mk_table(spark, tmp_path / "t")
    a, b = _halves(feed)
    with pytest.raises(Exception):
        audited_merge_batch(
            table, _chunk(spark, feed, a), ORDER_COLS,
            expressions={"boom": "nonexistent_column > 0"}, batch_id=0,
        )
    assert table.list_staged() == []
    assert table.read().count() == 0  # table untouched, fence not advanced

    # an EMPTY test battery is vacuously clean: publish, don't error
    stats = audited_merge_batch(table, _chunk(spark, feed, a), ORDER_COLS, batch_id=0)
    assert stats.version is not None and table.list_staged() == []


def test_reset_aborts_this_apps_staged_commits(spark, tmp_path, feed):
    """stage -> reset -> publish must NOT resurrect pre-reset data: the
    reset aborts staged commits fenced under the reset app_id (their fence
    no longer guards them), while another app's stage survives."""
    a, b = _halves(feed)
    table = _mk_table(spark, tmp_path / "tbl_reset_wap")
    merge_batch(table, _chunk(spark, feed, a), ORDER_COLS, app_id="app-a", batch_id=0)
    staged_a = merge_batch(
        table, _chunk(spark, feed, b), ORDER_COLS, app_id="app-a", batch_id=1,
        strategy="mor", stage=True,
    ).staged_id
    staged_b = merge_batch(
        table, _chunk(spark, feed, b), ORDER_COLS, app_id="app-b", batch_id=1,
        strategy="mor", stage=True,
    ).staged_id
    table.reset("app-a")
    assert table.list_staged() == [staged_b]  # app-a's stage aborted
    with pytest.raises(Exception):
        table.publish_staged(staged_a)  # marker gone
    table.publish_staged(staged_b)  # the other app's work is unaffected
    assert table.read().count() > 0
