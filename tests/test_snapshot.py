"""Chunked resumable initial snapshot (sources/snapshot.py).

Covers: chunk planning + boundary persistence, fenced per-chunk resume
(crash mid-snapshot), staged one-pass chunking, and the full DBLog-style
convergence claim — snapshot chunks interleaved with a live WAL tail through
the runner converge to the exact batch-replay oracle in any interleaving.
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from airbyte_spark.feedgen import FeedSpec, generate_feed, oracle_final_state, _write_segments
from airbyte_spark.functions.text import canonicalize_pandas
from airbyte_spark.lake import LakeTable
from airbyte_spark.schemas import TRANSCRIPT_STRUCT
from airbyte_spark.sources.snapshot import (
    SnapshotPlan,
    pending_chunks,
    plan_snapshot,
    run_snapshot,
    stage_chunks,
)
from airbyte_spark.streaming import ReplayConfig, run_replay_stream
from airbyte_spark.streaming.runner import bootstrap_table
from tests.util import assert_same

SPEC = FeedSpec(
    n_convs=30, turns_per_conv=4, n_updates=180, n_deletes=24,
    dup_rate=0.08, late_rate=0.08, n_segments=6, seed=77,
)


@pytest.fixture(scope="module")
def feed(tmp_path_factory):
    d = tmp_path_factory.mktemp("snapfeed")
    ev = generate_feed(str(d), SPEC)
    return str(d), ev


def _source_state(ev: pd.DataFrame, l0: int) -> pd.DataFrame:
    """The source table's consistent state at LSN l0 (what a snapshot
    reads): final rows of all events with lsn <= l0, deletes absent."""
    return oracle_final_state(ev[ev["_ab_cdc_lsn"] <= l0])


def _source_df(spark, pdf: pd.DataFrame):
    return spark.createDataFrame(pdf, TRANSCRIPT_STRUCT)


def test_plan_roundtrip_and_chunk_cover(spark, tmp_path, feed):
    _, ev = feed
    src = _source_df(spark, _source_state(ev, int(ev["_ab_cdc_lsn"].max())))
    plan = plan_snapshot(
        src, "conv_id", low_watermark=999, rows_per_chunk=25, app_id="snap-t1"
    )
    assert plan.n_chunks >= 3
    p = str(tmp_path / "plan.json")
    plan.save(p)
    loaded = SnapshotPlan.load(p)
    assert loaded.boundaries == plan.boundaries
    assert loaded.low_watermark == 999
    # chunks partition the source: disjoint by construction (half-open
    # ranges), and together they cover every row exactly once
    from airbyte_spark.sources.snapshot import chunk_predicate

    total = sum(
        src.filter(chunk_predicate(plan, i)).count() for i in range(plan.n_chunks)
    )
    assert total == src.count()


def test_snapshot_resume_from_fence(spark, tmp_path, feed):
    _, ev = feed
    l0 = int(ev["_ab_cdc_lsn"].max())
    state = _source_state(ev, l0)
    src = _source_df(spark, state)
    table = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=4)
    plan = plan_snapshot(
        src, "conv_id", low_watermark=l0, rows_per_chunk=25, app_id="snap-t2"
    )
    # "crash" after two chunks
    s1 = run_snapshot(table, plan, src, max_chunks=2)
    assert s1.chunks_run == 2 and not s1.done
    assert pending_chunks(table, plan) == list(range(2, plan.n_chunks))
    before = table.read().count()
    assert 0 < before < len(state)
    # resume: completed chunks fence-skip, remainder applies
    s2 = run_snapshot(table, plan, src)
    assert s2.done and s2.chunks_skipped == 2
    assert_same(table.read(), state)
    # idempotent re-run: everything fenced, no new commits
    v = table.snapshot().version
    s3 = run_snapshot(table, plan, src)
    assert s3.done and s3.chunks_run == 0
    assert table.snapshot().version == v


def test_snapshot_staged_chunks(spark, tmp_path, feed):
    _, ev = feed
    l0 = int(ev["_ab_cdc_lsn"].max())
    state = _source_state(ev, l0)
    src = _source_df(spark, state)
    table = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=4)
    plan = plan_snapshot(
        src, "conv_id", low_watermark=l0, rows_per_chunk=30, app_id="snap-t3"
    )
    staging = str(tmp_path / "staging")
    stage_chunks(src, plan, staging)
    assert os.path.exists(os.path.join(staging, "_DONE"))
    mtimes = {
        f: os.path.getmtime(os.path.join(staging, f)) for f in os.listdir(staging)
    }
    stage_chunks(src, plan, staging)  # second call is a no-op
    assert mtimes == {
        f: os.path.getmtime(os.path.join(staging, f)) for f in os.listdir(staging)
    }
    # chunks read from staging directories only — no source df needed
    s = run_snapshot(table, plan)
    assert s.done
    assert_same(table.read(), state)


def test_snapshot_interleaved_with_wal_tail(spark, tmp_path, feed):
    """The headline convergence property: source state at L0 snapshotted in
    chunks WHILE the post-L0 WAL replays through the stream — updates and
    deletes of snapshotted keys, inserts of unseen keys, late/duplicate
    deliveries — lands byte-equal to the one-shot batch oracle over the
    whole feed."""
    _, ev = feed
    l0 = int(ev["_ab_cdc_lsn"].quantile(0.55))
    state = _source_state(ev, l0)
    wal = ev[ev["_ab_cdc_lsn"] > l0].drop(columns=["op", "version"])
    # the tail must actually touch snapshotted keys and delete some
    assert wal["_ab_cdc_deleted_at"].notna().any()

    wal_dir = tmp_path / "wal"
    _write_segments(wal, str(wal_dir), 5)
    src_dir = str(tmp_path / "src")
    _source_df(spark, state).write.parquet(src_dir)

    src = spark.read.parquet(src_dir)
    plan = plan_snapshot(
        src, "conv_id", low_watermark=l0, rows_per_chunk=20, app_id="snap-t4"
    )
    assert plan.n_chunks >= 4  # more chunks than one trigger drains
    plan_path = str(tmp_path / "plan.json")
    plan.save(plan_path)

    cfg = ReplayConfig(
        feed_dir=str(wal_dir),
        table_path=str(tmp_path / "table"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        snapshot_plan_path=plan_path,
        snapshot_source_dir=src_dir,
        snapshot_chunks_per_trigger=1,
    )
    run_replay_stream(spark, cfg)
    table = LakeTable(spark, cfg.table_path)
    # every chunk fenced under the plan's app id, stream under its own
    fences = table.snapshot().fences
    assert fences["snap-t4"] == plan.n_chunks - 1
    assert cfg.app_id in fences
    assert_same(
        table.read(), oracle_final_state(ev, canonicalize=canonicalize_pandas)
    )
    # a key only in the snapshot (no post-L0 events) must carry the
    # low-watermark stamp, not its original lsn (Debezium snapshot-record
    # semantics)
    wal_keys = set(zip(wal["conv_id"], wal["turn_idx"]))
    snap_only = [k for k in zip(state["conv_id"], state["turn_idx"])
                 if k not in wal_keys]
    assert snap_only, "fixture must leave some keys snapshot-only"
    got = (
        table.read(include_meta=True)
        .filter(
            (F.col("conv_id") == snap_only[0][0])
            & (F.col("turn_idx") == int(snap_only[0][1]))
        )
        .select("__lsn")
        .collect()
    )
    assert got and got[0][0] == l0


def test_job_cli_snapshot_flags(spark, tmp_path, feed):
    """--snapshot-source creates + persists the plan on first run, drains
    chunks alongside the tail, and a second invocation resumes from the
    persisted plan (all chunks fenced => pure no-op)."""
    from airbyte_spark import job

    _, ev = feed
    l0 = int(ev["_ab_cdc_lsn"].quantile(0.5))
    state = _source_state(ev, l0)
    wal = ev[ev["_ab_cdc_lsn"] > l0].drop(columns=["op", "version"])
    wal_dir = tmp_path / "wal"
    _write_segments(wal, str(wal_dir), 3)
    src_dir = str(tmp_path / "src")
    _source_df(spark, state).write.parquet(src_dir)

    argv = [
        "--feed-dir", str(wal_dir),
        "--table", str(tmp_path / "tbl"),
        "--checkpoint", str(tmp_path / "ck"),
        "--n-buckets", "4",
        "--snapshot-source", src_dir,
        "--snapshot-chunk-rows", "25",
        "--snapshot-chunk-col", "conv_id",
    ]
    # creating a plan without the stamp LSN must refuse loudly
    with pytest.raises(SystemExit):
        job.main(argv)
    job.main(argv + ["--snapshot-low-watermark", str(l0)])
    plan_path = str(tmp_path / "ck") + ".snapshot_plan.json"
    assert os.path.exists(plan_path)
    table = LakeTable(spark, str(tmp_path / "tbl"))
    want = oracle_final_state(ev, canonicalize=canonicalize_pandas)
    assert_same(table.read(), want)
    v = table.snapshot().version
    # resume run: plan re-loaded, every chunk fenced, stream caught up
    job.main(argv)  # low watermark not needed once the plan exists
    assert table.snapshot().version == v
    assert_same(table.read(), want)
    # --backfill and the snapshot flags are alternative bootstrap modes
    with pytest.raises(SystemExit):
        job.main(argv[:8] + ["--backfill", "--snapshot-source", src_dir])


def test_job_cli_staged_plan_only(spark, tmp_path, feed):
    """A plan whose chunks were STAGED (stage_chunks) needs no source at
    run time: CLI --snapshot-plan alone drives the whole snapshot; naming
    a missing plan with no source refuses loudly instead of starting a
    tail that silently never snapshots."""
    from airbyte_spark import job

    _, ev = feed
    l0 = int(ev["_ab_cdc_lsn"].quantile(0.5))
    state = _source_state(ev, l0)
    wal = ev[ev["_ab_cdc_lsn"] > l0].drop(columns=["op", "version"])
    wal_dir = tmp_path / "wal"
    _write_segments(wal, str(wal_dir), 2)
    src = _source_df(spark, state)

    plan = plan_snapshot(
        src, "conv_id", low_watermark=l0, rows_per_chunk=30, app_id="snap-t6"
    )
    stage_chunks(src, plan, str(tmp_path / "staging"))
    plan_path = str(tmp_path / "plan.json")
    plan.save(plan_path)

    argv = [
        "--feed-dir", str(wal_dir),
        "--table", str(tmp_path / "tbl"),
        "--checkpoint", str(tmp_path / "ck"),
        "--n-buckets", "4",
        "--snapshot-plan", plan_path,
    ]
    job.main(argv)
    assert_same(
        LakeTable(spark, str(tmp_path / "tbl")).read(),
        oracle_final_state(ev, canonicalize=canonicalize_pandas),
    )
    # a plan path that doesn't exist and no source to plan from: refuse
    with pytest.raises(SystemExit):
        job.main(argv[:-1] + [str(tmp_path / "nope.json")])


def test_snapshot_min_fence_resumes_secondary_tables(spark, tmp_path, feed):
    """A crash between a chunk's main-table commit and its SCD-history
    commit must NOT skip the chunk for the SCD table on restart: resume
    consults the MINIMUM fence across every table the drain writes.
    Reproduced by committing chunk 0 to the MAIN table only (as if the
    crash hit right after that commit) and then running the stream — the
    SCD table must still receive chunk 0's rows (the main merge
    fence-skips the re-run)."""
    from airbyte_spark.lake.scd import bootstrap_scd_table, read_scd
    from airbyte_spark.schemas import CHANGE_STRUCT, PK

    _, ev = feed
    l0 = int(ev["_ab_cdc_lsn"].quantile(0.55))
    state = _source_state(ev, l0)
    wal = ev[ev["_ab_cdc_lsn"] > l0].drop(columns=["op", "version"])
    wal_dir = tmp_path / "wal"
    _write_segments(wal, str(wal_dir), 3)
    src_dir = str(tmp_path / "src")
    _source_df(spark, state).write.parquet(src_dir)
    src = spark.read.parquet(src_dir)

    table = bootstrap_table(spark, str(tmp_path / "table"), n_buckets=4)
    plan = plan_snapshot(
        src, "conv_id", low_watermark=l0, rows_per_chunk=20, app_id="snap-t5"
    )
    assert plan.n_chunks >= 3
    plan_path = str(tmp_path / "plan.json")
    plan.save(plan_path)

    # the crash window: chunk 0 fenced into the MAIN table only
    run_snapshot(table, plan, src, max_chunks=1)
    scd = bootstrap_scd_table(
        spark, str(tmp_path / "scd"), CHANGE_STRUCT, PK,
        bucket_cols=["conv_id"], n_buckets=table.snapshot().n_buckets,
    )
    # main alone says "resume at 1"; the min across tables says "resume
    # at 0" because the SCD table never saw chunk 0
    assert pending_chunks(table, plan) == list(range(1, plan.n_chunks))
    assert pending_chunks(table, plan, secondary=[scd]) == list(
        range(plan.n_chunks)
    )

    cfg = ReplayConfig(
        feed_dir=str(wal_dir),
        table_path=str(tmp_path / "table"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        scd_table_path=str(tmp_path / "scd"),
        max_files_per_trigger=1,
        snapshot_plan_path=plan_path,
        snapshot_source_dir=src_dir,
        snapshot_chunks_per_trigger=1,
    )
    run_replay_stream(spark, cfg)

    # chunk 0 carries keys the WAL never touches — the old main-only
    # resume rule loses exactly these from the SCD history
    chunk0 = state[state["conv_id"] < plan.boundaries[0]]
    wal_keys = set(zip(wal["conv_id"], wal["turn_idx"]))
    snap_only = {
        k for k in zip(chunk0["conv_id"], chunk0["turn_idx"])
        if k not in wal_keys
    }
    assert snap_only, "fixture must leave chunk-0 keys snapshot-only"
    scd_keys = {
        (r.conv_id, r.turn_idx)
        for r in read_scd(scd).select("conv_id", "turn_idx").collect()
    }
    assert snap_only <= scd_keys
    # and every main-table key has history
    main_keys = {
        (r.conv_id, r.turn_idx)
        for r in table.read().select("conv_id", "turn_idx").collect()
    }
    assert main_keys <= scd_keys
