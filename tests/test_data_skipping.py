"""File-level data skipping on incremental lake reads.

Per-file ``__lsn`` min/max footer stats are recorded in the commit log at
write time (Delta stats-skipping analog); ``read_incremental(since_lsn)``
prunes files wholly ≤ the watermark BEFORE the scan is built, so a consumer
resuming from a recent watermark touches only the newest commits' files —
the reference's incremental-read semantics (cursor > state) without
replaying the log (works past log expiry, unlike the CDF)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from airbyte_spark.catalog import TableSchema
from airbyte_spark.lake import LakeTable, merge_batch
from airbyte_spark.schemas import CHANGE_STRUCT, ORDER_COLS, PK, TRANSCRIPT_STRUCT


def _mk_bronze(spark, path, n_chunks=4, rows_per_chunk=500):
    """Append-only bronze table: chunk i holds lsn in [i*R, (i+1)*R)."""
    schema = TableSchema.from_struct(
        spark.range(1).select(
            F.lit(0).alias("id"), F.lit("x").alias("payload")
        ).schema
    )
    table = LakeTable.create(
        spark, path, schema, primary_key=[], bucket_cols=["id"], n_buckets=4
    )
    for i in range(n_chunks):
        df = (
            spark.range(i * rows_per_chunk, (i + 1) * rows_per_chunk)
            .select(
                F.col("id"),
                F.concat(F.lit("p"), F.col("id")).alias("payload"),
            )
        )
        table.append(df, lsn_col="id")
    return table, n_chunks * rows_per_chunk


def test_footer_stats_recorded(spark, tmp_path):
    table, total = _mk_bronze(spark, str(tmp_path / "t"))
    snap = table.snapshot()
    assert snap.files, "expected data files"
    for meta in snap.files.values():
        assert isinstance(meta["min_lsn"], int)
        assert isinstance(meta["max_lsn"], int)
        assert meta["min_lsn"] <= meta["max_lsn"]


def test_incremental_read_prunes_and_is_exact(spark, tmp_path):
    table, total = _mk_bronze(spark, str(tmp_path / "t"))
    since = 999  # chunks 0-1 (lsn 0..999) are wholly ≤ the watermark
    inc = table.read_incremental(since)
    full = table.read(include_meta=True, include_deleted=True, resolve=False)
    want = full.filter(F.col("__lsn") > since)
    assert inc.exceptAll(want).count() == 0
    assert want.exceptAll(inc).count() == 0
    assert inc.count() == total - (since + 1)

    # the pruned scan reads strictly fewer files, and none of the files it
    # reads has max_lsn ≤ since
    snap = table.snapshot()
    pruned_files = set(inc.inputFiles())
    all_files = set(full.inputFiles())
    assert pruned_files < all_files
    skipped = {
        os.path.realpath(os.path.join(table.path, p))
        for p, m in snap.files.items()
        if m["max_lsn"] <= since
    }
    assert skipped, "test fixture should have skippable files"
    for f in pruned_files:
        local = os.path.realpath(f.replace("file:", ""))
        assert local not in skipped


def test_statless_legacy_files_never_pruned(spark, tmp_path):
    """Commits written before stats collection carry no bounds: the file is
    conservatively scanned and the residual filter keeps the result exact."""
    table, total = _mk_bronze(spark, str(tmp_path / "t"), n_chunks=3)
    # strip the stats from commit 1's log entry (simulates a legacy table)
    log = table._log_path(1)
    with open(log) as f:
        entry = json.load(f)
    for ad in entry["adds"]:
        ad.pop("min_lsn", None)
        ad.pop("max_lsn", None)
    with open(log, "w") as f:
        json.dump(entry, f)
    table._snap_cache = None

    since = total  # everything is ≤ the watermark
    inc = table.read_incremental(since)
    assert inc.count() == 0
    # legacy files (commit 1) still enter the scan; stat'd files are pruned
    legacy = {
        p for p, m in table.snapshot().files.items() if m.get("max_lsn") is None
    }
    assert legacy
    scanned = {f.replace("file:", "") for f in inc.inputFiles()}
    scanned_rel = {os.path.relpath(os.path.realpath(p), table.path) for p in scanned}
    assert {os.path.normpath(p) for p in legacy} <= scanned_rel
    assert len(scanned) == len(legacy)


def test_incremental_over_mor_table_with_deletes(spark, tmp_path, tmp_path_factory):
    """Tombstones flow through the raw feed; resolve=True gives the upsert
    feed (latest per key within the window), exact because merges enforce
    strictly-increasing __lsn per key."""
    import numpy as np

    from airbyte_spark.feedgen import FeedSpec, generate_feed

    feed = tmp_path_factory.mktemp("dsfeed")
    ev = generate_feed(
        str(feed),
        FeedSpec(n_convs=10, turns_per_conv=3, n_updates=40, n_deletes=6,
                 dup_rate=0.0, late_rate=0.0, n_segments=2, seed=7),
    )
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TableSchema.from_struct(TRANSCRIPT_STRUCT),
        primary_key=list(PK), bucket_cols=["conv_id"], n_buckets=4,
    )
    cols = [f.name for f in CHANGE_STRUCT.fields]
    watermark = None
    for i, idx in enumerate(np.array_split(np.arange(len(ev)), 3)):
        batch = spark.createDataFrame(ev.iloc[idx][cols], schema=CHANGE_STRUCT)
        merge_batch(table, batch, ORDER_COLS, app_id="ds", batch_id=i, strategy="mor")
        if i == 0:
            watermark = table.lineage_totals()["max_lsn"]

    raw = table.read(include_meta=True, include_deleted=True, resolve=False)
    want_raw = raw.filter(F.col("__lsn") > watermark)
    got_raw = table.read_incremental(watermark)
    assert got_raw.exceptAll(want_raw).count() == 0
    assert want_raw.exceptAll(got_raw).count() == 0
    assert got_raw.filter(F.col("__deleted")).count() > 0, "deletes visible"

    got_up = table.read_incremental(watermark, resolve=True)
    win = F.row_number().over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window
        .partitionBy(*PK).orderBy(F.col("__lsn").desc())
    )
    want_up = want_raw.withColumn("_rn", win).filter(F.col("_rn") == 1).drop("_rn")
    assert got_up.exceptAll(want_up).count() == 0
    assert want_up.exceptAll(got_up).count() == 0


def test_stats_survive_rollback_and_checkpoint(spark, tmp_path):
    table, _ = _mk_bronze(spark, str(tmp_path / "t"), n_chunks=3)
    v_keep = 2
    table.append(
        spark.range(5000, 5100).select(
            F.col("id"), F.lit("late").alias("payload")
        ),
        lsn_col="id",
    )
    table.rollback(v_keep)
    table._write_checkpoint()
    table._snap_cache = None
    snap = table.snapshot()
    for meta in snap.files.values():
        assert meta.get("max_lsn") is not None
    # pruning still effective after rollback + checkpoint fold
    inc = table.read_incremental(10**9)
    assert inc.count() == 0
    assert inc.inputFiles() == []


# ------------------------------------------------- generic range skipping


def _mk_timed(spark, path, n_days=4, rows_per_day=200):
    """Bronze table with stats_cols=["ts"]: append i holds day i only —
    the time-correlated ingest shape where event-time skipping pays."""
    import datetime as dt

    schema_df = spark.range(1).select(
        F.lit(0).cast("long").alias("id"),
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit("x").alias("payload"),
    )
    table = LakeTable.create(
        spark, path, TableSchema.from_struct(schema_df.schema),
        primary_key=[], bucket_cols=["id"], n_buckets=2,
        stats_cols=["ts"],
    )
    for day in range(n_days):
        df = spark.range(day * rows_per_day, (day + 1) * rows_per_day).select(
            F.col("id"),
            (
                F.lit("2025-01-01 00:00:00").cast("timestamp")
                + F.make_interval(days=F.lit(day), mins=F.col("id") % 1000)
            ).alias("ts"),
            F.concat(F.lit("p"), F.col("id")).alias("payload"),
        )
        table.append(df, lsn_col="id")
    return table, dt.datetime(2025, 1, 1)


def test_event_time_stats_recorded(spark, tmp_path):
    table, _ = _mk_timed(spark, str(tmp_path / "t"))
    snap = table.snapshot()
    assert snap.stats_cols == ["ts"]
    for meta in snap.files.values():
        st = meta["stats"].get("ts")
        assert st is not None and st[0] <= st[1]  # epoch-micros bounds


def test_event_time_range_read_prunes_and_is_exact(spark, tmp_path):
    import datetime as dt

    table, day0 = _mk_timed(spark, str(tmp_path / "t"))
    lo = day0 + dt.timedelta(days=1)
    hi = day0 + dt.timedelta(days=2) - dt.timedelta(seconds=1)

    got = table.read(ranges={"ts": (lo, hi)}, resolve=False)
    full = table.read(resolve=False)
    want = full.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() > 0

    # file-level pruning: only day-1's files enter the scan
    snap = table.snapshot()
    lo_us = int(lo.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    hi_us = int(hi.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    matching = {
        p for p, m in snap.files.items()
        if not (m["stats"]["ts"][1] < lo_us or m["stats"]["ts"][0] > hi_us)
    }
    scanned = {
        os.path.relpath(os.path.realpath(f.replace("file:", "")), table.path)
        for f in got.inputFiles()
    }
    assert scanned == {os.path.normpath(p) for p in matching}
    assert len(scanned) < len(snap.files)

    # open-ended ranges work and stay exact
    tail = table.read(ranges={"ts": (lo, None)}, resolve=False)
    want_tail = full.filter(F.col("ts") >= F.lit(lo))
    assert tail.exceptAll(want_tail).count() == 0
    assert want_tail.exceptAll(tail).count() == 0
    assert len(tail.inputFiles()) < len(snap.files)


def test_range_read_without_stats_cols_is_exact_not_pruned(spark, tmp_path):
    """A table created without stats_cols records no per-column bounds:
    ranges still filters exactly (residual), it just can't skip files."""
    import datetime as dt

    schema_df = spark.range(1).select(
        F.lit(0).cast("long").alias("id"),
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TableSchema.from_struct(schema_df.schema),
        primary_key=[], bucket_cols=["id"], n_buckets=2,
    )
    for day in range(3):
        df = spark.range(day * 100, (day + 1) * 100).select(
            F.col("id"),
            (
                F.lit("2025-01-01 00:00:00").cast("timestamp")
                + F.make_interval(days=F.lit(day))
            ).alias("ts"),
        )
        table.append(df, lsn_col="id")
    lo = dt.datetime(2025, 1, 2)
    got = table.read(ranges={"ts": (lo, lo)}, resolve=False)
    assert got.count() == 100
    # conservative: every file scanned (no bounds recorded)
    assert len(got.inputFiles()) == len(table.snapshot().files)


def test_event_time_stats_survive_checkpoint_and_fresh_handle(spark, tmp_path):
    import datetime as dt

    table, day0 = _mk_timed(spark, str(tmp_path / "t"))
    table._write_checkpoint()
    fresh = LakeTable(spark, table.path)
    snap = fresh.snapshot()
    assert snap.stats_cols == ["ts"]
    assert all(m["stats"].get("ts") for m in snap.files.values())
    lo = day0 + dt.timedelta(days=3)
    got = fresh.read(ranges={"ts": (lo, None)}, resolve=False)
    assert got.count() == 200
    assert len(got.inputFiles()) < len(snap.files)
