"""Multi-stream sync — the platform-sync (EP1) equivalent.

An Airbyte connection replicates N configured streams in one sync
(SyncWorkflowImpl.java:100-165; per-stream state isolation via
StreamStateManager). Spark-first shape: one SparkSession runs N concurrent
StreamingQueries, one per stream, each with its own feed directory, lake
table, checkpoint, and fence namespace (app_id = stream name). The driver
awaits all; a failure in one stream does not corrupt another (states are
fully isolated — per-table commit logs).

Scale: concurrent queries share the executor pool; Spark's scheduler
interleaves their tasks (FAIR scheduling pools can be configured per
stream if one stream must not starve the rest).
"""

from __future__ import annotations

import os
import shutil
from typing import Sequence

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..lake.table import LakeTable
from .runner import ReplayConfig, run_replay_stream


def run_sync(
    spark: SparkSession,
    cfgs: Sequence[ReplayConfig],
    available_now: bool = True,
) -> list[StreamingQuery]:
    """Start one replay stream per config, then await them all (bounded
    sync) or return the running queries (continuous)."""
    queries = [
        run_replay_stream(
            spark, cfg, available_now=available_now, await_termination=False
        )
        for cfg in cfgs
    ]
    if available_now:
        # await EVERY query even when an earlier one fails — per-stream
        # isolation means the healthy streams must finish their bounded
        # sync (their states are independent), and every failure must
        # surface, not just the first in start order
        errors: list[tuple[str, Exception]] = []
        for q in queries:
            try:
                q.awaitTermination()
            except Exception as e:  # StreamingQueryException per stream
                errors.append((q.name, e))
        if errors:
            if len(errors) == 1:
                raise errors[0][1]
            raise RuntimeError(
                f"{len(errors)} streams failed: "
                + ", ".join(f"{n}: {e}" for n, e in errors)
            ) from errors[0][1]
    return queries


def reset_stream(spark: SparkSession, cfg: ReplayConfig) -> dict[str, int]:
    """Airbyte's per-stream "reset" job (reset connection for one stream:
    EmptyAirbyteSource overwrite + state wipe,
    DefaultJobCreator.createResetConnectionJob): wipe the stream's data
    and exactly-once state everywhere it lives, so the next
    ``run_replay_stream(cfg)`` re-bootstraps from the feed's beginning.

    Three independent state surfaces, each cleared:

    1. the main table — one metadata-only ``reset`` commit (all files
       dropped, ``cfg.app_id``'s fence cleared; history/time-travel kept,
       changelog consumers see a truncate boundary);
    2. the SCD history table and every persisted child table, when the
       config maintains them (same per-table reset — each carries its own
       fence for the same app_id);
    3. the Structured-Streaming checkpoint directory, so source offsets
       restart at the feed's first file.

    Returns {table path: reset commit version} for the tables touched.
    Not run while the stream's queries are active — stop them first (the
    same contract as Airbyte, which cancels the sync before resetting)."""
    out: dict[str, int] = {}
    out[cfg.table_path] = LakeTable(spark, cfg.table_path).reset(cfg.app_id)
    if cfg.scd_table_path and LakeTable.exists(cfg.scd_table_path):
        out[cfg.scd_table_path] = LakeTable(spark, cfg.scd_table_path).reset(
            cfg.app_id
        )
    if cfg.child_tables_path and os.path.isdir(cfg.child_tables_path):
        # only THIS stream's child tables: the same schema walk that
        # bootstraps them names them (unnest_children_with_specs), so a
        # base dir shared with another stream's children is never touched
        # — a blanket listdir reset would drop the other stream's data
        # while its fences survive (different app_id), leaving it
        # permanently empty behind fenced no-op batches
        from ..operators.unnest import unnest_children_with_specs
        from ..schemas import CURSOR, PK

        empty = spark.createDataFrame([], cfg.feed_struct)
        _, specs = unnest_children_with_specs(
            empty, PK, cfg.stream_name, carry_cols=[CURSOR]
        )
        for spec in specs:
            path = os.path.join(cfg.child_tables_path, spec["name"])
            if LakeTable.exists(path):
                out[path] = LakeTable(spark, path).reset(cfg.app_id)
    # a failed checkpoint wipe must RAISE: swallowing it leaves a
    # half-reset stream (data + fence wiped, source offsets kept) that
    # silently resumes mid-feed and lands a fraction of the table
    if os.path.isdir(cfg.checkpoint_dir):
        shutil.rmtree(cfg.checkpoint_dir)
    return out
