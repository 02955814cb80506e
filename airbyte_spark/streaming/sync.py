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

from typing import Sequence

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

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
