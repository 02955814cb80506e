"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the engine's extension point for operators Spark doesn't ship:
per-conversation progress tracking (event count, LSN high-watermark, delete
count) maintained as typed per-key state across micro-batches — the
Structured Streaming analog of the reference's per-stream CursorManager
(source-relational-db/.../state/CursorManager.java) that tracks
``currentMaxCursor`` + record counts per stream.

Arrow-batched: the callback sees pandas DataFrames per key group, never
single rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "conv_id string, n_events bigint, max_lsn bigint, n_deletes bigint"
STATE_SCHEMA = "n bigint, mx bigint, nd bigint"


def _track(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, mx, nd = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            # all-null LSN batches (snapshot records without CDC metadata)
            # arrive as float NaN through Arrow — int(NaN) would kill the
            # query; the watermark simply doesn't advance for them
            m = pdf["_ab_cdc_lsn"].max()
            if pd.notna(m):
                mx = max(mx, int(m))
            nd += int(pdf["_ab_cdc_deleted_at"].notna().sum())
    state.update((n, mx, nd))
    yield pd.DataFrame(
        {"conv_id": [key[0]], "n_events": [n], "max_lsn": [mx], "n_deletes": [nd]}
    )


def conversation_progress(stream: DataFrame) -> DataFrame:
    """Per-conversation running progress over a change-event stream.

    Scale shape: state is 3 longs per conv_id, hash-partitioned by key —
    10^8 conversations is a few GB of state store spread across executors;
    RocksDB state store handles spill beyond memory.
    """
    return (
        stream.groupBy("conv_id")
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
