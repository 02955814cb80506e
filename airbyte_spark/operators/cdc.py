"""CDC change-event projection (S6) — Debezium envelope -> flat record.

Reference: DebeziumEventUtils.java:23-66 — take ``after`` (or ``before`` for
deletes), inject ``_ab_cdc_updated_at`` = source ts_ms, ``_ab_cdc_deleted_at``
= ts_ms when op = delete else null, plus the source LSN
(PostgresCdcConnectorMetadataInjector.java:15-24).

Pure column expressions — whole-stage-codegen friendly, no Python.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def project_debezium_events(
    env: DataFrame,
    payload_cols: Sequence[str],
    lsn_col: str = "source.lsn",
) -> DataFrame:
    """``env`` has columns: op (c/u/d/r), ts_ms (long, epoch millis),
    before (struct), after (struct), source (struct with lsn).

    Returns the flat change-record the rest of the engine consumes.
    """
    is_delete = F.col("op") == F.lit("d")
    image = F.when(is_delete, F.col("before")).otherwise(F.col("after"))
    ts = F.timestamp_millis(F.col("ts_ms"))
    proj = env.select(
        *[image.getField(c).alias(c) for c in payload_cols],
        F.col(lsn_col).cast("long").alias("_ab_cdc_lsn"),
        ts.alias("_ab_cdc_updated_at"),
        F.when(is_delete, ts).otherwise(F.lit(None).cast("timestamp")).alias(
            "_ab_cdc_deleted_at"
        ),
        F.current_timestamp().alias("_airbyte_emitted_at"),
    )
    return proj
