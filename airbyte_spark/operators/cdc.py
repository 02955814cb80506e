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
from pyspark.sql import types as T


def project_debezium_events(
    env: DataFrame,
    payload_cols: Sequence[str],
    lsn_col: str = "source.lsn",
) -> DataFrame:
    """``env`` has columns: op (c/u/d/r), ts_ms (long, epoch millis),
    before (struct), after (struct), source (struct with lsn and,
    in full Debezium envelopes, ts_ms).

    ``_ab_cdc_updated_at`` prefers ``source.ts_ms`` (the DB TRANSACTION
    time — the reference's DebeziumEventUtils semantics) over the
    envelope-level ``ts_ms`` (connector PROCESSING time): on an
    at-least-once redelivery the stale copy carries a NEWER processing
    time than the fresh event it duplicates, so ordering on it would
    resurrect old data wherever updated_at breaks an LSN tie. Envelopes
    without ``source.ts_ms`` fall back to the envelope time.

    Returns the flat change-record the rest of the engine consumes.
    """
    is_delete = F.col("op") == F.lit("d")
    image = F.when(is_delete, F.col("before")).otherwise(F.col("after"))
    src_type = env.schema["source"].dataType
    if isinstance(src_type, T.StructType) and "ts_ms" in src_type.fieldNames():
        ts = F.timestamp_millis(
            F.coalesce(F.col("source").getField("ts_ms"), F.col("ts_ms"))
        )
    else:
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
