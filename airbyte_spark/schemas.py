"""Canonical schemas for the transcript table and its change feed.

Shapes mandated by BASELINE.json ``input_hint`` plus the CDC metadata columns
the reference injects into every Debezium change event
(DebeziumEventUtils.java:19-21 — ``_ab_cdc_lsn``, ``_ab_cdc_updated_at``,
``_ab_cdc_deleted_at``) and the emit timestamp every Airbyte record carries
(airbyte_protocol.yaml:55-75 — ``emitted_at``).
"""

from __future__ import annotations

from pyspark.sql import types as T

from .catalog import ConfiguredStream, TableSchema

PK = ["conv_id", "turn_idx"]
CURSOR = "_ab_cdc_lsn"

#: Final ("silver") transcript table — exactly the input_hint shape.
TRANSCRIPT_STRUCT = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

#: WAL/binlog change-event row (bronze). One row per change event.
CHANGE_STRUCT = T.StructType(
    list(TRANSCRIPT_STRUCT.fields)
    + [
        T.StructField("_ab_cdc_lsn", T.LongType(), False),
        T.StructField("_ab_cdc_updated_at", T.TimestampType(), True),
        T.StructField("_ab_cdc_deleted_at", T.TimestampType(), True),
        T.StructField("_airbyte_emitted_at", T.TimestampType(), True),
    ]
)

#: Epoch-2 evolved change schema (FIXTURES.md F4/E2): adds tool_version.
CHANGE_STRUCT_V2 = T.StructType(
    list(CHANGE_STRUCT.fields[:5])
    + [T.StructField("tool_version", T.StringType(), True)]
    + list(CHANGE_STRUCT.fields[5:])
)

#: Payload (non-metadata) columns of the change feed.
PAYLOAD_COLS = [f.name for f in TRANSCRIPT_STRUCT.fields]

#: CDC/delivery metadata columns a change feed carries on top of payload.
CHANGE_META_COLS = [
    "_ab_cdc_lsn",
    "_ab_cdc_updated_at",
    "_ab_cdc_deleted_at",
    "_airbyte_emitted_at",
]

#: CDC ordering spec, widest first — the reference's SCD window ordering
#: (stream_processor.py:876-891): cursor desc, cdc_updated desc, emitted desc.
ORDER_COLS = ["_ab_cdc_lsn", "_ab_cdc_updated_at", "_airbyte_emitted_at"]


def transcripts_stream() -> ConfiguredStream:
    return ConfiguredStream(
        name="transcripts",
        schema=TableSchema.from_struct(TRANSCRIPT_STRUCT),
        primary_key=list(PK),
        cursor_field=CURSOR,
        sync_mode="incremental",
        destination_sync_mode="append_dedup",
    )
