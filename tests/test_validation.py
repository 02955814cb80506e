"""Per-record schema validation with error accounting (P2 — reference
RecordSchemaValidator / DefaultReplicationWorker.java:549-577)."""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_spark.catalog import TableSchema
from airbyte_spark.lake import LakeTable, merge_batch
from airbyte_spark.schemas import CHANGE_STRUCT, ORDER_COLS, PK, TRANSCRIPT_STRUCT
from airbyte_spark.sources.validation import (
    error_samples,
    validate_json_records,
    validation_counts,
)

SCHEMA = T.StructType([T.StructField("k", T.LongType()), T.StructField("s", T.StringType())])

ROWS = [
    (1, '{"k": 1, "s": "a"}'),
    (2, '{"k": 2}'),            # missing optional field: valid, null-padded
    (3, '{"k": 3, "s": "b"'),   # truncated: malformed
    (4, "not json at all"),     # malformed
    (5, None),                  # null payload: valid (nothing to parse)
] + [(100 + i, "{bad") for i in range(15)]  # bounded-sample fodder


def test_validate_flags_and_counts(spark):
    df = spark.createDataFrame(ROWS, ["id", "payload"])
    v = validate_json_records(df, "payload", SCHEMA)
    rows = {r.id: r for r in v.collect()}
    assert rows[1]._is_valid and rows[1].k == 1 and rows[1].s == "a"
    assert rows[2]._is_valid and rows[2].s is None
    assert not rows[3]._is_valid and rows[3]._corrupt_record == '{"k": 3, "s": "b"'
    assert not rows[4]._is_valid
    assert rows[5]._is_valid  # null payload is absent, not malformed
    c = validation_counts(v).collect()[0]
    assert (c.n_records, c.n_valid, c.n_invalid) == (20, 3, 17)


def test_error_samples_bounded(spark):
    df = spark.createDataFrame(ROWS, ["id", "payload"])
    v = validate_json_records(df, "payload", SCHEMA)
    samples = error_samples(v, n=10)
    assert len(samples) == 10  # 17 invalid, sample capped like the reference log
    assert all(s is not None for s in samples)


def test_invalid_counts_reach_lineage(spark, tmp_path):
    """The sync path quarantines malformed records and records the count in
    the same fenced commit as the data (sync-summary contract)."""
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TableSchema.from_struct(TRANSCRIPT_STRUCT),
        primary_key=list(PK), bucket_cols=["conv_id"], n_buckets=4,
    )
    ts = pd.Timestamp("2025-01-01").to_pydatetime()
    good = [("conv-a", 0, "user", "hello", None, ts, 1, ts, None, ts)]
    batch = spark.createDataFrame(good, schema=CHANGE_STRUCT)
    merge_batch(table, batch, ORDER_COLS, batch_id=0, rows_invalid=17)
    lin = table.lineage_df().toPandas()
    assert lin["rows_invalid"].iloc[0] == 17
    assert table.lineage_totals()["rows_invalid"] == 17


def test_validation_counts_empty_frame_reports_zero(spark):
    """SUM over zero rows is NULL — an empty micro-batch must report
    0/0/0 to the lineage accounting, not None."""
    from airbyte_spark.sources.validation import VALID_COL, validation_counts

    empty = spark.createDataFrame(
        [], T.StructType([T.StructField(VALID_COL, T.BooleanType())])
    )
    (row,) = validation_counts(empty).collect()
    assert (row["n_records"], row["n_valid"], row["n_invalid"]) == (0, 0, 0)
