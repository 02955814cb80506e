"""Per-record schema validation with error accounting (P2).

The reference validates every record against the stream's JSON schema and
keeps a bounded per-stream error sample: counts are tracked for the sync
summary and at most 10 distinct validation errors are logged per stream
(DefaultReplicationWorker.java:549-577, RecordSchemaValidator.java). The
repo's previous behavior — silently casting/null-padding — loses exactly
that signal: a malformed feed looked like a clean feed full of nulls.

Spark-first shape: ``from_json`` in PERMISSIVE mode with a
``columnNameOfCorruptRecord`` capture column. The parse, the validity flag
and the counts are all JVM-side column expressions (one pass, no Python);
the ≤N error sample is a bounded ``limit(n).collect()`` — the only
driver-side piece, same bound as the reference's log cap.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"
VALID_COL = "_is_valid"


def validate_json_records(
    df: DataFrame,
    json_col: str,
    schema: T.StructType,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Parse ``json_col`` against ``schema`` keeping malformed payloads.

    Adds one column per schema field (null-padded on failure), plus
    ``corrupt_col`` holding the raw payload of malformed records (null for
    clean ones) and ``_is_valid``. Rows are never dropped — the caller
    decides whether to quarantine or null-pad, with exact counts either
    way."""
    full = T.StructType(list(schema.fields) + [T.StructField(corrupt_col, T.StringType())])
    parsed = df.withColumn(
        "_p",
        F.from_json(
            F.col(json_col),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ),
    )
    bad = F.col(f"_p.{corrupt_col}").isNotNull() | (
        F.col(json_col).isNotNull() & F.col("_p").isNull()
    )
    out = parsed
    for fs in schema.fields:
        out = out.withColumn(fs.name, F.col(f"_p.{fs.name}"))
    return (
        out.withColumn(corrupt_col, F.when(bad, F.col(json_col)))
        .withColumn(VALID_COL, ~bad)
        .drop("_p")
    )


def validation_counts(
    validated: DataFrame, group_cols: Optional[Sequence[str]] = None
) -> DataFrame:
    """(n_records, n_valid, n_invalid) overall or per group — feeds the
    sync-summary / lineage `rows_invalid` accounting."""
    aggs = [
        F.count("*").cast("long").alias("n_records"),
        # coalesce: SUM over zero rows is NULL — an empty micro-batch must
        # report 0, not None, to the lineage accounting
        F.coalesce(F.sum(F.col(VALID_COL).cast("long")), F.lit(0))
        .alias("n_valid"),
        F.coalesce(F.sum((~F.col(VALID_COL)).cast("long")), F.lit(0))
        .alias("n_invalid"),
    ]
    if group_cols:
        return validated.groupBy(*group_cols).agg(*aggs)
    return validated.agg(*aggs)


def error_samples(validated: DataFrame, n: int = 10) -> list[str]:
    """At most ``n`` malformed raw payloads — the bounded per-stream error
    sample the reference logs (never an unbounded collect)."""
    return [
        r[CORRUPT_COL]
        for r in validated.filter(~F.col(VALID_COL))
        .select(CORRUPT_COL)
        .limit(n)
        .collect()
    ]
