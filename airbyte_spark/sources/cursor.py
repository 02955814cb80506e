"""Source-side scans: full refresh, incremental cursor, tie probe.

Reference semantics:
* S1 full refresh — AbstractDbSource.getFullRefreshStream
  (AbstractDbSource.java:471-481): plain table scan of selected columns.
* S2 incremental cursor scan — AbstractJdbcSource.java:334-386: ``WHERE
  cursor > state`` normally, ``>=`` when a tie-replay is possible (the stored
  per-cursor record count mismatches), relying on downstream dedup to absorb
  replays.
* S3 tie probe — AbstractJdbcSource.java:406-431: ``COUNT(*) WHERE cursor = state``.

Spark-first: these are pure DataFrame filters, so Catalyst pushes the cursor
predicate into the parquet scan (PushedFilters) and prunes columns — the
same physical effect as the reference's hand-built SQL, for free.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def full_refresh_scan(df: DataFrame, columns: Optional[Sequence[str]] = None) -> DataFrame:
    return df.select(*columns) if columns else df


def incremental_cursor_scan(
    df: DataFrame,
    cursor: str,
    state,
    tie_safe: bool = False,
    columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Rows past the cursor high-watermark. ``tie_safe=True`` re-reads the
    boundary value (>=) — safe because the sink MERGE is idempotent on
    (pk, lsn), the Spark analog of the reference's count-probe heuristic."""
    if state is None:
        out = df
    else:
        pred = F.col(cursor) >= F.lit(state) if tie_safe else F.col(cursor) > F.lit(state)
        out = df.filter(pred)
    return out.select(*columns) if columns else out


def cursor_tie_count(df: DataFrame, cursor: str, state) -> int:
    return df.filter(F.col(cursor) == F.lit(state)).count()
