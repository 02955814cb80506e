"""S9 — declarative (low-code) source primitives, Spark-first.

The reference's declarative CDK composes three pieces per stream
(airbyte-cdk/.../declarative/): a dpath record extractor
(extractors/dpath_extractor.py:19-76), an interpolated record filter
(record_filter.py:14-41), and stream slicers (datetime / list / substream,
stream_slicers/datetime_stream_slicer.py:23). Row-at-a-time Python there;
here each is a pure Catalyst expression:

* extractor  -> ``get_json_object`` / ``from_json`` column projections
* filter     -> ``df.filter(F.expr(...))`` (SQL predicate instead of jinja)
* slicer     -> a partition expression (e.g. date_trunc) used as a group
               or predicate; slices are partitions of one DataFrame, not a
               driver-side loop of requests

All three push down / fuse into the scan under whole-stage codegen.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def extract_json_fields(
    df: DataFrame,
    json_col: str,
    field_paths: dict[str, str],
    types: Optional[dict[str, str]] = None,
    keep: Optional[Sequence[str]] = None,
) -> DataFrame:
    """dpath-style extraction: {out_name: '$.path'} -> typed columns."""
    types = types or {}
    # `keep is None` (not falsy): keep=[] legitimately means "project only
    # the extracted fields"
    cols = [F.col(c) for c in (df.columns if keep is None else keep)]
    for name, path in field_paths.items():
        c = F.get_json_object(F.col(json_col), path)
        if name in types:
            c = c.cast(types[name])
        cols.append(c.alias(name))
    return df.select(*cols)


def record_filter(df: DataFrame, predicate: str) -> DataFrame:
    """Declarative record filter: a SQL boolean expression (the reference
    interpolates jinja into Python; we hand Catalyst a predicate it can
    push into the scan)."""
    return df.filter(F.expr(predicate))


def datetime_slice_col(ts_col: Column, granularity: str = "day") -> Column:
    """Datetime stream slicer as a partition expression.

    Sub-day granularities keep their time component (a to_date wrap would
    collapse all 24 hourly slices of a day into one label); day-or-coarser
    label as DATE. Labels follow the column's own wall clock — tz-proof
    for NTZ columns (the feed contract); for LTZ columns calendar
    bucketing is session-timezone-relative by Spark's date_trunc
    semantics, so pin the session tz for replay-stable LTZ slicing."""
    t = F.date_trunc(granularity, ts_col)
    if granularity.lower() in ("day", "week", "month", "quarter", "year"):
        return F.to_date(t)
    return t


def list_sliced_read(
    df: DataFrame,
    slice_col: str,
    values: Sequence,
    slice_alias: str = "slice_value",
) -> DataFrame:
    """List stream slicer (reference
    stream_slicers/list_stream_slicer.py): each configured value is one
    slice. Spark-first: ONE DataFrame with a pushable IN-predicate plus
    the slice column — the slices are partitions of the scan (the
    IN-filter reaches the parquet reader as PushedFilters), not a
    driver-side loop of per-value requests."""
    out = df.filter(F.col(slice_col).isin(list(values)))
    return out.withColumn(slice_alias, F.col(slice_col))


def substream_sliced_read(
    child: DataFrame,
    parent: DataFrame,
    parent_key: str,
    child_key: str,
    slice_alias: str = "parent_slice",
    broadcast_keys: bool = True,
) -> DataFrame:
    """Substream slicer (reference stream_slicers/substream_slicer.py):
    slices are derived from PARENT records — the CDK loops parent records
    and issues one child read per parent id. Spark-first: equi-join the
    child against the distinct parent keys in one pass; with
    ``broadcast_keys`` (the common case: parents ≪ children) the join is
    a broadcast hash join, so the child side stays a map-only scan with
    no shuffle. Set it False when the parent key set itself is huge."""
    keys = parent.select(F.col(parent_key).alias("__pkey")).distinct()
    if broadcast_keys:
        keys = F.broadcast(keys)
    out = child.join(keys, F.col(child_key) == F.col("__pkey"), "inner")
    return out.withColumn(slice_alias, F.col("__pkey")).drop("__pkey")


def sliced_read(
    df: DataFrame,
    ts_col: str,
    start: Optional[str] = None,
    end: Optional[str] = None,
    granularity: str = "day",
    slice_alias: str = "slice_start",
) -> DataFrame:
    """Bounded datetime-sliced scan: one DataFrame with a slice column —
    the distributed analog of the CDK's slice loop (each slice is a
    partition predicate, prunable at the parquet level)."""
    out = df
    # cast bounds to the column's own type (timestamp vs timestamp_ntz) so
    # a non-UTC session timezone can't shift the slice boundaries
    ts_type = df.schema[ts_col].dataType.simpleString()
    if start is not None:
        out = out.filter(F.col(ts_col) >= F.lit(start).cast(ts_type))
    if end is not None:
        out = out.filter(F.col(ts_col) < F.lit(end).cast(ts_type))
    return out.withColumn(slice_alias, datetime_slice_col(F.col(ts_col), granularity))
