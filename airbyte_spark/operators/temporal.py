"""Temporal AS-OF join: resolve each probe row against the SCD2-history
version active at the probe's cursor position.

The reference materializes Type-2 history and leaves point-in-time reads
to the warehouse (dbt models filter `start <= t < end`, e.g. the
scd-table consumers of base-normalization's stream_processor.py output).
Here the lookup is a first-class operator with two physical shapes:

* ``asof_join`` — MERGE shape (default): union probes with version rows,
  ONE shuffle on the key, and a running ``last(version, ignorenulls)``
  window carries each version forward to the probes after it. No per-key
  fanout: a key with 10^6 versions and 10^6 probes costs O(n log n) in
  one partition-local sort, never the 10^12-row intermediate of a naive
  equi-join + range filter. This is the 100 TB path (same shape as
  pandas merge_asof / Flink temporal join).
* ``asof_lookup`` — equi-join + range-filter shape: right for SMALL
  history dims where the join broadcasts and per-key version counts are
  tiny; the plan is a BroadcastHashJoin with the non-equi bounds as a
  post-filter. Versions are non-overlapping so each probe matches ≤ 1.

Tie rule (both shapes): a probe AT a version's start cursor sees that
version (inclusive start, exclusive end — SCD2 interval semantics).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PAYLOAD = "__asof_payload"
_KIND = "__asof_is_probe"


def asof_join(
    probes: DataFrame,
    history: DataFrame,
    keys: Sequence[str],
    probe_cursor: str,
    version_cursor: str,
    payload_cols: Optional[Sequence[str]] = None,
    how: str = "inner",
    deleted_col: Optional[str] = None,
) -> DataFrame:
    """Merge-shape as-of join (see module docstring).

    Returns one row per probe: all probe columns + each payload column
    from the version whose ``version_cursor`` is the greatest value
    ``<= probe[probe_cursor]``. Probes before a key's first version get
    NULL payload (and are dropped when ``how='inner'``).

    Payload columns are packed into ONE struct so the running
    ``last(_, ignorenulls=True)`` cannot mix fields across versions when
    a payload field is legitimately NULL inside a version.

    CDC delete semantics: when ``deleted_col`` names a history column, a
    version whose flag is set is a TOMBSTONE — a probe resolving to it
    sees "key absent at that cursor" (dropped on ``inner``, NULL payload
    on ``left``), while probes before the delete still see live state.
    The tombstone must stay IN the merge (not be pre-filtered), else
    post-delete probes would wrongly resurrect the prior version."""
    keys = list(keys)
    if payload_cols is None:
        payload_cols = [
            c for c in history.columns if c not in keys and c != version_cursor
        ]
    payload_cols = list(payload_cols)
    if deleted_col is not None and deleted_col not in payload_cols:
        payload_cols.append(deleted_col)

    h = history.select(
        *keys,
        F.col(version_cursor).alias("_asof_c"),
        F.struct(
            F.col(version_cursor).alias(version_cursor),
            *[F.col(c) for c in payload_cols],
        ).alias(_PAYLOAD),
        F.lit(0).alias(_KIND),
    )
    p = probes.select(
        "*",
        F.col(probe_cursor).alias("_asof_c"),
        F.lit(None).cast(h.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        F.lit(1).alias(_KIND),
    )
    u = p.unionByName(h, allowMissingColumns=True)
    # versions sort before probes at the same cursor (inclusive start)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_asof_c", _KIND)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    resolved = u.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
    out = resolved.filter(F.col(_KIND) == 1)
    if deleted_col is not None:
        # a resolved tombstone means "absent at this cursor"; the flag is
        # a boolean (true = deleted) or the _ab_cdc_deleted_at convention
        # (non-null timestamp = deleted)
        from pyspark.sql.types import BooleanType

        d = F.col(f"{_PAYLOAD}.{deleted_col}")
        d_type = history.schema[deleted_col].dataType
        is_del = (
            F.coalesce(d, F.lit(False))
            if isinstance(d_type, BooleanType)
            else d.isNotNull()
        )
        out = out.withColumn(
            _PAYLOAD,
            F.when(
                is_del, F.lit(None).cast(out.schema[_PAYLOAD].dataType)
            ).otherwise(F.col(_PAYLOAD)),
        )
    if how == "inner":
        out = out.filter(F.col(_PAYLOAD).isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    # any payload name colliding with a probe column gets the version_
    # prefix (same rule as asof_lookup) — emitting two identically-named
    # columns would make every downstream select/filter ambiguous
    def _alias(c: str) -> str:
        return f"version_{c}" if c in probes.columns else c

    return out.select(
        *probes.columns,
        F.col(f"{_PAYLOAD}.{version_cursor}").alias(_alias(version_cursor)),
        *[F.col(f"{_PAYLOAD}.{c}").alias(_alias(c)) for c in payload_cols],
    )


def asof_lookup(
    probes: DataFrame,
    history: DataFrame,
    keys: Sequence[str],
    probe_cursor: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Equi-join + range-filter as-of lookup (INNER semantics) against an
    SCD2 history with explicit ``[start_col, end_col)`` version bounds
    (NULL end = active). Broadcast-friendly; per-probe match is unique
    because versions are non-overlapping. Prefer ``asof_join`` when the
    history is large or keys are hot (no fanout; and it offers 'left')."""
    keys = list(keys)
    renames = {
        c: f"version_{c}"
        for c in history.columns
        if c not in keys and c in probes.columns
    }
    h = history
    for old, new in renames.items():
        h = h.withColumnRenamed(old, new)
    start = renames.get(start_col, start_col)
    end = renames.get(end_col, end_col)
    return probes.join(h, on=keys, how="inner").filter(
        (F.col(start) <= F.col(probe_cursor))
        & (F.col(end).isNull() | (F.col(end) > F.col(probe_cursor)))
    )
