"""Incremental SCD Type-2 history maintenance — the streaming ``<stream>_scd``
table (D2/D6 in streaming form).

The reference maintains the SCD table incrementally: each run unions the
new data with the re-opened rows of affected keys and re-runs the dedup/
window CTE over that union (stream_processor.py:892-942), so history rows
get their ``_airbyte_end_at`` closed and ``_airbyte_active_row`` moved
without rewriting unaffected keys. This module is the Spark-first
equivalent at bucket granularity:

per micro-batch (fenced, same contract as ``merge_batch``):
1. collapse the at-least-once batch to distinct (pk, cursor) versions
   (``salted_scd2_input`` — hash agg, map-side combine);
2. compute the touched buckets from the batch keys (≤ n_buckets);
3. read ONLY those buckets' existing history rows, union with the new
   versions, drop cross-batch duplicate versions;
4. re-run the SCD2 window over the union (bounded to touched buckets —
   O(touched history), the same asymptotics as the COW upsert) and
   rewrite those buckets in one fenced commit.

The result is byte-equal to running batch ``scd2()`` over the whole feed
(tests assert exceptAll == 0 both ways, including the late-event fixture:
a late lower-LSN version lands as a CLOSED history row — it cannot become
active, matching the reference's ordering semantics).

The SCD table is a second LakeTable next to the SCD1 latest-state table;
each table carries its own fence for the same (app_id, batch_id), so a
crash between the two commits re-delivers the batch and whichever table
already committed skips it (exactly-once per table).

Schema evolution: the history table evolves like any LakeTable — apply the
same catalog diff via ``LakeTable.evolve`` on BOTH tables (the conform step
here null-pads rows written before the evolve, identical to the main
table's star_intersect behavior).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import TableSchema
from ..operators.dedup import scd2, scd2_bounded
from ..operators.skew import salted_scd2_input
from .table import LakeTable, META_DELETED, META_LSN, Snapshot

#: columns computed by the SCD window — everything else is carried state
SCD_OUT_COLS = [
    "_airbyte_unique_key",
    "_airbyte_start_at",
    "_airbyte_end_at",
    "_airbyte_active_row",
]


def scd_struct(change_struct: T.StructType) -> T.StructType:
    """History-table schema: every change-feed column (each version row
    keeps its CDC metadata so the window can re-run) + the SCD columns."""
    return T.StructType(
        list(change_struct.fields)
        + [
            T.StructField("_airbyte_unique_key", T.StringType(), True),
            T.StructField("_airbyte_start_at", T.LongType(), True),
            T.StructField("_airbyte_end_at", T.LongType(), True),
            T.StructField("_airbyte_active_row", T.IntegerType(), True),
        ]
    )


def bootstrap_scd_table(
    spark: SparkSession,
    path: str,
    change_struct: T.StructType,
    pk: Sequence[str],
    cursor: str = "_ab_cdc_lsn",
    bucket_cols: Optional[Sequence[str]] = None,
    n_buckets: int = 32,
) -> LakeTable:
    """Create (or open) the ``<stream>_scd`` table: one row per (pk,
    cursor) version, bucketed like the main table so both upserts prune
    the same way."""
    if LakeTable.exists(path):
        return LakeTable(spark, path)
    return LakeTable.create(
        spark,
        path,
        TableSchema.from_struct(scd_struct(change_struct)),
        primary_key=[*pk, cursor],
        bucket_cols=list(bucket_cols or pk[:1]),
        n_buckets=n_buckets,
    )


@dataclass
class ScdMergeStats:
    skipped: bool
    version: Optional[int] = None
    rows_in: int = 0
    touched_buckets: int = 0


def scd_merge_batch(
    table: LakeTable,
    batch: DataFrame,
    pk: Sequence[str],
    cursor: str = "_ab_cdc_lsn",
    app_id: str = "default",
    batch_id: int = 0,
    epoch: Optional[int] = None,
    post_dedup=None,
    bounded: bool = False,
) -> ScdMergeStats:
    """Apply one micro-batch to the SCD history table (fenced).

    ``post_dedup`` runs expensive per-row transforms (pandas-UDF
    canonicalization) AFTER the version collapse — |versions| rows, not
    |events| — and only on NEW rows (existing history was canonicalized
    when first written). ``bounded=True`` swaps the window for
    ``scd2_bounded`` (range-bucketed sorts) when single keys accumulate
    unbounded version counts."""
    snap = table.snapshot()
    last = snap.fences.get(app_id)
    if last is not None and batch_id <= last:
        return ScdMergeStats(skipped=True)

    new = salted_scd2_input(batch, pk, cursor)
    if post_dedup is not None:
        new = post_dedup(new)
    new = new.withColumn("_b", table.bucket_expr(snap)).persist()
    try:
        stats_rows = (
            new.groupBy("_b")
            .agg(F.count("*").alias("n"), F.max(F.col(cursor).cast("long")).alias("mx"))
            .collect()
        )
        rows_in = sum(r["n"] for r in stats_rows)
        if rows_in == 0:
            version = table.commit(
                snap, [], [], fence=(app_id, batch_id),
                lineage=_scd_lineage(app_id, batch_id, 0, None, epoch), op="scd_merge",
            )
            return ScdMergeStats(skipped=False, version=version, rows_in=0)
        per_bucket = {
            int(r["_b"]): {"rows": r["n"], "max_lsn": r["mx"]} for r in stats_rows
        }
        touched = list(per_bucket)
        old_files = [p for p, m in snap.files.items() if m["bucket"] in set(touched)]

        # carried state for touched buckets only: strip the SCD columns,
        # they are recomputed over the union
        existing = table.read(
            buckets=touched, include_meta=False, include_deleted=True, snap=snap
        ).drop(*SCD_OUT_COLS)
        core_cols = existing.columns
        # cross-batch re-delivery of an already-written version collapses
        # with the SAME deterministic winner rule as the intra-batch
        # collapse, so streaming and batch builds stay byte-equal even when
        # duplicate copies differ in delivery metadata
        unioned = salted_scd2_input(
            existing.unionByName(new.select(*core_cols)), pk, cursor
        )
        window = scd2_bounded if bounded else scd2
        hist = window(unioned, pk, cursor)

        schema_cols = []
        for fs in snap.schema.fields:
            if fs.name in hist.columns:
                schema_cols.append(F.col(fs.name).cast(fs.dtype).alias(fs.name))
            else:
                schema_cols.append(F.lit(None).cast(fs.dtype).alias(fs.name))
        rows = hist.select(
            *schema_cols,
            F.col(cursor).cast("long").alias(META_LSN),
            F.lit(False).alias(META_DELETED),
        ).withColumn("_b", table.bucket_expr(snap))

        _lsns = [v["max_lsn"] for v in per_bucket.values() if v["max_lsn"] is not None]
        lineage = _scd_lineage(
            app_id, batch_id, rows_in, max(_lsns) if _lsns else None, epoch
        )
        lineage["partitions"] = {
            b: {"rows": v["rows"], "max_lsn": v["max_lsn"], "deletes": 0}
            for b, v in per_bucket.items()
        }
        adds, total = table.write_data_files(
            snap, rows, n_out_partitions=len(touched)
        )
        lineage["rows_upserted"] = total
        version = table.commit(
            snap, adds, old_files, fence=(app_id, batch_id), lineage=lineage,
            op="scd_merge",
        )
        return ScdMergeStats(
            skipped=False, version=version, rows_in=rows_in,
            touched_buckets=len(touched),
        )
    finally:
        new.unpersist()


def _scd_lineage(app_id, batch_id, rows_in, max_lsn, epoch):
    return {
        "app_id": app_id,
        "batch_id": batch_id,
        "rows_in": rows_in,
        "rows_upserted": rows_in,
        "rows_deleted": 0,
        "max_lsn": max_lsn,
        "epoch": epoch,
    }
