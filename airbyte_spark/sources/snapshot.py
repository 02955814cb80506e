"""Chunked, resumable initial snapshot interleaved with the CDC tail.

The reference composes the initial CDC load as "snapshot iterator, then the
WAL iterator" (PostgresSource.java:377-381 concatWithEagerClose of the
Debezium ``snapshot.mode=initial_only`` pass, PostgresCdcProperties.java:114,
with the incremental iterator; chunked fetch sizing in
airbyte-db/db-lib AdaptiveStreamingQueryConfig.java; checkpointed
source reads in airbyte-cdk core.py:195 ``state_checkpoint_interval``).
That snapshot is NOT resumable mid-table: a crash during the initial load
restarts it from row zero, and the WAL is blocked behind it.

This module is the Spark-first version of the watermark-based chunked
snapshot (Debezium "incremental snapshots"; DBLog, Andreadis et al. 2020,
arXiv:2010.12597): the source table is split into primary-key-range chunks,
each chunk is applied through the SAME fenced LSN-resolving merge as the
live tail, and chunks interleave freely with WAL micro-batches.

The key reduction — why no DBLog window/buffer protocol is needed here:
DBLog dedups chunk rows against change events captured between the chunk's
low and high watermarks. Under an upsert sink that already resolves by LSN
(``merge_batch``: source wins only if strictly newer), it is sufficient to
stamp every chunk row with the chunk's LOW WATERMARK — the source LSN at
(or before) the moment the chunk was read:

* a WAL event with lsn > low_watermark always beats the chunk row, whether
  it arrives before or after the chunk (late chunk rows cannot clobber
  newer tail state — the merge keeps the strictly-newest version);
* a chunk row reflecting state newer than some already-applied event is
  re-applied idempotently when that event's lsn <= low_watermark;
* deletes during the snapshot window arrive as WAL tombstones with
  lsn > low_watermark and win over any chunk row.

So snapshot ∪ tail converges to the exact source state in ANY interleaving
— which is what makes per-chunk resume safe: each chunk is one fenced
merge commit (app_id = the plan's, batch_id = chunk index); a crash and
restart re-runs the loop and every completed chunk short-circuits on its
fence before any compute happens.

Scale shape: chunk planning is ONE count + ONE bounded sample (the same
sample-based range boundary estimation Spark's RangePartitioner uses);
each chunk read pushes ``lo <= chunk_col < hi`` into the source scan
(JDBC: a WHERE on the indexed pk, the reference's chunked-query shape;
parquet: row-group/file stats pruning when the source clusters by the
key). For file sources that are NOT clustered by the chunk column, pass
``staging_dir`` to ``stage_chunks``: one range-repartition pass writes the
source partitioned by chunk id, after which every chunk read is a
directory-pruned O(chunk) scan instead of a full-source scan per chunk.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake.merge import merge_batch
from ..lake.table import LakeTable
from ..schemas import CHANGE_META_COLS, ORDER_COLS


@dataclass
class SnapshotPlan:
    """Persisted chunk plan — the Debezium incremental-snapshot offset
    analog. Boundaries are half-open upper bounds on ``chunk_col``:
    chunk 0 = (-inf, b0) (+ NULL keys), chunk i = [b_{i-1}, b_i),
    chunk n-1 = [b_{n-2}, +inf). Persist with ``save`` so a restarted
    job re-reads the SAME ranges (the sample is seeded but the source
    may have grown — resume must not re-plan)."""

    chunk_col: str
    boundaries: list
    low_watermark: int
    app_id: str = "snapshot"
    staging_dir: Optional[str] = None
    meta: dict = field(default_factory=dict)

    @property
    def n_chunks(self) -> int:
        return len(self.boundaries) + 1

    def save(self, path: str) -> None:
        parent = os.path.dirname(os.path.abspath(path))
        os.makedirs(parent, exist_ok=True)  # CLI saves before the ckpt dir exists
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "chunk_col": self.chunk_col,
                    "boundaries": self.boundaries,
                    "low_watermark": self.low_watermark,
                    "app_id": self.app_id,
                    "staging_dir": self.staging_dir,
                    "meta": self.meta,
                },
                f,
            )
        os.replace(tmp, path)  # atomic: a torn plan file is never visible

    @staticmethod
    def load(path: str) -> "SnapshotPlan":
        with open(path) as f:
            d = json.load(f)
        return SnapshotPlan(**d)


def plan_snapshot(
    source: DataFrame,
    chunk_col: str,
    *,
    low_watermark: int,
    rows_per_chunk: int = 1 << 20,
    app_id: str = "snapshot",
    seed: int = 7,
    oversample: int = 64,
) -> SnapshotPlan:
    """Compute chunk boundaries from a seeded sample (one count + one
    bounded-size sample job — RangePartitioner-style estimation, never a
    global sort). ``chunk_col`` must be string/numeric (JSON-persistable)
    and should be the leading pk / an indexed column on JDBC sources.
    Driver memory is O(n_chunks * oversample) sampled values."""
    n = source.count()
    n_chunks = max(1, math.ceil(n / rows_per_chunk))
    boundaries: list = []
    if n_chunks > 1:
        frac = min(1.0, (n_chunks * oversample) / n)
        vals = sorted(
            r[0]
            for r in source.select(chunk_col).sample(False, frac, seed).collect()
            if r[0] is not None
        )
        if vals:
            step = len(vals) / n_chunks
            # distinct boundaries only: heavy duplicate keys collapse
            # adjacent cut points — a chunk is then larger, never wrong
            boundaries = sorted({vals[int(i * step)] for i in range(1, n_chunks)})
    return SnapshotPlan(
        chunk_col=chunk_col,
        boundaries=boundaries,
        low_watermark=low_watermark,
        app_id=app_id,
        meta={"source_rows": n, "rows_per_chunk": rows_per_chunk},
    )


def chunk_predicate(plan: SnapshotPlan, i: int):
    """Pushable range predicate selecting chunk ``i``'s rows."""
    c = F.col(plan.chunk_col)
    lo = plan.boundaries[i - 1] if i > 0 else None
    hi = plan.boundaries[i] if i < len(plan.boundaries) else None
    pred = F.lit(True)
    if lo is not None:
        pred = c >= F.lit(lo)
    if hi is not None:
        pred = pred & (c < F.lit(hi))
    if lo is None:
        pred = pred | c.isNull()  # NULL keys ride in the first chunk
    return pred


def stage_chunks(source: DataFrame, plan: SnapshotPlan, staging_dir: str) -> None:
    """Optional ONE-PASS staging for file sources not clustered by the
    chunk column: write the source partitioned by chunk id so each chunk
    read prunes to its own directory (O(chunk), not O(source) per chunk).
    Idempotent: a crash mid-staging re-runs the overwrite; the _DONE
    marker gates chunk reads. The staged copy is immutable — exactly the
    consistent-snapshot-at-low-watermark the stamping contract wants."""
    done = os.path.join(staging_dir, "_DONE")
    if os.path.exists(done):
        plan.staging_dir = staging_dir
        return
    expr = F.lit(len(plan.boundaries))  # last chunk
    for i in range(len(plan.boundaries) - 1, -1, -1):
        expr = F.when(
            F.col(plan.chunk_col) < F.lit(plan.boundaries[i]), F.lit(i)
        ).otherwise(expr)
    if plan.boundaries:
        expr = F.when(F.col(plan.chunk_col).isNull(), F.lit(0)).otherwise(expr)
    (
        source.withColumn("_chunk", expr)
        .repartition("_chunk")
        .write.mode("overwrite")
        .partitionBy("_chunk")
        .parquet(staging_dir)
    )
    with open(done, "w") as f:
        f.write("ok")
    plan.staging_dir = staging_dir


def read_chunk(
    spark: SparkSession, source: Optional[DataFrame], plan: SnapshotPlan, i: int
) -> DataFrame:
    """Chunk ``i``'s source rows — directory-pruned from staging when
    staged, else a range-filtered read of ``source``."""
    if plan.staging_dir is not None:
        df = spark.read.parquet(plan.staging_dir).filter(F.col("_chunk") == i)
        return df.drop("_chunk")
    if source is None:
        raise ValueError("un-staged plan needs the source DataFrame")
    return source.filter(chunk_predicate(plan, i))


def stamp_chunk(
    df: DataFrame,
    plan: SnapshotPlan,
    cursor: str = "_ab_cdc_lsn",
    deleted_col: str = "_ab_cdc_deleted_at",
    order_cols: Sequence[str] = tuple(ORDER_COLS),
) -> DataFrame:
    """Turn plain source rows into change events carrying the snapshot
    low-watermark (Debezium stamps snapshot records with the source LSN the
    same way, DebeziumEventUtils.java:19-21 metadata) — the whole dedup
    protocol under an LSN-resolving sink."""
    out = df.withColumn(cursor, F.lit(plan.low_watermark).cast("long"))
    for c in [deleted_col, *order_cols]:
        if c != cursor and c not in out.columns:
            out = out.withColumn(c, F.lit(None).cast("timestamp"))
    return out


@dataclass
class SnapshotStats:
    chunks_total: int
    chunks_run: int
    chunks_skipped: int
    done: bool


def pending_chunks(
    table: LakeTable,
    plan: SnapshotPlan,
    secondary: Sequence[LakeTable] = (),
) -> list[int]:
    """Chunk ids not yet fenced into EVERY table the drain writes (resume
    point). Chunks commit in index order, so each table's fence value is
    its high-watermark — the resume point is the MINIMUM across the main
    table and every ``secondary`` table (SCD history, child tables, dedup
    index/flags): the per-table commits of one chunk are not atomic as a
    group, so a crash can leave the main fence ahead of a secondary's.
    Re-running a chunk already applied to some tables is safe — every
    sub-merge fence-skips idempotently before any compute."""
    fences = [table.snapshot().fences.get(plan.app_id)]
    for t in secondary:
        fences.append(t.snapshot().fences.get(plan.app_id))
    last = min(-1 if f is None else f for f in fences)
    return list(range(last + 1, plan.n_chunks))


def run_snapshot(
    table: LakeTable,
    plan: SnapshotPlan,
    source: Optional[DataFrame] = None,
    *,
    order_cols: Sequence[str] = tuple(ORDER_COLS),
    cursor: str = "_ab_cdc_lsn",
    deleted_col: str = "_ab_cdc_deleted_at",
    strategy: str = "cow",
    max_chunks: Optional[int] = None,
    post_collapse=None,
) -> SnapshotStats:
    """Apply up to ``max_chunks`` pending chunks (all, when None), one
    fenced merge commit per chunk. Safe to call repeatedly, from a crash
    restart, or interleaved between WAL micro-batches (the runner's
    ``snapshot_chunks_per_trigger`` does exactly that): completed chunks
    are fence-skipped before any compute, and chunk-vs-tail ordering is
    free by the low-watermark stamping argument in the module docstring."""
    spark = table.spark
    pend = pending_chunks(table, plan)
    total = plan.n_chunks
    if not pend:
        return SnapshotStats(total, 0, total, True)
    todo = pend if max_chunks is None else pend[: max_chunks]
    run = 0
    for i in todo:
        batch = stamp_chunk(
            read_chunk(spark, source, plan, i),
            plan,
            cursor=cursor,
            deleted_col=deleted_col,
            order_cols=order_cols,
        )
        merge_batch(
            table,
            batch,
            order_cols,
            cursor=cursor,
            deleted_col=deleted_col,
            app_id=plan.app_id,
            batch_id=i,
            strategy=strategy,
            post_collapse=post_collapse,
            # empty ranges still commit: the fence must advance past them
            commit_empty=True,
        )
        run += 1
    return SnapshotStats(total, run, total - len(pend), run == len(pend))
