"""Optimistic concurrency on the commit log (Iceberg-style): create-
exclusive version publish, add-only conflict retry, rewrite re-plan."""

import pytest

from airbyte_spark.catalog import TableSchema
from airbyte_spark.lake.table import CommitConflict, LakeTable
from airbyte_spark.schemas import TRANSCRIPT_STRUCT


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"), TableSchema.from_struct(TRANSCRIPT_STRUCT),
        primary_key=["conv_id", "turn_idx"], bucket_cols=["conv_id"], n_buckets=2,
    )


def test_losing_writer_gets_conflict(spark, table):
    t2 = LakeTable(spark, table.path)
    snap1, snap2 = table.snapshot(), t2.snapshot()
    v = table.commit(snap1, [], [], op="merge")  # writer 1 wins
    with pytest.raises(CommitConflict, match="already committed"):
        t2.commit(snap2, [], [], op="merge")  # same base version -> loser
    assert table.snapshot().version == v


def test_add_only_conflict_retries_to_next_version(spark, table):
    t2 = LakeTable(spark, table.path)
    snap1, snap2 = table.snapshot(), t2.snapshot()
    v1 = table.commit(snap1, [], [], op="merge")
    v2 = t2.commit(snap2, [], [], op="merge", retry_conflicts=2)
    assert v2 == v1 + 1  # landed after re-reading the log


def test_rewrite_conflict_never_blind_retries(spark, table):
    """A commit carrying removes chose files FROM the stale snapshot —
    retrying without re-planning could drop another writer's data."""
    t2 = LakeTable(spark, table.path)
    snap1, snap2 = table.snapshot(), t2.snapshot()
    table.commit(snap1, [], [], op="merge")
    with pytest.raises(CommitConflict):
        t2.commit(snap2, [], ["data/whatever.parquet"], op="merge",
                  retry_conflicts=5)


def test_duplicate_fence_race_raises(spark, table):
    """Two writers racing the SAME (app_id, batch_id): the loser must not
    double-apply even with retries — the fence re-check catches it."""
    t2 = LakeTable(spark, table.path)
    snap1, snap2 = table.snapshot(), t2.snapshot()
    table.commit(snap1, [], [], fence=("app", 5), op="merge")
    with pytest.raises(CommitConflict, match="fence advanced"):
        t2.commit(snap2, [], [], fence=("app", 5), op="merge", retry_conflicts=3)
    # a LATER batch from the stale writer still lands fine
    v = t2.commit(t2.snapshot(), [], [], fence=("app", 6), op="merge",
                  retry_conflicts=3)
    assert t2.snapshot().fences["app"] == 6 and v == t2.snapshot().version
