"""Randomized model test: a seeded sequence of lake operations (merge cow/
mor, compact, vacuum, rebucket, rollback, reset) is checked after every step
against a plain-dict replay model. The lake's entire public behavior —
LSN conflict resolution, tombstones, fencing, layout evolution, restore —
must match the 20-line model exactly, whatever the interleaving.
"""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from airbyte_spark.catalog import TableSchema
from airbyte_spark.functions.names import canonicalize_identifier
from airbyte_spark.lake import LakeTable, merge_batch
from airbyte_spark.schemas import CHANGE_STRUCT, ORDER_COLS, PK, TRANSCRIPT_STRUCT

KEYS = [("c%d" % c, t) for c in range(6) for t in range(3)]


def _batch_df(spark, rows):
    ts = pd.Timestamp("2025-01-01").to_pydatetime()
    data = [
        (conv, turn, "user", text, None, ts, lsn, ts,
         ts if deleted else None, ts)
        for (conv, turn, lsn, text, deleted) in rows
    ]
    return spark.createDataFrame(data, schema=CHANGE_STRUCT)


def _model_read(model):
    return sorted(
        (c, t, v["text"]) for (c, t), v in model.items() if not v["deleted"]
    )


def _table_read(table):
    return sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in table.read().select("conv_id", "turn_idx", "text").collect()
    )


def test_lake_random_op_sequence_matches_model(spark, tmp_path):
    rng = random.Random(4242)
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TableSchema.from_struct(TRANSCRIPT_STRUCT),
        primary_key=list(PK), bucket_cols=["conv_id"], n_buckets=4,
    )
    model: dict = {}
    history = []  # (version, model snapshot, next batch_id) for rollbacks
    lsn = 0
    batch_id = 0

    def apply_merge(strategy):
        nonlocal lsn, batch_id
        rows = []
        for _ in range(rng.randint(1, 8)):
            conv, turn = rng.choice(KEYS)
            lsn += 1
            deleted = rng.random() < 0.2
            rows.append((conv, turn, lsn, f"v{lsn}", deleted))
            cur = model.get((conv, turn))
            if cur is None or lsn > cur["lsn"]:
                model[(conv, turn)] = {"lsn": lsn, "text": f"v{lsn}", "deleted": deleted}
        merge_batch(table, _batch_df(spark, rows), ORDER_COLS,
                    app_id="model", batch_id=batch_id, strategy=strategy)

    ops = ["merge_cow", "merge_mor", "merge_mor", "compact", "rebucket",
           "rollback", "reset"]
    for step in range(18):
        op = rng.choice(ops)
        if op in ("merge_cow", "merge_mor"):
            apply_merge("cow" if op == "merge_cow" else "mor")
            batch_id += 1
            history.append((table.snapshot().version, dict(model), batch_id))
        elif op == "compact":
            table.compact()
        elif op == "rebucket":
            table.rebucket(rng.choice([2, 4, 8]))
        elif op == "reset":
            # per-stream reset: data gone AND the fence cleared, so the
            # batch-id counter legitimately restarts at 0 — the next merge
            # must APPLY (a reset that left the fence would silently fence
            # every replayed batch off)
            table.reset("model")
            model = {}
            batch_id = 0
            history.append((table.snapshot().version, {}, 0))
        elif op == "rollback" and len(history) >= 2:
            tv, tmodel, tbid = history[rng.randrange(len(history) - 1)]
            try:
                table.rollback(tv)
            except ValueError:
                continue  # target vacuumed/expired — legitimate refusal
            model = dict(tmodel)
            # rollback restores the fences wholesale: the batch-id counter
            # must rewind with them or later merges would be fenced off
            batch_id = tbid
            history = [(v, m, b) for v, m, b in history if v <= tv]
        assert _table_read(table) == _model_read(model), f"divergence at step {step} ({op})"

    # final invariant: lineage watermark equals the model's max applied lsn
    applied = [v["lsn"] for v in model.values()]
    if applied:
        wm = table.lineage_totals().get("max_lsn")
        assert wm is None or wm >= max(applied)


@pytest.mark.parametrize("seed", [7, 99])
def test_identifier_canonicalization_idempotent(seed):
    rng = random.Random(seed)
    alphabet = "aZ9 _-é.ü#\t文%"
    for _ in range(200):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 60)))
        once = canonicalize_identifier(s, max_length=20)
        assert canonicalize_identifier(once, max_length=20) == once


def _mk_plain_table(spark, path, n_buckets=4):
    return LakeTable.create(
        spark, str(path), TableSchema.from_struct(TRANSCRIPT_STRUCT),
        primary_key=list(PK), bucket_cols=["conv_id"], n_buckets=n_buckets,
    )


def test_rollback_across_rebucket_restores_bucket_count(spark, tmp_path):
    """Rolling back ACROSS a rebucket must restore n_buckets too: the
    re-referenced files carry bucket ids computed under the OLD count, and
    a merge planning with the new count would neither read nor remove a
    key's existing rows — duplicate live rows and wrong pruning."""
    table = _mk_plain_table(spark, tmp_path / "t", n_buckets=2)
    rows0 = [("c%d" % i, 0, 10 + i, "v1", False) for i in range(6)]
    merge_batch(table, _batch_df(spark, rows0), ORDER_COLS, app_id="m", batch_id=0)
    v_pre = table.snapshot().version
    table.rebucket(8)
    table.rollback(v_pre)
    assert table.snapshot().n_buckets == 2

    rows1 = [("c%d" % i, 0, 50 + i, "v2", False) for i in range(6)]
    merge_batch(table, _batch_df(spark, rows1), ORDER_COLS, app_id="m", batch_id=1)
    assert _table_read(table) == [("c%d" % i, 0, "v2") for i in range(6)]


def test_append_foreign_lsn_col_and_session_conf_restored(spark, tmp_path):
    """append() must resolve the cursor from the INCOMING frame before the
    conform drops non-schema columns (same contract as overwrite), and a
    lake write must not permanently hijack the session's parquet
    timestamp-encoding conf."""
    table = _mk_plain_table(spark, tmp_path / "t")
    key = "spark.sql.parquet.outputTimestampType"
    before = spark.conf.get(key)
    src = _batch_df(spark, [("c0", 0, 5, "x", False)]).withColumn(
        "__lsn", F.col("_ab_cdc_lsn") * 2
    )
    table.append(src, lsn_col="__lsn")  # '__lsn' is NOT a schema column
    got = table.read(include_meta=True).select("conv_id", "__lsn").collect()
    assert [(r["conv_id"], r["__lsn"]) for r in got] == [("c0", 10)]
    assert spark.conf.get(key) == before
