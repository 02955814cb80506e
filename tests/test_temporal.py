"""Temporal AS-OF join: merge-shape vs lookup-shape equivalence, interval
semantics (inclusive start / exclusive end), and payload integrity."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from airbyte_spark.operators.dedup import scd2
from airbyte_spark.operators.temporal import asof_join, asof_lookup


@pytest.fixture(scope="module")
def history(spark):
    # key 1: versions at cursors 10, 20, 30; key 2: single version at 15
    rows = [
        (1, 10, "a", None),
        (1, 20, "b", "x"),
        (1, 30, "c", None),  # NULL payload field inside a real version
        (2, 15, "d", "y"),
    ]
    return spark.createDataFrame(rows, "k int, vstart int, text string, tool string")


@pytest.fixture(scope="module")
def probes(spark):
    rows = [
        (1, 5),   # before first version -> no match
        (1, 10),  # AT a version start -> that version (inclusive)
        (1, 25),  # between versions -> version 20
        (1, 99),  # after last -> active version 30
        (2, 15),
        (3, 50),  # key with no history
    ]
    return spark.createDataFrame(rows, "k int, at int")


def _expected():
    return {
        (1, 10): 10,
        (1, 25): 20,
        (1, 99): 30,
        (2, 15): 15,
    }


def test_asof_join_inner(history, probes):
    out = asof_join(probes, history, ["k"], "at", "vstart").collect()
    got = {(r.k, r.at): r.vstart for r in out}
    assert got == _expected()
    # payload came from the RIGHT version, including its legitimate NULL
    by = {(r.k, r.at): (r.text, r.tool) for r in out}
    assert by[(1, 99)] == ("c", None)  # not 'x' leaked from version 20
    assert by[(1, 10)] == ("a", None)


def test_asof_join_left(history, probes):
    out = asof_join(probes, history, ["k"], "at", "vstart", how="left").collect()
    assert len(out) == 6
    null_probes = {(r.k, r.at) for r in out if r.vstart is None}
    assert null_probes == {(1, 5), (3, 50)}


def test_lookup_shape_agrees(history, probes):
    hist = history.withColumn(
        "vend",
        F.lead("vstart").over(Window.partitionBy("k").orderBy("vstart")),
    )
    a = asof_join(probes, history, ["k"], "at", "vstart")
    b = asof_lookup(probes, hist, ["k"], "at", "vstart", "vend").select(a.columns)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_asof_against_scd2_operator(spark):
    """End-to-end with the real scd2 operator's start/end columns."""
    ev = spark.createDataFrame(
        [(1, 100), (1, 200), (1, 300), (2, 150)], "user_id int, event_id int"
    )
    hist = scd2(ev, ["user_id"], "event_id").select(
        "user_id",
        F.col("_airbyte_start_at").alias("vstart"),
        F.col("_airbyte_end_at").alias("vend"),
    )
    pr = ev.select("user_id", (F.col("event_id") + 50).alias("at"))
    merged = asof_join(pr, hist.select("user_id", "vstart"), ["user_id"], "at", "vstart")
    looked = asof_lookup(pr, hist, ["user_id"], "at", "vstart", "vend")
    got_m = {(r.user_id, r.at): r.vstart for r in merged.collect()}
    got_l = {(r.user_id, r.at): r.vstart for r in looked.collect()}
    want = {(1, 150): 100, (1, 250): 200, (1, 350): 300, (2, 200): 150}
    assert got_m == want and got_l == want


def test_asof_join_probe_cursor_name_collision(spark, history):
    """A probe column named like the version cursor gets a version_ alias."""
    pr = spark.createDataFrame([(1, 25)], "k int, vstart int")
    out = asof_join(pr, history, ["k"], "vstart", "vstart").collect()
    assert out[0].version_vstart == 20 and out[0].vstart == 25


def test_asof_randomized_cross_shape(spark):
    """Randomized (seeded) equivalence: merge shape == lookup shape on a
    history with hot keys, duplicate probe cursors, and sparse keys."""
    import numpy as np

    rng = np.random.default_rng(1234)
    n_keys = 20
    hist_rows = []
    for k in range(n_keys):
        n_v = int(rng.integers(1, 12))
        starts = sorted(rng.choice(np.arange(1, 500), size=n_v, replace=False))
        for s in starts:
            hist_rows.append((int(k), int(s), f"p{k}_{s}"))
    probe_rows = [
        (int(rng.integers(0, n_keys + 3)), int(rng.integers(0, 520)))
        for _ in range(400)
    ]
    hist = spark.createDataFrame(hist_rows, "k int, vstart int, payload string")
    probes = spark.createDataFrame(probe_rows, "k int, at int").withColumn(
        "pid", F.monotonically_increasing_id()
    )
    hist_b = hist.withColumn(
        "vend", F.lead("vstart").over(Window.partitionBy("k").orderBy("vstart"))
    )
    a = asof_join(probes, hist, ["k"], "at", "vstart")
    b = asof_lookup(probes, hist_b, ["k"], "at", "vstart", "vend").select(a.columns)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) > 100


def test_asof_join_delete_tombstones(spark):
    """A probe resolving to a tombstone version sees 'key absent': dropped
    on inner, NULL payload on left; probes BEFORE the delete still see the
    prior live version (the tombstone must not be pre-filtered away)."""
    hist = spark.createDataFrame(
        [(1, 10, "a", None), (1, 20, None, "2024-01-01 00:00:00"),
         (1, 30, "c", None)],
        "k int, vstart int, text string, _del string",
    ).withColumn("_del", F.col("_del").cast("timestamp"))
    probes = spark.createDataFrame(
        [(1, 15), (1, 25), (1, 35)], "k int, at int"
    )
    inner = asof_join(probes, hist, ["k"], "at", "vstart", deleted_col="_del")
    got = {(r.k, r.at): r.text for r in inner.collect()}
    assert got == {(1, 15): "a", (1, 35): "c"}  # (1,25) dropped: deleted
    left = asof_join(
        probes, hist, ["k"], "at", "vstart", how="left", deleted_col="_del"
    )
    lg = {(r.k, r.at): (r.vstart, r.text) for r in left.collect()}
    assert lg[(1, 25)] == (None, None)
    # boolean-flag convention too
    hist_b = hist.withColumn("_del", F.col("_del").isNotNull())
    inner_b = asof_join(probes, hist_b, ["k"], "at", "vstart", deleted_col="_del")
    assert {(r.k, r.at) for r in inner_b.collect()} == {(1, 15), (1, 35)}


def test_asof_lookup_broadcasts_small_history(spark, history, probes):
    """The lookup shape plans a BroadcastHashJoin for a small (dim-sized)
    history — no shuffle of the probe side."""
    hist = history.withColumn(
        "vend", F.lead("vstart").over(Window.partitionBy("k").orderBy("vstart"))
    )
    out = asof_lookup(probes, F.broadcast(hist), ["k"], "at", "vstart", "vend")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert {(r.k, r.at): r.vstart for r in out.collect()} == _expected()


def test_micro_batch_temporal_enrichment(spark, tmp_path):
    """CDC composition: a dim stream maintains an SCD history table while
    a fact stream is enriched per micro-batch via as-of lookup against the
    history READ SO FAR. With event-time aligned to processing order
    (disjoint LSN windows), the incrementally-enriched output must equal
    one batch asof_join of all facts against the full final history."""
    from airbyte_spark.lake.scd import bootstrap_scd_table, read_scd, scd_merge_batch
    from pyspark.sql import types as T

    dim_struct = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("_ab_cdc_lsn", T.LongType()),
            T.StructField("attr", T.StringType()),
        ]
    )
    table = bootstrap_scd_table(
        spark, str(tmp_path / "dim_scd"), dim_struct, ["k"],
        bucket_cols=["k"], n_buckets=2, cursor="_ab_cdc_lsn",
    )
    # dim versions: two epochs per key; facts probe between and after
    dim_batches = [
        [(1, 10, "a1"), (2, 10, "b1")],
        [(1, 100, "a2"), (2, 120, "b2")],
    ]
    fact_batches = [
        [(1, 50), (2, 50)],     # after epoch 1, before epoch 2
        [(1, 150), (2, 110)],   # (2, 110) still sees b1 (b2 starts at 120)
    ]
    enriched_parts = []
    for i, (db, fb) in enumerate(zip(dim_batches, fact_batches)):
        scd_merge_batch(
            table, spark.createDataFrame(db, dim_struct), ["k"],
            app_id="enrich", batch_id=i, strategy="mor", cursor="_ab_cdc_lsn",
        )
        facts = spark.createDataFrame(fb, "k int, at long")
        hist = read_scd(table).select(
            "k", F.col("_airbyte_start_at").alias("vstart"), "attr"
        )
        enriched_parts.append(asof_join(facts, hist, ["k"], "at", "vstart"))
    incremental = enriched_parts[0].unionByName(enriched_parts[1])

    all_facts = spark.createDataFrame(
        [r for fb in fact_batches for r in fb], "k int, at long"
    )
    full_hist = read_scd(table).select(
        "k", F.col("_airbyte_start_at").alias("vstart"), "attr"
    )
    batch = asof_join(all_facts, full_hist, ["k"], "at", "vstart")
    assert sorted(map(tuple, incremental.collect())) == \
           sorted(map(tuple, batch.collect()))
    got = {(r.k, r.at): r.attr for r in incremental.collect()}
    assert got == {(1, 50): "a1", (2, 50): "b1", (1, 150): "a2", (2, 110): "b1"}


def test_asof_join_renames_colliding_payload_columns(spark):
    """A history payload column that also exists in probes must come back
    with the version_ prefix (same rule as asof_lookup) — duplicate output
    names would make every downstream reference ambiguous."""
    from airbyte_spark.operators.temporal import asof_join

    history = spark.createDataFrame(
        [("k1", 10, "active"), ("k1", 20, "closed")], "id string, v long, status string"
    )
    probes = spark.createDataFrame(
        [("k1", 15, "probe-status")], "id string, t long, status string"
    )
    out = asof_join(probes, history, ["id"], "t", "v")
    assert sorted(out.columns) == ["id", "status", "t", "v", "version_status"]
    row = out.collect()[0]
    assert row["status"] == "probe-status" and row["version_status"] == "active"
    assert row["v"] == 10
