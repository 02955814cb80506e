import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_spark.catalog import TableSchema, diff_schemas
from airbyte_spark.feedgen import FeedSpec, generate_feed, oracle_final_state
from airbyte_spark.lake import LakeTable, merge_batch
from airbyte_spark.schemas import ORDER_COLS, PK, TRANSCRIPT_STRUCT, CHANGE_STRUCT
from tests.util import assert_same


def _mk_table(spark, path, n_buckets=8) -> LakeTable:
    return LakeTable.create(
        spark,
        str(path),
        TableSchema.from_struct(TRANSCRIPT_STRUCT),
        primary_key=list(PK),
        bucket_cols=["conv_id"],
        n_buckets=n_buckets,
    )


def _chunks(ev: pd.DataFrame, k: int):
    return np.array_split(np.arange(len(ev)), k)


def _merge_chunk(spark, table, ev, idx, batch_id):
    pdf = ev.iloc[idx][[f.name for f in CHANGE_STRUCT.fields]]
    batch = spark.createDataFrame(pdf, schema=CHANGE_STRUCT)
    return merge_batch(table, batch, ORDER_COLS, batch_id=batch_id)


@pytest.fixture(scope="module")
def feed(tmp_path_factory):
    d = tmp_path_factory.mktemp("feed")
    spec = FeedSpec(
        n_convs=30, turns_per_conv=5, n_updates=200, n_deletes=25,
        dup_rate=0.1, late_rate=0.1, seed=11,
    )
    ev = generate_feed(str(d), spec)
    return ev


def test_merge_full_feed_matches_oracle(spark, tmp_path, feed):
    table = _mk_table(spark, tmp_path / "t")
    for i, idx in enumerate(_chunks(feed, 5)):
        stats = _merge_chunk(spark, table, feed, idx, batch_id=i)
        assert not stats.skipped
    oracle = oracle_final_state(feed)
    assert_same(table.read(), oracle)
    # lineage recorded per batch
    lin = table.lineage_df().toPandas()
    assert sorted(lin["batch_id"]) == [0, 1, 2, 3, 4]
    assert lin["max_lsn"].max() == feed["_ab_cdc_lsn"].max()


def test_fence_skips_replayed_batch(spark, tmp_path, feed):
    table = _mk_table(spark, tmp_path / "t")
    chunks = _chunks(feed, 3)
    for i, idx in enumerate(chunks):
        _merge_chunk(spark, table, feed, idx, batch_id=i)
    before = table.snapshot()
    # re-deliver batches 0..2 (at-least-once) — all must be no-ops
    for i, idx in enumerate(chunks):
        stats = _merge_chunk(spark, table, feed, idx, batch_id=i)
        assert stats.skipped
    after = table.snapshot()
    assert before.version == after.version
    assert before.files == after.files
    assert_same(table.read(), oracle_final_state(feed))


def _row(conv, turn, lsn, text, deleted=False):
    base = pd.Timestamp("2025-01-01")
    return dict(
        conv_id=conv, turn_idx=turn, role="user", text=text, tool=None,
        ts=base, _ab_cdc_lsn=lsn,
        _ab_cdc_updated_at=base + pd.Timedelta(seconds=lsn),
        _ab_cdc_deleted_at=(base + pd.Timedelta(seconds=lsn)) if deleted else pd.NaT,
        _airbyte_emitted_at=base + pd.Timedelta(seconds=lsn + 1),
    )


def _batch(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows), schema=CHANGE_STRUCT)


def test_tombstone_blocks_late_lower_lsn_update(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t")
    merge_batch(
        table,
        _batch(spark, [_row("c1", 0, 10, "hello"), _row("c1", 0, 20, None, deleted=True)]),
        ORDER_COLS, batch_id=0,
    )
    assert table.read().count() == 0
    # late event with lsn 15 arrives in a LATER batch: must not resurrect
    merge_batch(
        table, _batch(spark, [_row("c1", 0, 15, "stale update")]),
        ORDER_COLS, batch_id=1,
    )
    assert table.read().count() == 0
    # but a genuinely newer event re-creates the key
    merge_batch(
        table, _batch(spark, [_row("c1", 0, 30, "reborn")]),
        ORDER_COLS, batch_id=2,
    )
    got = table.read().collect()
    assert len(got) == 1 and got[0]["text"] == "reborn"


def test_late_lower_lsn_update_within_live_key(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t")
    merge_batch(table, _batch(spark, [_row("c1", 0, 50, "v2")]), ORDER_COLS, batch_id=0)
    merge_batch(table, _batch(spark, [_row("c1", 0, 40, "v1-late")]), ORDER_COLS, batch_id=1)
    got = table.read().collect()
    assert len(got) == 1 and got[0]["text"] == "v2"


def test_bucket_pruning_rewrites_only_touched(spark, tmp_path, feed):
    table = _mk_table(spark, tmp_path / "t", n_buckets=8)
    _merge_chunk(spark, table, feed, np.arange(len(feed)), batch_id=0)
    before = table.snapshot()
    # single-key update -> touches exactly 1 bucket
    stats = merge_batch(
        table, _batch(spark, [_row("conv-3", 1, 10_000_000, "patched")]),
        ORDER_COLS, batch_id=1,
    )
    assert stats.touched_buckets == 1
    after = table.snapshot()
    untouched_before = {p for p, m in before.files.items() if m["bucket"] != _bucket_of(spark, "conv-3", 8)}
    assert untouched_before <= set(after.files)  # untouched files survive
    got = table.read().filter((F.col("conv_id") == "conv-3") & (F.col("turn_idx") == 1)).collect()
    assert got[0]["text"] == "patched"


def _bucket_of(spark, conv_id, n):
    return spark.createDataFrame([(conv_id,)], "conv_id string").select(
        F.pmod(F.hash("conv_id"), F.lit(n)).alias("b")
    ).collect()[0]["b"]


def test_append_and_overwrite(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t")
    pdf = pd.DataFrame(
        [
            dict(conv_id="a", turn_idx=0, role="user", text="x", tool=None,
                 ts=pd.Timestamp("2025-01-01")),
            dict(conv_id="b", turn_idx=1, role="assistant", text="y", tool="search",
                 ts=pd.Timestamp("2025-01-01")),
        ]
    )
    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_STRUCT)
    table.append(df)
    table.append(df)  # append = at-least-once duplication allowed (bronze)
    assert table.read().count() == 4
    table.overwrite(df)
    assert table.read().count() == 2


def test_schema_evolution_no_rewrite(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t")
    merge_batch(table, _batch(spark, [_row("c1", 0, 1, "old-row")]), ORDER_COLS, batch_id=0)
    files_before = set(table.snapshot().files)

    # E2 add tool_version, E3 widen turn_idx, E4 rename tool -> tool_name
    snap = table.snapshot()
    new_struct = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.LongType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool_name", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("tool_version", T.StringType()),
        ]
    )
    transforms = diff_schemas(
        snap.schema, new_struct, primary_key=list(PK),
        rename_hints={"tool": "tool_name"},
    )
    table.evolve(transforms)
    assert set(table.snapshot().files) == files_before  # metadata-only

    got = table.read().toPandas()
    assert list(got.columns) == [
        "conv_id", "turn_idx", "role", "text", "tool_name", "ts", "tool_version"
    ]
    assert got["tool_version"].isna().all()  # null-padded old file
    assert str(got["turn_idx"].dtype) == "int64"

    # new-schema rows merge in; old rows still readable side-by-side
    evolved_change = T.StructType(
        list(new_struct.fields)
        + [
            T.StructField("_ab_cdc_lsn", T.LongType()),
            T.StructField("_ab_cdc_updated_at", T.TimestampType()),
            T.StructField("_ab_cdc_deleted_at", T.TimestampType()),
            T.StructField("_airbyte_emitted_at", T.TimestampType()),
        ]
    )
    base = pd.Timestamp("2025-01-01")
    pdf = pd.DataFrame(
        [
            dict(conv_id="c2", turn_idx=0, role="user", text="new-row",
                 tool_name="python", ts=base, tool_version="v2",
                 _ab_cdc_lsn=100, _ab_cdc_updated_at=base,
                 _ab_cdc_deleted_at=pd.NaT, _airbyte_emitted_at=base),
        ]
    )
    merge_batch(
        table, spark.createDataFrame(pdf, schema=evolved_change),
        ORDER_COLS, batch_id=1,
    )
    got = table.read().sort("conv_id").toPandas()
    assert len(got) == 2
    assert got.loc[got.conv_id == "c2", "tool_version"].iloc[0] == "v2"
    assert pd.isna(got.loc[got.conv_id == "c1", "tool_version"].iloc[0])


def test_empty_batch_commit_policy(spark, tmp_path):
    """commit_empty=False: zero-row batches leave NO commit (idle-tail log
    churn guard), re-delivery stays a no-op, and a later non-empty batch
    advances the fence normally; default (True) keeps the empty-lineage
    commit for complete per-batch accounting."""
    table = _mk_table(spark, tmp_path / "t")
    empty = spark.createDataFrame([], schema=CHANGE_STRUCT)
    v0 = table.snapshot().version

    stats = merge_batch(table, empty, ORDER_COLS, batch_id=0, commit_empty=False)
    assert not stats.skipped and stats.rows_in == 0 and stats.version is None
    assert table.snapshot().version == v0  # no log growth

    # re-delivery of the uncommitted empty batch: still a no-op
    stats = merge_batch(table, empty, ORDER_COLS, batch_id=0, commit_empty=False)
    assert stats.version is None and table.snapshot().version == v0

    # a later real batch commits and fences past the skipped id
    batch = _batch(spark, [_row("c1", 0, 5, "hello")])
    stats = merge_batch(table, batch, ORDER_COLS, batch_id=1, commit_empty=False)
    assert stats.version is not None and stats.rows_in == 1
    assert table.read().count() == 1
    # replaying the old empty id after the fence advanced: fenced no-op
    stats = merge_batch(table, empty, ORDER_COLS, batch_id=0, commit_empty=False)
    assert stats.skipped

    # default policy still records the empty commit + lineage row
    stats = merge_batch(table, empty, ORDER_COLS, batch_id=2)
    assert stats.version is not None
    lin = table.lineage_df().toPandas()
    assert 2 in set(lin["batch_id"])


def test_order_struct_narrow_int_and_decimal_cursors(spark):
    """Winner selection must be total and TYPED for any cursor type:
    an IntegerType cursor with NULLs (a -(2^62) sentinel would wrap to 0,
    tying with legitimate zeros), negative cursors (null must lose to
    them too), and a DecimalType cursor (a string fallback would compare
    lexicographically: '9' > '10')."""
    from airbyte_spark.operators.dedup import latest_per_key

    df = spark.createDataFrame(
        [("k", None, "null-cur"), ("k", -5, "neg"), ("k", 0, "zero")],
        T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("cur", T.IntegerType()),
            T.StructField("v", T.StringType()),
        ]),
    )
    (row,) = latest_per_key(df, ["id"], ["cur"]).collect()
    assert row["v"] == "zero"
    # null loses even when every real cursor is negative
    (row,) = latest_per_key(df.filter("v <> 'zero'"), ["id"], ["cur"]).collect()
    assert row["v"] == "neg"

    dec = spark.createDataFrame(
        [("k", "9", "stale"), ("k", "10", "fresh")],
        "id string, cur string, v string",
    ).select("id", F.col("cur").cast(T.DecimalType(20, 0)).alias("cur"), "v")
    (row,) = latest_per_key(dec, ["id"], ["cur"]).collect()
    assert row["v"] == "fresh"  # numeric 10 > 9; lexicographic '9' > '10'


def test_latest_per_key_empty_payload_is_distinct_keys(spark):
    from airbyte_spark.operators.dedup import latest_per_key

    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), ("b", 1, "z")],
        "id string, cur long, v string",
    )
    out = latest_per_key(df, ["id"], ["cur"], payload_cols=[])
    assert sorted(r["id"] for r in out.collect()) == ["a", "b"]
    assert out.columns == ["id"]


def test_cow_merge_null_pads_evolved_column(spark, tmp_path):
    """After a metadata-only evolve adds a column, a batch that doesn't
    carry it yet must COW-merge with the column null-padded (the MOR path
    already conformed; COW referenced s.<col> unconditionally and died
    with UNRESOLVED_COLUMN)."""
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TableSchema.from_struct(TRANSCRIPT_STRUCT),
        primary_key=list(PK), bucket_cols=["conv_id"], n_buckets=2,
    )
    import datetime

    TS = datetime.datetime(2025, 1, 1)

    def batch(rows):
        return spark.createDataFrame(
            [(c, t, "user", txt, None, TS, lsn, TS, None, TS)
             for (c, t, lsn, txt) in rows],
            CHANGE_STRUCT,
        )

    merge_batch(table, batch([("c1", 0, 10, "a")]), ORDER_COLS,
                app_id="m", batch_id=0, strategy="cow")
    target = T.StructType(
        list(TRANSCRIPT_STRUCT.fields)
        + [T.StructField("tool_version", T.StringType(), True)]
    )
    table.evolve(diff_schemas(table.snapshot().schema, target,
                              primary_key=list(PK)))
    merge_batch(table, batch([("c1", 0, 20, "b")]), ORDER_COLS,
                app_id="m", batch_id=1, strategy="cow")
    rows = table.read().collect()
    assert [(r["text"], r["tool_version"]) for r in rows] == [("b", None)]


def test_staged_empty_batch_respects_commit_empty(spark, tmp_path):
    """commit_empty=False must leave NO commit for a zero-row trigger on
    the STAGED (write-audit-publish) path too — an audited idle tail
    would otherwise publish one empty commit per quiet-hour trigger."""
    from airbyte_spark.lake.quality import audited_merge_batch

    table = LakeTable.create(
        spark, str(tmp_path / "t"), TableSchema.from_struct(TRANSCRIPT_STRUCT),
        primary_key=list(PK), bucket_cols=["conv_id"], n_buckets=2,
    )
    empty = spark.createDataFrame([], CHANGE_STRUCT)
    v0 = table.snapshot().version
    stats = audited_merge_batch(
        table, empty, ORDER_COLS, not_null=["conv_id"], batch_id=0,
        commit_empty=False,
    )
    assert stats.version is None and table.snapshot().version == v0
    assert table.list_staged() == []


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    cur=st.lists(
        st.one_of(st.none(), st.integers(-100, 100)), min_size=1, max_size=8
    )
)
def test_latest_per_key_matches_python_nulls_lose_model(spark, cur):
    """Property: the winner per key is exactly the Python max with
    nulls-lose semantics, for any mix of NULL/negative/zero cursors on a
    narrow int type (the sentinel-coalesce bug class)."""
    from airbyte_spark.operators.dedup import latest_per_key

    rows = [("k", c, i) for i, c in enumerate(cur)]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("c", T.IntegerType()),
            T.StructField("i", T.LongType()),
        ]),
    )
    (row,) = latest_per_key(df, ["id"], ["c", "i"]).collect()
    # model: nulls lose; ties on c broken by i (the unique row index)
    best = max(range(len(cur)), key=lambda i: ((cur[i] is not None, cur[i] if cur[i] is not None else 0), i))
    assert row["i"] == best
