"""Source/destination acceptance-style invariants (SURVEY §5.4):
black-box properties any sync must satisfy, mirrored from
source-acceptance-test/tests/test_incremental.py and test_full_refresh.py.
"""

import pandas as pd
from hypothesis import given, settings, strategies as st

from airbyte_spark.catalog import TableSchema
from airbyte_spark.feedgen import FeedSpec, generate_feed
from airbyte_spark.functions.text import canonicalize_pandas
from airbyte_spark.lake import LakeTable, merge_batch
from airbyte_spark.schemas import CHANGE_STRUCT, ORDER_COLS, PK, TRANSCRIPT_STRUCT


def _mk_table(spark, path):
    return LakeTable.create(
        spark, str(path), TableSchema.from_struct(TRANSCRIPT_STRUCT),
        primary_key=list(PK), bucket_cols=["conv_id"], n_buckets=4,
    )


def _change_df(spark, ev):
    return spark.createDataFrame(
        ev[[f.name for f in CHANGE_STRUCT.fields]], schema=CHANGE_STRUCT
    )


def test_abnormally_large_state_yields_no_records(spark, tmp_path, tmp_path_factory):
    """test_incremental.py:250 analog: a fence far in the future means every
    incoming batch is already-committed — zero records applied."""
    feed = tmp_path_factory.mktemp("accfeed")
    ev = generate_feed(str(feed), FeedSpec(n_convs=6, turns_per_conv=3,
                                           n_updates=20, n_deletes=2, seed=3))
    table = _mk_table(spark, tmp_path / "t")
    # pretend a future sync already committed batch 10^6
    table.commit(table.snapshot(), [], [], fence=("app", 10**6))
    stats = merge_batch(table, _change_df(spark, ev), ORDER_COLS,
                        app_id="app", batch_id=42)
    assert stats.skipped
    assert table.read().count() == 0


def test_two_sequential_full_refreshes_identical(spark, tmp_path, tmp_path_factory):
    """test_full_refresh.py:39 analog: overwrite twice from the same source
    produces the identical record set (and old files are dereferenced)."""
    feed = tmp_path_factory.mktemp("ffeed")
    ev = generate_feed(str(feed), FeedSpec(n_convs=6, turns_per_conv=3,
                                           n_updates=20, n_deletes=2, seed=4))
    table = _mk_table(spark, tmp_path / "t")
    payload = _change_df(spark, ev).select(*[f.name for f in TRANSCRIPT_STRUCT.fields])
    table.overwrite(payload)
    first = table.read().toPandas().sort_values(["conv_id", "turn_idx", "text"]).reset_index(drop=True)
    table.overwrite(payload)
    second = table.read().toPandas().sort_values(["conv_id", "turn_idx", "text"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(first, second)


def test_conversation_assembly_stable_turn_ordering(spark, tmp_path_factory):
    """north_rule invariant as an operator: assembling each conversation
    from the replayed final table yields turns in turn_idx order, matching
    a pandas-built transcript exactly — regardless of event delivery order
    (late/duplicate/hot feed)."""
    from airbyte_spark.operators.transcripts import assemble_conversations
    from airbyte_spark.plans.replay import batch_replay

    feed = tmp_path_factory.mktemp("asmfeed")
    ev = generate_feed(str(feed), FeedSpec(n_convs=8, turns_per_conv=5,
                                           n_updates=60, n_deletes=6,
                                           dup_rate=0.1, late_rate=0.1, seed=21))
    final = batch_replay(spark, str(feed), canonicalize=False)
    got = {
        r.conv_id: (r.n_turns, r.transcript)
        for r in assemble_conversations(final).collect()
    }

    from airbyte_spark.feedgen import oracle_final_state

    oracle = oracle_final_state(ev)
    for conv, grp in oracle.groupby("conv_id"):
        grp = grp.sort_values("turn_idx")
        want = "\n".join(f"{r.role}: {r.text}" for r in grp.itertuples())
        assert got[conv] == (len(grp), want)
    assert set(got) == set(oracle["conv_id"].unique())


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_canonicalizer_idempotent(s):
    """canon(canon(x)) == canon(x) — required for exactly-once replays that
    re-canonicalize already-written rows."""
    once = canonicalize_pandas(pd.Series([s], dtype=object))
    twice = canonicalize_pandas(once.copy())
    a, b = once.iloc[0], twice.iloc[0]
    assert (a is None and b is None) or a == b


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 3),
                          st.integers(1, 1000), st.booleans()),
                min_size=1, max_size=40))
def test_oracle_latest_wins_property(events):
    """Pandas-oracle property: for any event set, the surviving value per
    key is the one with the max LSN, and deleted winners remove the key."""
    import numpy as np
    rows = []
    for conv, turn, lsn, deleted in events:
        rows.append(dict(conv_id=f"c{conv}", turn_idx=turn, _ab_cdc_lsn=lsn,
                         text=f"t{lsn}", role="user", tool=None,
                         ts=pd.Timestamp("2025-01-01"),
                         _ab_cdc_updated_at=pd.Timestamp("2025-01-01"),
                         _ab_cdc_deleted_at=pd.Timestamp("2025-01-01") if deleted else pd.NaT,
                         _airbyte_emitted_at=pd.Timestamp("2025-01-01")))
    ev = pd.DataFrame(rows)
    from airbyte_spark.feedgen import oracle_final_state
    out = oracle_final_state(ev)
    # brute-force check
    best = {}
    for r in rows:
        k = (r["conv_id"], r["turn_idx"])
        if k not in best or r["_ab_cdc_lsn"] >= best[k]["_ab_cdc_lsn"]:
            best[k] = r
    want = {k: v for k, v in best.items() if pd.isna(v["_ab_cdc_deleted_at"])}
    got = {(r.conv_id, r.turn_idx): r.text for r in out.itertuples()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k]["text"]


def test_sessionize_gap_is_timezone_free(spark, tmp_path):
    """The session gap is a wall-clock NTZ difference: under a non-UTC
    session timezone a DST-straddling pair (01:50 -> 03:05 spring-forward,
    75 real minutes but 4500s of wall clock) must still split the session
    exactly like DuckDB's tz-free epoch() difference does."""
    import datetime

    from pyspark.sql import types as T

    import __spark_entry__ as entry

    rows = [
        (1, datetime.datetime(2024, 3, 10, 1, 50), 7, "view", 9.0, "{}"),
        (2, datetime.datetime(2024, 3, 10, 3, 5), 7, "view", 9.0, "{}"),
    ]
    struct = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    spark.createDataFrame(rows, struct).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))

    key = "spark.sql.session.timeZone"
    prev = spark.conf.get(key)
    spark.conf.set(key, "America/New_York")
    try:
        out = entry.q_cdc_sessionize(spark, str(tmp_path)).collect()
    finally:
        spark.conf.set(key, prev)
    # 4500s wall-clock gap > 1800 -> two sessions (an NTZ->LTZ epoch
    # detour would compute 900s and keep one session)
    assert sorted(r["session_idx"] for r in out) == [1, 2]
