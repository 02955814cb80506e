"""applyInPandasWithState custom stateful operator vs batch oracle."""

import pandas as pd

from airbyte_spark.feedgen import FeedSpec, generate_feed
from airbyte_spark.schemas import CHANGE_STRUCT
from airbyte_spark.streaming.stateful import conversation_progress


def test_conversation_progress_matches_batch_oracle(spark, tmp_path, tmp_path_factory):
    feed = tmp_path_factory.mktemp("stfeed")
    ev = generate_feed(
        str(feed),
        FeedSpec(n_convs=15, turns_per_conv=4, n_updates=100, n_deletes=12,
                 dup_rate=0.05, late_rate=0.05, n_segments=4, seed=5),
    )
    stream = (
        spark.readStream.schema(CHANGE_STRUCT)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{feed}/*.parquet")
    )
    q = (
        conversation_progress(stream)
        .writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.sql(
        """SELECT conv_id, n_events, max_lsn, n_deletes FROM (
             SELECT *, row_number() OVER (PARTITION BY conv_id
                      ORDER BY n_events DESC) rn FROM conv_progress) WHERE rn=1"""
    ).toPandas().sort_values("conv_id").reset_index(drop=True)

    want = (
        ev.groupby("conv_id")
        .agg(
            n_events=("_ab_cdc_lsn", "size"),
            max_lsn=("_ab_cdc_lsn", "max"),
            n_deletes=("_ab_cdc_deleted_at", lambda s: s.notna().sum()),
        )
        .reset_index()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    # multiple micro-batches actually happened (update mode emitted
    # intermediate rows for at least one conv)
    assert spark.table("conv_progress").count() > len(want)
    pd.testing.assert_frame_equal(
        got.astype({"n_events": "int64", "max_lsn": "int64", "n_deletes": "int64"}),
        want.astype({"n_events": "int64", "max_lsn": "int64", "n_deletes": "int64"}),
        check_dtype=False,
    )


def test_track_survives_all_null_lsn_group():
    """A key group whose micro-batch carries only NULL LSNs (snapshot
    records) arrives as float NaN through Arrow — the tracker must not
    crash on int(NaN); the watermark simply doesn't advance."""
    from airbyte_spark.streaming.stateful import _track

    class _FakeState:
        exists = False
        get = (0, 0, 0)

        def update(self, v):
            self.updated = v

    st = _FakeState()
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1", "c1"],
            "_ab_cdc_lsn": pd.array([None, None], dtype="float64"),
            "_ab_cdc_deleted_at": pd.array(
                [None, pd.Timestamp("2025-01-01")], dtype="datetime64[us]"
            ),
        }
    )
    (out,) = _track(("c1",), iter([pdf]), st)
    assert st.updated == (2, 0, 1)
    assert out["n_events"][0] == 2 and out["max_lsn"][0] == 0
