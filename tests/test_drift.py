"""Ingest drift detection: EW-baseline math, alert semantics (mean shift,
null-rate spike, constant-stream sensitivity, warmup gating), state
persistence, and the zero-extra-pass df.observe integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbyte_spark.streaming.drift import DriftDetector, profile_cols


def _row(n, **metrics):
    return {"__drift_n": n, **metrics}


def _feed_stable(det, batches=8, mean=10.0, nulls=0, n=100):
    out = []
    for _ in range(batches):
        out.extend(
            det.observe_batch(
                _row(n, value__mean=mean, value__nulls=nulls)
            )
        )
    return out


def test_stable_stream_never_alerts():
    det = DriftDetector(cols=["value"], warmup=3)
    assert _feed_stable(det, batches=10) == []


def test_mean_shift_alerts_once_warm():
    det = DriftDetector(cols=["value"], warmup=3, z=4.0)
    _feed_stable(det, batches=6, mean=10.0)
    alerts = det.observe_batch(_row(100, value__mean=250.0, value__nulls=0))
    assert [a["metric"] for a in alerts] == ["mean"]
    a = alerts[0]
    assert a["column"] == "value" and a["value"] == 250.0
    assert a["baseline_mean"] == pytest.approx(10.0)


def test_null_rate_spike_alerts():
    det = DriftDetector(cols=["value"], warmup=3)
    _feed_stable(det, batches=6, nulls=0)
    alerts = det.observe_batch(_row(100, value__mean=10.0, value__nulls=60))
    assert [a["metric"] for a in alerts] == ["null_rate"]
    assert alerts[0]["value"] == pytest.approx(0.6)


def test_warmup_gates_alerts():
    det = DriftDetector(cols=["value"], warmup=5)
    _feed_stable(det, batches=4)
    # 5th batch is wild but the baseline is still warming up
    assert det.observe_batch(_row(100, value__mean=999.0, value__nulls=0)) == []


def test_drifted_batch_cannot_vouch_for_itself():
    # the alert compares against the baseline BEFORE folding the batch in:
    # two consecutive identical drifted batches both alert (the first did
    # not silently normalize the second)
    det = DriftDetector(cols=["value"], warmup=3, alpha=0.01)
    _feed_stable(det, batches=6, mean=10.0)
    first = det.observe_batch(_row(100, value__mean=300.0, value__nulls=0))
    second = det.observe_batch(_row(100, value__mean=300.0, value__nulls=0))
    assert first and second


def test_empty_batch_is_no_evidence():
    det = DriftDetector(cols=["value"], warmup=2)
    _feed_stable(det, batches=4)
    assert det.observe_batch(_row(0)) == []
    # and it did not disturb the baseline
    assert det.observe_batch(_row(100, value__mean=10.0, value__nulls=0)) == []


def test_state_round_trip():
    det = DriftDetector(cols=["value"], warmup=3)
    _feed_stable(det, batches=6)
    resumed = DriftDetector.from_json(det.to_json())
    alerts = resumed.observe_batch(_row(100, value__mean=500.0, value__nulls=0))
    assert alerts and alerts[0]["batches_seen"] == 6


def test_observe_integration_zero_extra_pass(spark):
    from pyspark.sql import Observation

    det = DriftDetector(cols=["v", "s"], warmup=2)
    for b in range(5):
        df = spark.range(200).select(
            (F.col("id") % 50).cast("double").alias("v"),
            F.when(F.col("id") % 10 == 0, None)
            .otherwise(F.lit("x"))
            .alias("s"),
        )
        obs = Observation()
        df.observe(obs, *profile_cols(["v", "s"])).count()
        assert det.observe_batch(obs.get) == []
    # drifted batch: v means shift, s goes mostly-null; both alert, and
    # the non-numeric column contributes null_rate only
    df = spark.range(200).select(
        (F.col("id") % 50 + 1000).cast("double").alias("v"),
        F.when(F.col("id") % 2 == 0, None).otherwise(F.lit("x")).alias("s"),
    )
    obs = Observation()
    df.observe(obs, *profile_cols(["v", "s"])).count()
    alerts = det.observe_batch(obs.get)
    got = {(a["column"], a["metric"]) for a in alerts}
    assert ("v", "mean") in got and ("s", "null_rate") in got


def test_drift_cols_ride_the_replay_observation(spark, tmp_path):
    """ReplayConfig.drift_cols adds the profile to the stream's existing
    'replay_feed' observation; alerts_from_listener replays the recorded
    per-batch rows through a detector in batch order."""
    from airbyte_spark.feedgen import FeedSpec, generate_feed
    from airbyte_spark.streaming import ReplayConfig, run_replay_stream
    from airbyte_spark.streaming import metrics as m
    from airbyte_spark.streaming.drift import alerts_from_listener

    d = str(tmp_path / "feed")
    generate_feed(
        d,
        FeedSpec(
            n_convs=10, turns_per_conv=3, n_updates=30, n_deletes=5,
            n_segments=4, seed=7,
        ),
    )
    cfg = ReplayConfig(
        feed_dir=d,
        table_path=str(tmp_path / "table"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        drift_cols=["turn_idx", "text"],
    )
    lst = m.attach(spark)
    try:
        run_replay_stream(spark, cfg)
        # listener delivery is async: the terminated event is posted
        # after the final progress event, so waiting here guarantees the
        # last batch's profile is in lst.progress (the race the CLI path
        # also has to close before reading alerts)
        assert lst.wait_terminated(30.0)
    finally:
        m.detach(spark, lst)
    rows = [
        r["observed"]["replay_feed"]
        for r in lst.progress
        if "replay_feed" in r.get("observed", {})
    ]
    assert len(rows) >= 2  # several micro-batches observed
    for r in rows:
        if not r.get("__drift_n"):
            continue  # idle trigger
        assert "turn_idx__mean" in r and "text__nulls" in r
        assert "rows_obs" in r  # the O8 estimates still ride along
    # replaying the recorded rows is deterministic and tags batch ids;
    # with a loose-z warm detector the feed's natural per-batch variation
    # stays under the bound
    first = alerts_from_listener(
        lst, DriftDetector(cols=["turn_idx", "text"], warmup=1, z=6.0)
    )
    again = alerts_from_listener(
        lst, DriftDetector(cols=["turn_idx", "text"], warmup=1, z=6.0)
    )
    assert first == again
    assert all(a["batch_id"] >= 1 for a in first)
    calm = alerts_from_listener(
        lst, DriftDetector(cols=["turn_idx", "text"], warmup=4, z=20.0)
    )
    assert calm == []


def test_drift_cols_must_exist_in_feed(spark, tmp_path):
    from airbyte_spark.streaming import ReplayConfig, run_replay_stream

    cfg = ReplayConfig(
        feed_dir=str(tmp_path / "feed"),
        table_path=str(tmp_path / "table"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        drift_cols=["nope"],
    )
    with pytest.raises(ValueError, match="drift_cols not in feed_struct"):
        run_replay_stream(spark, cfg)


def test_job_cli_drift_cols(spark, tmp_path, capsys):
    """--drift-cols on a bounded sync prints one drift_alerts JSON line
    (profiles observed per micro-batch through the CLI path)."""
    import json

    from airbyte_spark import job
    from airbyte_spark.feedgen import FeedSpec, generate_feed

    d = str(tmp_path / "feed")
    generate_feed(
        d,
        FeedSpec(
            n_convs=8, turns_per_conv=2, n_updates=20, n_deletes=0,
            n_segments=2, seed=99,
        ),
    )
    job.main([
        "--feed-dir", d,
        "--table", str(tmp_path / "tbl"),
        "--checkpoint", str(tmp_path / "ck"),
        "--n-buckets", "4",
        # messy-but-natural spelling: spaces and a trailing comma must
        # parse to ["turn_idx", "text"] (regression: ' text' / '' used
        # to reach the runner's membership check and fail)
        "--drift-cols", "turn_idx, text,",
    ])
    lines = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith('{"drift_alerts"')
    ]
    assert len(lines) == 1
    assert isinstance(json.loads(lines[0])["drift_alerts"], list)


def test_job_cli_drift_cols_rejected_on_backfill(spark, tmp_path):
    from airbyte_spark import job

    with pytest.raises(SystemExit, match="drift-cols"):
        job.main([
            "--feed-dir", str(tmp_path / "feed"),
            "--table", str(tmp_path / "tbl"),
            "--checkpoint", str(tmp_path / "ck"),
            "--backfill",
            "--drift-cols", "turn_idx",
        ])
