"""Multi-stream sync: two streams replay concurrently in one session with
fully isolated tables/checkpoints/fences, each matching its own oracle."""

from airbyte_spark.feedgen import FeedSpec, generate_feed, oracle_final_state
from airbyte_spark.functions.text import canonicalize_pandas
from airbyte_spark.lake import LakeTable
from airbyte_spark.streaming import ReplayConfig, run_replay_stream
from airbyte_spark.streaming.sync import run_sync
from tests.util import assert_same


def test_two_streams_isolated(spark, tmp_path, tmp_path_factory):
    specs = {
        "alpha": FeedSpec(n_convs=12, turns_per_conv=3, n_updates=60, n_deletes=8,
                          dup_rate=0.05, late_rate=0.05, n_segments=3, seed=101),
        "beta": FeedSpec(n_convs=8, turns_per_conv=5, n_updates=40, n_deletes=5,
                         dup_rate=0.1, late_rate=0.1, n_segments=2, seed=202),
    }
    evs, cfgs = {}, []
    for name, spec in specs.items():
        feed = tmp_path_factory.mktemp(f"feed_{name}")
        evs[name] = generate_feed(str(feed), spec)
        cfgs.append(
            ReplayConfig(
                feed_dir=str(feed),
                table_path=str(tmp_path / f"tbl_{name}"),
                checkpoint_dir=str(tmp_path / f"ck_{name}"),
                app_id=f"stream-{name}",
                max_files_per_trigger=1,
            )
        )

    run_sync(spark, cfgs)

    for name, cfg in zip(specs, cfgs):
        table = LakeTable(spark, cfg.table_path)
        assert_same(
            table.read(), oracle_final_state(evs[name], canonicalize=canonicalize_pandas)
        )
        # fences are namespaced per stream
        assert list(table.snapshot().fences) == [f"stream-{name}"]

    # resuming one stream does not disturb the other: re-run alpha only
    run_replay_stream(spark, cfgs[0])
    t_beta = LakeTable(spark, cfgs[1].table_path)
    assert_same(
        t_beta.read(), oracle_final_state(evs["beta"], canonicalize=canonicalize_pandas)
    )


def test_failing_stream_does_not_block_healthy_streams(spark, tmp_path, tmp_path_factory):
    """Bounded multi-stream sync where one stream's audit gate fails: the
    HEALTHY stream must still complete its sync (per-stream isolation) and
    the failure must surface after all queries terminated."""
    import pytest

    good_feed = tmp_path_factory.mktemp("feed_good")
    bad_feed = tmp_path_factory.mktemp("feed_bad")
    spec = FeedSpec(n_convs=10, turns_per_conv=3, n_updates=40, n_deletes=5,
                    dup_rate=0.05, late_rate=0.05, n_segments=2, seed=303)
    ev = generate_feed(str(good_feed), spec)
    generate_feed(str(bad_feed), FeedSpec(
        n_convs=6, turns_per_conv=3, n_updates=20, n_deletes=2,
        dup_rate=0.05, late_rate=0.05, n_segments=2, seed=404))
    cfgs = [
        ReplayConfig(
            feed_dir=str(good_feed),
            table_path=str(tmp_path / "tbl_good"),
            checkpoint_dir=str(tmp_path / "ck_good"),
            app_id="stream-good",
            max_files_per_trigger=1,
        ),
        ReplayConfig(
            feed_dir=str(bad_feed),
            table_path=str(tmp_path / "tbl_bad"),
            checkpoint_dir=str(tmp_path / "ck_bad"),
            app_id="stream-bad",
            max_files_per_trigger=1,
            # a gate the data genuinely violates: every batch fails
            audit_tests={"expressions": {"never": "1 = 0"}},
        ),
    ]
    with pytest.raises(Exception):
        run_sync(spark, cfgs)
    # the healthy stream finished its bounded sync despite the failure
    good = LakeTable(spark, cfgs[0].table_path)
    assert_same(
        good.read(), oracle_final_state(ev, canonicalize=canonicalize_pandas)
    )
    # the failed stream never published anything
    bad = LakeTable(spark, cfgs[1].table_path)
    assert bad.read().count() == 0 and bad.list_staged() == []
