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
