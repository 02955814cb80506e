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


def test_reset_stream_full_cycle(spark, tmp_path, tmp_path_factory):
    """Per-stream reset (Airbyte reset job): after a completed sync, reset
    wipes data + fence + checkpoint in one call; a re-run of the SAME sync
    reproduces the oracle state (fences cleared, offsets restarted) instead
    of fencing every batch off as a duplicate. History survives: time
    travel to the pre-reset version still reads the old state, and a
    changelog consumer sees a truncate boundary at the reset commit."""
    from airbyte_spark.streaming.sync import reset_stream

    feed = tmp_path_factory.mktemp("feed_reset")
    spec = FeedSpec(n_convs=10, turns_per_conv=3, n_updates=50, n_deletes=6,
                    dup_rate=0.05, late_rate=0.05, n_segments=2, seed=505)
    ev = generate_feed(str(feed), spec)
    cfg = ReplayConfig(
        feed_dir=str(feed),
        table_path=str(tmp_path / "tbl_reset"),
        checkpoint_dir=str(tmp_path / "ck_reset"),
        app_id="stream-reset",
        max_files_per_trigger=1,
    )
    run_replay_stream(spark, cfg)
    table = LakeTable(spark, cfg.table_path)
    expected = oracle_final_state(ev, canonicalize=canonicalize_pandas)
    assert_same(table.read(), expected)
    pre_reset_version = table.snapshot().version

    versions = reset_stream(spark, cfg)
    assert set(versions) == {cfg.table_path}
    table = LakeTable(spark, cfg.table_path)
    snap = table.snapshot()
    assert table.read(snap=snap).count() == 0
    assert cfg.app_id not in snap.fences
    import os
    assert not os.path.exists(cfg.checkpoint_dir)

    # time travel across the reset still reads the pre-reset state
    assert_same(table.read(snap=table.snapshot(at_version=pre_reset_version)),
                expected)

    # changelog: the reset commit is a truncate boundary, like overwrite
    changes = table.changes_between(
        pre_reset_version - 1, on_truncate="boundary"
    )
    boundary = changes.filter("_change_type = 'truncate'").collect()
    assert [r["_change_version"] for r in boundary] == [snap.version]

    # the re-run reproduces the oracle exactly (not fenced off)
    run_replay_stream(spark, cfg)
    table = LakeTable(spark, cfg.table_path)
    assert_same(table.read(), expected)


def test_reset_stream_scopes_to_one_app_id(spark, tmp_path, tmp_path_factory):
    """Resetting one stream's app_id must not clear another writer's fence
    on the same table (two apps can legally feed one table)."""
    from airbyte_spark.streaming.sync import reset_stream

    feed = tmp_path_factory.mktemp("feed_scope")
    spec = FeedSpec(n_convs=6, turns_per_conv=2, n_updates=20, n_deletes=2,
                    dup_rate=0.0, late_rate=0.0, n_segments=1, seed=606)
    generate_feed(str(feed), spec)
    cfg = ReplayConfig(
        feed_dir=str(feed),
        table_path=str(tmp_path / "tbl_scope"),
        checkpoint_dir=str(tmp_path / "ck_scope"),
        app_id="app-a",
    )
    run_replay_stream(spark, cfg)
    table = LakeTable(spark, cfg.table_path)
    # a second writer advances its own fence on the same table (empty
    # fenced commit — the idle-tail shape)
    table.commit(table.snapshot(), [], [], fence=("app-b", 7), op="merge")
    reset_stream(spark, cfg)
    fences = LakeTable(spark, cfg.table_path).snapshot().fences
    assert "app-a" not in fences and fences.get("app-b") == 7


def test_job_cli_reset_then_resync(spark, tmp_path, tmp_path_factory):
    """--reset wipes the stream and the same CLI sync command re-syncs it
    to the oracle state afterwards (the Airbyte reset-then-sync flow)."""
    from airbyte_spark import job

    feed = tmp_path_factory.mktemp("feed_clireset")
    spec = FeedSpec(n_convs=8, turns_per_conv=2, n_updates=24, n_deletes=3,
                    dup_rate=0.0, late_rate=0.0, n_segments=2, seed=707)
    ev = generate_feed(str(feed), spec)
    args = [
        "--feed-dir", str(feed),
        "--table", str(tmp_path / "tbl_cli"),
        "--checkpoint", str(tmp_path / "ck_cli"),
        "--app-id", "cli-stream",
        "--n-buckets", "4",
    ]
    expected = oracle_final_state(ev, canonicalize=canonicalize_pandas)
    job.main(args)
    assert_same(LakeTable(spark, str(tmp_path / "tbl_cli")).read(), expected)
    job.main([*args, "--reset"])
    table = LakeTable(spark, str(tmp_path / "tbl_cli"))
    assert table.read().count() == 0
    job.main(args)
    assert_same(LakeTable(spark, str(tmp_path / "tbl_cli")).read(), expected)
