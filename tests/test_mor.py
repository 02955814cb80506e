"""Merge-on-read strategy: delta-file ingest + scan-time resolution +
compaction fold — equivalence with copy-on-write and the pandas oracle."""

import numpy as np

from airbyte_spark.catalog import TableSchema
from airbyte_spark.feedgen import FeedSpec, generate_feed, oracle_final_state
from airbyte_spark.functions.text import canonicalize_pandas
from airbyte_spark.lake import LakeTable, merge_batch
from pyspark.sql import types as T

from airbyte_spark.schemas import CHANGE_STRUCT, ORDER_COLS, PK, TRANSCRIPT_STRUCT

#: CHANGE_STRUCT with a nullable LSN (snapshot records without CDC metadata)
T_NULLABLE_CHANGE = T.StructType(
    [
        T.StructField(f.name, f.dataType, True if f.name == "_ab_cdc_lsn" else f.nullable)
        for f in CHANGE_STRUCT.fields
    ]
)
from airbyte_spark.streaming import ReplayConfig, run_replay_stream
from tests.util import assert_same

SPEC = FeedSpec(n_convs=20, turns_per_conv=4, n_updates=120, n_deletes=15,
                dup_rate=0.08, late_rate=0.08, n_segments=5, seed=77)


def _mk_table(spark, path):
    return LakeTable.create(
        spark, str(path), TableSchema.from_struct(TRANSCRIPT_STRUCT),
        primary_key=list(PK), bucket_cols=["conv_id"], n_buckets=4,
    )


def _merge_chunks(spark, table, ev, k, strategy):
    for i, idx in enumerate(np.array_split(np.arange(len(ev)), k)):
        pdf = ev.iloc[idx][[f.name for f in CHANGE_STRUCT.fields]]
        merge_batch(
            table, spark.createDataFrame(pdf, schema=CHANGE_STRUCT),
            ORDER_COLS, batch_id=i, strategy=strategy,
        )


def test_mor_matches_oracle_and_cow(spark, tmp_path, tmp_path_factory):
    feed = tmp_path_factory.mktemp("morfeed")
    ev = generate_feed(str(feed), SPEC)
    oracle = oracle_final_state(ev)

    t_mor = _mk_table(spark, tmp_path / "mor")
    _merge_chunks(spark, t_mor, ev, 4, "mor")
    # delta files exist, and the un-fenced read resolves correctly
    kinds = {m["kind"] for m in t_mor.snapshot().files.values()}
    assert kinds == {"delta"}
    assert_same(t_mor.read(), oracle)

    t_cow = _mk_table(spark, tmp_path / "cow")
    _merge_chunks(spark, t_cow, ev, 4, "cow")
    assert_same(t_cow.read(), oracle)

    # replayed batch is fenced in mor mode too
    n_files = len(t_mor.snapshot().files)
    _merge_chunks(spark, t_mor, ev, 4, "mor")  # same batch_ids -> all no-ops
    assert len(t_mor.snapshot().files) == n_files
    assert_same(t_mor.read(), oracle)


def test_mor_compaction_folds_deltas(spark, tmp_path, tmp_path_factory):
    feed = tmp_path_factory.mktemp("morfeed2")
    ev = generate_feed(str(feed), SPEC)
    oracle = oracle_final_state(ev)
    table = _mk_table(spark, tmp_path / "t")
    _merge_chunks(spark, table, ev, 4, "mor")

    table.compact()
    snap = table.snapshot()
    assert {m["kind"] for m in snap.files.values()} == {"base"}
    per_bucket = {}
    for p, m in snap.files.items():
        per_bucket.setdefault(m["bucket"], []).append(p)
    assert all(len(v) == 1 for v in per_bucket.values())
    assert_same(table.read(), oracle)
    table.vacuum()
    assert_same(table.read(), oracle)

    # cow merge after fold continues correctly (monotone new batch)
    ev2 = ev.copy()
    ev2["_ab_cdc_lsn"] = ev2["_ab_cdc_lsn"] + int(ev["_ab_cdc_lsn"].max())
    pdf = ev2.iloc[:30][[f.name for f in CHANGE_STRUCT.fields]]
    merge_batch(table, spark.createDataFrame(pdf, schema=CHANGE_STRUCT),
                ORDER_COLS, batch_id=100, strategy="cow")
    assert table.read().count() > 0


def test_mor_streaming_replay(spark, tmp_path, tmp_path_factory):
    feed = tmp_path_factory.mktemp("morfeed3")
    ev = generate_feed(str(feed), SPEC)
    cfg = ReplayConfig(
        feed_dir=str(feed),
        table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"),
        max_files_per_trigger=2,
        strategy="mor",
    )
    run_replay_stream(spark, cfg)
    table = LakeTable(spark, cfg.table_path)
    assert_same(table.read(), oracle_final_state(ev, canonicalize=canonicalize_pandas))
    # fold and re-check
    table.compact()
    assert_same(table.read(), oracle_final_state(ev, canonicalize=canonicalize_pandas))


def test_mor_streaming_autocompact(spark, tmp_path, tmp_path_factory):
    feed = tmp_path_factory.mktemp("morfeed4")
    ev = generate_feed(str(feed), SPEC)
    cfg = ReplayConfig(
        feed_dir=str(feed),
        table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"),
        max_files_per_trigger=1,
        strategy="mor",
        compact_every_batches=2,
    )
    run_replay_stream(spark, cfg)
    table = LakeTable(spark, cfg.table_path)
    assert_same(table.read(), oracle_final_state(ev, canonicalize=canonicalize_pandas))
    # folds happened mid-stream: base files exist; delta backlog is bounded
    kinds = [m["kind"] for m in table.snapshot().files.values()]
    assert "base" in kinds
    assert kinds.count("delta") <= 2  # at most compact_every-1 un-folded batches


def test_mor_lsn_tie_is_deterministic_and_matches_cow(spark, tmp_path):
    """Two commits carrying the SAME (pk, __lsn) — a tie-prone cursor such as
    a second-granularity timestamp cast to long. COW resolves 'target keeps
    on tie'; the MOR scan must resolve identically (earliest commit wins)
    and return the same row on every read."""
    import pandas as pd

    def batch(text, lsn):
        return pd.DataFrame(
            {
                "conv_id": ["conv-tie"], "turn_idx": [0], "role": ["user"],
                "text": [text], "tool": [None],
                "ts": [pd.Timestamp("2025-01-01")], "_ab_cdc_lsn": [lsn],
                "_ab_cdc_updated_at": [pd.Timestamp("2025-01-01")],
                "_ab_cdc_deleted_at": [pd.NaT],
                "_airbyte_emitted_at": [pd.Timestamp("2025-01-01")],
            }
        )

    results = {}
    for strategy in ("mor", "cow"):
        table = _mk_table(spark, tmp_path / strategy)
        for i, text in enumerate(["first", "second"]):
            merge_batch(
                table, spark.createDataFrame(batch(text, 10), schema=CHANGE_STRUCT),
                ORDER_COLS, batch_id=i, strategy=strategy,
            )
        reads = {table.read().collect()[0]["text"] for _ in range(3)}
        assert len(reads) == 1, f"{strategy} read nondeterministic: {reads}"
        results[strategy] = reads.pop()
    assert results["mor"] == results["cow"] == "first"


def test_merge_tolerates_null_cursor_rows(spark, tmp_path):
    """Snapshot/full-refresh records without CDC metadata (null LSN) must not
    crash the merge; the lineage high-watermark ignores them."""
    import pandas as pd

    table = _mk_table(spark, tmp_path / "t")
    ts = pd.Timestamp("2025-01-01").to_pydatetime()
    rows = [
        ("conv-a", 0, "user", "x", None, ts, None, None, None, ts),
        ("conv-b", 0, "user", "y", None, ts, None, None, None, ts),
    ]
    stats = merge_batch(
        table,
        spark.createDataFrame(rows, schema=T_NULLABLE_CHANGE),
        ORDER_COLS,
        batch_id=0,
    )
    assert not stats.skipped and stats.rows_in == 2
    assert table.read().count() == 2
    lin = table.lineage_df().toPandas()
    assert lin["max_lsn"].isna().all()


def test_cow_merge_folds_pending_deltas(spark, tmp_path, tmp_path_factory):
    """A cow merge on buckets that still hold unfolded deltas resolves them
    transparently: the target read collapses base+delta before the join and
    the rewrite dereferences the delta files."""
    feed = tmp_path_factory.mktemp("morfeed5")
    ev = generate_feed(str(feed), SPEC)
    table = _mk_table(spark, tmp_path / "t")
    # first half as mor deltas, second half as a cow merge
    halves = np.array_split(np.arange(len(ev)), 2)
    pdf0 = ev.iloc[halves[0]][[f.name for f in CHANGE_STRUCT.fields]]
    merge_batch(table, spark.createDataFrame(pdf0, schema=CHANGE_STRUCT),
                ORDER_COLS, batch_id=0, strategy="mor")
    assert {m["kind"] for m in table.snapshot().files.values()} == {"delta"}
    pdf1 = ev.iloc[halves[1]][[f.name for f in CHANGE_STRUCT.fields]]
    merge_batch(table, spark.createDataFrame(pdf1, schema=CHANGE_STRUCT),
                ORDER_COLS, batch_id=1, strategy="cow")
    # the cow rewrite covered every touched bucket's deltas
    snap = table.snapshot()
    touched_kinds = {m["kind"] for m in snap.files.values()}
    assert "base" in touched_kinds
    assert_same(table.read(), oracle_final_state(ev))
