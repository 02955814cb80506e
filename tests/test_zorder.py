"""Z-order clustering at rewrite time (Delta OPTIMIZE ZORDER BY analog):
the interleave key itself against a Python model, the compaction-time
sort order it induces, validation rules, and exactness of range reads
over a z-ordered table."""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_spark.catalog import TableSchema
from airbyte_spark.lake import LakeTable, merge_batch
from airbyte_spark.lake.table import zorder_key


def _z_model(vals, bounds):
    """Python mirror of zorder_key for one row."""
    ranks = []
    for v, (lo, hi) in zip(vals, bounds):
        if lo is None or hi is None or not hi > lo or v is None:
            ranks.append(0)
            continue
        r = int((float(v) - lo) * (65535.0 / (hi - lo)))
        ranks.append(max(0, min(65535, r)))
    n = len(ranks)
    z = 0
    for j in range(16):
        for i, r in enumerate(ranks):
            z |= ((r >> j) & 1) << (j * n + i)
    return z


def test_zorder_key_matches_model(spark):
    rows = [(a, b) for a in (0, 13, 999, 65535, 100000, -5) for b in (0, 7, 50)]
    df = spark.createDataFrame(rows, "x long, y long")
    bounds = [(0.0, 65535.0), (0.0, 50.0)]
    got = df.select(
        "x",
        "y",
        zorder_key([(F.col("x"), *bounds[0]), (F.col("y"), *bounds[1])]).alias(
            "z"
        ),
    ).collect()
    for r in got:
        assert r.z == _z_model((r.x, r.y), bounds), (r.x, r.y)


def test_zorder_key_null_and_degenerate(spark):
    df = spark.createDataFrame([(None, 5), (3, None)], "x long, y long")
    z = zorder_key([(F.col("x"), 0.0, 10.0), (F.col("y"), 7.0, 7.0)])
    got = [r.z for r in df.select(z.alias("z")).collect()]
    # null x -> rank 0; degenerate y bounds -> rank 0 everywhere
    assert got[0] == 0
    assert got[1] == _z_model((3, None), [(0.0, 10.0), (None, None)])


def _mk(spark, path, **kw):
    schema = TableSchema.from_struct(
        T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("x", T.LongType(), True),
                T.StructField("y", T.LongType(), True),
            ]
        )
    )
    return LakeTable.create(
        spark, path, schema, primary_key=["id"], n_buckets=2, **kw
    )


def test_create_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="mutually exclusive"):
        _mk(spark, str(tmp_path / "a"), zorder_cols=["x", "y"], sort_cols=["x"])
    with pytest.raises(ValueError, match="2-3 columns"):
        _mk(spark, str(tmp_path / "b"), zorder_cols=["x"])
    with pytest.raises(ValueError, match="not in schema"):
        _mk(spark, str(tmp_path / "c"), zorder_cols=["x", "nope"])
    # non-numeric zorder column must fail at CREATE, not at the first
    # compact() (zorder_key folds stat bounds through float())
    str_schema = TableSchema.from_struct(
        T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("name", T.StringType(), True),
                T.StructField("x", T.LongType(), True),
            ]
        )
    )
    with pytest.raises(ValueError, match="numeric or timestamp"):
        LakeTable.create(
            spark, str(tmp_path / "e"), str_schema, primary_key=["id"],
            n_buckets=2, zorder_cols=["name", "x"],
        )
    t = _mk(spark, str(tmp_path / "d"), zorder_cols=["x", "y"])
    snap = t.snapshot()
    # zorder columns are implicitly stat'd (bounds fold from file stats)
    assert set(snap.zorder_cols) == {"x", "y"}
    assert set(snap.zorder_cols) <= set(snap.stats_cols)


def _fill(spark, table, n_batches=4, per_batch=64):
    for b in range(n_batches):
        df = (
            spark.range(b * per_batch, (b + 1) * per_batch)
            .select(
                F.col("id"),
                F.pmod(F.col("id") * 37, F.lit(1000)).alias("x"),
                F.pmod(F.col("id") * 101, F.lit(1000)).alias("y"),
            )
            .withColumn("_lsn", F.col("id"))
            .withColumn("_del", F.lit(None).cast("timestamp"))
        )
        merge_batch(
            table, df, ["_lsn"], cursor="_lsn", deleted_col="_del",
            batch_id=b, strategy="mor",
        )


def test_compaction_sorts_by_z_curve(spark, tmp_path):
    table = _mk(spark, str(tmp_path / "t"), zorder_cols=["x", "y"])
    _fill(spark, table)
    table.compact()
    snap = table.snapshot()
    # bounds the rewrite used: folded from recorded file stats
    los, his = {}, {}
    for c in ("x", "y"):
        vals = [
            m["stats"][c]
            for m in snap.files.values()
            if m.get("stats", {}).get(c)
        ]
        assert vals, f"stats missing for {c}"
        los[c] = min(v[0] for v in vals)
        his[c] = max(v[1] for v in vals)
    bounds = [(float(los["x"]), float(his["x"])), (float(los["y"]), float(his["y"]))]
    import pyarrow.parquet as pq
    import os

    checked = 0
    for path, meta in snap.files.items():
        rows = pq.read_table(
            os.path.join(table.path, path), columns=["x", "y"]
        ).to_pylist()
        zs = [_z_model((r["x"], r["y"]), bounds) for r in rows]
        assert zs == sorted(zs), f"file {path} not z-sorted"
        checked += 1
    assert checked >= 2  # one compacted file per bucket


def test_zorder_range_reads_stay_exact(spark, tmp_path):
    table = _mk(spark, str(tmp_path / "t"), zorder_cols=["x", "y"])
    _fill(spark, table)
    table.compact()
    got = table.read(ranges={"y": (100, 300)}).orderBy("id").collect()
    want = (
        table.read().filter(F.col("y").between(100, 300)).orderBy("id").collect()
    )
    assert got == want and len(got) > 0


def test_linear_sort_tables_unaffected(spark, tmp_path):
    table = _mk(spark, str(tmp_path / "t"), sort_cols=["x"])
    _fill(spark, table, n_batches=2)
    table.compact()
    snap = table.snapshot()
    assert snap.zorder_cols == []
    import pyarrow.parquet as pq
    import os

    for path in snap.files:
        xs = [
            r["x"]
            for r in pq.read_table(
                os.path.join(table.path, path), columns=["x"]
            ).to_pylist()
        ]
        assert xs == sorted(xs)
