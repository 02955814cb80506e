"""Persistent incremental IVF index (ops/ann_index.py).

Claims under test: (1) searching the materialized index is BIT-EQUAL to
the one-shot ``ivf_search`` plan on the same corpus, regardless of how the
corpus was split into ingest increments; (2) ingest is exactly-once under
redelivery; (3) search reads a proper subset of the table's buckets."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_spark.ops import embeddings as emb_ops
from airbyte_spark.ops.ann_index import (
    ann_search,
    bootstrap_ann_index,
    ingest_vectors,
    load_centroids,
)

EMB_STRUCT = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _vec(i: int, dim: int = 8) -> list[float]:
    return [round(math.sin(0.7 * i + 0.3 * j), 4) for j in range(dim)]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in range(40)], EMB_STRUCT
    )


def _build(spark, path, emb, increments=2, n_buckets=8):
    cents = emb_ops._centroids(emb, 8)
    index = bootstrap_ann_index(spark, path, cents, n_buckets=n_buckets)
    for i in range(increments):
        ingest_vectors(
            index,
            emb.filter(F.pmod(F.col("vec_id"), F.lit(increments)) == i),
            app_id="t-ann",
            batch_id=i,
        )
    return index


def test_search_equals_one_shot_ivf(spark, tmp_path, emb):
    index = _build(spark, str(tmp_path / "idx"), emb)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    got = sorted(
        tuple(r)
        for r in ann_search(index, queries, nprobe=2, k=5).collect()
    )
    want = sorted(
        tuple(r)
        for r in emb_ops.ivf_search(
            emb, n_cells=8, n_queries=10, nprobe=2, k=5
        ).collect()
    )
    assert got == want and got
    # centroids round-trip the JSON persistence exactly
    cents = {r.cell: r.c for r in load_centroids(spark, index.path).collect()}
    orig = {
        int(r["cell"]): [float(x) for x in r["c"]]
        for r in emb_ops._centroids(emb, 8).collect()
    }
    assert {k: [round(x, 4) for x in v] for k, v in cents.items()} == {
        k: [round(x, 4) for x in v] for k, v in orig.items()
    }


def test_ingest_redelivery_fenced(spark, tmp_path, emb):
    index = _build(spark, str(tmp_path / "idx"), emb, increments=1)
    n = index.read().count()
    v = index.snapshot().version
    assert ingest_vectors(index, emb, app_id="t-ann", batch_id=0) is None
    assert index.read().count() == n
    assert index.snapshot().version == v


def test_embedding_dedup_incremental_equals_batch(spark, tmp_path, emb):
    from airbyte_spark.ops.ann_index import (
        bootstrap_embedding_dedup_index,
        embedding_flag_and_ingest,
    )

    # the incremental contract is vs the UNCAPPED one-shot: a growing
    # index cannot reproduce a rank-based cap (ranks depend on the whole
    # corpus); its occupancy guardrail is the persisted n_sub hash split
    batch = {
        (r.vec_a, r.vec_b): (r.bucket, r.cos)
        for r in emb_ops.sign_lsh_near_dup(emb, max_bucket_size=None).collect()
    }
    assert batch, "fixture must produce sign-LSH near-dups"
    index = bootstrap_embedding_dedup_index(
        spark, str(tmp_path / "eidx"), n_buckets=4
    )
    got, last = {}, {}
    for i in range(3):
        inc = emb.filter(F.pmod(F.col("vec_id"), F.lit(3)) == i)
        last = {
            (r.vec_a, r.vec_b): (r.bucket, r.cos)
            for r in embedding_flag_and_ingest(
                index, inc, app_id="t-emb", batch_id=i
            ).collect()
        }
        assert not set(last) & set(got)
        got.update(last)
    assert got == batch
    # fenced redelivery: no index growth, identical flag set
    rows = index.read().count()
    replay = {
        (r.vec_a, r.vec_b): (r.bucket, r.cos)
        for r in embedding_flag_and_ingest(
            index,
            emb.filter(F.pmod(F.col("vec_id"), F.lit(3)) == 2),
            app_id="t-emb",
            batch_id=2,
        ).collect()
    }
    assert index.read().count() == rows
    assert replay == last


def test_search_prunes_buckets(spark, tmp_path, emb):
    n_buckets = 8
    index = _build(spark, str(tmp_path / "idx"), emb, n_buckets=n_buckets)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    # replicate ann_search's driver-side probe->bucket resolution
    from airbyte_spark.ops.ann_index import _nearest_cells

    cents = load_centroids(spark, index.path)
    probes = _nearest_cells(
        queries.select("query_id", F.col("q").cast("array<float>").alias("q")),
        cents, "query_id", "q", 2,
    )
    cells = [r[0] for r in probes.select("cell").distinct().collect()]
    snap = index.snapshot()
    buckets = {
        r["_b"]
        for r in spark.createDataFrame([(c,) for c in cells], "cell int")
        .withColumn("_b", index.bucket_expr(snap))
        .collect()
    }
    all_buckets = {m["bucket"] for m in snap.files.values()}
    assert buckets < all_buckets  # proper subset: pruning has teeth
    # and the pruned search still answers exactly
    got = sorted(
        tuple(r) for r in ann_search(index, queries, nprobe=2, k=3).collect()
    )
    want = sorted(
        tuple(r)
        for r in emb_ops.ivf_search(
            emb, n_cells=8, n_queries=2, nprobe=2, k=3
        ).collect()
    )
    assert got == want

def test_embedding_index_persisted_bucketing_and_nsub(spark, tmp_path, emb):
    """n_bits/n_sub persist at bootstrap (like the IVF centroids): a
    conflicting n_bits is rejected — mixed bucketings silently stop
    matching — and n_sub > 1 is the deterministic skew guardrail: flags
    become exactly the same-hashed-sub subset of the uncapped pair set,
    stable across increments (a rank cap would not be)."""
    from airbyte_spark.ops.ann_index import (
        bootstrap_embedding_dedup_index,
        embedding_flag_and_ingest,
    )

    idx = bootstrap_embedding_dedup_index(
        spark, str(tmp_path / "i1"), n_buckets=4, n_bits=3
    )
    with pytest.raises(ValueError, match="persisted"):
        embedding_flag_and_ingest(idx, emb, n_bits=8)
    got = {
        (r.vec_a, r.vec_b)
        for r in embedding_flag_and_ingest(idx, emb, batch_id=0).collect()
    }
    want = {
        (r.vec_a, r.vec_b)
        for r in emb_ops.sign_lsh_near_dup(
            emb, n_bits=3, max_bucket_size=None
        ).collect()
    }
    assert got == want and want

    idx2 = bootstrap_embedding_dedup_index(
        spark, str(tmp_path / "i2"), n_buckets=4, n_bits=3, n_sub=2
    )
    got2 = {
        (r.vec_a, r.vec_b)
        for r in embedding_flag_and_ingest(idx2, emb, batch_id=0).collect()
    }
    sub = {
        r.vec_id: r.s
        for r in emb.select(
            "vec_id", F.pmod(F.xxhash64("vec_id"), F.lit(2)).alias("s")
        ).collect()
    }
    assert got2 == {p for p in want if sub[p[0]] == sub[p[1]]}
    assert got2 < want  # the guardrail actually dropped cross-sub pairs
