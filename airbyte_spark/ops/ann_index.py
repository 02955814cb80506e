"""Persistent incremental IVF index: similarity search that reads only the
probed cells' buckets.

``embeddings.ivf_search`` is the right PLAN for one-shot search — but it
re-assigns the whole corpus to cells on every call and scans every vector.
A serving corpus is ingested once and searched many times; this module
materializes the inverted file as a LakeTable BUCKETED BY CELL so that:

* **Ingest** is O(batch): assign the new vectors to their nearest centroid
  (broadcast centroids + map-side top-1 — the `ivf_assign` plan) and
  fence-append them into their cells' buckets. Exactly-once under
  at-least-once delivery, same contract as every other lake write.
* **Search** reads only the probed cells' BUCKETS: the nprobe cells per
  query resolve (driver-side, ≤ n_cells rows) to a bucket id set, and
  ``read(buckets=...)`` never lists, opens, or scans any other bucket's
  files. At 10^9 vectors in 1024 cells with nprobe=8, a search touches
  <1% of the table instead of all of it — file-level pruning the one-shot
  plan cannot have. A residual ``cell IN (probed)`` filter keeps the
  result exact for cells that share a bucket hash.
* Results are BIT-EQUAL to ``embeddings.ivf_search`` on the same corpus
  (same centroid derivation, same rounding, same tiebreaks) — the oracle
  query shares `ann_ivf_search`'s SQL.

Centroids are fixed at bootstrap (persisted as JSON beside the table's
commit log, like the snapshot plan) — the standard IVF contract: retrain
centroids => rebuild the index. Derive them with
``embeddings.train_centroids`` (DataFrame-only Lloyd iterations over a
sample or the bootstrap corpus); the seeded first-k init remains the
zero-training fallback. Cosine math and tiebreaks come from
``embeddings.py`` so the two paths can never drift.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..catalog import TableSchema
from ..lake.table import LakeTable
from .embeddings import cosine

INDEX_STRUCT = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("cell", T.IntegerType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)

CENTROIDS_FILE = "centroids.json"


def bootstrap_ann_index(
    spark: SparkSession,
    path: str,
    centroids: DataFrame,
    n_buckets: int = 32,
) -> LakeTable:
    """Create (or open) the IVF table. ``centroids`` = (cell, c:embedding)
    — persisted to ``<path>/centroids.json`` at create time (bounded:
    n_cells rows) and immutable for the index's lifetime."""
    if LakeTable.exists(path):
        return LakeTable(spark, path)
    # centroids FIRST, table-create second: the create commit is the
    # "index exists" signal, so a crash between the two steps leaves a
    # re-runnable bootstrap — the reverse order would leave a table that
    # exists but can never load its centroids
    rows = [
        {"cell": int(r["cell"]), "c": [float(x) for x in r["c"]]}
        for r in centroids.select("cell", "c").collect()
    ]
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".{CENTROIDS_FILE}.tmp")
    with open(tmp, "w") as f:
        json.dump(sorted(rows, key=lambda r: r["cell"]), f)
    os.replace(tmp, os.path.join(path, CENTROIDS_FILE))
    return LakeTable.create(
        spark,
        path,
        TableSchema.from_struct(INDEX_STRUCT),
        primary_key=[],
        bucket_cols=["cell"],
        n_buckets=n_buckets,
    )


def load_centroids(spark: SparkSession, table_path: str) -> DataFrame:
    with open(os.path.join(table_path, CENTROIDS_FILE)) as f:
        rows = json.load(f)
    return spark.createDataFrame(
        [(r["cell"], r["c"]) for r in rows],
        T.StructType(
            [
                T.StructField("cell", T.IntegerType()),
                T.StructField("c", T.ArrayType(T.FloatType())),
            ]
        ),
    )


def _nearest_cells(
    vecs: DataFrame, cents: DataFrame, id_col: str, vec_col: str, n: int
) -> DataFrame:
    """Top-n nearest centroids per vector — ivf_assign/ivf_search's exact
    scoring and tiebreak (cos desc, cell asc), shared by ingest (n=1) and
    query probing (n=nprobe)."""
    scored = vecs.join(F.broadcast(cents)).withColumn(
        "_cos", F.round(cosine(F.col("c"), F.col(vec_col)), 6)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_cos").desc(), F.col("cell").asc())
    return (
        scored.withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= n)
        .select(id_col, vec_col, "cell")
    )


def ingest_vectors(
    index: LakeTable,
    emb: DataFrame,
    *,
    app_id: str = "ann-index",
    batch_id: int = 0,
) -> Optional[int]:
    """Assign the batch to cells and fence-append into the index. The
    assignment is the `ivf_assign` plan: broadcast centroids, map-side
    WindowGroupLimit top-1 — O(batch), no corpus read at all."""
    cents = load_centroids(index.spark, index.path)
    assigned = _nearest_cells(
        emb.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("embedding").cast("array<float>").alias("embedding"),
        ),
        cents,
        "vec_id",
        "embedding",
        1,
    )
    return index.append(assigned, fence=(app_id, batch_id))


EMB_DEDUP_STRUCT = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("bucket", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)


LSH_META_FILE = "lsh_meta.json"


def bootstrap_embedding_dedup_index(
    spark: SparkSession,
    path: str,
    n_buckets: int = 32,
    n_bits: int = 8,
    n_sub: int = 1,
    mutable: bool = False,
) -> LakeTable:
    """Embedding near-dup index (append-only): the third signature family
    on the incremental-index machinery (MinHash bands / SimHash block
    permutations / sign-hyperplane buckets) — semantic near-dups by cosine
    instead of lexical overlap. Bucketed + compaction-sorted by the
    sign-LSH bucket id; the batch's bucket IN-filter prunes whenever the
    batch touches a subset of the key space.

    ``n_bits`` and ``n_sub`` are PERSISTED beside the commit log (like the
    IVF centroids) and immutable for the index's lifetime — every
    increment must bucket identically or nothing matches. SIZE n_bits TO
    THE CORPUS: bucket count is 2^n_bits, so per-increment cross-join cost
    is O(batch × corpus / 2^n_bits) — pick n_bits ≈ log2(expected_corpus /
    target_occupancy) at bootstrap (bounded by the embedding dimension for
    this axis-aligned family; re-bucketing => rebuild, the standard LSH
    index contract). ``n_sub`` > 1 is the skew guardrail on top: each
    vector is deterministically hashed into one of n_sub sub-buckets and
    candidates must share it, dividing worst-case occupancy by n_sub at a
    documented recall cost (cross-sub pairs lost). n_sub=1 (default)
    keeps the exact union-of-increments == one-shot equivalence.

    ``mutable=True`` (re-crawled / CDC-fed corpora): primary key vec_id
    with versioned MOR merges — a re-ingested vector's row replaces the
    previous version's at scan, deletes tombstone it — same contract as
    the mutable MinHash/SimHash indexes, bucketed by vec_id (the merge's
    pruning key; the append-only layout buckets by sign bucket for scan
    pruning instead)."""
    if LakeTable.exists(path):
        return LakeTable(spark, path)
    if n_sub < 1:
        raise ValueError(f"n_sub must be >= 1, got {n_sub}")
    # meta FIRST, table-create second — same crash-safe bootstrap order as
    # the IVF centroids: the create commit is the "index exists" signal
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".{LSH_META_FILE}.tmp")
    with open(tmp, "w") as f:
        json.dump({"n_bits": n_bits, "n_sub": n_sub}, f)
    os.replace(tmp, os.path.join(path, LSH_META_FILE))
    if mutable:
        struct = T.StructType(
            [
                T.StructField("vec_id", T.LongType(), False),
                # nullable: tombstones carry only the key
                T.StructField("bucket", T.LongType(), True),
                T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            ]
        )
        return LakeTable.create(
            spark,
            path,
            TableSchema.from_struct(struct),
            primary_key=["vec_id"],
            bucket_cols=["vec_id"],
            n_buckets=n_buckets,
            sort_cols=["bucket"],
        )
    return LakeTable.create(
        spark,
        path,
        TableSchema.from_struct(EMB_DEDUP_STRUCT),
        primary_key=[],
        bucket_cols=["bucket"],
        n_buckets=n_buckets,
        sort_cols=["bucket"],
    )


EMB_FLAGS_STRUCT = T.StructType(
    [
        T.StructField("vec_a", T.LongType(), False),
        T.StructField("vec_b", T.LongType(), False),
        T.StructField("bucket", T.LongType(), False),
        T.StructField("cos", T.DoubleType(), False),
    ]
)


def bootstrap_embedding_flags_table(
    spark: SparkSession, path: str, n_buckets: int = 8
) -> LakeTable:
    """Append-only sink for the embedding index's candidate pairs — the
    semantic sibling of ``dedup_index.bootstrap_flags_table`` (different
    payload shape: cosine + bucket instead of shared band count)."""
    if LakeTable.exists(path):
        return LakeTable(spark, path)
    return LakeTable.create(
        spark,
        path,
        TableSchema.from_struct(EMB_FLAGS_STRUCT),
        primary_key=[],
        bucket_cols=["vec_a"],
        n_buckets=n_buckets,
    )


def _load_lsh_meta(path: str) -> dict:
    """Persisted bucketing parameters; defaults cover indexes created
    before the meta file existed."""
    p = os.path.join(path, LSH_META_FILE)
    if not os.path.exists(p):
        return {"n_bits": 8, "n_sub": 1}
    with open(p) as f:
        return json.load(f)


def embedding_flag_and_ingest(
    index: LakeTable,
    emb: DataFrame,
    *,
    app_id: str = "emb-dedup-index",
    batch_id: int = 0,
    n_bits: Optional[int] = None,
    threshold: float = 0.3,
    max_pushdown_keys: int = 8192,
    flags_table: Optional[LakeTable] = None,
    version: Optional[int] = None,
    version_col: Optional[str] = None,
    deletes: Optional[DataFrame] = None,
) -> DataFrame:
    """One increment against the embedding near-dup index: flag
    (vec_a, vec_b, bucket, cos) pairs sharing a sign bucket (and, when the
    index was bootstrapped with n_sub > 1, the same hashed sub-bucket)
    with cosine ≥ threshold — intra-batch ∪ vs the accepted corpus — then
    fence-append the batch's (vec_id, bucket, embedding) rows. With the
    default n_sub=1 the contract matches the MinHash/SimHash indexes:
    union-of-increments == one-shot ``sign_lsh_near_dup(...,
    max_bucket_size=None)``, redelivery reflags identically (batch-id
    anti-join), vec_id unique across the corpus.

    Bucketing parameters come from the PERSISTED index meta (see
    ``bootstrap_embedding_dedup_index`` for the n_bits-vs-corpus-size
    sizing rule); passing ``n_bits`` explicitly is only a guard — it must
    equal the persisted value or the increment is rejected, because mixed
    bucketings silently stop matching. ``flags_table`` commits the fenced
    flags append BEFORE the index append (same crash-window ordering as
    ``dedup_index.flag_and_ingest``)."""
    from .embeddings import sign_bucket

    meta = _load_lsh_meta(index.path)
    if n_bits is not None and n_bits != meta["n_bits"]:
        raise ValueError(
            f"n_bits={n_bits} conflicts with the index's persisted "
            f"bucketing (n_bits={meta['n_bits']}); an index must bucket "
            "every increment identically — rebuild to re-bucket"
        )
    n_bits = meta["n_bits"]
    n_sub = meta.get("n_sub", 1)

    def _sub(side: str):
        # deterministic per-vector sub-bucket: stable across increments
        # (unlike a rank split, which depends on what else is in the
        # bucket), so both join sides always agree on a vector's sub
        return F.pmod(F.xxhash64(F.col(f"{side}.vec_id")), F.lit(n_sub))

    bt = (
        emb.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("embedding").cast("array<float>").alias("embedding"),
        )
        .withColumn("bucket", sign_bucket(F.col("embedding"), n_bits))
        .persist()
    )
    try:
        batch_ids = bt.select("vec_id").distinct()
        idx = index.read().join(F.broadcast(batch_ids), "vec_id", "left_anti")
        # the batch's distinct buckets (≤ min(2^n_bits, |batch|)) become a
        # pushed IN-filter on the index scan (numeric pushdown + sorted
        # file stats); past the driver-side bound fall back to the plain
        # equi-join — the right plan for corpus-sized increments
        keys = [
            r[0]
            for r in bt.select("bucket")
            .distinct()
            .limit(max_pushdown_keys + 1)
            .collect()
        ]
        if len(keys) <= max_pushdown_keys:
            idx = idx.filter(F.col("bucket").isin(keys))

        on = F.col("a.bucket") == F.col("b.bucket")
        if n_sub > 1:
            on = on & (_sub("a") == _sub("b"))
        cos = F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6)
        intra = (
            bt.alias("a")
            .join(bt.alias("b"), on & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                F.col("a.bucket").alias("bucket"),
                cos.alias("cos"),
            )
        )
        cross = (
            bt.alias("a")
            .join(idx.alias("b"), on)
            .select(
                F.least("a.vec_id", "b.vec_id").alias("vec_a"),
                F.greatest("a.vec_id", "b.vec_id").alias("vec_b"),
                F.col("a.bucket").alias("bucket"),
                cos.alias("cos"),
            )
        )
        flags = (
            intra.unionByName(cross).filter(F.col("cos") >= threshold)
        )
        out = flags.localCheckpoint(eager=True)  # resolve BEFORE the append
        if flags_table is not None:
            # flags land before the index append — see flag_and_ingest's
            # crash-window argument
            flags_table.append(out, fence=(app_id, batch_id))
        entries = bt.select("vec_id", "bucket", "embedding")
        if index.snapshot().primary_key:
            from .dedup_index import _mutable_merge

            _mutable_merge(
                index, entries, emb,
                id_col="vec_id",
                n_bands=None,  # keyed on vec_id alone — one row per vector
                null_cols=(
                    ("bucket", "long"),
                    ("embedding", "array<float>"),
                ),
                app_id=app_id, batch_id=batch_id,
                version=version, version_col=version_col, deletes=deletes,
            )
        else:
            if version_col is not None or deletes is not None:
                raise ValueError(
                    "per-doc versions / deletes need a mutable index "
                    "(bootstrap_embedding_dedup_index(..., mutable=True))"
                )
            index.append(entries, fence=(app_id, batch_id))
        return out
    finally:
        bt.unpersist()


def ann_search(
    index: LakeTable,
    queries: DataFrame,
    *,
    nprobe: int = 2,
    k: int = 5,
) -> DataFrame:
    """Top-k cosine neighbors per query over the PROBED CELLS ONLY.

    The probed cell set (≤ n_cells distinct values) resolves to bucket ids
    on the driver; ``read(buckets=...)`` prunes every other bucket's files
    before the scan exists. Output mirrors ``ivf_search``:
    (query_id, neighbor_id, rank, cos)."""
    spark = index.spark
    cents = load_centroids(spark, index.path)
    q = queries.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("q").cast("array<float>").alias("q"),
    )
    probes = _nearest_cells(q, cents, "query_id", "q", nprobe)

    snap = index.snapshot()
    cells = [r[0] for r in probes.select("cell").distinct().collect()]
    buckets = [
        r["_b"]
        for r in spark.createDataFrame(
            [(c,) for c in cells], "cell int"
        )
        .withColumn("_b", index.bucket_expr(snap))
        .select("_b")
        .distinct()
        .collect()
    ]
    corpus = index.read(buckets=buckets, snap=snap).filter(
        F.col("cell").isin(cells)  # residual: cells sharing a bucket hash
    )
    scored = (
        corpus.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("q"), F.col("embedding")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), "rank", "cos"
        )
    )
