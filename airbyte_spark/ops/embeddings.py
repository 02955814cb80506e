"""Similarity search over an embedding column (array<float>).

Three tiers, mirroring how a real 100 TB ANN pipeline is built:

* ``cosine_topk`` — brute-force baseline: broadcast the (small) query set,
  score every corpus vector, window-topk per query. Exact; the corpus side
  is a map-only scan so it scales linearly with executors; the only shuffle
  is the per-query top-k (tiny: k rows per query per partition after the
  partial sort).
* ``label_blocked_near_dup`` — IVF-style: vectors are pre-assigned to a
  coarse cluster (here the `label` column stands in for the IVF cell id);
  candidate pairs only form within a cell, turning O(n²) into
  Σ_cell O(|cell|²).
* ``sign_lsh_buckets`` / ``sign_lsh_near_dup`` — random-hyperplane-LSH
  family member using axis-aligned hyperplanes (sign of coordinate j): an
  n_bits-wide bucket id per vector, candidates meet only inside a bucket;
  occupancy stays bounded via the default rank-chunk cap plus the
  documented n_bits-vs-corpus-size guidance.

All arithmetic folds the array left-to-right in double precision via
``F.zip_with``/``F.aggregate`` (built-in higher-order functions, JVM-side),
which makes the scores reproducible bit-for-bit in the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # try_divide + coalesce: a zero-norm vector (padded/missing embedding)
    # has undefined cosine — treat as similarity 0 (never a near-dup)
    # instead of DIVIDE_BY_ZERO aborting the whole job under ANSI mode
    # (Spark 4 default)
    return F.coalesce(
        F.try_divide(dot(a, b), norm(a) * norm(b)), F.lit(0.0)
    )


def cosine_topk(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for the first `n_queries` vectors.

    Query side is broadcast (it is tiny by construction); ranking is on the
    6-dp-rounded score with vec_id as total tiebreak so results are
    engine-independent.
    """
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    targets = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("t"))
    scored = (
        targets.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("q"), F.col("t")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


DEFAULT_MAX_CELL_SIZE = 48


def label_blocked_near_dup(
    emb: DataFrame,
    threshold: float = 0.35,
    max_cell_size: int | None = DEFAULT_MAX_CELL_SIZE,
) -> DataFrame:
    """IVF-style near-duplicate pairs: candidates only within the same
    coarse cluster (`label`), verified by exact cosine ≥ threshold.

    Within-cell cost is O(|cell|²) — inherent to IVF — so a skewed cell
    (one cluster holding 10^7 vectors) is the scale hazard. The cell cap
    is therefore ON BY DEFAULT: cells above ``max_cell_size`` chunk into
    sub-cells of EXACTLY ≤ cap rows by within-cell rank (row_number over
    vec_id), so every join group is bounded at O(cap²) no matter how
    skewed the clustering — a hash/modulo split would only bound the
    EXPECTED size (and raw vec_ids can even be correlated mod nsub,
    putting a whole cell in one sub-cell). The rank window costs one
    bounded per-cell sort — O(|cell| log |cell|) preprocessing versus the
    O(|cell|²) join it prevents. This trades recall (cross-sub-cell
    pairs are lost), the standard IVF posture — raise the cap (or pass
    None to disable) when recall matters more than bounded cost."""
    from pyspark.sql import Window

    v = emb.select("vec_id", "label", "embedding")
    sub_cond = []
    if max_cell_size is not None:
        w = Window.partitionBy("label").orderBy("vec_id")
        v = v.withColumn(
            "_sub",
            F.floor(
                (F.row_number().over(w) - F.lit(1)) / F.lit(max_cell_size)
            ).cast("long"),
        )
        sub_cond = [F.col("a._sub") == F.col("b._sub")]
    a, b = v.alias("a"), v.alias("b")
    cond = (F.col("a.label") == F.col("b.label")) & (
        F.col("a.vec_id") < F.col("b.vec_id")
    )
    for c in sub_cond:
        cond = cond & c
    pairs = a.join(b, cond)
    return (
        pairs.withColumn("cos", F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6))
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").cast("long").alias("label"),
            "cos",
        )
    )


def ivf_assign(
    emb: DataFrame, n_cells: int = 8, centroids: DataFrame | None = None
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid by cosine distance — the real inverted-file cell id
    (``label_blocked_near_dup`` uses a pre-existing label as a stand-in;
    this derives the cell from the geometry).

    Centroids default to the first ``n_cells`` vectors (deterministic
    "init" — a k-means refinement would iterate assign/update, but the
    ASSIGNMENT plan is the part that must scale and it is one broadcast
    join + a per-vector top-1: corpus side map-only, WindowGroupLimit
    keeps the rank-1 filter partial map-side, ties broken by smaller cell
    id so any engine reproduces the cells bit-for-bit).

    Output: (vec_id, cell, cos) — cos is the similarity to the assigned
    centroid (rounded like every score here, see module banner).
    """
    return _assign(emb, n_cells, centroids).select("vec_id", "cell", "cos")


def _centroids(
    emb: DataFrame, n_cells: int, centroids: DataFrame | None = None
) -> DataFrame:
    """The ONE centroid-frame derivation (default: first ``n_cells``
    vectors), shared by assignment and search so a caller's custom
    centroids — or a changed default — can never make ``ivf_search``
    probe cells a different assignment produced."""
    cents = centroids if centroids is not None else emb.filter(
        F.col("vec_id") < n_cells
    )
    return cents.select(
        F.col("vec_id").cast("long").alias("cell"), F.col("embedding").alias("c")
    )


def _assign(
    emb: DataFrame, n_cells: int, centroids: DataFrame | None = None
) -> DataFrame:
    """(vec_id, cell, cos, t) — assignment WITH the vector carried through,
    so ``ivf_search`` consumes it directly instead of joining the corpus
    back to its own assignment on vec_id (a full self-join shuffle of the
    corpus at 10^9 vectors; carrying ``t`` keeps it one scan)."""
    cents = _centroids(emb, n_cells, centroids)
    scored = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"), F.col("embedding").alias("t")
    ).join(F.broadcast(cents)).withColumn(
        "cos", F.round(cosine(F.col("c"), F.col("t")), 6)
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("cell").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .select("vec_id", "cell", "cos", "t")
    )


def train_centroids(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    init: DataFrame | None = None,
) -> DataFrame:
    """Lloyd k-means refinement for the IVF coarse quantizer, pure
    DataFrame ops — completes the IVF story (``ivf_assign``/``ann_index``
    previously took centroids as given).

    Per iteration: ASSIGN every vector to its nearest current centroid
    (the ``_assign`` plan — broadcast centroids + map-side top-1, the
    corpus side is one scan), then UPDATE each cell's centroid to the
    elementwise mean of its members (posexplode → one partial-aggregated
    groupBy over (cell, pos) longs/doubles — never an array shuffle of
    the corpus). Cells that lose every member keep their previous
    centroid. Means are not re-normalized: cosine assignment is
    scale-invariant, so the mean DIRECTION is all that matters (spherical
    k-means reduction).

    The k centroids round-trip through the driver between iterations
    (bounded: k rows — the same place every production k-means keeps
    them), which keeps each iteration's plan flat instead of stacking
    ``iters`` joins into one lineage. Returns (cell, c) ready for
    ``ivf_assign``/``ivf_search``/``bootstrap_ann_index``.

    ``init`` defaults to the first k vectors — the same seeded init as
    ``_centroids``, so ``train_centroids(emb, k, iters=0)`` reproduces
    the untrained behavior exactly."""
    from pyspark.sql import types as T

    spark = emb.sparkSession
    if init is not None:
        cents = init.select(
            F.col("cell").cast("long").alias("cell"),
            F.col("c").cast("array<float>").alias("c"),
        )
    else:
        cents = _centroids(emb, k)
    cent_schema = T.StructType(
        [
            T.StructField("cell", T.LongType()),
            T.StructField("c", T.ArrayType(T.FloatType())),
        ]
    )

    def _as_assign_input(c: DataFrame) -> DataFrame:
        # _assign's custom-centroid contract is (vec_id, embedding)-shaped
        return c.select(
            F.col("cell").alias("vec_id"), F.col("c").alias("embedding")
        )

    for _ in range(iters):
        assigned = _assign(emb, k, _as_assign_input(cents))
        means = (
            assigned.select("cell", F.posexplode("t").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"].cast("float"),
                ).alias("c_new")
            )
        )
        rows = (
            cents.join(means, "cell", "left")
            .select(
                F.col("cell").cast("long").alias("cell"),
                F.coalesce("c_new", "c").cast("array<float>").alias("c"),
            )
            .collect()
        )
        cents = spark.createDataFrame(
            [(int(r["cell"]), [float(x) for x in r["c"]]) for r in rows],
            cent_schema,
        )
    return cents.select(F.col("cell").cast("long").alias("cell"), "c")


def mean_assignment_cos(emb: DataFrame, centroids: DataFrame) -> float:
    """Clustering objective: mean cosine of every vector to its assigned
    centroid (higher = tighter cells) — one aggregate over the assign
    plan; the train/eval loop's scoreboard. ``centroids`` is (cell, c),
    as returned by ``train_centroids``."""
    adapted = centroids.select(
        F.col("cell").alias("vec_id"), F.col("c").alias("embedding")
    )
    # n_cells=0 is a dead argument here: _assign only consults it when
    # centroids is None — counting the centroid frame first would run a
    # whole extra Spark job just to produce an ignored integer
    return float(
        _assign(emb, 0, adapted).agg(F.avg("cos")).first()[0]
    )


def ivf_search(
    emb: DataFrame,
    n_cells: int = 8,
    n_queries: int = 10,
    nprobe: int = 2,
    k: int = 5,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF top-k search: probe only the ``nprobe`` cells nearest each
    query, exact cosine inside the probed cells — the standard
    recall/cost dial (nprobe = n_cells degenerates to brute force).

    Scale shape: both the query set and the (query, probed-cell) table are
    broadcast; the corpus is scanned ONCE with its cell assignment and
    joined on the cell equi-key, so candidate fanout is bounded by the
    probed cells' sizes, never all-pairs. Output mirrors ``cosine_topk``
    (query_id, neighbor_id, rank, cos) for side-by-side recall checks.
    """
    corpus = _assign(emb, n_cells, centroids).select(
        F.col("vec_id").alias("neighbor_id"), "cell", "t"
    )

    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").cast("long").alias("query_id"),
        F.col("embedding").alias("q"),
    )
    cents = _centroids(emb, n_cells, centroids)
    qc = queries.join(F.broadcast(cents)).withColumn(
        "qcos", F.round(cosine(F.col("q"), F.col("c")), 6)
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("cell").asc()
    )
    probes = (
        qc.withColumn("prank", F.row_number().over(wq))
        .filter(F.col("prank") <= nprobe)
        .select("query_id", "q", "cell")
    )
    scored = corpus.join(F.broadcast(probes), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    ).withColumn("cos", F.round(cosine(F.col("q"), F.col("t")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def sign_bucket(emb_col: Column, n_bits: int = 8) -> Column:
    """Axis-aligned hyperplane LSH bucket: bit j = sign(v[j] > 0).

    ``F.get`` (null for out-of-range, never an ANSI INVALID_ARRAY_INDEX)
    makes dims beyond the embedding length contribute bit 0 in BOTH ANSI
    and legacy modes. Default n_bits matches ``sign_lsh_near_dup`` and
    the DuckDB oracle, so the published bucket table and the near-dup
    path agree on bucket ids."""
    bucket = F.lit(0).cast("long")
    for j in range(n_bits):
        bucket = bucket + F.when(
            F.get(emb_col, j) > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def sign_lsh_buckets(emb: DataFrame, n_bits: int = 8) -> DataFrame:
    """(vec_id, bucket) assignment table."""
    return emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        sign_bucket(F.col("embedding"), n_bits).alias("bucket"),
    )


#: sign buckets above this size sub-split into rank chunks — same posture
#: (and size) as the IVF cell cap; bounds every join group at O(cap²)
DEFAULT_MAX_BUCKET_SIZE = 48


def sign_lsh_near_dup(
    emb: DataFrame,
    n_bits: int = 8,
    threshold: float = 0.3,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """LSH-bucketed near-dup: candidates share a sign-bucket (equi-join on
    bucket id — the scale path), verified by exact cosine.

    Scale posture: bucket count is 2^n_bits — a CONSTANT — so occupancy
    (and the per-bucket O(|bucket|²) join) grows linearly with the corpus.
    Two dials keep that bounded, mirroring ``label_blocked_near_dup``:

    * ``n_bits`` should scale with the corpus — pick roughly
      log2(n / target_occupancy) (each added bit halves expected
      occupancy; n_bits is capped by the embedding dimension for this
      axis-aligned family).
    * ``max_bucket_size`` (ON by default) sub-splits buckets above the
      cap into rank chunks of EXACTLY ≤ cap rows (row_number over
      vec_id), so every join group is O(cap²) no matter how skewed the
      sign distribution — a hash split would only bound the EXPECTED
      size. Trades recall (cross-chunk pairs are lost), the standard
      LSH posture; pass None to disable when recall matters more than
      bounded cost."""
    v = emb.select("vec_id", "embedding").withColumn(
        "bucket", sign_bucket(F.col("embedding"), n_bits)
    )
    sub_cond = []
    if max_bucket_size is not None:
        w = Window.partitionBy("bucket").orderBy("vec_id")
        v = v.withColumn(
            "_sub",
            F.floor(
                (F.row_number().over(w) - F.lit(1)) / F.lit(max_bucket_size)
            ).cast("long"),
        )
        sub_cond = [F.col("a._sub") == F.col("b._sub")]
    # pin the join-key exchange so both self-join sides share one shuffle
    # stage (the bucket computation and scan run once, not per side; the
    # join shuffles on bucket anyway) — same reuse shape as the LSH band
    # join in dedup_docs.minhash_lsh_candidates
    v = v.repartition("bucket")
    a, b = v.alias("a"), v.alias("b")
    cond = (F.col("a.bucket") == F.col("b.bucket")) & (
        F.col("a.vec_id") < F.col("b.vec_id")
    )
    for c in sub_cond:
        cond = cond & c
    pairs = a.join(b, cond)
    return (
        pairs.withColumn("cos", F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6))
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.bucket").alias("bucket"),
            "cos",
        )
    )

# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup, Abbas et al. 2023): cluster the corpus with
# the IVF quantizer, then within each cell drop every vector that has a
# sufficiently-cosine-similar lower-id neighbor. The cluster step turns
# the O(n²) semantic-similarity space into Σ_cell O(|cell|²), and the
# occupancy cap bounds each join group like the rest of the ANN family.
# ---------------------------------------------------------------------------

SEMANTIC_DUP_THRESHOLD = 0.40


def semantic_dedup(
    emb: DataFrame,
    n_cells: int = 8,
    threshold: float = SEMANTIC_DUP_THRESHOLD,
    centroids: DataFrame | None = None,
    max_cell_size: int | None = DEFAULT_MAX_CELL_SIZE,
) -> DataFrame:
    """SemDeDup over the embedding column: (vec_id, cell, dup_of, keep).

    A vector is a semantic duplicate (keep = 0) when a SMALLER-id vector
    in its IVF cell has cosine ≥ threshold; ``dup_of`` is the smallest
    such id (deterministic canonical representative, mirroring
    exact_dedup's min-doc_id rule). Assignment is the shared ``_assign``
    plan — broadcast centroids, map-side top-1 — so the corpus is scanned
    once; candidates only meet inside a cell (and, with the default
    occupancy cap, inside a ≤cap rank-chunk, so every join group is
    O(cap²) regardless of how skewed the clustering is — same posture and
    same recall trade as ``label_blocked_near_dup``, documented there).

    Pass ``centroids=train_centroids(emb, k)`` for Lloyd-refined cells;
    the default seeded init keeps the op fully deterministic with zero
    extra passes. Reference has no analog (semantic curation is out of
    its scope); semantics follow the published SemDeDup procedure with
    min-id in place of "farthest from centroid" as the kept exemplar —
    the keep-rule is a tie-break policy, not the algorithm's substance,
    and min-id is reproducible across engines.
    """
    assigned = _assign(emb, n_cells, centroids).select("vec_id", "cell", "t")
    if max_cell_size is not None:
        w = Window.partitionBy("cell").orderBy("vec_id")
        assigned = assigned.withColumn(
            "_sub",
            F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(max_cell_size)).cast(
                "long"
            ),
        )
    a = assigned.alias("a")
    b = assigned.alias("b")
    cond = (F.col("a.cell") == F.col("b.cell")) & (
        F.col("b.vec_id") < F.col("a.vec_id")
    )
    if max_cell_size is not None:
        cond = cond & (F.col("a._sub") == F.col("b._sub"))
    dup_of = (
        a.join(b, cond)
        .filter(F.round(cosine(F.col("a.t"), F.col("b.t")), 6) >= threshold)
        .groupBy(F.col("a.vec_id").alias("vec_id"))
        .agg(F.min(F.col("b.vec_id")).cast("long").alias("dup_of"))
    )
    return (
        assigned.join(dup_of, "vec_id", "left")
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("cell").cast("long").alias("cell"),
            "dup_of",
            F.col("dup_of").isNull().cast("int").alias("keep"),
        )
    )
