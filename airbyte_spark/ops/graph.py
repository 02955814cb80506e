"""Distributed connected components — near-dup PAIRS become dedup
CLUSTERS (the step after every candidate generator in dedup_docs.py: a
curation pipeline keeps one canonical document per component, not per
pair).

Algorithm: iterative min-label propagation with POINTER JUMPING —
every node starts labeled with itself; each round takes the min label
across its neighborhood, then jumps to its label's label (path halving),
so label trees flatten geometrically and convergence is O(log diameter)
rounds, not O(diameter). All state is (node:long, comp:long) pairs: the
shuffles never carry text, and each round is two equi-joins + one
hash-aggregate. Lineage is truncated per round (localCheckpoint) — the
standard iterative-Spark guard against plan blowup. Convergence is
detected by an order-independent label checksum, so the loop stops as
soon as a round changes nothing (max_iter is a backstop, not the usual
exit).

Skew note: after a few rounds every member of a big component joins on
the SAME comp value in the jump step; AQE skew-join splits those
partitions at runtime. For dedup clusters (components of a handful of
near-identical docs) the keys are inherently fine-grained. Graphs with
billion-node components would want the large-star/small-star formulation
(Kiveris et al., "Connected Components in MapReduce and Beyond") whose
per-round fanout is provably bounded; for the dedup use case the simpler
propagation wins on constant factors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_iter: int = 25,
) -> DataFrame:
    """``(node, component)`` for every node; component = min node id in
    its component (isolated nodes are their own component — a dedup
    pipeline keeps exactly the ``node == component`` rows as canonical).

    ``nodes``: one column ``node`` (long). ``edges``: columns ``src``,
    ``dst`` (long) — undirected, direction/duplicates/self-loops are
    normalized away here.
    """
    n = nodes.select(F.col("node").cast("long")).distinct()
    e = (
        edges.select(
            F.col("src").cast("long").alias("a"), F.col("dst").cast("long").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
    )
    # drop edges touching ids outside `nodes` — otherwise a stray endpoint
    # leaks into the output AND can become a component id with no member
    # row, breaking the node == component canonical-pick contract
    e = e.join(n, e["a"] == n["node"], "left_semi")
    e = e.join(n, e["b"] == n["node"], "left_semi")
    # undirected: both directions once
    ed = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().localCheckpoint(eager=True)

    lbl = n.withColumn("comp", F.col("node")).localCheckpoint(eager=True)
    prev_sum = None
    for _ in range(max_iter):
        # 1. propagate: min label over {self} ∪ neighbors
        nbr = (
            ed.join(lbl, ed["b"] == lbl["node"])
            .select(F.col("a").alias("node"), F.col("comp"))
        )
        lbl2 = (
            lbl.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # 2. pointer jumping: comp <- comp[comp] (path halving)
        x, y = lbl2.alias("x"), lbl2.alias("y")
        lbl2 = x.join(
            y, F.col("x.comp") == F.col("y.node"), "left"
        ).select(
            F.col("x.node").alias("node"),
            F.coalesce(F.col("y.comp"), F.col("x.comp")).alias("comp"),
        ).localCheckpoint(eager=True)
        # 3. order-independent convergence checksum — one tiny action
        # (bit_xor: rows are unique by node, xor never overflows ANSI)
        cur_sum = lbl2.agg(
            F.expr("bit_xor(xxhash64(node, comp))").alias("s")
        ).first()["s"]
        lbl = lbl2
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return lbl.select("node", F.col("comp").alias("component"))
