"""Corpus-scale quiet-window evidence for the dedup ladder's join constants.

The curation/dedupidx benches run on a replicated ~100k-500k doc corpus that
is adversarially dup-dense (every doc has hundreds of near-replicas), which
makes their timings candidate-OUTPUT-dominated. This tool measures the other
regime — the one that matters for the banding constructions at 10^10 docs:
a NATURAL-density corpus (unique docs + a 1% injected near-dup fraction)
big enough that join-key cardinality and bucket occupancy, not true-pair
output, dominate. Sections:

    minhash_banded      one-shot minhash_lsh_candidates over N docs
    simhash_banded      one-shot simhash_banded_pairs (block-permutation —
                        the round-5 construction whose whole point is
                        surviving this scale)
    exact_substring     one-shot exact_substring_dups (window-hash exact
                        tier; O(total tokens) shuffle, linear constant)
    minhash_index_flag  flag_and_ingest of a 1k-doc increment against the
                        N-doc MinHash index (pushdown regime)
    simhash_index_flag  simhash_flag_and_ingest of the same increment
                        against the N-doc SimHash index

The corpus is generated entirely with Catalyst expressions (md5-derived
tokens keyed on doc_id — no Python in the generate path) so generation
parallelizes and the timed sections measure the operators, not the driver.
Docs with doc_id % 100 == 1 reuse their predecessor's token seed with one
token changed: a deterministic 1% near-dup fraction so recall paths stay
exercised without quadratic output.

Adoption mirrors bench.py: a section lands in BENCH/bench_state.json (key
``dedupscale:<cpus>@<n_docs>``) only when its bracketing calibrations are
quiet (< 1s); BASELINE.md renders from persisted bests.

Usage: [DEDUP_SCALE_DOCS=5000000] python tools/dedup_scale_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import (  # noqa: E402
    CPUS,
    STATE_FILE,
    _load_state,
    bracket_calibration,
    get_spark,
    wait_for_quiet_host,
)

QUIET = 1.0
N_DOCS = int(os.environ.get("DEDUP_SCALE_DOCS", "5000000"))
#: comma-separated subset of sections to run (re-adopt a stormy one
#: without repaying the whole suite); empty = all
ONLY = {
    s for s in os.environ.get("DEDUP_SCALE_SECTIONS", "").split(",") if s
}


def _want(name: str) -> bool:
    return not ONLY or name in ONLY
INCREMENT_DOCS = 1000
TOKENS_PER_DOC = 16


def synth_corpus(spark, n_docs: int, id_offset: int = 0):
    """(doc_id, text) — TOKENS_PER_DOC unique-ish 8-char tokens per doc,
    all Catalyst expressions. 1% of docs near-duplicate their predecessor
    (same token seed, last token replaced)."""
    from pyspark.sql import functions as F

    df = spark.range(n_docs).select(
        (F.col("id") + id_offset).alias("doc_id")
    )
    seed = F.when(
        F.col("doc_id") % 100 == 1, F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    tok = (
        "transform(sequence(1, {n}), j -> substring(md5(concat(_seed, '-', j)), 1, 8))"
    ).format(n=TOKENS_PER_DOC)
    return (
        df.withColumn("_seed", seed.cast("string"))
        .withColumn("_toks", F.expr(tok))
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 100 == 1,
                F.concat_ws(
                    " ",
                    F.concat(
                        F.slice("_toks", 1, TOKENS_PER_DOC - 1),
                        F.array(F.lit("changed")),
                    ),
                ),
            )
            .otherwise(F.concat_ws(" ", "_toks"))
            .alias("text"),
        )
        .repartition(CPUS * 2)
    )


def main():
    from airbyte_spark.ops.dedup_docs import (
        minhash_band_table,
        minhash_lsh_candidates,
        simhash_band_table,
        simhash_banded_pairs,
    )
    from airbyte_spark.ops.dedup_index import (
        bootstrap_dedup_index,
        bootstrap_simhash_index,
        flag_and_ingest,
        simhash_flag_and_ingest,
    )

    spark = get_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synth_corpus(spark, N_DOCS).cache()
    corpus.count()
    # id-disjoint increment slices, one per (warm, timed) attempt per family
    incs = [
        synth_corpus(spark, INCREMENT_DOCS, id_offset=N_DOCS + i * INCREMENT_DOCS)
        for i in range(4)
    ]

    st = _load_state()
    key = f"dedupscale:{CPUS}@{N_DOCS}"
    entry = st.setdefault(key, {"sections": {}})
    entry.update(
        {
            "cpus": CPUS,
            "n_docs": N_DOCS,
            "increment_docs": INCREMENT_DOCS,
            "neardup_fraction": 0.01,
        }
    )

    calib = wait_for_quiet_host(threshold=QUIET)

    def record(name, sec, calib_post, denom):
        rec = {
            "sec": sec,
            "docs_per_sec": round(denom / sec, 1),
            "cpu_calibration_sec": max(calib, calib_post),
        }
        quiet = rec["cpu_calibration_sec"] < QUIET
        print(json.dumps({"section": name, **rec, "adopted": quiet}), flush=True)
        if quiet:
            cur = entry["sections"].get(name)
            if cur is None or sec < cur["sec"]:
                entry["sections"][name] = rec
        return calib_post

    def timed(name, job, denom):
        nonlocal calib
        t0 = time.time()
        job()
        sec = round(time.time() - t0, 3)
        calib = record(name, sec, bracket_calibration(), denom)

    noop = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731

    # --- one-shot banded ops over the full corpus ---------------------------
    if _want("minhash_banded"):
        timed("minhash_banded", lambda: noop(minhash_lsh_candidates(corpus)), N_DOCS)
    if _want("simhash_banded"):
        timed("simhash_banded", lambda: noop(simhash_banded_pairs(corpus)), N_DOCS)
    if _want("exact_substring"):
        from airbyte_spark.ops.dedup_docs import exact_substring_dups

        # the exact tier: O(total tokens) window-hash shuffle + two hash
        # aggregates — evidences the linear-in-corpus constant at the
        # same scale point as the banded families
        timed(
            "exact_substring",
            lambda: noop(exact_substring_dups(corpus)),
            N_DOCS,
        )

    if _want("line_dedup"):
        from airbyte_spark.ops.lines import line_corpus_dedup

        # RefinedWeb line-level corpus dedup: one line-hash aggregate +
        # count join + per-doc regroup — the hot "same boilerplate on
        # every page" key collapses map-side, so this evidences the
        # linear constant of the text-REWRITING dedup tier
        timed("line_dedup", lambda: noop(line_corpus_dedup(corpus)), N_DOCS)
    if _want("dsir"):
        from airbyte_spark.ops.curation import dsir_scores

        # DSIR importance scoring against a 10k-doc target sample: two
        # 256-key hash aggregates + broadcast weight join + one per-doc
        # aggregate — the map-dominated quality-scoring tier at the same
        # corpus point as the dedup families
        target = synth_corpus(spark, 10_000, id_offset=N_DOCS * 2)
        timed("dsir", lambda: noop(dsir_scores(corpus, target)), N_DOCS)

    # --- incremental flag paths against the indexed corpus ------------------
    tmp = tempfile.mkdtemp(prefix="dedup_scale_bench_")
    run_mh = _want("minhash_index_build") or _want("minhash_index_flag")
    run_sh = _want("simhash_index_build") or _want("simhash_index_flag")
    mh_index = bootstrap_dedup_index(
        spark, os.path.join(tmp, "mh"), n_buckets=CPUS
    )
    if run_mh:
        t0 = time.time()
        mh_index.append(minhash_band_table(corpus), fence=("bench", 0))
        record("minhash_index_build", round(time.time() - t0, 3),
               bracket_calibration(), N_DOCS)
        enumerate_it = iter(enumerate(incs[:2]))

        def mh_flag():
            i, inc = next(enumerate_it)
            flag_and_ingest(mh_index, inc, app_id="bench", batch_id=i + 1)

        mh_flag()  # warm
        timed("minhash_index_flag", mh_flag, INCREMENT_DOCS)

    if run_sh:
        sh_index = bootstrap_simhash_index(
            spark, os.path.join(tmp, "sh"), n_buckets=CPUS
        )
        t0 = time.time()
        sh_index.append(simhash_band_table(corpus), fence=("bench", 0))
        record("simhash_index_build", round(time.time() - t0, 3),
               bracket_calibration(), N_DOCS)
        enumerate_it = iter(enumerate(incs[2:]))

        def sh_flag():
            i, inc = next(enumerate_it)
            simhash_flag_and_ingest(
                sh_index, inc, app_id="bench", batch_id=i + 1
            )

        sh_flag()  # warm
        timed("simhash_index_flag", sh_flag, INCREMENT_DOCS)

    with open(STATE_FILE, "w") as f:
        json.dump(st, f, indent=1, sort_keys=True)
    _write_section(st)
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


def _write_section(st: dict):
    """Render EVERY persisted dedupscale:* scale point (largest corpus
    first), not just the current run's — a 50k smoke run must never
    silently replace the published 5M-doc evidence table. Each point
    renders its own persisted cpus / near-dup fraction / increment size
    (they are per-entry state, not global constants)."""
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    header = "## Dedup ladder at corpus scale (natural density, quiet window)"
    keys = sorted(
        (k for k in st if k.startswith("dedupscale:")
         and st[k].get("sections")),
        key=lambda k: st[k].get("n_docs", 0),
        reverse=True,
    )
    if not keys:
        print("no quiet-window dedup-scale measurement yet; BASELINE.md unchanged")
        return
    tables = []
    for k in keys:
        entry = st[k]
        rows = "\n".join(
            f"| {n} | {r['sec']} | {r['docs_per_sec']:,} | {r['cpu_calibration_sec']}s |"
            for n, r in sorted(entry["sections"].items())
        )
        tables.append(
            f"""### {entry.get('n_docs', 0):,} docs — local[{entry.get('cpus')}], \
{entry.get('neardup_fraction', 0):.0%} injected near-dups, \
{entry.get('increment_docs', 0):,}-doc flag increments (state key `{k}`)

| section | wall sec | docs/sec | cpu_calibration |
|---|---|---|---|
{rows}"""
        )
    all_tables = "\n\n".join(tables)
    body = f"""{header}

`python tools/dedup_scale_bench.py` — banding join constants on a
SYNTHETIC natural-density corpus (the regime where key cardinality —
not true-pair output — dominates); per-section best quiet-window
measurement (bracketing calibrations < {QUIET}s), per-point corpus
parameters in each heading. simhash_banded runs the round-5
block-permutation construction (C(6,3)=20 tables x 30-bit keys); the
flag sections time one flag increment against the fully-indexed
corpus; line_dedup / dsir are the text-rewriting and scoring tiers at
the same points.

{all_tables}
"""
    old = ""
    if os.path.exists(md):
        old = open(md).read()
    i = old.find(header)
    if i >= 0:
        j = old.find("\n## ", i + len(header))
        old = old[:i] + (old[j + 1:] if j >= 0 else "")
    if old and not old.endswith("\n"):
        old += "\n"
    with open(md, "w") as f:
        f.write(old + body)
    print(f"wrote {md} (dedup-scale section)")


if __name__ == "__main__":
    main()
