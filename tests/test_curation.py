"""Tests for corpus-curation operators (airbyte_spark/ops/curation.py):
decontamination, PII redaction, deterministic splits/samples.

Small hand-checkable corpora; determinism is the core contract (every op
must be a pure function of its input so the DuckDB oracle and any re-run
reproduce it bit-for-bit).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbyte_spark.ops.curation import (
    decontaminate,
    ngram_hashes,
    pack_sequences,
    redact_pii,
    sample_per_stratum,
    split_bucket,
    stratified_split,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "a b c d e f", "en"),
            (2, "a b c d x y", "en"),      # shares gram "a b c d" with 1
            (3, "p q r s t u", "en"),      # clean
            (4, "x", "de"),                # shorter than n — zero grams
            (5, "a b c d e f g", "de"),    # shares two grams with 1
        ],
        ["doc_id", "text", "lang"],
    )


def _toks(df):
    # ngram_hashes takes a MATERIALIZED token array (an inline split would
    # re-run once per gram inside the interpreted HOF lambda)
    return df.select("doc_id", F.split(F.trim("text"), r"\s+").alias("_toks"))


def test_ngram_hashes_short_doc_empty(spark):
    df = _toks(spark.createDataFrame([(1, "a b"), (2, "")], ["doc_id", "text"]))
    rows = df.select(F.size(ngram_hashes(F.col("_toks"), 4)).alias("n")).collect()
    assert [r["n"] for r in rows] == [0, 0]


def test_ngram_hashes_distinct(spark):
    # repeated gram collapses: "a b a b a b" has 3 bigrams, 2 distinct
    df = _toks(spark.createDataFrame([(1, "a b a b a b")], ["doc_id", "text"]))
    assert df.select(F.size(ngram_hashes(F.col("_toks"), 2)).alias("n")).head()["n"] == 2


def test_decontaminate_counts(spark, corpus):
    bench = corpus.filter(F.col("doc_id") == 1)
    rest = corpus.filter(F.col("doc_id") != 1)
    got = {r["doc_id"]: (r["n_hits"], r["contaminated"])
           for r in decontaminate(rest, bench, n=4).collect()}
    # doc 2: grams {a b c d, b c d x, c d x y} -> 1 hit
    # doc 5: grams of "a b c d e f g" overlap bench's {a b c d, b c d e, c d e f} on 3
    assert got[2] == (1, 1)
    assert got[5] == (3, 1)
    assert got[3] == (0, 0)
    assert got[4] == (0, 0)  # zero-gram doc still reported, clean
    assert set(got) == {2, 3, 4, 5}


def test_decontaminate_plan_broadcasts_benchmark(spark, corpus):
    bench = corpus.filter(F.col("doc_id") == 1)
    plan = decontaminate(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-1.org or d@e.co thanks"),
            (2, "call +1 (555) 010-1234 or 555 123 4567"),
            (3, "email x@y.io then call 555-010-9999 ok"),
            (4, "nothing here"),
            (5, ""),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[1]["n_emails"] == 2 and got[1]["n_phones"] == 0
    assert got[1]["redacted"] == "mail <EMAIL> or <EMAIL> thanks"
    assert got[2]["n_emails"] == 0 and got[2]["n_phones"] == 2
    assert got[2]["redacted"] == "call <PHONE> or <PHONE>"
    assert got[3]["n_emails"] == 1 and got[3]["n_phones"] == 1
    assert got[3]["redacted"] == "email <EMAIL> then call <PHONE> ok"
    assert got[4]["redacted"] == "nothing here"
    assert got[5]["redacted"] == ""


def test_redact_order_email_before_phone(spark):
    # digits inside an email must not survive as a phone match
    df = spark.createDataFrame([(1, "u15551234567@example.com")], ["doc_id", "text"])
    r = redact_pii(df).head()
    assert r["redacted"] == "<EMAIL>" and r["n_phones"] == 0


def test_stratified_split_deterministic_and_partitioned(spark, corpus):
    a = stratified_split(corpus).collect()
    b = stratified_split(corpus.repartition(5)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    for r in a:
        assert r["split"] == (
            "train" if r["bucket"] < 800 else "val" if r["bucket"] < 900 else "test"
        )
        assert 0 <= r["bucket"] < 1000


def test_stratified_split_stable_under_append(spark, corpus):
    # an existing row's assignment never moves when new rows arrive
    before = {r["doc_id"]: r["split"] for r in stratified_split(corpus).collect()}
    grown = corpus.unionByName(
        spark.createDataFrame([(99, "z z z z", "fr")], ["doc_id", "text", "lang"])
    )
    after = {r["doc_id"]: r["split"] for r in stratified_split(grown).collect()}
    assert all(after[k] == v for k, v in before.items())


def test_split_bucket_salt_independence(spark, corpus):
    two = corpus.select(
        split_bucket(F.col("doc_id"), "split").alias("a"),
        split_bucket(F.col("doc_id"), "sample").alias("b"),
    ).collect()
    # different salts give different (independent) assignments
    assert any(r["a"] != r["b"] for r in two)


def test_sample_per_stratum_k_and_determinism(spark, corpus):
    got = sample_per_stratum(corpus, k=2).collect()
    per = {}
    for r in got:
        per.setdefault(r["stratum"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
    assert all(len(v) <= 2 for v in per.values())
    again = sample_per_stratum(corpus.repartition(7), k=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_curate_cli_end_to_end(spark, tmp_path):
    """curate.py over a corpus with a known dup, a junk doc, and one
    contaminated doc: the output holds exactly the survivors, each with a
    split, train rows packed, and the stats line accounts every stage."""
    from airbyte_spark import curate

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again today", "en"),
        (2, "the quick brown fox jumps over the lazy dog again today", "en"),  # dup of 1
        (3, "!!!! ???? ....", "en"),                                           # junk
        (4, "a completely distinct and quite long document of words here", "en"),
        (5, "der hund lief und die katze schlief im haus dort", "de"),
        (6, "secret eval answer sequence alpha beta gamma delta epsilon", "en"),  # contaminated
    ]
    bench_rows = [(100, "answer sequence alpha beta gamma delta", "en")]
    docs_dir = str(tmp_path / "docs")
    bench_dir = str(tmp_path / "bench")
    out_dir = str(tmp_path / "curated")
    cols = ["doc_id", "text", "lang"]
    spark.createDataFrame(rows, cols).write.parquet(docs_dir)
    spark.createDataFrame(bench_rows, cols).write.parquet(bench_dir)

    stats = curate.main([
        "--docs-dir", docs_dir,
        "--out", out_dir,
        "--benchmark-dir", bench_dir,
        "--min-quality", "0.2",
        "--decontaminate-n", "4",
        "--budget", "16",
        "--n-shards", "2",
    ])
    assert stats["rows_in"] == 6
    assert stats["rows_after_exact_dedup"] == 5          # dup collapsed
    assert stats["rows_after_quality"] == 4              # junk dropped
    assert stats["rows_after_decontaminate"] == 3        # leak dropped
    got = spark.read.parquet(out_dir)
    ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert ids == {1, 4, 5}
    r = {row["doc_id"]: row for row in got.collect()}
    for i in ids:
        assert r[i]["split"] in ("train", "val", "test")
        assert r[i]["quality"] >= 0.2
        if r[i]["split"] == "train":
            assert r[i]["pack_id"] is not None and r[i]["n_tokens"] > 0
        else:
            assert r[i]["pack_id"] is None
    assert sum(stats["split_counts"].values()) == 3


def test_curate_cli_repetition_and_mixture(spark, tmp_path):
    """--drop-repetitive removes the Gopher-flagged doc; --mixture
    downsamples to the target token shares (binding domain keeps rate 1,
    untargeted domains drop) and the stats line accounts the stage."""
    from airbyte_spark import curate

    rows = [
        (1, "spam " * 30, "en"),  # repetitive: one token repeated 30x
        (2, "a perfectly ordinary english document with the usual words in it", "en"),
        (3, "another clean and quite ordinary english text of the corpus here", "en"),
        (4, "ein ganz gewoehnliches deutsches dokument mit vielen worten drin", "de"),
        (5, "zh only words that are not targeted by the mixture at all", "zh"),
    ]
    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "curated")
    spark.createDataFrame(rows, ["doc_id", "text", "lang"]).write.parquet(docs_dir)

    stats = curate.main([
        "--docs-dir", docs_dir,
        "--out", out_dir,
        "--drop-repetitive",
        "--mixture", '{"de": 1.0}',
        "--budget", "16",
        "--n-shards", "2",
    ])
    assert stats["rows_in"] == 5
    # doc 1 dies at the quality+repetition stage
    assert stats["rows_after_quality"] == 4
    # de is the only targeted domain: everything else drops at mixture
    assert stats["rows_after_mixture"] == 1
    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got == {4}


def test_sample_per_stratum_carry_cols(spark, corpus):
    got = sample_per_stratum(corpus, k=1, carry_cols=("text",)).collect()
    assert {"doc_id", "stratum", "text", "rank"} == set(got[0].asDict())


def test_pack_sequences_budget_bound(spark):
    # 40 docs of 3-7 tokens, one shard so packing order is fully checked
    rows = [(i, " ".join(["tok"] * (3 + i % 5))) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = pack_sequences(df, budget=10, n_shards=1).collect()
    per_pack: dict[int, int] = {}
    max_doc = 0
    for r in got:
        per_pack[r["pack_id"]] = per_pack.get(r["pack_id"], 0) + r["n_tokens"]
        max_doc = max(max_doc, r["n_tokens"])
    # streaming-packing bound: every pack < budget + max doc size
    assert all(v < 10 + max_doc for v in per_pack.values())
    # packs are contiguous 0..P-1 within the single shard
    assert sorted(per_pack) == list(range(len(per_pack)))
    # total token mass is conserved
    assert sum(per_pack.values()) == sum(3 + i % 5 for i in range(40))


def _h60_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_pack_sequences_matches_python_model(spark):
    """Exact-model check incl. an oversize doc: replay the packing rule in
    python (hash order, running cumsum, interval-start pack) and require
    identical assignments — also proves nothing co-packs AFTER an
    oversize doc inside its overflowed pack."""
    sizes = {1: 2, 2: 50, 3: 2, 4: 7, 5: 9}
    budget, n_shards = 10, 1
    df = spark.createDataFrame(
        [(i, " ".join(["x"] * s)) for i, s in sizes.items()], ["doc_id", "text"]
    )
    order = sorted(sizes, key=lambda i: (_h60_py(f"{i}:pack"), i))
    cum, expected = 0, {}
    for i in order:
        expected[i] = ((cum // budget) * n_shards, sizes[i])
        cum += sizes[i]
    got = {
        r["doc_id"]: (r["pack_id"], r["n_tokens"])
        for r in pack_sequences(df, budget=budget, n_shards=n_shards).collect()
    }
    assert got == expected


def test_pack_sequences_rejects_degenerate_params(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        pack_sequences(df, budget=0)
    with pytest.raises(ValueError):
        pack_sequences(df, budget=16, n_shards=0)


from hypothesis import given, settings, strategies as st

_WORDS = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
_TEXTS = st.lists(_WORDS, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(
    corpus_rows=st.lists(_TEXTS, min_size=1, max_size=12),
    bench_rows=st.lists(_TEXTS, min_size=1, max_size=4),
    n=st.sampled_from([2, 3]),
)
def test_decontaminate_matches_bruteforce(spark, corpus_rows, bench_rows, n):
    """Property: for ANY corpus/benchmark (tiny shared vocabulary forces
    overlaps), per-doc n_hits equals a brute-force python recount of
    distinct-gram intersections."""
    def grams(text: str) -> set:
        toks = text.split()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    corpus = spark.createDataFrame(
        list(enumerate(corpus_rows)), ["doc_id", "text"]
    )
    bench = spark.createDataFrame(
        list(enumerate(bench_rows)), ["doc_id", "text"]
    )
    bench_set = set().union(*(grams(t) for t in bench_rows))
    expected = {
        i: len(grams(t) & bench_set) for i, t in enumerate(corpus_rows)
    }
    got = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(corpus, bench, n=n).collect()
    }
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    sizes=st.lists(st.integers(0, 30), min_size=1, max_size=30),
    budget=st.sampled_from([1, 7, 64]),
)
def test_pack_sequences_bound_property(spark, sizes, budget):
    """Property: for ANY doc-size mix and budget, every pack's token sum
    stays below budget + max doc size and token mass is conserved. (Pack
    ids within a shard need NOT be contiguous: a doc longer than the
    budget spans several budget windows, and the next doc starts in a
    later pack — the intervening ids are simply never issued.)"""
    rows = [(i, " ".join(["w"] * s)) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = pack_sequences(df, budget=budget, n_shards=2).collect()
    per_pack: dict[int, int] = {}
    for r in got:
        # interleaved numbering: shard always recoverable, never aliased
        assert r["pack_id"] >= 0 and r["shard"] == r["pack_id"] % 2
        per_pack[r["pack_id"]] = per_pack.get(r["pack_id"], 0) + r["n_tokens"]
    cap = budget + max(sizes)
    assert all(v < cap for v in per_pack.values())
    assert sum(per_pack.values()) == sum(sizes)


def test_pack_sequences_deterministic(spark):
    rows = [(i, " ".join(["w"] * (1 + i % 9))) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(map(tuple, pack_sequences(df, budget=16, n_shards=4).collect()))
    b = sorted(map(tuple, pack_sequences(df.repartition(7), budget=16, n_shards=4).collect()))
    assert a == b
    # interleaved pack ids never collide across shards
    shards = {t[1] for t in a}
    assert len(shards) > 1
    for (_, shard, pack_id, _n) in a:
        assert pack_id % 4 == shard


def test_curate_cli_line_stages(spark, tmp_path):
    """--line-dedup strips corpus-wide boilerplate lines first,
    --line-filter then applies the C4 rule chain; docs left with < 3
    lines drop, survivors carry the cleaned text downstream."""
    from airbyte_spark import curate

    boiler = "subscribe now to our newsletter"
    good = [
        "the quick brown fox runs fast today number {i} one.",
        "a second perfectly ordinary sentence for document {i} two.",
        "and a third clean closing line for document {i} three.",
    ]
    rows = []
    for i in range(12):  # boilerplate occurs 13x >= min_count 10
        rows.append((i, "\n".join([boiler] + [g.format(i=i) for g in good]), "en"))
    # boiler + only 2 good lines -> line-filter drops it (< 3 kept)
    rows.append((50, "\n".join([boiler] + [g.format(i=50) for g in good[:2]]), "en"))
    # 3 good lines + a marker line the filter strips (doc survives)
    rows.append(
        (51, "\n".join([g.format(i=51) for g in good]
                       + ["please enable javascript to continue here."]), "en")
    )
    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "curated")
    spark.createDataFrame(rows, ["doc_id", "text", "lang"]).write.parquet(docs_dir)

    stats = curate.main([
        "--docs-dir", docs_dir,
        "--out", out_dir,
        "--line-dedup", "10",
        "--line-filter",
        "--budget", "32",
        "--n-shards", "2",
    ])
    assert stats["rows_in"] == 14
    assert stats["rows_after_line_dedup"] == 14  # rewrites, never drops
    assert stats["rows_after_line_filter"] == 13  # doc 50 out
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out_dir).collect()}
    assert 50 not in got and 51 in got
    for t in got.values():
        assert boiler not in t and "javascript" not in t
    assert got[51].count("\n") == 2  # exactly the 3 good lines remain
