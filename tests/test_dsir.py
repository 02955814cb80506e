"""DSIR importance-sampling tests: exact brute-force model comparison
(including the micro-unit ln quantization), direction sanity, robustness
to bigram-less docs, and partitioning invariance of the integer scores."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from airbyte_spark.ops.curation import DSIR_BUCKETS, dsir_scores


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _q6ln(x: int) -> int:
    # Python round() is banker's; Spark/DuckDB round() is half-away —
    # match them explicitly
    v = math.log(x) * 1e6
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _model(corpus: list[tuple[int, str]], target: list[tuple[int, str]]):
    """Pure-Python mirror of dsir_scores (B buckets, add-one smoothing)."""
    B = DSIR_BUCKETS

    def buckets(text):
        toks = text.split()
        return [
            _h60(f"{toks[i]} {toks[i + 1]}") % B
            for i in range(len(toks) - 1)
        ]

    tc = [0] * B
    for _, t in target:
        for b in buckets(t):
            tc[b] += 1
    cc = [0] * B
    for _, t in corpus:
        for b in buckets(t):
            cc[b] += 1
    w_rel = [_q6ln(tc[b] + 1) - _q6ln(cc[b] + 1) for b in range(B)]
    lnT, lnC = _q6ln(sum(tc) + B), _q6ln(sum(cc) + B)
    out = {}
    for d, t in corpus:
        bs = buckets(t)
        n = len(bs)
        logw = sum(w_rel[b] for b in bs) - n * (lnT - lnC)
        out[d] = (n, logw if n else 0)
    return out


@pytest.fixture(scope="module")
def fixture(spark):
    target = [(1000 + i, "spark sql merge " * 4) for i in range(3)]
    corpus = [
        (1, "spark sql merge spark sql merge spark sql"),  # target-like
        (2, "wombat quokka platypus echidna wombat quokka"),  # unlike
        (3, "spark sql wombat quokka merge spark platypus"),  # mixed
        (4, "solo"),  # no bigrams
        (5, ""),  # empty
    ]
    cdf = spark.createDataFrame(corpus, ["doc_id", "text"])
    tdf = spark.createDataFrame(target, ["doc_id", "text"])
    return corpus, target, cdf, tdf


def test_dsir_matches_brute_force(spark, fixture):
    corpus, target, cdf, tdf = fixture
    want = _model(corpus, target)
    got = {
        r.doc_id: (r.n_bigrams, r.logw_micro)
        for r in dsir_scores(cdf, tdf).collect()
    }
    assert got == want


def test_dsir_direction_and_selection(spark, fixture):
    corpus, target, cdf, tdf = fixture
    rows = {r.doc_id: r for r in dsir_scores(cdf, tdf).collect()}
    # target-like doc scores above the dissimilar one, and is selected
    assert rows[1].avg_logw > rows[2].avg_logw
    assert rows[1].selected == 1 and rows[2].selected == 0
    # mixed doc sits strictly between
    assert rows[2].avg_logw < rows[3].avg_logw < rows[1].avg_logw


def test_dsir_bigramless_docs_scored_not_dropped(spark, fixture):
    corpus, target, cdf, tdf = fixture
    rows = {r.doc_id: r for r in dsir_scores(cdf, tdf).collect()}
    for d in (4, 5):
        assert rows[d].n_bigrams == 0
        assert rows[d].logw_micro == 0
        assert rows[d].avg_logw == 0.0
        assert rows[d].selected == 0


def test_dsir_partitioning_invariance(spark, fixture):
    corpus, target, cdf, tdf = fixture
    base = {
        r.doc_id: r.logw_micro for r in dsir_scores(cdf, tdf).collect()
    }
    shuffled = {
        r.doc_id: r.logw_micro
        for r in dsir_scores(cdf.repartition(7), tdf.repartition(5)).collect()
    }
    assert base == shuffled
