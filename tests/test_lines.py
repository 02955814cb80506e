"""Tests for line-level curation ops (C4 rule-chain filtering and
RefinedWeb corpus-level line dedup): hand-checkable fixtures plus a
brute-force model comparison, and plan asserts for the scale claims
(filter is shuffle-free; dedup's only wide stages are the line-hash agg,
the count join, and the per-doc regroup)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbyte_spark.ops.lines import (
    LINE_DUP_MIN_COUNT,
    MIN_KEPT_LINES,
    c4_line_filter,
    line_corpus_dedup,
)


# ---------------------------------------------------------------------------
# c4_line_filter
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def filter_docs(spark):
    return spark.createDataFrame(
        [
            # 3 good lines -> doc kept
            (
                1,
                "alpha beta gamma delta epsilon.\n"
                "one two three four five!\n"
                'quoted words here four five"',
            ),
            # good + each rule violated once -> 1 kept < 3 -> doc dropped
            (
                2,
                "alpha beta gamma delta epsilon.\n"
                "too short here.\n"                       # < 5 words
                "no terminal punctuation on this line\n"  # no [.!?"]
                "please enable JavaScript to continue viewing.\n"  # marker
                "we use Cookie banners on this site.\n"            # marker
                "this object has a { brace inside.\n"              # marker
                "classic Lorem Ipsum filler text here.",           # marker
            ),
            (3, ""),  # empty text -> one empty line, nothing kept
        ],
        ["doc_id", "text"],
    )


def test_c4_rule_chain(spark, filter_docs):
    rows = {r.doc_id: r for r in c4_line_filter(filter_docs).collect()}
    assert rows[1].n_lines == 3 and rows[1].n_kept == 3
    assert rows[1].doc_kept == 1
    assert rows[1].clean_text == filter_docs.filter("doc_id=1").first().text
    assert rows[2].n_lines == 7 and rows[2].n_kept == 1
    assert rows[2].doc_kept == 0
    assert rows[2].clean_text == "alpha beta gamma delta epsilon."
    assert rows[2].kept_frac == pytest.approx(round(1 / 7, 6))
    assert rows[3].n_lines == 1 and rows[3].n_kept == 0
    assert rows[3].clean_text == "" and rows[3].kept_frac == 0.0
    assert MIN_KEPT_LINES == 3  # the doc-level rule the fixture exercises


def test_c4_filter_is_shuffle_free(spark, filter_docs):
    plan = c4_line_filter(filter_docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scan -> project only, at any scale


def test_c4_min_kept_lines_override(spark, filter_docs):
    out = {r.doc_id: r for r in c4_line_filter(filter_docs, min_kept_lines=1).collect()}
    assert out[2].doc_kept == 1  # one surviving line suffices now


# ---------------------------------------------------------------------------
# line_corpus_dedup
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dedup_docs_fixture(spark):
    boiler = "subscribe to our newsletter"
    rows = []
    # 12 docs each carrying the boilerplate line (>= default threshold 10)
    # plus one unique line; doc 100 is boilerplate-only; doc 101 has a
    # line repeated 3x corpus-wide (below threshold -> kept)
    for i in range(12):
        rows.append((i, f"{boiler}\nunique line number {i}"))
    rows.append((100, boiler))
    rows.append((101, "three times line\nmiddle content here"))
    rows.append((102, "three times line"))
    rows.append((103, "Three Times LINE"))  # case-folds to the same key
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_line_corpus_dedup_threshold(spark, dedup_docs_fixture):
    out = {r.doc_id: r for r in line_corpus_dedup(dedup_docs_fixture).collect()}
    assert LINE_DUP_MIN_COUNT == 10
    for i in range(12):
        assert out[i].n_lines == 2 and out[i].n_removed == 1
        assert out[i].clean_text == f"unique line number {i}"
    # boilerplate-only doc survives as an empty string, not a lost row
    assert out[100].n_lines == 1 and out[100].n_removed == 1
    assert out[100].clean_text == ""
    # 3 occurrences (case-insensitive) < 10 -> kept everywhere
    assert out[101].n_removed == 0
    assert out[101].clean_text == "three times line\nmiddle content here"
    assert out[103].n_removed == 0


def test_line_corpus_dedup_lower_threshold_and_order(spark, dedup_docs_fixture):
    out = {
        r.doc_id: r
        for r in line_corpus_dedup(dedup_docs_fixture, min_count=3).collect()
    }
    # now the 3x line is removed too (normalization counts doc 103's
    # variant), and surviving lines keep their original order
    assert out[101].n_removed == 1
    assert out[101].clean_text == "middle content here"
    assert out[102].clean_text == "" and out[103].clean_text == ""


def test_line_corpus_dedup_vs_brute_force(spark):
    # adversarial mix: repeated mid-doc lines, whitespace-variant
    # normalization, multi-line survivors whose order must be preserved
    import collections

    docs = []
    for d in range(30):
        lines = [f"common header line" if d % 2 == 0 else f"doc {d} intro"]
        lines += [f"doc {d} body {j}" for j in range(d % 4)]
        if d % 3 == 0:
            lines.append("  COMMON header LINE ")  # same normalized key
        docs.append((d, "\n".join(lines)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    min_count = 5
    counts = collections.Counter(
        ln.strip().lower() for _, t in docs for ln in t.split("\n")
    )
    expected = {}
    for d, t in docs:
        lines = t.split("\n")
        kept = [ln for ln in lines if counts[ln.strip().lower()] < min_count]
        expected[d] = (len(lines), len(lines) - len(kept), "\n".join(kept))
    got = {
        r.doc_id: (r.n_lines, r.n_removed, r.clean_text)
        for r in line_corpus_dedup(df, min_count=min_count).collect()
    }
    assert got == expected


def test_line_corpus_dedup_plan_shape(spark, dedup_docs_fixture):
    # inverted-index shape: the count side is an aggregate on the line
    # hash (hot boilerplate collapses map-side), never a cartesian or
    # broadcast-nested-loop pairing of occurrences
    plan = (
        line_corpus_dedup(dedup_docs_fixture)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
