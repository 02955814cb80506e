"""Text-analysis operators for training-data curation over a `documents`
table (doc_id, text, ...): language ID, quality scoring, token counting,
document fingerprinting.

Everything is built from JVM-side ``pyspark.sql.functions`` (split / filter /
transform / regexp) — zero Python in the data path, so the whole stage stays
inside whole-stage codegen and scales linearly with input bytes. At 100 TB
these are embarrassingly parallel map-only stages: no shuffle at all (the
plans are scan → project), so they scale with executor count by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import h60

# Marker stopwords per language for the n-gram/stopword language heuristic.
# Tiny by design: the heuristic must be decidable and portable (the same CASE
# chain runs in the DuckDB oracle), not a real langid model.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "a"],
    "de": ["der", "und", "die", "das"],
    "fr": ["le", "et", "les", "la"],
    "es": ["el", "y", "los", "que"],
}

EN_STOPWORDS = ["the", "a", "and", "of", "to", "in"]

# BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation.
# Kept RE2-compatible (no lookarounds) so the oracle regex is identical.
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column) -> Column:
    """Whitespace tokens of a trimmed string column."""
    return F.split(F.trim(col), r"\s+")


def count_token(toks: Column, word: str) -> Column:
    """How many tokens equal `word` (exact match, case-sensitive)."""
    return F.size(F.filter(toks, lambda t: t == F.lit(word))).cast("long")


def marker_counts(toks: Column) -> dict[str, Column]:
    """Per-language marker-stopword hit counts."""
    out = {}
    for lang, words in LANG_MARKERS.items():
        c = None
        for w in words:
            cc = count_token(toks, w)
            c = cc if c is None else c + cc
        out[lang] = c.alias(f"{lang}_cnt")
    return out


def language_id(docs: DataFrame) -> DataFrame:
    """doc_id, per-language marker counts, lang_guess.

    The token array and per-language counts are materialized in nested
    selects so each is evaluated once per row (lambda bodies can't share
    subexpressions with the outer projection)."""
    toked = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), tokens(F.col("text")).alias("_toks")
    )
    counts = marker_counts(F.col("_toks"))
    counted = toked.select(
        "doc_id", *[counts[k].alias(f"{k}_cnt") for k in ("en", "de", "fr", "es")]
    )
    en, de, fr, es = [F.col(f"{k}_cnt") for k in ("en", "de", "fr", "es")]
    guess = (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de >= es) & (de > 0), F.lit("de"))
        .when((fr >= es) & (fr > 0), F.lit("fr"))
        .when(es > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )
    return counted.select(
        "doc_id", "en_cnt", "de_cnt", "fr_cnt", "es_cnt", guess.alias("lang_guess")
    )


def _quality_raw_cols(text: Column, toks: Column) -> list[Column]:
    """Raw per-row counters the quality ratios derive from; `toks` must be
    a MATERIALIZED token array (see language_id's note)."""
    stop = None
    for w in EN_STOPWORDS:
        c = count_token(toks, w)
        stop = c if stop is None else stop + c
    return [
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(text).cast("long").alias("n_chars"),
        F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("long").alias("_alpha"),
        stop.alias("_stop"),
    ]


def _quality_out_cols() -> list[Column]:
    """Quality ratios + composite over the raw counters."""
    # try_divide + coalesce: empty documents (n_chars/n_tokens = 0) are
    # exactly what a quality filter must SCORE (as 0), not crash on with
    # DIVIDE_BY_ZERO under ANSI mode (Spark 4 default)
    alpha_ratio = F.coalesce(
        F.try_divide(F.col("_alpha"), F.col("n_chars")), F.lit(0.0)
    )
    stop_ratio = F.coalesce(
        F.try_divide(F.col("_stop"), F.col("n_tokens")), F.lit(0.0)
    )
    return [
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(
            alpha_ratio * 0.5
            + stop_ratio * 0.3
            + F.least(F.col("n_tokens") / F.lit(200.0), F.lit(1.0)) * 0.2,
            6,
        ).alias("quality"),
    ]


def quality_score(docs: DataFrame) -> DataFrame:
    """Length / alpha-ratio / stopword-ratio quality features + composite.

    Mirrors the usual pretraining-corpus quality filters (C4/Gopher-style
    length+symbol heuristics) as pure column expressions; raw counts are
    materialized once, ratios derive from the materialized columns.
    """
    toked = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text"),
        tokens(F.col("text")).alias("_toks"),
    )
    base = toked.select(
        "doc_id", *_quality_raw_cols(F.col("text"), F.col("_toks"))
    )
    return base.select("doc_id", "n_tokens", "n_chars", *_quality_out_cols())


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per document."""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(tokens(F.col("text"))).cast("long").alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_REGEX)).cast("long").alias("bpe_tokens"),
    )


def fingerprint(docs: DataFrame, window: int = 8) -> DataFrame:
    """Winnowing-style rolling-hash document fingerprint: the minimum 60-bit
    hash over all `window`-char shingles. Robust to local edits (a single
    edit only perturbs `window` shingles), unlike a whole-document md5."""
    n = F.greatest(F.length("text") - (window - 1), F.lit(1))
    sh = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: h60(F.col("text").substr(i, F.lit(window))),
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.array_min(sh).alias("fingerprint"),
    )

def _word_ngrams(toks: Column, n: int) -> Column:
    """All word n-grams of a materialized token array (with repeats —
    repetition scoring needs multiplicity, unlike dedup shingling which
    distincts). <n tokens ⇒ empty list (no n-gram exists)."""
    cnt = F.size(toks) - (n - 1)
    return F.when(
        cnt >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + off) for off in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _max_multiplicity(arr: Column) -> Column:
    """Highest occurrence count of any single element, computed per row as
    the longest equal-run of the SORTED array — O(m log m) map-side fold
    (array_sort + aggregate), never an explode/groupBy shuffle. Empty
    array ⇒ 0."""
    return F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + F.lit(1).cast("long"))
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + F.lit(1).cast("long"))
                .otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


# Gopher-style repetition thresholds (Rae et al. 2021, table A1 spirit):
# a document is flagged repetitive when ANY ratio crosses its bar. The
# top-n-gram criteria only apply once the doc has at least MIN_NGRAMS
# n-grams — below that the max-multiplicity ratio is dominated by the
# denominator (a clean 6-token doc has top-trigram 1/4 = 0.25), and short
# docs are the length filter's job, not the repetition filter's.
REP_DUP_TOKEN_MAX = 0.60
REP_TOP_BIGRAM_MAX = 0.20
REP_TOP_TRIGRAM_MAX = 0.18
REP_MIN_NGRAMS = 16


def repetition_scores(docs: DataFrame) -> DataFrame:
    """Gopher/C4-style repetition quality filters, entirely map-only.

    Per document: ``dup_token_frac`` (1 − distinct/total tokens — a
    "the the the" page scores near 1), ``top_bigram_frac`` /
    ``top_trigram_frac`` (fraction of all word n-grams claimed by the
    single most frequent one — catches boilerplate loops that token-level
    stats miss), and the composite ``repetitive`` flag.

    At 100 TB this is a pure scan→project stage (zero shuffle, inside
    whole-stage codegen): the n-gram multiplicity is a per-row
    array_sort + fold, NOT an explode/groupBy, so cost is
    O(len · log len) per document and scales linearly with input bytes.
    Reference has no analog (quality filtering is out of its scope);
    semantics follow the published Gopher repetition filters.
    """
    toked = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokens(F.col("text")).alias("_t"),
    )
    base = toked.select(
        "doc_id",
        F.size("_t").cast("long").alias("n_tokens"),
        *_repetition_raw_cols(F.col("_t")),
    )
    return base.select("doc_id", "n_tokens", *_repetition_out_cols())


def _repetition_raw_cols(t: Column) -> list[Column]:
    """Raw per-row repetition counters from a MATERIALIZED token array
    (n_tokens is shared with the quality counters, so it is not here)."""
    return [
        F.size(F.array_distinct(t)).cast("long").alias("_n_distinct"),
        _max_multiplicity(_word_ngrams(t, 2)).alias("_top2"),
        # clamped at 0: a 1-token doc has -1 here otherwise, and
        # try_divide(0, -1) yields -0.0, which value-hashes ≠ 0.0
        F.greatest(F.size(t) - F.lit(1), F.lit(0)).cast("long").alias("_n2"),
        _max_multiplicity(_word_ngrams(t, 3)).alias("_top3"),
        F.greatest(F.size(t) - F.lit(2), F.lit(0)).cast("long").alias("_n3"),
    ]


def _repetition_out_cols() -> list[Column]:
    """Repetition fractions + composite flag over the raw counters."""
    # try_divide: 0-gram documents (shorter than the n-gram) must SCORE 0,
    # not crash with DIVIDE_BY_ZERO under ANSI mode (Spark 4 default)
    dup_tok = F.coalesce(
        F.try_divide(F.col("n_tokens") - F.col("_n_distinct"), F.col("n_tokens")),
        F.lit(0.0),
    )
    top2 = F.coalesce(F.try_divide(F.col("_top2"), F.col("_n2")), F.lit(0.0))
    top3 = F.coalesce(F.try_divide(F.col("_top3"), F.col("_n3")), F.lit(0.0))
    return [
        F.round(dup_tok, 6).alias("dup_token_frac"),
        F.round(top2, 6).alias("top_bigram_frac"),
        F.round(top3, 6).alias("top_trigram_frac"),
        (
            (dup_tok > REP_DUP_TOKEN_MAX)
            | ((F.col("_n2") >= REP_MIN_NGRAMS) & (top2 > REP_TOP_BIGRAM_MAX))
            | ((F.col("_n3") >= REP_MIN_NGRAMS) & (top3 > REP_TOP_TRIGRAM_MAX))
        )
        .cast("int")
        .alias("repetitive"),
    ]


def quality_and_repetition(docs: DataFrame) -> DataFrame:
    """Quality AND repetition scores in ONE scan→project→project chain —
    the pipeline-stage form (curate.py): two map-only frames joined on
    doc_id would cost a full-corpus shuffle for columns that derive from
    the same token array. Output = quality_score's columns followed by
    repetition_scores' (n_tokens shared)."""
    toked = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text"),
        tokens(F.col("text")).alias("_t"),
    )
    base = toked.select(
        "doc_id",
        *_quality_raw_cols(F.col("text"), F.col("_t")),
        *_repetition_raw_cols(F.col("_t")),
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "n_chars",
        *_quality_out_cols(),
        *_repetition_out_cols(),
    )

def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's OWN
    unigram LM — the classic "how typical is this text" quality signal
    (CCNet-style LM filtering, reduced to the unigram case so the model
    is one aggregate instead of an external artifact).

    score(d) = (1/|d|) Σ_t ln P(t),  P(t) = count(t) / N

    Determinism contract: floating-point SUMS are order-dependent, so the
    per-token term is quantized FIRST — ``round(ln(count)*1e6)`` as a
    bigint micro-unit (Spark's Math.log and DuckDB's libm ln agree bit-
    for-bit on this quantization over the whole count domain; verified
    1..2×10^6) — and the per-doc total is an EXACT integer sum, orderless
    by construction. The one double division at the end is deterministic.

    Plan shape at 100 TB: pass 1 builds the LM — explode tokens, ONE hash
    aggregate to (token, count) with map-side combine; N folds off the
    same aggregate. Pass 2 scores — explode again, equi-join token→count
    (the vocab side is Zipf-bounded: ~10^7 rows per language, broadcast
    range; here Spark picks the strategy), one per-doc hash aggregate.
    Two shuffles of (token) keys + one of (doc_id) keys, all linear in
    corpus tokens. Output: (doc_id, n_tokens, sum_logc_micro, logprob).
    """
    toked = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(tokens(F.col("text"))).alias("tok"),
    )
    vocab = toked.groupBy("tok").agg(F.count("*").alias("_c"))
    # 1-row frame holding ln(N) quantized on the same micro-unit grid
    n_total = vocab.agg(
        F.round(F.log(F.sum("_c")) * 1e6).cast("long").alias("_lnN_micro"),
    )
    scored = toked.join(
        vocab.withColumn(
            "_logc_micro", F.round(F.log("_c") * 1e6).cast("long")
        ),
        "tok",
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("_logc_micro").cast("long").alias("sum_logc_micro"),
    )
    # 1-row LM normalizer joined on a literal key (broadcast: zero shuffle)
    return per_doc.withColumn("_k", F.lit(1)).join(
        F.broadcast(n_total.withColumn("_k", F.lit(1))), "_k"
    ).select(
        "doc_id",
        "n_tokens",
        "sum_logc_micro",
        F.round(
            (F.col("sum_logc_micro") / F.col("n_tokens") - F.col("_lnN_micro"))
            / 1e6,
            6,
        ).alias("logprob"),
    )
