"""Line-level curation operators (C4 / RefinedWeb stage): per-line quality
filtering and corpus-wide boilerplate-line removal.

Reference parity note: like ops/curation.py these go BEYOND
phiture/airbyte's operator set — they are the line-granular cleaning
stages a 100 TB pretraining pipeline runs between ingest and document
dedup (C4's "three sentence" rule chain, Raffel et al. 2020 §2.2;
RefinedWeb's line-wise corpus dedup, Penedo et al. 2023 §3.3). Built on
the same cross-engine determinism contract as ops/dedup_docs.py: every
hash routes through md5 (ops/hashing.h60) so the DuckDB oracle reproduces
results bit-for-bit.

Scale shapes (verified on ``.explain``):

* ``c4_line_filter`` — ALL rules are per-line lambda predicates evaluated
  with ``F.filter``/``F.forall`` directly on the split-line array: the
  plan is scan -> project, zero shuffle, zero explode (no row blowup),
  zero Python. At 100 TB this is an embarrassingly parallel map stage.
* ``line_corpus_dedup`` — the inverted-index shape: ONE hash aggregate on
  the normalized line hash (map-side partial combine collapses hot
  boilerplate lines before the shuffle), one O(total lines) join of
  occurrences against the 1-row-per-distinct-line count table (hot lines
  fan out occurrences x 1, never occurrences x occurrences), one per-doc
  regroup to reassemble text. Linear in corpus bytes; the skew-prone
  "same nav bar on every page" key lands on the AGGREGATE (cheap) and on
  the count-table build side, never as a join explosion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import h60
from .text_analysis import tokens

#: per-line quality rules (C4 §2.2, kept decidable + oracle-portable):
#: a line is KEPT when it has >= MIN_LINE_WORDS words, ends in terminal
#: punctuation, and carries no boilerplate marker substring.
MIN_LINE_WORDS = 5
#: terminal-punctuation rule — RE2-compatible (shared with the oracle)
TERMINAL_PUNCT_RE = r'[.!?"]$'
#: case-insensitive substrings that mark a line as boilerplate
BOILERPLATE_MARKERS = ["javascript", "lorem ipsum", "cookie", "{"]
#: a document survives the filter when >= this many lines are kept
MIN_KEPT_LINES = 3

#: corpus-dedup default: drop lines whose normalized form occurs >= this
#: many times corpus-wide (RefinedWeb removes exact-duplicate lines that
#: appear on many pages — nav bars, footers, license blurbs)
LINE_DUP_MIN_COUNT = 10


def split_lines(text: Column) -> Column:
    """Newline-split of a text column (array<string>)."""
    return F.split(text, "\n")


def _line_kept(line: Column) -> Column:
    """The C4 per-line predicate (pure column expression)."""
    # the one shared token definition (ops.text_analysis.tokens): the
    # DuckDB oracle splits on the same regex, so any future change to
    # tokenization has a single Spark-side divergence point
    words = F.size(tokens(line))
    ok = (words >= F.lit(MIN_LINE_WORDS)) & line.rlike(TERMINAL_PUNCT_RE)
    low = F.lower(line)
    for m in BOILERPLATE_MARKERS:
        ok = ok & ~low.contains(F.lit(m))
    return ok


def c4_line_filter(
    docs: DataFrame,
    min_kept_lines: int = MIN_KEPT_LINES,
) -> DataFrame:
    """C4-style line filtering: per doc, keep only lines that pass the
    rule chain; the doc itself survives when >= ``min_kept_lines`` lines
    remain.

    Returns (doc_id, n_lines, n_kept, kept_frac, doc_kept, clean_text).
    Map-only: the rules run as array-lambda predicates on the split-line
    array, so the stage never explodes rows and never shuffles.
    """
    lines = F.split(F.col("text"), "\n")
    kept = F.filter(lines, _line_kept)
    staged = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(kept, "\n").alias("clean_text"),
    )
    kept_frac = F.coalesce(
        F.try_divide(F.col("n_kept"), F.col("n_lines")), F.lit(0.0)
    )
    return staged.select(
        "doc_id",
        "n_lines",
        "n_kept",
        F.round(kept_frac, 6).alias("kept_frac"),
        (F.col("n_kept") >= min_kept_lines).cast("int").alias("doc_kept"),
        "clean_text",
    )


def line_corpus_dedup(
    docs: DataFrame,
    min_count: int = LINE_DUP_MIN_COUNT,
) -> DataFrame:
    """RefinedWeb-style corpus-level line dedup: a line whose normalized
    (lower/trim) form occurs >= ``min_count`` times corpus-wide is
    boilerplate; remove it from every document.

    Returns (doc_id, n_lines, n_removed, clean_text) with ``clean_text``
    reassembled in original line order. One hash aggregate + one
    count-table join + one per-doc regroup — O(total lines), no fanout
    joins (see module docstring for the skew argument).
    """
    occ = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(split_lines(F.col("text"))).alias("idx", "line"),
    ).withColumn("lh", h60(F.lower(F.trim(F.col("line")))))
    counts = occ.groupBy("lh").agg(F.count(F.lit(1)).alias("cnt"))
    flagged = occ.join(counts, "lh").withColumn(
        "dup", F.col("cnt") >= F.lit(min_count)
    )
    # collect_list drops nulls, so wrapping the struct in when(~dup, ...)
    # keeps only surviving lines; array_sort on the (idx, line) struct
    # restores original order before reassembly
    kept_struct = F.when(
        ~F.col("dup"), F.struct(F.col("idx"), F.col("line"))
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("dup").cast("long")).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s.getField("line"),
            ),
            "\n",
        ).alias("clean_text"),
    )
    return per_doc.select("doc_id", "n_lines", "n_removed", "clean_text")
