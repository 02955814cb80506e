"""Corpus-curation pipeline CLI — the training-data side's ``job.py``.

Composes the ops/ curation ladder into one runnable pipeline over a
documents parquet directory (columns: doc_id, text, lang, ...):

    exact dedup (keep min doc_id per content hash)
      -> quality filter (C4/Gopher-style column-expression score)
         [+ Gopher repetition bars with --drop-repetitive]
      -> benchmark decontamination (optional --benchmark-dir)
      -> target-domain token-mixture downsampling (optional --mixture)
      -> deterministic stratified train/val/test split
      -> token-budget sequence packing (train split)
      -> parquet out, partitioned by split, + ONE JSON stats line

Scale shape: every stage is the documented scale form of its operator —
the corpus-sized shuffles are exact-dedup's hash agg, decontaminate's
per-doc hit count, packing's shard exchange, and the per-stage doc_id
semi-joins that apply each filter's verdict to the carried frame;
quality scoring (with or without the repetition bars — one combined
projection) and the split are map-only; the benchmark gram set and the
mixture-rate table broadcast. Stage row counts are measured with ONE
aggregate over a cached frame per stage boundary (the cache is reused by
the next stage, so counting adds no extra scan of the input).

Usage:
    spark-submit --py-files airbyte_spark.zip -m airbyte_spark.curate \\
        --docs-dir ... --out ... [--benchmark-dir ...] [--min-quality 0.3]
        [--budget 2048] [--n-shards 64] [--stratum-col lang]
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_session() -> SparkSession:
    return (
        SparkSession.builder.appName("airbyte-spark-curate")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def curate(
    spark: SparkSession,
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    min_quality: float = 0.0,
    decontaminate_n: int = 4,
    stratum_col: str = "lang",
    train_upto: int = 800,
    val_upto: int = 900,
    budget: int = 2048,
    n_shards: int = 64,
    drop_repetitive: bool = False,
    mixture: dict[str, float] | None = None,
    line_dedup_min_count: int | None = None,
    line_filter: bool = False,
) -> tuple[DataFrame, dict]:
    """Run the curation ladder; returns (curated frame, stage stats).

    The curated frame carries the input columns plus quality, split, and
    (train rows only) pack_id/n_tokens — everything a downstream trainer
    needs to shard, sample, and batch without re-deriving state.
    """
    from .ops.curation import decontaminate, pack_sequences, stratified_split
    from .ops.dedup_docs import exact_dedup
    from .ops.text_analysis import quality_score

    # cache the input BEFORE the rows_in count: the count, exact_dedup's
    # hash agg and the keep semi-join all reuse one materialization —
    # counting never pays its own full input scan
    docs = docs.cache()
    stats: dict = {"rows_in": docs.count()}

    # 0. line-level cleaning (C4/RefinedWeb order: corpus boilerplate
    # lines out first, then the per-line rule chain) — each stage
    # REWRITES text, so it must precede every content-hash/ngram stage
    if line_dedup_min_count is not None:
        from .ops.lines import line_corpus_dedup

        ld = line_corpus_dedup(docs, min_count=line_dedup_min_count)
        nxt = docs.drop("text").join(
            ld.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
        ).cache()
        stats["rows_after_line_dedup"] = nxt.count()
        docs.unpersist()
        docs = nxt
    if line_filter:
        from .ops.lines import c4_line_filter

        lf = c4_line_filter(docs).filter(F.col("doc_kept") == 1)
        nxt = docs.drop("text").join(
            lf.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
        ).cache()
        stats["rows_after_line_filter"] = nxt.count()
        docs.unpersist()
        docs = nxt

    # 1. exact dedup — keep the canonical (min doc_id) copy per content
    keep = exact_dedup(docs).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    deduped = docs.join(keep, "doc_id", "left_semi").cache()
    stats["rows_after_exact_dedup"] = deduped.count()
    docs.unpersist()

    # 2. quality filter (map-only score); --drop-repetitive stacks the
    # Gopher repetition bars onto the SAME projection
    # (quality_and_repetition: one scan of the cached frame — joining two
    # separately-materialized score frames would shuffle the corpus on
    # doc_id for columns that derive from the same token array), then ONE
    # join back carries the quality score onto the survivors
    if drop_repetitive:
        from .ops.text_analysis import quality_and_repetition

        q = quality_and_repetition(deduped).filter(
            (F.col("quality") >= min_quality) & (F.col("repetitive") == 0)
        )
    else:
        q = quality_score(deduped).filter(F.col("quality") >= min_quality)
    passed = deduped.join(q.select("doc_id", "quality"), "doc_id").cache()
    stats["rows_after_quality"] = passed.count()
    deduped.unpersist()

    # 3. decontamination (optional; benchmark gram set broadcasts)
    if benchmark is not None:
        clean_ids = decontaminate(passed, benchmark, n=decontaminate_n).filter(
            F.col("contaminated") == 0
        ).select("doc_id")
        clean = passed.join(clean_ids, "doc_id", "left_semi").cache()
        stats["rows_after_decontaminate"] = clean.count()
        passed.unpersist()
    else:
        clean = passed
        stats["rows_after_decontaminate"] = stats["rows_after_quality"]

    # 3b. target-domain-mixture downsampling (optional): never-upsample
    # token-mixture rates from one tiny totals aggregate; corpus side is
    # one scan + the split's map-only hash
    if mixture:
        from .ops.curation import domain_mixture_sample

        sampled_ids = domain_mixture_sample(
            clean, mixture, domain_col=stratum_col
        ).filter(F.col("sampled") == 1).select("doc_id")
        mixed = clean.join(sampled_ids, "doc_id", "left_semi").cache()
        stats["rows_after_mixture"] = mixed.count()  # materializes the cache
        clean.unpersist()  # parent cache (passed or decontaminated) now idle
        clean = mixed
    else:
        stats["rows_after_mixture"] = stats["rows_after_decontaminate"]

    # 4. deterministic stratified split (map-only)
    split = stratified_split(
        clean, stratum_col=stratum_col, train_upto=train_upto,
        val_upto=val_upto,
    ).select("doc_id", "split")
    with_split = clean.join(split, "doc_id").cache()

    split_counts = {
        r["split"]: r["n"]
        for r in with_split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    stats["split_counts"] = split_counts
    clean.unpersist()

    # 5. pack the train split into token-budget batches (reuses the
    # with_split cache — the ONE cache left alive: it directly backs the
    # returned frame, so the caller's write rescans nothing; release it
    # with ``out.sparkSession.catalog.clearCache()`` (or end the session)
    # once the result is materialized
    packs = pack_sequences(
        with_split.filter(F.col("split") == "train"),
        budget=budget, n_shards=n_shards,
    ).select("doc_id", "pack_id", "n_tokens")
    out = with_split.join(packs, "doc_id", "left")
    return out, stats


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--docs-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--benchmark-dir", default=None,
                   help="parquet dir of held-out eval docs; documents "
                   "sharing any word n-gram with them are dropped")
    p.add_argument("--min-quality", type=float, default=0.0)
    p.add_argument("--decontaminate-n", type=int, default=4)
    p.add_argument("--stratum-col", default="lang")
    p.add_argument("--train-upto", type=int, default=800,
                   help="split buckets [0,this) of 1000 are train")
    p.add_argument("--val-upto", type=int, default=900)
    p.add_argument("--budget", type=int, default=2048,
                   help="token budget per training pack")
    p.add_argument("--n-shards", type=int, default=64)
    p.add_argument("--drop-repetitive", action="store_true",
                   help="also drop docs failing the Gopher repetition "
                   "bars (dup-token / top-n-gram fractions)")
    p.add_argument("--line-dedup", type=int, default=None, metavar="MIN_COUNT",
                   help="first remove lines whose normalized form occurs "
                   ">= MIN_COUNT times corpus-wide (RefinedWeb boilerplate "
                   "removal)")
    p.add_argument("--line-filter", action="store_true",
                   help="apply the C4 per-line rule chain (min words, "
                   "terminal punctuation, boilerplate markers); docs with "
                   "< 3 surviving lines are dropped")
    p.add_argument("--mixture", default=None,
                   help='target token mixture as JSON, e.g. '
                   '\'{"en":0.5,"de":0.3,"fr":0.2}\' over --stratum-col; '
                   "downsamples only (never upsamples)")
    args = p.parse_args(argv)
    mixture = json.loads(args.mixture) if args.mixture else None
    if mixture is not None:
        # fail the fat-fingered forms loudly HERE: '{}' would silently
        # skip the stage (curate()'s `if mixture:` is False), and a
        # string share would only die deep inside the op as a raw
        # TypeError after the earlier stages already ran
        if (
            not isinstance(mixture, dict)
            or not mixture
            or not all(
                isinstance(s, (int, float)) and not isinstance(s, bool)
                for s in mixture.values()
            )
        ):
            raise SystemExit(
                "--mixture must be a non-empty JSON object of "
                'domain -> numeric share, e.g. \'{"en":0.5,"de":0.5}\''
            )

    spark = build_session()
    docs = spark.read.parquet(args.docs_dir)
    bench = (
        spark.read.parquet(args.benchmark_dir) if args.benchmark_dir else None
    )
    out, stats = curate(
        spark, docs, bench,
        min_quality=args.min_quality,
        decontaminate_n=args.decontaminate_n,
        stratum_col=args.stratum_col,
        train_upto=args.train_upto,
        val_upto=args.val_upto,
        budget=args.budget,
        n_shards=args.n_shards,
        drop_repetitive=args.drop_repetitive,
        mixture=mixture,
        line_dedup_min_count=args.line_dedup,
        line_filter=args.line_filter,
    )
    out.write.mode("overwrite").partitionBy("split").parquet(args.out)
    # the pipeline's one remaining stage cache backed that write; don't
    # pin executor memory after the job's last action
    spark.catalog.clearCache()
    stats["out"] = args.out
    print(json.dumps(stats, sort_keys=True))
    return stats


if __name__ == "__main__":
    main()
