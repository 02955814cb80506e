"""Schema tests — the reference's generated dbt data-quality tests as
first-class checks.

base-normalization emits a dbt schema test per stream
(integration_tests/dbt_test_config/dbt_schema_tests/schema_test.yml): PK
uniqueness via ``unique_combination_of_columns``, ``not_null`` on the
surrogate/meta columns, and freeform expression tests. Spark-first shape:

* all ``not_null`` columns and all expression tests fold into ONE
  map-side hash aggregate (a single scan, no shuffle);
* each uniqueness test is one groupBy on its column tuple (the one
  genuinely shuffle-bound check — same exchange a dedup would need);
* results come back as a tidy (test_name, failing_rows) DataFrame so the
  report is itself queryable/unionable, plus ``run_schema_tests`` for a
  bounded driver-side dict.

The SCD convenience check mirrors the reference's generated test set for
Type-2 tables: unique active row per key, not-null surrogate key.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _folded_failures(
    df: DataFrame,
    not_null: Sequence[str] = (),
    expressions: Optional[dict[str, Column | str]] = None,
) -> DataFrame:
    """All not_null + expression tests in ONE map-side aggregate (a single
    scan), unstacked to tidy (test_name, failing_rows) rows."""
    aggs: list[Column] = []
    labels: list[str] = []
    for i, c in enumerate(not_null):
        # coalesce: an EMPTY frame must report 0 failing rows, not NULL
        # (sum over zero rows is NULL) — same contract as the unique path
        aggs.append(
            F.coalesce(F.sum(F.col(c).isNull().cast("long")), F.lit(0))
            .alias(f"_t{len(labels)}")
        )
        labels.append(f"not_null_{c}")
    for name, e in (expressions or {}).items():
        cond = F.expr(e) if isinstance(e, str) else e
        aggs.append(
            F.coalesce(
                F.sum((~F.coalesce(cond, F.lit(False))).cast("long")), F.lit(0)
            ).alias(f"_t{len(labels)}")
        )
        labels.append(f"expression_{name}")
    wide = df.agg(*aggs)

    def _q(lbl: str) -> str:
        # test labels embed column / user-chosen test names — escape them
        # for the single-quoted SQL literal they land in
        return lbl.replace("\\", "\\\\").replace("'", "\\'")

    stack = ", ".join(f"'{_q(lbl)}', `_t{i}`" for i, lbl in enumerate(labels))
    return wide.selectExpr(
        f"stack({len(labels)}, {stack}) as (test_name, failing_rows)"
    )


def not_null_failures(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(test_name, failing_rows) for every ``not_null_<col>`` test — one
    map-side aggregate for ALL columns."""
    return _folded_failures(df, not_null=cols)


def expression_failures(df: DataFrame, tests: dict[str, Column | str]) -> DataFrame:
    """(test_name, failing_rows) for named expression tests (rows where
    the expression is NOT satisfied fail — NULL counts as failing, like
    dbt's expression_is_true). One aggregate for all expressions."""
    return _folded_failures(df, expressions=tests)


def unique_combination_failures(
    df: DataFrame, cols: Sequence[str], name: Optional[str] = None
) -> DataFrame:
    """(test_name, failing_rows) for one ``unique_combination_of_columns``
    test: failing_rows counts the EXTRA rows beyond one per key (0 ⇒
    unique). NULL-keyed rows group together, matching dbt."""
    name = name or "unique_" + "_".join(cols)
    dupes = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("failing_rows"))
    )
    return dupes.select(F.lit(name).alias("test_name"), "failing_rows")


def schema_tests(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[Sequence[str]] = (),
    expressions: Optional[dict[str, Column | str]] = None,
) -> DataFrame:
    """The full dbt-style test battery as one tidy DataFrame — not_null
    and expression tests share ONE scan/aggregate; each uniqueness test
    adds its own groupBy."""
    parts: list[DataFrame] = []
    if not_null or expressions:
        parts.append(_folded_failures(df, not_null, expressions))
    for combo in unique:
        parts.append(unique_combination_failures(df, list(combo)))
    if not parts:
        raise ValueError("no tests configured")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def run_schema_tests(df: DataFrame, **kwargs) -> dict[str, int]:
    """Collect the (bounded: one row per test) report as a dict."""
    return {
        r.test_name: r.failing_rows for r in schema_tests(df, **kwargs).collect()
    }


class AuditFailed(RuntimeError):
    """A write-audit-publish gate found failing schema tests; the staged
    commit was aborted and the table is untouched."""

    def __init__(self, failures: dict[str, int]):
        self.failures = failures
        super().__init__(f"schema-test audit failed: {failures}")


def audited_merge_batch(
    table,
    batch: DataFrame,
    order_cols: Sequence[str],
    *,
    not_null: Sequence[str] = (),
    unique: Sequence[Sequence[str]] = (),
    expressions: Optional[dict[str, Column | str]] = None,
    **merge_kwargs,
):
    """Write-audit-publish merge (Iceberg WAP analog): stage the merge,
    run the dbt-style test battery against the STAGED post-merge state,
    publish only if clean — readers can never observe a batch that fails
    its data-quality gate. The reference runs generated dbt tests after
    normalization (post-visibility); this moves the same battery before.

    Scale contract: the audit scans ONLY the buckets the batch touched
    (``MergeStats.buckets``), so per-batch audit cost is O(touched
    buckets), never O(table). That scope is exact for row-local tests
    (not_null / expressions) and for uniqueness on pk-prefix tuples (all
    copies of a key share its bucket); uniqueness on columns the table is
    NOT bucketed by would need a full-table pass — run those post-publish
    via ``schema_tests(table.read())`` instead.

    On failure the staged commit is aborted (files deleted) and
    ``AuditFailed`` carries the per-test failing-row counts; the fence did
    not advance, so the batch can be re-delivered after the data is fixed.
    """
    from .merge import merge_batch

    stats = merge_batch(table, batch, order_cols, stage=True, **merge_kwargs)
    if stats.skipped:
        return stats
    if stats.staged_id is None:
        # merge decided not to stage anything (empty batch under
        # commit_empty=False) — nothing to audit or publish
        return stats
    no_tests = not (not_null or unique or expressions)
    if not stats.buckets or no_tests:
        # empty batch, or an empty test battery (vacuously clean):
        # nothing to audit — publish
        stats.version = table.publish_staged(stats.staged_id)
        stats.staged_id = None
        return stats
    try:
        view = table.staged_view(stats.staged_id)
        audit_df = table.read(snap=view, buckets=stats.buckets)
        failures = {
            k: v
            for k, v in run_schema_tests(
                audit_df, not_null=not_null, unique=unique,
                expressions=expressions,
            ).items()
            if v
        }
    except BaseException:
        # the audit itself failed (transient Spark error, bad expression):
        # a parked staged commit would leak its data files forever —
        # abort before surfacing the error; the fence did not advance, so
        # the batch is re-deliverable
        table.abort_staged(stats.staged_id)
        raise
    if failures:
        table.abort_staged(stats.staged_id)
        raise AuditFailed(failures)
    stats.version = table.publish_staged(stats.staged_id)
    stats.staged_id = None
    return stats


def scd_table_tests(history: DataFrame, pk: Sequence[str]) -> DataFrame:
    """The reference's generated test set for a Type-2 history table:
    surrogate key not null, at most ONE active row per key, version rows
    unique on (key, start cursor)."""
    active = history.filter(F.col("_airbyte_active_row") == 1)
    return (
        not_null_failures(history, ["_airbyte_unique_key", "_airbyte_start_at"])
        .unionByName(
            unique_combination_failures(
                active, list(pk), name="unique_active_row_per_key"
            )
        )
        .unionByName(
            unique_combination_failures(
                history, [*pk, "_airbyte_start_at"], name="unique_version_rows"
            )
        )
    )
