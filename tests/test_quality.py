"""dbt-style schema tests (reference parity: base-normalization's
generated dbt_schema_tests — unique_combination_of_columns, not_null,
expression tests)."""

import pytest
from pyspark.sql import functions as F

from airbyte_spark.lake.quality import (
    run_schema_tests,
    scd_table_tests,
    schema_tests,
)
from airbyte_spark.operators.dedup import scd2


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, 10, 5.0),
        (2, 20, -1.0),     # expression failure
        (2, 20, None),     # dup (k, v) + NULL value -> expression failure
        (None, 30, 2.0),   # null k
        (4, None, 3.0),    # null v
    ]
    return spark.createDataFrame(rows, "k int, v int, value double")


def test_report_counts(df):
    got = run_schema_tests(
        df,
        not_null=["k", "v"],
        unique=[["k", "v"], ["k"]],
        expressions={"value_non_negative": "value >= 0"},
    )
    assert got == {
        "not_null_k": 1,
        "not_null_v": 1,
        "expression_value_non_negative": 2,  # NULL fails, like dbt
        "unique_k_v": 1,   # one extra row beyond one per (k, v)
        "unique_k": 1,     # key 2 appears twice -> 1 extra
    }


def test_all_green_on_clean_data(spark):
    clean = spark.createDataFrame([(1, 1), (2, 2)], "k int, v int")
    got = run_schema_tests(clean, not_null=["k", "v"], unique=[["k"]])
    assert set(got.values()) == {0}


def test_single_aggregate_plan(df):
    """not_null + expression tests share ONE aggregate (no extra scans)."""
    rep = schema_tests(
        df, not_null=["k", "v"], expressions={"pos": "value >= 0"}
    )
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    n_scans = plan.count("LogicalRDD")
    assert n_scans == 1, plan


def test_scd_table_tests(spark):
    ev = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 150)], "user_id int, event_id int"
    )
    hist = scd2(ev, ["user_id"], "event_id")
    got = {r.test_name: r.failing_rows for r in scd_table_tests(hist, ["user_id"]).collect()}
    assert got == {
        "not_null__airbyte_unique_key": 0,
        "not_null__airbyte_start_at": 0,
        "unique_active_row_per_key": 0,
        "unique_version_rows": 0,
    }
    # corrupt: duplicate an active version row
    bad = hist.unionByName(hist.filter(F.col("_airbyte_active_row") == 1).limit(1))
    got2 = {r.test_name: r.failing_rows for r in scd_table_tests(bad, ["user_id"]).collect()}
    assert got2["unique_active_row_per_key"] == 1
    assert got2["unique_version_rows"] == 1


def test_schema_tests_empty_frame_reports_zero(spark):
    """An EMPTY frame has zero failing rows — not NULL (sum over no rows):
    every test kind must agree."""
    from airbyte_spark.lake.quality import run_schema_tests

    empty = spark.createDataFrame([], "id long, amount long")
    rep = run_schema_tests(
        empty, not_null=["id"], unique=[["id"]],
        expressions={"amt_pos": "amount > 0"},
    )
    assert rep == {"not_null_id": 0, "expression_amt_pos": 0, "unique_id": 0}


def test_schema_tests_label_with_quote(spark):
    """A test name (or column) containing a single quote must not break
    the generated stack() SQL."""
    from airbyte_spark.lake.quality import run_schema_tests

    df = spark.createDataFrame([(1,), (-2,)], "amount long")
    rep = run_schema_tests(df, expressions={"amount's positive": "amount > 0"})
    assert rep == {"expression_amount's positive": 1}
