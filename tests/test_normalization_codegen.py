"""Normalization SQL codegen (O4) — both dialect renders of the generated
model chain must agree with each other and with hand-computed semantics.

Reference behavior: stream_processor.py:237-316 stage pipeline; see
airbyte_spark/normalization/codegen.py for the file:line map.
"""

import json

import duckdb
import pytest

from pyspark.sql import types as T

from airbyte_spark.catalog import ConfiguredStream, TableSchema
from airbyte_spark.normalization import (
    generate_normalization_sql,
    normalization_stages,
)


def _stream(dest="append_dedup"):
    struct = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("updated_at", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("balance", T.DoubleType()),
            T.StructField("vip", T.BooleanType()),
            T.StructField("joined", T.TimestampType()),
        ]
    )
    return ConfiguredStream(
        name="users",
        schema=TableSchema.from_struct(struct),
        primary_key=["id"],
        cursor_field="updated_at",
        sync_mode="incremental",
        destination_sync_mode=dest,
    )


def _raw_docs():
    """6 raw records: id=1 has 3 versions (one exact cursor re-delivery),
    id=2 has 2, id=3 one with nulls."""
    rows = [
        ("a1", {"id": 1, "updated_at": 10, "name": "ada", "balance": 1.5,
                "vip": True, "joined": "2024-01-02 03:04:05.000006"}),
        ("a2", {"id": 1, "updated_at": 20, "name": "ada2", "balance": 2.5,
                "vip": False, "joined": "2024-01-02 03:04:05.000006"}),
        ("a2dup", {"id": 1, "updated_at": 20, "name": "ada2-redelivered",
                   "balance": 2.5, "vip": False,
                   "joined": "2024-01-02 03:04:05.000006"}),
        ("b1", {"id": 2, "updated_at": 5, "name": "bob", "balance": 0.0,
                "vip": False, "joined": "2020-06-01 00:00:00.000000"}),
        ("b2", {"id": 2, "updated_at": 6, "name": "bob", "balance": 9.25,
                "vip": True, "joined": "2020-06-01 00:00:00.000000"}),
        ("c1", {"id": 3, "updated_at": 1, "name": None, "balance": None,
                "vip": None, "joined": None}),
    ]
    return [
        (ab_id, json.dumps(rec), "2024-07-01 00:00:00.000000")
        for ab_id, rec in rows
    ]


@pytest.fixture()
def raw_view(spark):
    df = spark.createDataFrame(
        _raw_docs(), "_airbyte_ab_id string, _airbyte_data string, _e string"
    ).selectExpr(
        "_airbyte_ab_id", "_airbyte_data",
        "CAST(_e AS TIMESTAMP) AS _airbyte_emitted_at",
    )
    df.createOrReplaceTempView("_airbyte_raw_users")
    return df


def test_spark_dialect_dedup_semantics(spark, raw_view):
    sql = generate_normalization_sql(_stream(), "_airbyte_raw_users", "spark")
    out = spark.sql(sql)
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    # latest version per key wins; the a2/a2dup cursor tie resolves to the
    # smaller _airbyte_ab_id ('a2' < 'a2dup')
    assert rows[1]["name"] == "ada2" and rows[1]["balance"] == 2.5
    assert rows[2]["vip"] is True and rows[2]["balance"] == 9.25
    # typed nulls survive
    assert rows[3]["name"] is None and rows[3]["joined"] is None
    # typing stage produced real types, not strings
    d = dict(out.dtypes)
    assert d["id"] == "bigint" and d["balance"] == "double"
    assert d["vip"] == "boolean" and d["joined"] == "timestamp"
    assert rows[1]["joined"].microsecond == 6


def test_scd_stage_history(spark, raw_view):
    stages = normalization_stages(_stream(), "_airbyte_raw_users", "spark")
    sql = (
        f"WITH ab1 AS ({stages['ab1']}), stg AS ({stages['stg']}) "
        f"{stages['scd']}"
    )
    hist = spark.sql(sql).filter("id = 1").orderBy("_airbyte_start_at").collect()
    assert [h["_airbyte_start_at"] for h in hist] == [10, 20]
    assert [h["_airbyte_end_at"] for h in hist] == [20, None]
    assert [h["_airbyte_active_row"] for h in hist] == [0, 1]
    # scd unique key extends the pk hash with the version start
    assert hist[0]["_airbyte_unique_key_scd"] != hist[1]["_airbyte_unique_key_scd"]
    assert hist[0]["_airbyte_unique_key"] == hist[1]["_airbyte_unique_key"]


def test_duckdb_dialect_agrees_with_spark(spark, raw_view):
    spark_rows = spark.sql(
        generate_normalization_sql(_stream(), "_airbyte_raw_users", "spark")
    ).collect()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE _airbyte_raw_users AS SELECT * FROM (VALUES "
        + ", ".join(
            f"('{a}', '{d}'::VARCHAR, TIMESTAMP '{e}')" for a, d, e in _raw_docs()
        )
        + ") t(_airbyte_ab_id, _airbyte_data, _airbyte_emitted_at)"
    )
    duck = con.execute(
        generate_normalization_sql(_stream(), "_airbyte_raw_users", "duckdb")
    ).fetchall()
    cols = [f.name for f in spark.sql(
        generate_normalization_sql(_stream(), "_airbyte_raw_users", "spark")
    ).schema.fields]
    s = sorted(tuple(r[c] for c in cols) for r in spark_rows)
    assert s == sorted(duck)


def test_non_dedup_final_is_hash_model(spark, raw_view):
    sql = generate_normalization_sql(
        _stream(dest="append"), "_airbyte_raw_users", "spark"
    )
    out = spark.sql(sql)
    assert out.count() == 6  # no dedup
    assert "_airbyte_users_hashid" in out.columns
    assert "_airbyte_unique_key" not in out.columns


def test_name_canonicalization_and_collisions(spark):
    struct = T.StructType(
        [
            T.StructField("User Name", T.StringType()),
            T.StructField("user_name", T.StringType()),
            T.StructField("Déjà-Vu", T.LongType()),
        ]
    )
    stream = ConfiguredStream(
        name="weird",
        schema=TableSchema.from_struct(struct),
        primary_key=[],
        sync_mode="full_refresh",
        destination_sync_mode="append",
    )
    doc = json.dumps({"User Name": "x", "user_name": "y", "Déjà-Vu": 7})
    spark.createDataFrame(
        [("r1", doc, "2024-01-01 00:00:00")],
        "_airbyte_ab_id string, _airbyte_data string, _e string",
    ).selectExpr(
        "_airbyte_ab_id", "_airbyte_data",
        "CAST(_e AS TIMESTAMP) AS _airbyte_emitted_at",
    ).createOrReplaceTempView("_airbyte_raw_weird")
    out = spark.sql(
        generate_normalization_sql(stream, "_airbyte_raw_weird", "spark")
    )
    row = out.collect()[0]
    # first claimant keeps the canonical form, second gets the _1 suffix
    assert row["user_name"] == "x" and row["user_name_1"] == "y"
    assert row["deja_vu"] == 7


def test_warehouse_dialect_renders():
    """Render-only warehouse dialects (bigquery/snowflake/postgres): the
    adapter rules the reference's per-warehouse macros encode — JSON
    extraction function, identifier quoting, type names, surrogate-hash
    shape — pinned as golden substrings so a dialect-table edit can't
    silently drift."""
    s = _stream()
    bq = generate_normalization_sql(s, "raw_users", dialect="bigquery")
    sf = generate_normalization_sql(s, "raw_users", dialect="snowflake")
    pg = generate_normalization_sql(s, "raw_users", dialect="postgres")

    # BigQuery: JSON_EXTRACT_SCALAR, bytes-md5 wrapped in TO_HEX over
    # ARRAY_TO_STRING (no concat_ws), INT64/FLOAT64/BOOL types, backticks
    assert "json_extract_scalar(_airbyte_data, '$.id')" in bq
    assert "to_hex(md5(array_to_string([" in bq
    assert "concat_ws" not in bq
    assert "CAST(`id` AS INT64)" in bq
    assert "CAST(`balance` AS FLOAT64)" in bq
    assert "CAST(`vip` AS BOOL)" in bq

    # Snowflake: parse_json/get_path + to_varchar, NUMBER(38,0),
    # TIMESTAMP_NTZ, double-quoted identifiers
    assert "to_varchar(get_path(parse_json(_airbyte_data), 'id'))" in sf
    assert 'CAST("id" AS NUMBER(38,0))' in sf
    assert 'CAST("joined" AS TIMESTAMP_NTZ)' in sf
    assert "md5(concat_ws('-'" in sf

    # Postgres: jsonb_extract_path_text, DOUBLE PRECISION
    assert "jsonb_extract_path_text(_airbyte_data::jsonb, 'id')" in pg
    assert 'CAST("balance" AS DOUBLE PRECISION)' in pg
    assert "md5(concat_ws('-'" in pg

    # every dialect emits the same stage chain
    for sql in (bq, sf, pg):
        for stage in ("ab1 AS (", "stg AS (", "scd AS ("):
            assert stage in sql
        assert "_airbyte_active_row = 1" in sql


def test_cross_dialect_timestamp_cursor_and_null_cursor(spark):
    """Cursor is a TIMESTAMP (typed text rendering differs per engine —
    Spark's CAST trims trailing micro zeros) and one record has a NULL
    cursor (engines default NULLS to opposite ends of ASC sorts): the
    spark and duckdb renders must still agree row-for-row, including the
    surrogate keys (raw-text hashing, never CAST(typed AS STRING)) and
    the active-row choice (ORDER BY pinned NULLS FIRST)."""
    struct = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("seen", T.TimestampType()),
            T.StructField("name", T.StringType()),
        ]
    )
    stream = ConfiguredStream(
        name="events",
        schema=TableSchema.from_struct(struct),
        primary_key=["id"],
        cursor_field="seen",
        sync_mode="incremental",
        destination_sync_mode="append_dedup",
    )
    rows = [
        ("e1", {"id": 1, "seen": "2024-01-02 03:04:05.100000", "name": "v1"}),
        ("e2", {"id": 1, "seen": "2024-06-01 00:00:00.000000", "name": "v2"}),
        ("e3", {"id": 2, "seen": None, "name": "null-cursor"}),
        ("e4", {"id": 2, "seen": "2024-01-01 00:00:00.000000", "name": "real"}),
    ]
    docs = [
        (a, json.dumps(r), "2024-07-01 00:00:00.000000") for a, r in rows
    ]
    df = spark.createDataFrame(
        docs, "_airbyte_ab_id string, _airbyte_data string, _e string"
    ).selectExpr(
        "_airbyte_ab_id", "_airbyte_data",
        "CAST(_e AS TIMESTAMP) AS _airbyte_emitted_at",
    )
    df.createOrReplaceTempView("_airbyte_raw_events")
    out = spark.sql(
        generate_normalization_sql(stream, "_airbyte_raw_events", "spark")
    )
    cols = [f.name for f in out.schema.fields]

    import duckdb as _duckdb

    con = _duckdb.connect()
    con.execute(
        "CREATE TABLE _airbyte_raw_events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"('{a}', '{d}'::VARCHAR, TIMESTAMP '{e}')" for a, d, e in docs
        )
        + ") t(_airbyte_ab_id, _airbyte_data, _airbyte_emitted_at)"
    )
    duck = con.execute(
        generate_normalization_sql(stream, "_airbyte_raw_events", "duckdb")
    ).fetchall()
    s = sorted(tuple(r[c] for c in cols) for r in out.collect())
    assert s == sorted(duck)
    # NULL-cursor version sorts FIRST: id=2's active row is the real one
    act = {r["id"]: r["name"] for r in out.collect()}
    assert act[2] == "real"
