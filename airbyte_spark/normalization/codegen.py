"""Normalization SQL codegen (O4) — the reference's dbt-model generator.

The reference's base-normalization walks the configured catalog and EMITS
SQL models per stream (``normalization/transform_catalog/
stream_processor.py:237-316``): ``_ab1`` JSON extraction (:386), ``_ab2``
column typing (:471), ``_ab3``/``_stg`` surrogate-key hashing (:667), an
``_scd`` Type-2 history for append_dedup streams (:734) and a final model
(active rows only, :1068), each rendered per warehouse dialect through
dbt adapter macros.

This module is that generator re-expressed for a Spark engine: given a
:class:`~airbyte_spark.catalog.ConfiguredStream` it emits ONE executable
SQL statement (a WITH-chain of the same stages) per dialect — the dialect
table plays the role of the dbt adapter. ``spark`` and ``duckdb`` are
EXECUTABLE here: running the spark-dialect output through ``spark.sql``
must produce the same rows as the duckdb-dialect output over the same raw
table; the driver oracle (`cdc_normalization_codegen`) checks exactly
that. ``bigquery`` / ``snowflake`` / ``postgres`` are RENDER-ONLY in this
sandbox (no engine to run them) — their adapter rules (JSON extraction
function, quoting, type names, surrogate-hash shape) mirror the
reference's per-warehouse macros and are pinned by golden tests.

Deliberate deviations from the reference, with reasons:

* the surrogate hash covers the EXTRACTED JSON TEXT (ab1 strings), not the
  typed ab2 columns: engines print typed values differently (Spark trims
  trailing timestamp zeros, warehouses vary float text), so hashing typed
  values is only reproducible inside one engine — hashing the raw token
  text is identical everywhere the raw document is identical. The stage
  order is therefore extract -> hash -> cast instead of extract -> cast ->
  hash.
* dedup within equal cursor values tiebreaks on ``_airbyte_ab_id``
  (deterministic) where the reference relies on warehouse row order.

Raw-table contract (the reference's ``_airbyte_raw_<stream>``):
``_airbyte_ab_id`` (string), ``_airbyte_data`` (JSON text),
``_airbyte_emitted_at`` (timestamp).
"""

from __future__ import annotations

from pyspark.sql import types as T

from ..catalog import ConfiguredStream
from ..functions.names import NameRegistry

RAW_ID = "_airbyte_ab_id"
RAW_DATA = "_airbyte_data"
RAW_EMITTED = "_airbyte_emitted_at"


import re

_PLAIN_PROP = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _json_path(prop: str, bracket: str) -> str:
    """JSON path literal for a property name; quoted form for names the
    dot syntax can't carry (spaces, dashes — stream_processor handles these
    through adapter macros). ``bracket`` is the dialect's quoted-member
    syntax: spark JsonPath brackets, duckdb double-quoted members."""
    if _PLAIN_PROP.match(prop):
        return f"$.{prop}"
    if "'" in prop or '"' in prop:
        raise ValueError(f"unsupported quote character in property name {prop!r}")
    return bracket.format(prop=prop)


_SPARK_BRACKET = "$['{prop}']"
_DUCKDB_BRACKET = '$."{prop}"'

def _sql_str(s: str) -> str:
    """Embed in a single-quoted SQL literal (spark's bracket path syntax
    itself contains single quotes)."""
    return "'" + s.replace("'", "''") + "'"


def _concat_ws_hash(cols: list[str]) -> str:
    """md5 over '-'-joined null-coalesced values — engines where md5()
    returns a hex string and concat_ws exists (spark/duckdb/snowflake/
    postgres)."""
    parts = ", ".join(f"coalesce({c}, '')" for c in cols)
    return f"md5(concat_ws('-', {parts}))"


def _bigquery_hash(cols: list[str]) -> str:
    """BigQuery: MD5() returns BYTES and CONCAT_WS doesn't exist — the
    reference's surrogate_key macro renders TO_HEX(MD5(ARRAY_TO_STRING()))
    there (dbt_utils cross-db surrogate_key; macros/cross_db_utils)."""
    parts = ", ".join(f"coalesce({c}, '')" for c in cols)
    return f"to_hex(md5(array_to_string([{parts}], '-')))"


#: the dbt-adapter-macro table (json_operations.sql / type macros of
#: normalization/macros/cross_db_utils rendered per warehouse). "types"
#: overrides the ANSI defaults of _sql_type per Spark type-class name.
_DIALECTS = {
    "spark": {
        "extract": lambda data, prop: (
            f"get_json_object({data}, {_sql_str(_json_path(prop, _SPARK_BRACKET))})"
        ),
        "quote": lambda name: f"`{name}`",
        "string_type": "STRING",
        "hash": _concat_ws_hash,
        "ts_text": lambda x: f"date_format({x}, 'yyyy-MM-dd HH:mm:ss.SSSSSS')",
    },
    "duckdb": {
        "extract": lambda data, prop: (
            f"json_extract_string({data}, {_sql_str(_json_path(prop, _DUCKDB_BRACKET))})"
        ),
        "quote": lambda name: f'"{name}"',
        "string_type": "VARCHAR",
        "hash": _concat_ws_hash,
        "ts_text": lambda x: f"strftime({x}, '%Y-%m-%d %H:%M:%S.%f')",
    },
    # ----- render-only warehouse dialects (no engine in this sandbox to
    # execute them; string contracts pinned by golden tests, mirroring the
    # reference's per-adapter macro renders) -----
    "bigquery": {
        "extract": lambda data, prop: (
            f"json_extract_scalar({data}, "
            f"{_sql_str(_json_path(prop, _SPARK_BRACKET))})"
        ),
        "quote": lambda name: f"`{name}`",
        "string_type": "STRING",
        "hash": _bigquery_hash,
        "ts_text": lambda x: f"format_timestamp('%Y-%m-%d %H:%M:%E6S', {x})",
        "types": {
            "LongType": "INT64",
            "IntegerType": "INT64",
            "DoubleType": "FLOAT64",
            "BooleanType": "BOOL",
            "DecimalType": "NUMERIC({p},{s})",
        },
    },
    "snowflake": {
        # adapter macro json_extract_scalar -> to_varchar(get_path(
        # parse_json(...), ...)); quoted path members for exotic names
        "extract": lambda data, prop: (
            f"to_varchar(get_path(parse_json({data}), "
            f"{_sql_str(prop if _PLAIN_PROP.match(prop) else chr(34) + prop + chr(34))}))"
        ),
        "quote": lambda name: f'"{name}"',
        "string_type": "VARCHAR",
        "hash": _concat_ws_hash,
        "ts_text": lambda x: f"to_varchar({x}, 'YYYY-MM-DD HH24:MI:SS.FF6')",
        "types": {
            "LongType": "NUMBER(38,0)",
            "IntegerType": "NUMBER(38,0)",
            "DoubleType": "FLOAT",
            "TimestampType": "TIMESTAMP_NTZ",
            "TimestampNTZType": "TIMESTAMP_NTZ",
        },
    },
    "postgres": {
        "extract": lambda data, prop: (
            f"jsonb_extract_path_text({data}::jsonb, {_sql_str(prop)})"
        ),
        "quote": lambda name: f'"{name}"',
        "string_type": "VARCHAR",
        "hash": _concat_ws_hash,
        "ts_text": lambda x: f"to_char({x}, 'YYYY-MM-DD HH24:MI:SS.US')",
        "types": {
            "DoubleType": "DOUBLE PRECISION",
        },
    },
}


def _sql_type(dtype: T.DataType, dialect: dict) -> str:
    override = dialect.get("types", {}).get(type(dtype).__name__)
    if override is not None:
        if isinstance(dtype, T.DecimalType):
            return override.format(p=dtype.precision, s=dtype.scale)
        return override
    if isinstance(dtype, T.LongType):
        return "BIGINT"
    if isinstance(dtype, T.IntegerType):
        return "INT"
    if isinstance(dtype, T.DoubleType):
        return "DOUBLE"
    if isinstance(dtype, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return "TIMESTAMP"
    if isinstance(dtype, T.DateType):
        return "DATE"
    if isinstance(dtype, T.DecimalType):
        return f"DECIMAL({dtype.precision},{dtype.scale})"
    if isinstance(dtype, T.StringType):
        return dialect["string_type"]
    raise ValueError(
        f"normalization codegen maps scalar JSON columns only, got {dtype}; "
        "nested objects/arrays route through unnest_children (P8)"
    )


def normalization_stages(
    stream: ConfiguredStream, raw_table: str, dialect: str = "spark"
) -> dict[str, str]:
    """The per-stage SELECTs, keyed by the reference's model suffixes
    (ab1/stg/scd/final). Compose with :func:`generate_normalization_sql`;
    exposed separately so tests can audit one stage at a time."""
    d = _DIALECTS[dialect]
    q = d["quote"]
    reg = NameRegistry()
    cols = [(reg.register(f.name), f) for f in stream.schema.fields]
    names = [n for n, _ in cols]
    name_of = dict(zip([f.name for _, f in cols], names))

    stages: dict[str, str] = {}

    # --- ab1: JSON extraction (generate_json_parsing_model, :386) --------
    extracts = ",\n        ".join(
        f"{d['extract'](RAW_DATA, f.name)} AS {q(n)}" for n, f in cols
    )
    stages["ab1"] = (
        f"SELECT\n        {extracts},\n"
        f"        {RAW_ID},\n        {RAW_EMITTED}\n    FROM {raw_table}"
    )

    # --- stg: surrogate hash over the extracted text, then typing --------
    # (generate_id_hashing_model :667 + generate_column_typing_model :471,
    # fused — see module docstring for the hash-before-cast rationale)
    hashid = f"_airbyte_{stream.name}_hashid"
    dedup = stream.destination_sync_mode == "append_dedup"
    if dedup and not stream.primary_key:
        raise ValueError("append_dedup requires a primary_key")
    unique_key = "_airbyte_unique_key"
    uk_items = ""
    if dedup:
        # unique keys hash the RAW EXTRACTED TEXT too (same rationale as
        # the hashid): CAST(typed AS STRING) renders differently per
        # engine (Spark trims trailing timestamp zeros), so typed-value
        # keys diverge across dialects. Computed here, over ab1's text
        # columns, BEFORE the casts. The no-cursor fallback formats the
        # raw-table timestamp with one pinned micro format per dialect.
        pk_raw = [q(name_of[c]) for c in stream.primary_key]
        cursor_text = (
            q(name_of[stream.cursor_field])
            if stream.cursor_field
            else d["ts_text"](RAW_EMITTED)
        )
        uk_items = (
            f"        {d['hash'](pk_raw)} AS {unique_key},\n"
            f"        {d['hash'](pk_raw + [cursor_text])} AS {unique_key}_scd,\n"
        )
    casts = ",\n        ".join(
        f"CAST({q(n)} AS {_sql_type(f.dtype, d)}) AS {q(n)}" for n, f in cols
    )
    stages["stg"] = (
        f"SELECT\n        {d['hash']([q(n) for n in names])} AS {q(hashid)},\n"
        f"{uk_items}"
        f"        {casts},\n        {RAW_ID},\n        {RAW_EMITTED}\n    FROM ab1"
    )

    if not dedup:
        # non-dedup path: the hash model IS the final model (:275-279)
        stages["final"] = (
            f"SELECT {', '.join(q(n) for n in names)}, "
            f"{q(hashid)}, {RAW_ID}, {RAW_EMITTED} FROM stg"
        )
        return stages

    pk = [q(name_of[c]) for c in stream.primary_key]
    cursor = q(name_of[stream.cursor_field]) if stream.cursor_field else RAW_EMITTED

    # --- scd: Type-2 window (generate_scd_type_2_model, :734-990) --------
    # row_number dedups exact cursor re-deliveries (input_data CTE), lead()
    # derives end_at/active_row, and the scd unique key extends the pk hash
    # with the version start (:968-980).
    payload = ", ".join(q(n) for n in names)
    # NULLS FIRST pinned explicitly: Spark defaults ASC to NULLS FIRST but
    # DuckDB/Postgres/Snowflake default to NULLS LAST — an unpinned order
    # makes the engines disagree on which version is active whenever the
    # cursor is NULL, breaking the row-for-row cross-dialect contract.
    order = f"{cursor} ASC NULLS FIRST, {RAW_ID} ASC"
    stages["scd"] = f"""SELECT
        {unique_key},
        {unique_key}_scd,
        {payload},
        {q(hashid)},
        {RAW_ID},
        {RAW_EMITTED},
        {cursor} AS _airbyte_start_at,
        lead({cursor}) OVER (
            PARTITION BY {', '.join(pk)}
            ORDER BY {order}) AS _airbyte_end_at,
        CASE WHEN lead({cursor}) OVER (
            PARTITION BY {', '.join(pk)}
            ORDER BY {order}) IS NULL
             THEN 1 ELSE 0 END AS _airbyte_active_row
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY {', '.join(pk)}, {cursor}
            ORDER BY {RAW_ID} ASC) AS _airbyte_rn
        FROM stg
    ) deduped
    WHERE _airbyte_rn = 1"""

    # --- final: active rows only (:1068 + active_row where-clause :307) --
    stages["final"] = (
        f"SELECT {unique_key}, {payload}, {q(hashid)}, {RAW_ID}, "
        f"{RAW_EMITTED} FROM scd WHERE _airbyte_active_row = 1"
    )
    return stages


def generate_normalization_sql(
    stream: ConfiguredStream, raw_table: str, dialect: str = "spark"
) -> str:
    """One executable statement: the stage chain as CTEs ending in the
    final model. ``spark.sql(generate_normalization_sql(s, raw, "spark"))``
    and DuckDB running the ``"duckdb"`` render of the same stream must
    agree row-for-row."""
    stages = normalization_stages(stream, raw_table, dialect)
    final = stages.pop("final")
    ctes = ",\n".join(f"{name} AS (\n    {sql}\n)" for name, sql in stages.items())
    return f"WITH {ctes}\n{final}"
