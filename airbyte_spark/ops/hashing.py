"""Cross-engine deterministic hashing primitives.

All similarity/dedup operators hash through md5 so the exact same value is
reproducible in any engine with an md5 function (the DuckDB oracle included):
``H(s) = bigint(first 15 hex chars of md5(s))`` — 60 bits, always positive,
safely inside int64. No engine-specific hash (murmur/xxhash) anywhere, so
results are portable and testable bit-for-bit.

Scale note: md5 here runs JVM-side inside whole-stage codegen
(``F.md5``/``F.conv`` are built-in expressions) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60


def h60(col: Column) -> Column:
    """60-bit positive bigint hash of a string column via md5."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """DuckDB-SQL twin of :func:`h60` for oracle queries."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"
