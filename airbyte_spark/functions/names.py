"""Identifier/name canonicalization + collision registry (P6 — the
catalog-name side of normalization).

Reference semantics being re-expressed (not translated):

* ``standard_name``: strip → accent-strip (NFD, drop combining marks) →
  ``\\s+`` → ``_`` → non-alnum → ``_``
  (destination_name_transformer.py:290-295, strip_accents :303-304).
* ``truncate_middle``: names over the destination limit keep their prefix
  and suffix and mark the cut with ``__`` (or ``_<level>`` on conflict):
  ``prefix = name[:limit-middle-1]; suffix = name[1-middle:]``
  (destination_name_transformer.py:115-137; limit = destination max minus
  the dbt suffix reserve, e.g. Postgres 63 → 43).
* case folding + leading-digit guard per destination
  (destination_name_transformer.py:213-247, :148-161); this engine
  defaults to the lowercase family (Postgres/Redshift/MySQL).
* collision resolution: case-insensitive lookup; the first occurrence
  keeps its name, later ones retry ``{raw}_{i}`` for i = 1..999
  (stream_processor.py:317-345; table_name_registry.py resolves deeper
  table-level conflicts the same way plus hashed suffixes).

Two forms are provided, both semantics-identical:

* driver-side (``canonicalize_identifier`` + ``NameRegistry``) for
  catalog/DDL metadata — identifiers are metadata, not data; plain Python
  is the right tool and the registry is inherently ordered/stateful.
* distributed (``canonicalize_identifier_udf`` + ``resolve_collisions``)
  for bulk column work (e.g. canonicalizing thousands of discovered field
  names across a catalog sweep): an Arrow-vectorized pandas UDF for the
  accent strip plus a window row_number for deterministic ``_n``
  suffixing. ``resolve_collisions`` equals the registry's output whenever
  the suffixed names need no re-truncation (the registry re-canonicalizes
  ``{raw}_{i}``, which only diverges when the suffix pushes the name over
  the length limit).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: Postgres's 63-byte identifier limit minus the reserve dbt needs for
#: its temp/backup suffixes (the reference's effective Postgres limit).
DEFAULT_MAX_LENGTH = 43


def strip_accents(s: str) -> str:
    return "".join(
        c for c in unicodedata.normalize("NFD", s) if unicodedata.category(c) != "Mn"
    )


def standard_name(s: str) -> str:
    s = strip_accents(s.strip())
    s = re.sub(r"\s+", "_", s)
    return re.sub(r"[^A-Za-z0-9_]", "_", s)


def truncate_middle(
    s: str, limit: int, conflict: bool = False, conflict_level: int = 0
) -> str:
    """Middle truncation preserving prefix+suffix; the cut is marked with
    ``__`` (or ``_<level>`` when resolving a conflict)."""
    if len(s) <= limit:
        return s
    middle = round(limit / 2)
    prefix = s[: limit - middle - 1]
    suffix = s[1 - middle :]
    mid = f"_{conflict_level}" if conflict else "__"
    return f"{prefix}{mid}{suffix}"


def canonicalize_identifier(
    name: str,
    max_length: int = DEFAULT_MAX_LENGTH,
    casing: str = "lower",
) -> str:
    """Full destination-safe identifier: standard naming → leading-digit
    guard → middle truncation → case fold.

    Ordering note: the reference guards the leading digit AFTER truncation
    (destination_name_transformer.py:155-161), which can overshoot the
    destination limit by one and makes the transform non-idempotent
    (re-canonicalizing re-truncates). Guarding BEFORE truncation keeps the
    ≤ max_length contract exact and makes the transform idempotent —
    required for replays that re-canonicalize already-written catalogs
    (property-tested in test_lake_model)."""
    out = standard_name(name)
    if out and out[0].isdigit():
        out = "_" + out
    out = truncate_middle(out, max_length)
    if casing == "lower":
        out = out.lower()
    elif casing == "upper":
        out = out.upper()
    return out


class NameRegistry:
    """Collision-resolving identifier registry for one namespace (one
    stream's columns, or one schema's tables).

    Case-insensitive lookup; the first raw name to claim a canonical form
    keeps it, later colliding raws retry ``{raw}_{i}``, re-canonicalized
    so the suffix itself survives truncation/casing rules. Registering
    the same raw name twice returns the same resolved name (idempotent).
    """

    def __init__(self, max_length: int = DEFAULT_MAX_LENGTH, casing: str = "lower"):
        self.max_length = max_length
        self.casing = casing
        self._taken: set[str] = set()
        self._by_raw: dict[str, str] = {}

    def register(self, raw: str) -> str:
        if raw in self._by_raw:
            return self._by_raw[raw]
        cand = canonicalize_identifier(raw, self.max_length, self.casing)
        i = 0
        while cand.lower() in self._taken:
            i += 1
            if i >= 1000:
                raise ValueError(f"cannot resolve name collision for {raw!r}")
            cand = canonicalize_identifier(
                f"{raw}_{i}", self.max_length, self.casing
            )
        self._taken.add(cand.lower())
        self._by_raw[raw] = cand
        return cand

    def mapping(self) -> dict[str, str]:
        return dict(self._by_raw)


def canonicalize_identifier_udf(max_length: int = DEFAULT_MAX_LENGTH):
    """Arrow-vectorized column form of ``canonicalize_identifier`` (the
    accent strip needs unicodedata; everything stays batched, never
    per-row Python over the wire)."""

    @pandas_udf("string")
    def _canon(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: None if x is None else canonicalize_identifier(x, max_length)
        )

    return _canon


def resolve_collisions(
    df: DataFrame,
    canon_col: str,
    order_col: str,
    out: str = "resolved",
) -> DataFrame:
    """Bulk collision suffixing: deterministic ``row_number`` per
    case-folded canonical name (ordered by ``order_col``); the n-th
    duplicate gets ``_n``. A generated suffix can itself collide with a
    PRE-EXISTING canonical name (['a','a','a_1'] -> 'a_1' twice), so the
    suffixing re-runs on the RESOLVED names until unique — the bulk twin
    of ``NameRegistry``'s retry loop. Each round only appends suffixes to
    non-first rows of a group, so names strictly converge; identifier
    sets are small relative to data, so every round is one bounded
    window plus a 1-row duplicate probe."""
    res = df.withColumn(out, F.col(canon_col))
    for _ in range(8):
        w = Window.partitionBy(F.lower(F.col(out))).orderBy(F.col(order_col))
        rn = F.row_number().over(w)
        res = res.withColumn(
            out,
            F.when(rn == 1, F.col(out)).otherwise(
                F.concat(F.col(out), F.lit("_"), (rn - 1).cast("string"))
            ),
        )
        dup = (
            res.groupBy(F.lower(F.col(out)))
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > 1)
            .limit(1)
            .count()
        )
        if dup == 0:
            return res
    raise ValueError(
        "resolve_collisions did not reach a unique naming fixpoint in 8 rounds"
    )
