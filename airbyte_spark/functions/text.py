"""Vectorized text canonicalization (the engine's only Python data path).

Re-expresses the reference's name/text normalization rules
(destination_name_transformer.py:290-303 — accent stripping, whitespace
collapse; JdbcSqlOperations/StateDecoratingIterator NUL stripping;
stream_processor.py:534 empty_string_to_null) as ONE Arrow-batched pandas UDF
— never per-row Python (north_star requirement).

``canonicalize_pandas`` is the pure-pandas twin used by test oracles so the
engine and oracle share byte-identical semantics.

Rules, in order:
1. strip NUL (\\x00) and other C0 control chars except \\t \\n \\r
2. Unicode NFKD normalize, drop combining marks (accent strip: é -> e)
3. collapse all whitespace runs (incl. \\t \\n \\r) to a single space
4. trim
5. empty string -> null
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_CTRL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
_WS = re.compile(r"\s+")


def canonicalize_pandas(s: pd.Series) -> pd.Series:
    """Vectorized canonicalization of a string Series (nulls pass through,
    empty results become null)."""
    mask = s.notna()
    out = s.copy()
    # str accessor keeps everything in C where possible; the NFKD pass has no
    # vectorized pandas form, so it runs via .map on the non-ASCII slice only
    # (NFKD + combining-mark strip is the identity on pure ASCII).
    vals = s[mask].astype(str)
    vals = vals.str.replace(_CTRL, "", regex=True)
    nonascii = vals.str.contains(r"[^\x00-\x7f]", regex=True)
    if nonascii.any():
        vals[nonascii] = vals[nonascii].map(
            lambda x: "".join(
                ch
                for ch in unicodedata.normalize("NFKD", x)
                if not unicodedata.combining(ch)
            )
        )
    vals = vals.str.replace(_WS, " ", regex=True).str.strip()
    out[mask] = vals
    out[out == ""] = None
    return out


@F.pandas_udf(StringType())
def canonicalize_udf(s: pd.Series) -> pd.Series:
    return canonicalize_pandas(s)


def canonicalize_col(col):
    """Apply the canonicalizer to a Column."""
    return canonicalize_udf(col)
