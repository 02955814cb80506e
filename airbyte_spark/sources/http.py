"""HTTP/API source with pagination, backoff and sliced parallel fetch (S8).

Reference semantics being re-expressed (airbyte-cdk/python/airbyte_cdk/
sources/streams/http/http.py): the ``read_records`` pagination loop
(http.py:406 — request → parse → next_page_token until exhausted), retry
policy (``should_retry`` = 429 or 5xx, http.py:222-240), exponential
backoff honoring ``Retry-After`` (rate_limiting.py), and the declarative
record selector (dpath into the response body).

Spark-first split — the part people get wrong is WHERE the HTTP happens:

* **Cursor-chained pagination is inherently serial** (each page's token
  comes from the previous response): the driver walks the token chain with
  backoff, but holds only raw page BODIES, and hands them straight to a
  DataFrame — all JSON parsing/typing/flattening runs executor-side via
  ``from_json`` + explode (``pages_to_records``), so a 10 GB paginated
  dump costs the driver one pass of I/O and zero parsing.
* **Independent slices (offset windows, date ranges, id shards) fetch ON
  THE EXECUTORS**: ``sliced_fetch`` builds a one-row-per-slice DataFrame
  and runs the transport inside ``mapInPandas`` — N slices fetch with full
  cluster parallelism, each with its own retry/backoff loop. This is the
  100×-scale path; the reference's stream_slices (http.py:118) maps to
  exactly this.

The transport is an injected callable ``(url, params) -> (status, headers,
body)`` — production uses ``urllib_transport`` (stdlib), tests inject a
fake; the engine never depends on a network being present.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: (url, params) -> (status_code, headers, body_text)
Transport = Callable[[str, dict], tuple[int, dict, str]]

DEFAULT_MAX_RETRIES = 5
DEFAULT_RETRY_FACTOR = 2.0


class HttpSourceError(RuntimeError):
    pass


def should_retry(status: int) -> bool:
    """Reference retry predicate (http.py:222-229): 429 or any 5xx."""
    return status == 429 or 500 <= status < 600


def backoff_seconds(attempt: int, headers: dict, retry_factor: float) -> float:
    """Server-driven wait when ``Retry-After`` is present, else exponential
    ``retry_factor * 2**attempt`` (http.py:231-240 + rate_limiting.py)."""
    ra = headers.get("Retry-After") or headers.get("retry-after")
    if ra is not None:
        try:
            return float(ra)
        except ValueError:
            pass
    return retry_factor * (2**attempt)


def fetch_with_backoff(
    transport: Transport,
    url: str,
    params: dict,
    max_retries: int = DEFAULT_MAX_RETRIES,
    retry_factor: float = DEFAULT_RETRY_FACTOR,
    sleep: Callable[[float], None] = time.sleep,
) -> str:
    """One logical request with the reference's retry policy; returns the
    body. Non-retryable non-200s and exhausted retries raise.

    Transport-level failures back off and retry exactly like a 5xx,
    matching the reference's DefaultBackoffHandler treatment of connection
    errors: in ``sliced_fetch`` one flaky connection must not fail the
    whole Spark task. The retryable set is the explicit connection-error
    surface — ``ConnectionError``/``TimeoutError``/``socket.gaierror``
    (DNS), ``urllib.error.URLError`` (stdlib transport wrapper) and
    ``http.client.HTTPException`` (malformed response, e.g.
    ``BadStatusLine``/``RemoteDisconnected``) — NOT bare ``OSError``:
    a ``FileNotFoundError`` from a file-backed test transport or a
    ``PermissionError`` is a bug, not a transient, and must surface
    immediately (round-3 advisor fix)."""
    import http.client
    import socket
    import urllib.error

    retryable = (
        ConnectionError,
        TimeoutError,
        socket.gaierror,
        socket.timeout,
        urllib.error.URLError,
        http.client.HTTPException,
    )
    last_err = None
    for attempt in range(max_retries + 1):
        try:
            status, headers, body = transport(url, params)
        except retryable as e:
            last_err = e
            if attempt < max_retries:
                sleep(backoff_seconds(attempt, {}, retry_factor))
            continue
        if status == 200:
            return body
        if not should_retry(status):
            raise HttpSourceError(f"HTTP {status} for {url} (not retryable)")
        last_err = f"HTTP {status}"
        if attempt < max_retries:
            sleep(backoff_seconds(attempt, headers, retry_factor))
    raise HttpSourceError(f"{last_err} for {url}: retries exhausted")


def urllib_transport(url: str, params: dict) -> tuple[int, dict, str]:
    """Stdlib production transport (no extra deps)."""
    import urllib.error
    import urllib.parse
    import urllib.request

    full = url + ("?" + urllib.parse.urlencode(params) if params else "")
    try:
        with urllib.request.urlopen(full, timeout=60) as r:  # noqa: S310
            return r.status, dict(r.headers), r.read().decode("utf-8")
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers or {}), ""


@dataclass
class HttpStreamSpec:
    """Declarative description of one paginated API stream."""

    name: str
    url: str
    #: JSON field holding the record list in each response body
    records_field: str = "data"
    #: JSON field holding the next-page token (null/absent = last page)
    next_token_field: str = "next"
    #: request param carrying the token
    token_param: str = "page_token"
    base_params: dict = field(default_factory=dict)
    max_pages: int = 100_000
    max_retries: int = DEFAULT_MAX_RETRIES
    retry_factor: float = DEFAULT_RETRY_FACTOR


def read_pages(
    spec: HttpStreamSpec,
    transport: Transport,
    sleep: Callable[[float], None] = time.sleep,
) -> Iterator[str]:
    """The serial token-chain walk (http.py:406 read_records loop): yields
    raw page bodies; parsing happens in Spark, not here."""
    token: Optional[str] = None
    for _ in range(spec.max_pages):
        params = dict(spec.base_params)
        if token is not None:
            params[spec.token_param] = token
        body = fetch_with_backoff(
            transport, spec.url, params, spec.max_retries, spec.retry_factor, sleep
        )
        yield body
        token = json.loads(body).get(spec.next_token_field)
        if token is None:
            return
    raise HttpSourceError(f"{spec.name}: exceeded max_pages={spec.max_pages}")


def pages_to_records(
    spark: SparkSession,
    pages: Iterator[str],
    record_schema: T.StructType,
    records_field: str = "data",
) -> DataFrame:
    """Raw page bodies -> typed record rows, parsed EXECUTOR-side:
    from_json(array<struct>) + explode — the driver never parses payloads."""
    body_df = spark.createDataFrame(((p,) for p in pages), "body string")
    arr = F.from_json(
        F.get_json_object(F.col("body"), f"$.{records_field}"),
        T.ArrayType(record_schema),
    )
    rec = body_df.select(F.explode(arr).alias("r"))
    return rec.select([F.col(f"r.{f.name}").alias(f.name) for f in record_schema.fields])


def sliced_fetch(
    spark: SparkSession,
    spec: HttpStreamSpec,
    slices: list[dict],
    record_schema: T.StructType,
    transport: Transport,
    sleep: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """Independent slices fetched ON THE EXECUTORS (http.py:118
    stream_slices): one row per slice -> repartition to slice count ->
    mapInPandas runs the transport + retry loop per slice in parallel,
    emitting typed records via Arrow. This is the scale path: N date-range/
    offset shards saturate the cluster, not the driver NIC."""
    slice_df = spark.createDataFrame(
        [(json.dumps(s),) for s in slices], "slice_json string"
    ).repartition(max(len(slices), 1))
    fields = record_schema.fields

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for sj in pdf["slice_json"]:
                params = {**spec.base_params, **json.loads(sj)}
                body = fetch_with_backoff(
                    transport, spec.url, params, spec.max_retries,
                    spec.retry_factor, sleep,
                )
                recs = json.loads(body).get(spec.records_field, [])
                out.extend(recs)
            yield pd.DataFrame(
                {f.name: [r.get(f.name) for r in out] for f in fields}
            )

    return slice_df.mapInPandas(fetch, record_schema)
