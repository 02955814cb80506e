"""HTTP source: pagination chain, retry/backoff policy, executor-side
sliced fetch (S8 — reference airbyte-cdk http.py:406,222-240)."""

import json

import pytest
from pyspark.sql import types as T

from airbyte_spark.sources.http import (
    HttpSourceError,
    HttpStreamSpec,
    backoff_seconds,
    fetch_with_backoff,
    pages_to_records,
    read_pages,
    should_retry,
    sliced_fetch,
)

REC_SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
)


def _page(records, next_token=None):
    return json.dumps({"data": records, "next": next_token})


PAGES = {
    None: _page([{"id": 1, "name": "a"}, {"id": 2, "name": "b"}], "t1"),
    "t1": _page([{"id": 3, "name": "c"}], "t2"),
    "t2": _page([{"id": 4, "name": "d"}]),
}


def paged_transport(url, params):
    return 200, {}, PAGES[params.get("page_token")]


def test_pagination_chain_and_executor_parse(spark):
    spec = HttpStreamSpec(name="s", url="http://api.test/v1/things")
    pages = list(read_pages(spec, paged_transport))
    assert len(pages) == 3
    df = pages_to_records(spark, iter(pages), REC_SCHEMA)
    rows = sorted((r.id, r.name) for r in df.collect())
    assert rows == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_retry_predicate_and_backoff_schedule():
    assert should_retry(429) and should_retry(503) and not should_retry(404)
    assert backoff_seconds(0, {}, 2.0) == 2.0
    assert backoff_seconds(2, {}, 2.0) == 8.0
    assert backoff_seconds(0, {"Retry-After": "7"}, 2.0) == 7.0

    calls = {"n": 0}
    sleeps = []

    def flaky(url, params):
        calls["n"] += 1
        if calls["n"] == 1:
            return 429, {}, ""
        if calls["n"] == 2:
            return 503, {"Retry-After": "7"}, ""
        return 200, {}, "ok"

    body = fetch_with_backoff(flaky, "u", {}, retry_factor=2.0, sleep=sleeps.append)
    assert body == "ok"
    assert sleeps == [2.0, 7.0]  # exponential, then server-driven


def test_transport_errors_retry_like_5xx():
    """Connection-level failures (URLError/socket timeout are OSError
    subclasses) back off and retry instead of failing the Spark task on
    the first flaky connection — reference connection-error backoff."""
    calls = {"n": 0}
    sleeps = []

    def flaky(url, params):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ConnectionResetError("peer reset")
        if calls["n"] == 2:
            raise TimeoutError("socket timeout")
        return 200, {}, "ok"

    body = fetch_with_backoff(flaky, "u", {}, retry_factor=2.0, sleep=sleeps.append)
    assert body == "ok"
    assert sleeps == [2.0, 4.0]

    def always_down(url, params):
        raise ConnectionRefusedError("no route")

    with pytest.raises(HttpSourceError, match="retries exhausted"):
        fetch_with_backoff(always_down, "u", {}, max_retries=2, sleep=lambda s: None)


def test_transport_retry_boundary():
    """The retryable set is the explicit connection-error surface: a
    malformed response (http.client.BadStatusLine — NOT an OSError) retries
    like a 5xx, while a non-transient OSError (FileNotFoundError from a
    file-backed test transport) surfaces immediately."""
    import http.client

    calls = {"n": 0}

    def bad_line_then_ok(url, params):
        calls["n"] += 1
        if calls["n"] == 1:
            raise http.client.BadStatusLine("garbage")
        return 200, {}, "ok"

    assert fetch_with_backoff(bad_line_then_ok, "u", {}, sleep=lambda s: None) == "ok"

    def missing_file(url, params):
        raise FileNotFoundError("fixture gone")

    with pytest.raises(FileNotFoundError):
        fetch_with_backoff(missing_file, "u", {}, sleep=lambda s: None)


def test_non_retryable_and_exhaustion():
    with pytest.raises(HttpSourceError, match="404.*not retryable"):
        fetch_with_backoff(lambda u, p: (404, {}, ""), "u", {}, sleep=lambda s: None)
    with pytest.raises(HttpSourceError, match="retries exhausted"):
        fetch_with_backoff(
            lambda u, p: (500, {}, ""), "u", {}, max_retries=2, sleep=lambda s: None
        )


def test_sliced_fetch_on_executors(spark):
    spec = HttpStreamSpec(name="s", url="http://api.test/v1/things")

    def slice_transport(url, params):
        lo = int(params["offset"])
        recs = [{"id": lo + i, "name": f"n{lo + i}"} for i in range(2)]
        return 200, {}, json.dumps({"data": recs})

    slices = [{"offset": k} for k in (0, 10, 20, 30)]
    df = sliced_fetch(spark, spec, slices, REC_SCHEMA, slice_transport)
    got = sorted(r.id for r in df.collect())
    assert got == [0, 1, 10, 11, 20, 21, 30, 31]
    # fetch happens inside a mapInPandas stage, not on the driver
    assert "MapInPandas" in df._jdf.queryExecution().executedPlan().toString()
