"""Singer tap adapter (S10) — envelope parse, typing, state, versions,
catalog conversion and selection rendering.

Reference behavior under test: singer_helpers.py (see module docstring of
airbyte_spark/sources/singer.py for the file:line map).
"""

import json
import os

import pytest

from airbyte_spark.sources import singer as sg

from pyspark.sql import types as T


CATALOG = {
    "streams": [
        {
            "stream": "users",
            "schema": {
                "type": "object",
                "properties": {
                    "id": {"type": "integer"},
                    "name": {"type": ["null", "string"]},
                    "balance": {"type": "number"},
                    "vip": {"type": "boolean"},
                    "joined": {"type": "string", "format": "date-time"},
                },
            },
            "key_properties": ["id"],
            "metadata": [
                {
                    "breadcrumb": [],
                    "metadata": {"valid-replication-keys": ["updated_at", "id"]},
                },
                {
                    "breadcrumb": ["properties", "name"],
                    "metadata": {"inclusion": "available"},
                },
                {
                    "breadcrumb": ["properties", "secret"],
                    "metadata": {"fieldExclusions": [["properties", "ssn"]]},
                },
            ],
        },
        {
            "stream": "snapshots",
            "schema": {
                "type": "object",
                "properties": {"k": {"type": "string"}, "v": {"type": "integer"}},
            },
            "key_properties": [],
            "metadata": [
                {
                    "breadcrumb": [],
                    "metadata": {"forced-replication-method": "FULL_TABLE"},
                }
            ],
        },
    ]
}


def _tap_lines():
    """A deterministic captured tap run: 2 streams, state, versions, noise."""
    users_schema = CATALOG["streams"][0]["schema"]
    lines = [
        json.dumps(
            {
                "type": "SCHEMA",
                "stream": "users",
                "schema": users_schema,
                "key_properties": ["id"],
            }
        ),
        "INFO starting sync (not a protocol line)",
        json.dumps(
            {
                "type": "RECORD",
                "stream": "users",
                "record": {
                    "id": 1,
                    "name": "ada",
                    "balance": 1.5,
                    "vip": True,
                    "joined": "2024-01-02 03:04:05.000006",
                },
            }
        ),
        json.dumps({"type": "STATE", "value": {"bookmarks": {"users": {"id": 1}}}}),
        json.dumps(
            {
                "type": "RECORD",
                "stream": "users",
                "record": {"id": 2, "name": None, "balance": 2.0, "vip": False},
                "time_extracted": "2024-05-05T00:00:00Z",
            }
        ),
        # full-table stream with version activation: v1 rows swept by v2
        json.dumps(
            {"type": "RECORD", "stream": "snapshots", "version": 1,
             "record": {"k": "old", "v": 1}}
        ),
        json.dumps(
            {"type": "RECORD", "stream": "snapshots", "version": 2,
             "record": {"k": "new", "v": 2}}
        ),
        json.dumps({"type": "ACTIVATE_VERSION", "stream": "snapshots", "version": 2}),
        json.dumps({"type": "STATE", "value": {"bookmarks": {"users": {"id": 2}}}}),
    ]
    return lines


@pytest.fixture(scope="module")
def tap_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("singer_tap")
    with open(os.path.join(d, "part-000.jsonl"), "w") as f:
        f.write("\n".join(_tap_lines()) + "\n")
    return str(d)


def test_envelope_counts_and_log_lines(spark, tap_dir):
    env = sg.read_singer_output(spark, tap_dir)
    counts = sg.message_counts(env)
    assert counts == {
        "SCHEMA": 1,
        "RECORD": 4,
        "STATE": 2,
        "ACTIVATE_VERSION": 1,
        "LOG": 1,
    }


def test_typed_records_round_trip(spark, tap_dir):
    env = sg.read_singer_output(spark, tap_dir)
    struct = sg.json_type_to_spark(CATALOG["streams"][0]["schema"])
    rows = {
        r["id"]: r
        for r in sg.records(env, "users", struct).orderBy("id").collect()
    }
    assert rows[1]["name"] == "ada" and rows[1]["vip"] is True
    assert rows[1]["balance"] == 1.5
    assert rows[1]["joined"].microsecond == 6  # micro-exact timestamp parse
    assert rows[2]["name"] is None and rows[2]["vip"] is False
    assert rows[2]["time_extracted"] == "2024-05-05T00:00:00Z"
    # schema field types honored
    d = dict(sg.records(env, "users", struct).dtypes)
    assert d["id"] == "bigint" and d["balance"] == "double" and d["vip"] == "boolean"
    assert d["joined"] == "timestamp"


def test_latest_state_is_last_in_emit_order(spark, tap_dir):
    env = sg.read_singer_output(spark, tap_dir)
    assert sg.latest_state(env) == {"bookmarks": {"users": {"id": 2}}}


def test_activate_version_sweeps_old_rows(spark, tap_dir):
    env = sg.read_singer_output(spark, tap_dir)
    struct = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    live = sg.active_records(env, "snapshots", struct).collect()
    assert [(r["k"], r["v"]) for r in live] == [("new", 2)]
    # unversioned streams: everything live
    users = sg.active_records(
        env, "users", sg.json_type_to_spark(CATALOG["streams"][0]["schema"])
    )
    assert users.count() == 2


def test_serialize_records_micro_exact_round_trip(spark):
    """to_json drops timestampFormat for NESTED structs (the record sits
    inside the envelope), so serialize_records must pre-format timestamps —
    this guards the micro-precision cursor round trip."""
    from pyspark.sql import functions as F

    src = spark.createDataFrame(
        [(1, "2024-01-01 00:03:52.824425"), (2, "2024-06-30 23:59:59.000001")],
        "id bigint, s string",
    ).select("id", F.to_timestamp("s").alias("ts"))
    lines = sg.serialize_records(src, "t", version_col=F.lit(7))
    env = sg.parse_singer_lines(lines)
    back = sg.records(env, "t", src.schema).orderBy("id").collect()
    assert [r["ts"].microsecond for r in back] == [824425, 1]
    assert [r[sg.VERSION_COL] for r in back] == [7, 7]


def test_catalog_conversion_metadata_rules():
    streams = sg.singer_catalog_to_streams(CATALOG)
    users = next(s for s in streams if s.name == "users")
    # valid-replication-keys -> incremental, first SORTED key as cursor
    assert users.sync_mode == "incremental"
    assert users.cursor_field == "id"
    assert users.primary_key == ["id"]
    assert users.destination_sync_mode == "append_dedup"
    snap = next(s for s in streams if s.name == "snapshots")
    assert snap.sync_mode == "full_refresh"
    assert snap.primary_key == [] and snap.destination_sync_mode == "append"
    # typed schema came through json_type_to_spark
    types = {f.name: f.dtype for f in users.schema.fields}
    assert isinstance(types["joined"], T.TimestampType)
    assert isinstance(types["id"], T.LongType)


def test_catalog_overrides_and_exclusions():
    streams = sg.singer_catalog_to_streams(
        CATALOG,
        sync_mode_overrides={"users": "full_refresh"},
        primary_key_overrides={"snapshots": ["k"]},
        excluded_streams=["nope"],
    )
    users = next(s for s in streams if s.name == "users")
    assert users.sync_mode == "full_refresh"
    snap = next(s for s in streams if s.name == "snapshots")
    assert snap.primary_key == ["k"]
    assert [s.name for s in sg.singer_catalog_to_streams(
        CATALOG, excluded_streams=["users"]
    )] == ["snapshots"]


def test_render_selection_catalog():
    configured = sg.singer_catalog_to_streams(CATALOG, excluded_streams=["snapshots"])
    rendered = sg.render_selection_catalog(configured, CATALOG)
    users = next(s for s in rendered["streams"] if s["stream"] == "users")
    assert users["schema"]["selected"] is True
    stream_md = next(
        m["metadata"] for m in users["metadata"] if m["breadcrumb"] == []
    )
    assert stream_md["selected"] is True
    assert stream_md["replication-method"] == "INCREMENTAL"
    assert stream_md["replication-key"] == "id"
    field_md = next(
        m["metadata"]
        for m in users["metadata"]
        if m["breadcrumb"] == ["properties", "name"]
    )
    assert field_md["selected"] is True
    excl_md = next(
        m["metadata"]
        for m in users["metadata"]
        if m["breadcrumb"] == ["properties", "secret"]
    )
    assert excl_md["selected"] is False  # fieldExclusions rule
    # unconfigured stream untouched (no selected stamp)
    snap = next(s for s in rendered["streams"] if s["stream"] == "snapshots")
    assert "selected" not in snap.get("schema", {})
    # input catalog not mutated
    assert "selected" not in CATALOG["streams"][0]["schema"]


def test_latest_state_across_files_ignores_partition_order(spark, tmp_path):
    """chunk-000 (small, early, STALE state) + chunk-001 (large, later,
    final state): Spark packs file splits size-DESCENDING, so a partition-
    id-based sequence orders the big later file FIRST and latest_state
    would resurrect the stale bookmark (checkpoint regression). The
    file-aware sequence must return the last state in capture order."""
    d = tmp_path / "cap"
    d.mkdir()
    early = [
        json.dumps({"type": "RECORD", "stream": "users", "record": {"id": 1}}),
        json.dumps({"type": "STATE", "value": {"bookmark": 1}}),
    ]
    late = [
        json.dumps({"type": "RECORD", "stream": "users", "record": {"id": i}})
        for i in range(2, 2000)
    ] + [json.dumps({"type": "STATE", "value": {"bookmark": 2}})]
    (d / "chunk-000.jsonl").write_text("\n".join(early) + "\n")
    (d / "chunk-001.jsonl").write_text("\n".join(late) + "\n")
    env = sg.read_singer_output(spark, str(d))
    assert sg.latest_state(env) == {"bookmark": 2}


def test_rfc3339_timestamps_parse_by_default(spark):
    """Real taps emit RFC3339 ('T'/'Z'); our own captures use the pinned
    space-separated micro format — BOTH must type-parse with the default
    parse format, or cursor values silently come back NULL."""
    import datetime

    lines = [
        json.dumps({"type": "RECORD", "stream": "s",
                    "record": {"id": 1, "at": "2021-01-01T00:00:00.000000Z"}}),
        json.dumps({"type": "RECORD", "stream": "s",
                    "record": {"id": 2, "at": "2021-01-01 00:00:00.000123"}}),
        # Python strftime('%z') basic-format offset (no colon)
        json.dumps({"type": "RECORD", "stream": "s",
                    "record": {"id": 3, "at": "2021-01-01T01:00:00+0000"}}),
    ]
    env = sg.parse_singer_lines(
        spark.createDataFrame([(l,) for l in lines], "value string")
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("at", T.TimestampType())]
    )
    vals = {r["id"]: r["at"] for r in sg.records(env, "s", schema).collect()}
    assert vals[1] == datetime.datetime(2021, 1, 1)  # session tz is UTC
    assert vals[2] == datetime.datetime(2021, 1, 1, 0, 0, 0, 123)
    assert vals[3] == datetime.datetime(2021, 1, 1, 1, 0)


def test_record_field_name_with_dot(spark):
    """A JSON property named 'user.name' is a legal key — field extraction
    must not parse it as a nested path."""
    lines = [
        json.dumps({"type": "RECORD", "stream": "s",
                    "record": {"id": 1, "user.name": "ada"}})
    ]
    env = sg.parse_singer_lines(
        spark.createDataFrame([(l,) for l in lines], "value string")
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()),
         T.StructField("user.name", T.StringType())]
    )
    row = sg.records(env, "s", schema).collect()[0]
    assert row["id"] == 1 and row["user.name"] == "ada"
