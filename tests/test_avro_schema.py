"""StructType -> Avro schema conversion (K6) — union nullability, logical
types, name standardization, nested records/arrays, Airbyte meta fields.

Reference behavior: JsonToAvroSchemaConverter.java (see module docstring
of airbyte_spark/avro_schema.py). Pure-dict tests, no Spark session.
"""

import json

from pyspark.sql import types as T

from airbyte_spark.avro_schema import struct_to_avro_schema


def _field(rec, name):
    return next(f for f in rec["fields"] if f["name"] == name)


def test_scalars_logical_types_and_nullability():
    struct = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("ok", T.BooleanType()),
            T.StructField("day", T.DateType()),
            T.StructField("at", T.TimestampType()),
            T.StructField("amt", T.DecimalType(38, 0)),
            T.StructField("blob", T.BinaryType()),
        ]
    )
    rec, renames = struct_to_avro_schema(struct, "users", add_airbyte_fields=False)
    assert rec["type"] == "record" and rec["name"] == "users"
    assert renames == {}
    # every field is a null-first union with a null default
    for f in rec["fields"]:
        assert f["type"][0] == "null" and f["default"] is None
    assert _field(rec, "id")["type"][1] == "long"
    assert _field(rec, "day")["type"][1] == {"type": "int", "logicalType": "date"}
    assert _field(rec, "at")["type"][1] == {
        "type": "long", "logicalType": "timestamp-micros"
    }
    assert _field(rec, "amt")["type"][1]["logicalType"] == "decimal"
    assert _field(rec, "amt")["type"][1]["precision"] == 38
    assert _field(rec, "blob")["type"][1] == "bytes"
    json.dumps(rec)  # JSON-able as-is


def test_name_standardization_tracked():
    struct = T.StructType(
        [
            T.StructField("user name", T.StringType()),
            T.StructField("1starts_with_digit", T.LongType()),
            T.StructField("clean", T.StringType()),
        ]
    )
    rec, renames = struct_to_avro_schema(
        struct, "weird stream!", add_airbyte_fields=False
    )
    assert rec["name"] == "weird_stream_"
    assert _field(rec, "user_name")
    assert _field(rec, "_1starts_with_digit")
    assert renames == {
        "user name": "user_name",
        "1starts_with_digit": "_1starts_with_digit",
        "weird stream!": "weird_stream_",
    }


def test_nested_record_and_array():
    struct = T.StructType(
        [
            T.StructField(
                "address",
                T.StructType(
                    [
                        T.StructField("city", T.StringType()),
                        T.StructField("zip", T.LongType()),
                    ]
                ),
            ),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField(
                "events",
                T.ArrayType(
                    T.StructType([T.StructField("kind", T.StringType())])
                ),
            ),
        ]
    )
    rec, _ = struct_to_avro_schema(struct, "s", add_airbyte_fields=False)
    addr = _field(rec, "address")["type"][1]
    assert addr["type"] == "record" and {f["name"] for f in addr["fields"]} == {
        "city", "zip"
    }
    tags = _field(rec, "tags")["type"][1]
    assert tags == {"type": "array", "items": ["null", "string"]}
    ev_items = _field(rec, "events")["type"][1]["items"][1]
    assert ev_items["type"] == "record"


def test_airbyte_meta_fields_prepended():
    struct = T.StructType([T.StructField("x", T.StringType())])
    rec, _ = struct_to_avro_schema(struct, "s", namespace="my ns")
    assert rec["namespace"] == "my_ns"
    assert [f["name"] for f in rec["fields"][:2]] == [
        "_airbyte_ab_id", "_airbyte_emitted_at"
    ]
    assert rec["fields"][0]["type"]["logicalType"] == "uuid"
    assert rec["fields"][1]["type"]["logicalType"] == "timestamp-millis"
